package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-aware equi join via key salting (SURVEY.md §4: "salting for
  * skew"). For a big fact side with hot keys joining a smaller dim side:
  * the fact side gets a random salt in [0, salts); the dim side is
  * replicated `salts` times; the join key becomes (key, salt), spreading
  * each hot key over `salts` reducers.
  *
  * AQE's skew-join splitting handles sort-merge skew automatically; this
  * explicit form remains necessary for aggregations-after-join shapes and
  * for deterministic tests, and composes with any join type whose
  * semantics survive replication (inner / left_outer from the salted
  * side).
  */
object SkewJoin {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      salts: Int = 8,
      joinType: String = "inner"): DataFrame = {
    // deterministic salt: hash of the full row spread over salts buckets
    // (rand() would break retries/replays — determinism is a feature)
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)).cast("int"))
    val replicatedSmall = small
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall,
        saltedBig("_salt") === replicatedSmall("_salt") &&
          col(bigKey) === col(smallKey), joinType)
      .drop("_salt")
  }
}
