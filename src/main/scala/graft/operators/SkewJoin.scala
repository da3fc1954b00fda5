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

  /** Sketch-driven DIFFERENTIATED salting — the production form of
    * [[saltedEquiJoin]] for when the small side is not tiny: blanket
    * salting replicates the ENTIRE small side `salts`×; here a
    * Misra–Gries pass over the big side's keys
    * ([[graft.functions.expressions.FreqSketchAgg]] — each map task
    * ships ≤ 2·capacity rows) finds the hot keys, and ONLY their small-
    * side rows are replicated. The split is theorem-backed, not
    * heuristic: every key that survives the sketch is salted, and any
    * key the sketch dropped has true frequency ≤ delta ≤ N/(capacity+1)
    * — so after the split NO reducer can receive more than
    * max(N/(capacity+1), maxFreq/salts) rows of any one key.
    *
    * Cold keys take the plain shuffled join; hot keys take the salted
    * join with the (≤ 2·capacity)-row hot list broadcast to both
    * sides. Output ≡ the plain inner join, row for row.
    */
  def sketchSaltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      salts: Int = 8,
      capacity: Int = 1024): DataFrame = {
    val spark = big.sparkSession
    import spark.implicits._
    val hotKeys = big
      .agg(graft.functions.expressions.FreqSketchAgg
        .freq_sketch(col(bigKey).cast("string"), capacity).as("sk"))
      .select(explode(col("sk.items.item")).as("k"))
      .as[String].collect().toSeq
    val hotDf = broadcast(hotKeys.toDF("__hot")
      .select(col("__hot").cast(big.schema(bigKey).dataType)))
    val bigCold = big.join(hotDf, col(bigKey) === col("__hot"), "left_anti")
    val bigHot = big.join(hotDf, col(bigKey) === col("__hot"), "left_semi")
    val smallHot = small
      .join(hotDf, col(smallKey) === col("__hot"), "left_semi")
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    val saltedBigHot = bigHot.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)).cast("int"))
    val hotJoined = saltedBigHot.join(smallHot,
        saltedBigHot("_salt") === smallHot("_salt") &&
          col(bigKey) === col(smallKey), "inner")
      .drop("_salt")
    val coldJoined = bigCold.join(small,
      col(bigKey) === col(smallKey), "inner")
    hotJoined.unionByName(coldJoined)
  }
}
