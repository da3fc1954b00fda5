package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition backfill: the replaced slice changes, every sibling
  * partition survives bit-identically, and the session conf is never
  * flipped (the round-10 ADVICE lesson — a global
  * partitionOverwriteMode switch silently changes every later
  * Overwrite+partitionBy in the session).
  */
class BackfillSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("overwritePartitions replaces exactly the slice's partitions; " +
      "siblings bit-identical; session conf untouched; empty slice " +
      "refused") {
    val dir = java.nio.file.Files
      .createTempDirectory("backfill").toString + "/t"
    val v1 = Seq((1L, "d1", 10L), (2L, "d1", 20L), (3L, "d2", 30L),
      (4L, "d3", 40L)).toDF("id", "day", "x")
    v1.write.partitionBy("day").parquet(dir)
    val before = Backfill.partitionManifest(spark, dir, "day",
        Seq("id", "x"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2)))).toMap
    val confBefore = spark.conf
      .getOption("spark.sql.sources.partitionOverwriteMode")
    // recompute day d1 only: one row dropped, one corrected
    Backfill.overwritePartitions(
      Seq((1L, "d1", 11L)).toDF("id", "day", "x"), dir, "day")
    val after = Backfill.partitionManifest(spark, dir, "day",
        Seq("id", "x"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2)))).toMap
    assert(after.keySet === Set("d1", "d2", "d3"),
      "a sibling partition vanished — the write ran under truncate " +
        "(static) semantics")
    assert(after("d2") === before("d2") && after("d3") === before("d3"),
      "a sibling partition's content changed")
    assert(after("d1")._1 === 1L, "the backfilled slice was not replaced")
    assert(after("d1")._2 !== before("d1")._2)
    // the scoped option must not leak into the session conf
    assert(spark.conf
      .getOption("spark.sql.sources.partitionOverwriteMode")
      === confBefore)
    // empty slice: a silent no-op is refused loudly
    val ex = intercept[IllegalArgumentException] {
      Backfill.overwritePartitions(v1.filter(col("id") < 0), dir, "day")
    }
    assert(ex.getMessage.contains("empty"))
  }
}
