package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Partition BACKFILL/repair on a partitioned parquet layout — the
  * lakehouse verb that recomputes one slice (a bad day, a corrected
  * source) and replaces exactly that slice, leaving every sibling
  * partition byte-untouched (public art: Hive dynamic partition
  * overwrite, Delta replaceWhere).
  *
  * The overwrite mode is scoped PER WRITE with
  * `.option("partitionOverwriteMode", "dynamic")` — never the session
  * conf. A session-global flip silently changes every later
  * Overwrite+partitionBy in the session from truncate-directory to
  * dynamic semantics (the round-10 ADVICE defect in SketchStore:
  * an index rebuild after such a flip kept stale partitions its new
  * assignment left empty). BackfillSpec pins both properties: sibling
  * partitions survive the backfill bit-identically, and the session
  * conf is unchanged after the call.
  */
object Backfill {

  /** Replace exactly the partitions PRESENT IN `slice` under
    * `dir` (a `partitionBy(partCol)` parquet layout). The caller's
    * frame must hold the full recomputed content of those partitions —
    * dynamic overwrite replaces per-directory, so a partial slice
    * silently truncates its partition to the partial rows; the guard
    * below refuses an EMPTY slice loudly (an empty dynamic overwrite
    * is a no-op that reads as success).
    */
  def overwritePartitions(slice: DataFrame, dir: String,
      partCol: String): Unit = {
    require(!slice.isEmpty,
      "overwritePartitions: the slice is empty — an empty dynamic " +
        "overwrite no-ops silently; refusing rather than reporting a " +
        "backfill that never happened")
    slice.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(dir)
  }

  /** The post-backfill audit: per partition value, row count and the
    * order-independent md5-52bit content checksum over `canonCols`
    * ([[graft.operators.Lineage.rowHash]]) — what a backfill job
    * stamps to prove which slices changed and that the rest did not.
    */
  def partitionManifest(spark: SparkSession, dir: String,
      partCol: String, canonCols: Seq[String]): DataFrame = {
    val df = spark.read.parquet(dir)
    df.groupBy(col(partCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(graft.operators.Lineage.rowHash(
          concat_ws(":", canonCols.map(col): _*))).as("cs"))
      .select(col(partCol), col("n_rows"),
        col("cs").cast("string").as("checksum"))
      .orderBy(partCol)
  }
}
