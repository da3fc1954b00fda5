package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixture-table loaders for the driver-generated parquet tables
  * (see /root/repo/TESTDATA.md). All reads go through here so every
  * query benefits from the same vectorized parquet scan with
  * predicate pushdown / column pruning handled by Catalyst.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Idempotent session-conf enable for TIMESTAMP(NANOS) parquet reads —
    * set only when absent so a shared session is mutated at most once.
    */
  def ensureNanosAsLong(spark: SparkSession): Unit =
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      .contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts has shipped as parquet TIMESTAMP(NANOS) (read nanos-as-
    // long and convert; µs-aligned, no precision loss) and as
    // timestamp[us] WITHOUT timezone, which Spark 4 reads TIMESTAMP_NTZ
    // (cast to TIMESTAMP — epoch-exact under the pinned UTC session
    // timezone). Normalizing HERE keeps every downstream consumer
    // (unix_micros, window(), streaming watermarks) on one type.
    ensureNanosAsLong(spark)
    // footer-schema read (ParquetIO): every query body re-loads its
    // fixture tables on every run, and a plain spark.read.parquet pays
    // a schema-INFERENCE Spark job per call (~25-100 ms of job latency
    // each; the bench re-plans ~250 queries × 3 runs × 1-3 tables).
    // One driver-side footer read yields the identical schema —
    // inference itself reads a single footer through the same
    // converter (guide §6: metadata work is driver-side). The nanos
    // conf above is set BEFORE the footer is converted, so the
    // TIMESTAMP(NANOS)→Long handling matches the inference path.
    val df = sources.ParquetIO.read(spark, s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else if (name == "events" &&
        df.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
      df.withColumn("ts", col("ts").cast("timestamp"))
    else df
  }

  /** Registers every fixture table as a temp view so `spark.sql`
    * queries can refer to them by name (mirrors how the DuckDB
    * oracle sees them).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
