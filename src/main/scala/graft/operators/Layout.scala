package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout operators (the Z-order clustering
  * production lakehouses expose as `OPTIMIZE ... ZORDER BY` — public:
  * Morton 1966; Delta Lake / Iceberg both document the technique).
  *
  * Why it matters at 100 TB: parquet data skipping prunes row groups
  * and files by min/max statistics. A layout sorted by ONE column
  * prunes only predicates on that column; interleaving the quantized
  * bits of SEVERAL columns into one Morton key and range-partitioning
  * by it keeps every partition tight in ALL interleaved dimensions at
  * once, so a conjunctive filter on any subset of them skips most of
  * the corpus. The whole operator is one agg (per-column min/max,
  * broadcast back), a per-row codegen'd bit-interleave, and the same
  * range exchange any sorted write already pays — no extra pass.
  */
object Layout {

  /** 16-bit min/max quantization of a numeric column: 0 when the
    * column is constant, else floor((x − min) · 65535 / (max − min)).
    * Double arithmetic — IEEE-identical across engines, so the oracle
    * can replay it verbatim.
    */
  private def quant(x: Column, mn: Column, mx: Column, bits: Int): Column =
    when(mx === mn, lit(0L)).otherwise(
      floor((x.cast("double") - mn.cast("double")) *
        ((1L << bits) - 1).toDouble /
        (mx.cast("double") - mn.cast("double"))).cast("long"))

  /** Morton bit-interleave of pre-quantized keys: bit i of key j lands
    * at position i·width + (width − 1 − j), so key 0 owns the most
    * significant bit of each group. Static unroll — stays in
    * whole-stage codegen (bits × width shift-mask terms).
    */
  private def interleave(qs: Seq[Column], bits: Int): Column = {
    val width = qs.size
    val terms = for {
      i <- 0 until bits
      (q, j) <- qs.zipWithIndex
    } yield shiftleft(
      shiftright(q, i).bitwiseAND(lit(1L)),
      i * width + (width - 1 - j))
    terms.reduce(_ + _)
  }

  /** Adds `zval`: the Morton (Z-order) key of `cols`, each min/max
    * quantized to `bits` bits. The min/max aggregate is one tiny row
    * broadcast back — the corpus is touched once.
    */
  def withZValue(df: DataFrame, cols: Seq[String],
      bits: Int = 16): DataFrame = {
    require(cols.size >= 2, s"z-order needs >= 2 columns: $cols")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits * cols must fit a long: $bits x ${cols.size}")
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"__mn_$c"), max(col(c)).as(s"__mx_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val qs = cols.map(c =>
      quant(col(c), col(s"__mn_$c"), col(s"__mx_$c"), bits))
    joined.withColumn("zval", interleave(qs, bits))
      .drop(cols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c")): _*)
  }

  /** The write-side layout: range-partition + sort by the Z key, the
    * shape `df.write.parquet` turns into multi-dimension-tight files
    * (each file's min/max envelope is narrow in EVERY z-ordered
    * column, so data skipping prunes on any of them).
    */
  def zorderLayout(df: DataFrame, cols: Seq[String], partitions: Int,
      bits: Int = 16): DataFrame = {
    require(partitions >= 1, s"partitions must be positive: $partitions")
    withZValue(df, cols, bits)
      .repartitionByRange(partitions, col("zval"))
      .sortWithinPartitions("zval")
  }
}
