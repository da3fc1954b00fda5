package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional clustering + zone-map
  * data skipping — the storage-layout operator behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY` and classic zone maps / small materialized
  * aggregates (Moerkotte VLDB'98; Morton 1966; all public art).
  *
  * Why it matters at 100 TB: a table range-partitioned by ONE column
  * prunes scans only for predicates on that column. Interleaving the
  * bits of two (quantized) sort keys makes each storage bucket a
  * compact RECTANGLE in (x, y) space, so per-bucket min/max zone maps
  * prune 2-D predicates on either or both columns — the difference
  * between touching O(√B) and O(B) of the B buckets for a box query.
  * Everything here is exact integer arithmetic (quantize → interleave
  * → fixed-width bucket → min/max/count per bucket), deterministic and
  * replayable digit for digit by the DuckDB oracle; the pruning panel
  * (q176) then MEASURES the win: buckets touched, rows scanned, scan
  * amplification vs true hits, per layout.
  *
  * Scale shape: the layout pass is one projection + one aggregate per
  * layout (zone maps are G rows); assigning real files would be
  * `repartitionByRange(zBucket)` — the bucket id computed here IS that
  * range key. The pruning panel joins Q rectangle predicates against
  * G zone-map rows (Q·G, metadata-scale) and never rescans the corpus
  * except for its own honesty column (true hits).
  */
object ZOrder {

  /** Bit-interleave two `bits`-bit non-negative ints: x's bit i lands
    * at position 2i, y's at 2i+1. Unrolled at plan-build time — pure
    * codegen'd shifts/masks, no HOF re-evaluation per element.
    */
  def interleave(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Quantize `c` from [mn, mx] onto [0, 2^bits): floor((c - mn) *
    * 2^bits / (mx - mn + 1)) — exact integer-valued arithmetic (the
    * products stay far below 2^52, so the double intermediate is
    * exact), identical in DuckDB.
    */
  def quantize(c: Column, mn: Column, mx: Column, bits: Int): Column =
    floor((c - mn) * lit(1L << bits) / (mx - mn + lit(1))).cast("long")

  /** Zone maps for `df` under two bucketed layouts over integer
    * columns (xCol, yCol): `zorder` (interleaved-bit bucket) and
    * `xsort` (x-only range bucket), both `nBuckets` fixed-width
    * buckets. Output: (layout, bucket, n_rows, x_min, x_max, y_min,
    * y_max, box_frac — the bucket's bounding-box area as a fraction of
    * the whole domain, the clustering-tightness score).
    */
  def zoneMaps(df: DataFrame, xCol: String, yCol: String, bits: Int,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 2 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two: $nBuckets")
    val zSpan = 1L << (2 * bits)
    val xSpan = 1L << bits
    require(zSpan % nBuckets == 0 && xSpan % nBuckets == 0,
      s"nBuckets=$nBuckets must divide both 2^$bits and 4^$bits")
    val x = col(xCol)
    val y = col(yCol)
    val bounds = df.agg(
      min(x).as("x_mn"), max(x).as("x_mx"),
      min(y).as("y_mn"), max(y).as("y_mx"))
    val q = df.select(x.as("x"), y.as("y")).crossJoin(broadcast(bounds))
      .withColumn("xq", quantize(col("x"), col("x_mn"), col("x_mx"), bits))
      .withColumn("yq", quantize(col("y"), col("y_mn"), col("y_mx"), bits))
    val z = q.withColumn("bucket",
      floor(interleave(col("xq"), col("yq"), bits) / lit(zSpan / nBuckets))
        .cast("long"))
      .withColumn("layout", lit("zorder"))
    val xs = q.withColumn("bucket",
      floor(col("xq") / lit(xSpan / nBuckets)).cast("long"))
      .withColumn("layout", lit("xsort"))
    val dom = (col("x_mx") - col("x_mn") + lit(1)).cast("double") *
      (col("y_mx") - col("y_mn") + lit(1)).cast("double")
    z.unionByName(xs)
      .groupBy(col("layout"), col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"),
        first(dom).as("__dom"))
      .withColumn("box_frac", round(
        (col("x_max") - col("x_min") + lit(1)).cast("double") *
          (col("y_max") - col("y_min") + lit(1)).cast("double")
          / col("__dom"), 6))
      .drop("__dom")
  }

  /** Deterministic rectangle-predicate panel over the zone maps: for
    * each of `nRects` seeded box predicates (x in [ra,rb], y in
    * [rc,rd], positioned by integer arithmetic inside the data's
    * bounds) and each layout: buckets touched (zone-map boxes the rect
    * intersects), rows a zone-map-guided scan reads, the true hit
    * count, and the scan amplification. The rect×zonemap join is
    * metadata-scale; only the honesty column (true_hits) touches data,
    * once, against the broadcast rect list.
    */
  def pruningPanel(df: DataFrame, xCol: String, yCol: String, bits: Int,
      nBuckets: Int, nRects: Int): DataFrame = {
    val spark = df.sparkSession
    val zm = zoneMaps(df, xCol, yCol, bits, nBuckets)
    val x = col(xCol)
    val y = col(yCol)
    val bounds = df.agg(
      min(x).as("x_mn"), max(x).as("x_mx"),
      min(y).as("y_mn"), max(y).as("y_mx"))
    // seeded boxes: origin walks a (37, 23)-step lattice mod 64, side
    // = an eighth of each span — square-ish, where 2-D clustering must
    // beat a 1-D sort
    val rects = spark.range(nRects).toDF("rect_id")
      .crossJoin(broadcast(bounds))
      .withColumn("xs", col("x_mx") - col("x_mn") + lit(1))
      .withColumn("ys", col("y_mx") - col("y_mn") + lit(1))
      .select(col("rect_id"),
        (col("x_mn") + floor((col("rect_id") * 37 % 64) * col("xs") / 64))
          .as("ra"),
        (col("y_mn") + floor((col("rect_id") * 23 % 64) * col("ys") / 64))
          .as("rc"),
        floor(col("xs") / 8).as("xw"), floor(col("ys") / 8).as("yw"))
      .withColumn("rb", col("ra") + col("xw"))
      .withColumn("rd", col("rc") + col("yw"))
      .drop("xw", "yw")
    val touched = rects.join(zm,
        col("ra") <= col("x_max") && col("rb") >= col("x_min") &&
          col("rc") <= col("y_max") && col("rd") >= col("y_min"))
      .groupBy("rect_id", "layout")
      .agg(count(lit(1)).as("buckets_touched"),
        sum(col("n_rows")).as("rows_scanned"))
    val hits = df.select(x.as("x"), y.as("y")).join(broadcast(rects),
        col("x").between(col("ra"), col("rb")) &&
          col("y").between(col("rc"), col("rd")), "right")
      .groupBy("rect_id")
      .agg(count(col("x")).as("true_hits"))
    touched.join(broadcast(hits), Seq("rect_id"))
      .select(col("rect_id"), col("layout"), col("buckets_touched"),
        col("rows_scanned"), col("true_hits"),
        round(col("rows_scanned").cast("double")
          / greatest(col("true_hits"), lit(1)).cast("double"), 6)
          .as("scan_amp"))
  }
}
