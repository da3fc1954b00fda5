package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact equi-depth histograms + range-selectivity estimation — the
  * other half of a CBO's stats inventory (Analyze/q173 carries NDV;
  * histograms price RANGE predicates, where equi-width bins lie under
  * skew; Selinger et al. System R, Piatetsky-Shapiro & Connell 1984).
  *
  * Exactness & determinism: boundaries are the values at EXACT global
  * ranks ceil(i·N/B) under a total (value, tieBreaker) order — no
  * approximate quantiles, no sampling — so DuckDB replays them with
  * `row_number() OVER (ORDER BY v, tie)` digit for digit.
  *
  * Scale shape: the global rank is computed the distributed way —
  * range-repartition + within-partition sort, then one bounded
  * driver-side collect of PER-PARTITION COUNTS (nPart longs) feeds
  * each partition its rank offset; a single `mapPartitionsWithIndex`
  * pass stamps ranks. No single-task window over the corpus, ever.
  * Rank correctness needs only that range partitions tile the total
  * order — it does NOT depend on where Spark's sampled boundaries
  * land, so the sampling inside repartitionByRange cannot perturb the
  * result.
  */
object Histogram {

  /** Input rows + a 1-based `rank` column in the total `orderCols`
    * order (which must be a total order — add a tie-breaker column).
    */
  def globalRank(df: DataFrame, orderCols: Seq[String],
      nPart: Int): DataFrame = {
    require(orderCols.nonEmpty, "globalRank: no order columns")
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(nPart, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .localCheckpoint() // two passes below; don't recompute the sort
    val counts = sorted.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().toMap // bounded: nPart longs
    val offsets = (0 until counts.keys.max.max(nPart - 1) + 1)
      .scanLeft(0L)((acc, i) => acc + counts.getOrElse(i, 0L))
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = StructType(sorted.schema.fields :+
      StructField("rank", LongType, nullable = false))
    val ranked = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var r = bc.value(i)
      it.map { row => r += 1; Row.fromSeq(row.toSeq :+ r) }
    }
    spark.createDataFrame(ranked, schema)
  }

  /** Exact equi-depth histogram of `valueCol` (ties broken by
    * `tieCol`): (bucket 1..B, lo, hi, n_rows) with hi = the value at
    * rank ceil(bucket·N/B), lo = the previous boundary (bucket 1's lo
    * = the global minimum), n_rows = the exact rank span.
    */
  def equiDepth(df: DataFrame, valueCol: String, tieCol: String,
      buckets: Int, nPart: Int = 32): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets: $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val ranked = globalRank(df.select(valueCol, tieCol),
      Seq(valueCol, tieCol), nPart)
    val n = ranked.count() // ONE scalar; boundary ranks derive driver-side
    require(n > 0, "equiDepth: empty input")
    // boundary ranks R(i) = max(1, ceil(i·N/B)), i = 0..B (i=0 -> the
    // global minimum); the scan filters to B+1 specific ranks instead
    // of exploding the corpus
    def r(i: Int): Long =
      math.max(1L, math.ceil(i.toDouble * n / buckets).toLong)
    val bdf = (0 to buckets).map(i => (i, r(i))).toDF("i", "brank")
    val bounds = ranked.join(broadcast(bdf), col("rank") === col("brank"))
      .select(col("i"), col(valueCol).as("v"))
    val b = bounds.select(col("i").as("bucket"), col("v").as("hi"))
    val lo = bounds.select((col("i") + 1).as("bucket"), col("v").as("lo"))
    // bucket i covers ranks (R(i-1), R(i)] — except bucket 1, whose
    // range is CLOSED at rank 1; spans are driver arithmetic on B ints
    val ndf = (1 to buckets)
      .map(i => (i, r(i) - r(i - 1) + (if (i == 1) 1L else 0L)))
      .toDF("bucket", "n_rows")
    b.join(lo, Seq("bucket")).join(broadcast(ndf), Seq("bucket"))
      .select(col("bucket"), col("lo"), col("hi"), col("n_rows"))
  }

  /** Estimated row count for `value <= x` by per-bucket linear
    * interpolation over an equi-depth histogram frame (bucket, lo, hi,
    * n_rows): full buckets below x count whole, the straddling bucket
    * contributes its interpolated fraction. `preds` must carry
    * (pred_id, x). Output: (pred_id, x, est_micro, est_rows) —
    * per-bucket contributions quantize to integer micro-rows BEFORE
    * summing, so the estimate is exact integer arithmetic (no
    * order-dependent float summation to diverge from the oracle).
    */
  def rangeSelectivity(hist: DataFrame, preds: DataFrame): DataFrame =
    preds.crossJoin(broadcast(hist))
      .withColumn("contrib_micro", floor(col("n_rows") *
        when(col("x") >= col("hi"), lit(1.0))
          .when(col("x") < col("lo"), lit(0.0))
          .when(col("hi") > col("lo"),
            (col("x") - col("lo")) / (col("hi") - col("lo")))
          .otherwise(lit(1.0)) * 1e6 + 0.5).cast("long"))
      .groupBy("pred_id", "x")
      .agg(sum(col("contrib_micro")).as("est_micro"))
      .withColumn("est_rows",
        round(col("est_micro").cast("double") / 1e6, 6))
}
