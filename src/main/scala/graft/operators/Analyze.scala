package graft.operators

import graft.functions.expressions.KmvAgg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ANALYZE-style per-column statistics in ONE table scan — the stats
  * frame a cost-based optimizer (or a data-curation triage pass) reads
  * before deciding join order, broadcast eligibility, and partition
  * counts (public art: Spark's own `ANALYZE TABLE ... COMPUTE
  * STATISTICS FOR COLUMNS`, DuckDB/Postgres ANALYZE, the CBO
  * literature).
  *
  * Scale shape: every statistic here aggregates with BOUNDED state —
  * count / null count / typed min / max / length sum are one value per
  * column per map task, and NDV uses the [[KmvAgg]] KMV sketch (≤ k
  * longs per column) instead of `count(DISTINCT ...)`. That keeps the
  * whole stats pass at one linear scan + one tiny exchange no matter
  * how many columns are profiled. The optional `exact = true` honesty
  * panel adds real `count(DISTINCT)` columns, which Catalyst plans as
  * an `Expand` — the input is physically duplicated once per distinct
  * aggregate. That blow-up is precisely what the sketch replaces;
  * q173 ships WITH the panel so the oracle can price the sketch's
  * error, and the production call is `exact = false` (spec-pinned to
  * have no Expand in its physical plan).
  *
  * Determinism / oracle replay: values are hashed and rendered through
  * a CANONICAL string encoding chosen per type to agree byte-for-byte
  * between Spark and DuckDB (integers: plain cast; floating point:
  * via decimal(38,6) — fixed scale, no exponent-format divergence;
  * timestamps: strftime to seconds). NDV therefore replays as
  * `DISTINCT canonical → md5-52bit → ORDER BY h LIMIT k`, and
  * min/max render as canonical(typed min/max), never a lexicographic
  * min over strings.
  */
object Analyze {

  /** Engine-portable canonical string encoding for a column value —
    * injective on each fixture type, identical text in Spark and
    * DuckDB (see the replay SQL in PipelineQueries q173).
    */
  def canon(c: Column, dt: DataType): Column = dt match {
    case StringType => c
    case ByteType | ShortType | IntegerType | LongType => c.cast("string")
    // Decimal(38,6), not (18,6): a non-ANSI cast overflows |x| >= 1e12
    // to null, silently undercounting ndv and rendering min/max null —
    // 38,6 covers |x| < 1e32 and prints identically in DuckDB
    case FloatType | DoubleType =>
      c.cast(DecimalType(38, 6)).cast("string")
    case _: DecimalType => c.cast(DecimalType(38, 6)).cast("string")
    case TimestampType | TimestampNTZType =>
      date_format(c, "yyyy-MM-dd HH:mm:ss")
    case DateType => c.cast("string")
    case other => throw new IllegalArgumentException(
      s"Analyze.canon: no canonical encoding for type $other")
  }

  /** Per-column stats over `cols` of `df` in one aggregate pass:
    * (col_name, cnt non-null, null_cnt, ndv_est — KMV(k) over the
    * canonical encoding — min_repr, max_repr — canonical of the TYPED
    * min/max — avg_len of the canonical text). With `exact = true`
    * adds (exact_ndv, rel_err): the honesty panel.
    *
    * The panel is deliberately NOT `countDistinct` columns inside the
    * SAME aggregate as the KMV sketches: Catalyst rewrites N distinct
    * aggregates into an `Expand` (N+1 copies of every row), and mixing
    * that with a TypedImperativeAggregate degrades the whole pass to a
    * sort aggregate over the expanded rows — measured 19× slower at
    * sf0.1. The panel runs as its own multi-distinct aggregate (hash
    * path without the sketch aggregate in the plan — measured 7×
    * faster than N sequential per-column distinct jobs).
    */
  def columnStats(df: DataFrame, cols: Seq[String], k: Int, seed: Long,
      exact: Boolean): DataFrame = {
    require(cols.nonEmpty, "columnStats: no columns requested")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach(c => require(types.contains(c),
      s"columnStats: no such column '$c' (have ${types.keys.mkString(",")})"))

    def cc(c: String): Column = canon(col(c), types(c))

    val aggs: Seq[Column] = Seq(count(lit(1)).as("__total")) ++
      cols.flatMap { c =>
        Seq(
          count(col(c)).as(s"__cnt_$c"),
          KmvAgg.kmv(Sketches.hash52(cc(c), seed), k).as(s"__kmv_$c"),
          canon(min(col(c)), types(c)).as(s"__min_$c"),
          canon(max(col(c)), types(c)).as(s"__max_$c"),
          avg(length(cc(c))).as(s"__len_$c"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)

    // unpivot the 1-row aggregate into one output row per column (a
    // driver-free Expand over a single row — negligible)
    val structs = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"__cnt_$c").as("cnt"),
        (col("__total") - col(s"__cnt_$c")).as("null_cnt"),
        Sketches.estimate(col(s"__kmv_$c"), k).as("ndv_raw"),
        col(s"__min_$c").as("min_repr"),
        col(s"__max_$c").as("max_repr"),
        round(col(s"__len_$c"), 6).as("avg_len"))
    }
    val stats = one.select(explode(array(structs: _*)).as("s"))
      .select(col("s.*"))

    val out =
      if (!exact) stats
      else {
        // one multi-distinct aggregate: Catalyst's Expand (N+1 copies)
        // IS acceptable here because, without a TypedImperativeAggregate
        // in the same Aggregate, the pass stays hash-based — measured
        // 7x faster than N sequential per-column distinct jobs, which
        // pay N scans + N job overheads
        val nAggs = cols.map(c => countDistinct(cc(c)).as(s"__ndv_$c"))
        val oneNdv = df.agg(nAggs.head, nAggs.tail: _*)
        val exactNdv = oneNdv.select(explode(array(cols.map(c =>
          struct(lit(c).as("col_name"),
            col(s"__ndv_$c").as("exact_ndv"))): _*)).as("s"))
          .select(col("s.*"))
        stats.join(broadcast(exactNdv), Seq("col_name"))
          .withColumn("rel_err", round(
            abs(col("ndv_raw") - col("exact_ndv")) / col("exact_ndv"), 6))
      }
    out.withColumn("ndv_est", round(col("ndv_raw"), 6))
      .drop("ndv_raw")
      .select(Seq(col("col_name"), col("cnt"), col("null_cnt"),
        col("ndv_est"), col("min_repr"), col("max_repr"),
        col("avg_len")) ++
        (if (exact) Seq(col("exact_ndv"), col("rel_err")) else Nil): _*)
      .orderBy("col_name")
  }
}
