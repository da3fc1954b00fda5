package graft.sources

import graft.operators.SimilaritySearch
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** PERSISTED approximate-nearest-neighbor index (SURVEY.md §2.1 S4/S5 +
  * §4 O3). The reference creates its vector index ONCE and queries it
  * repeatedly (`/root/reference/AI.py:47-55`, queried per ask at
  * `AI.py:138`); the in-memory paths in [[SimilaritySearch]] recompute
  * signatures (LSH) or the whole k-means build (IVF) inside every query.
  * At a 100 TB index the build dwarfs any single query — amortizing it is
  * the entire point of an index. This module stores:
  *
  *  - LSH: a bucket table `(tb, vec_id)` where `tb = table * 2^bits +
  *    bucket`, written `bucketBy(tb)`/`sortBy(tb)` through the catalog,
  *    plus a vector table `(vec_id, embedding)` bucketed by `vec_id` for
  *    the re-rank join. Queries push `tb IN (probed buckets)` into the
  *    scan — Spark prunes storage buckets on the bucketing column and
  *    parquet row groups via the sort-order min/max stats, and no
  *    signature is recomputed over the index side.
  *  - IVF: Lloyd-refined centroids (tiny, plain parquet) plus the
  *    inverted lists `(centroid_id, vec_id, embedding)` partitioned by
  *    `centroid_id` — probing nProbe lists per query is partition
  *    pruning, the classic inverted-file read pattern.
  *
  * Freshness contract: `ensure*` rebuilds when the stored meta (operating
  * point + row count) no longer matches the source frame; the layout is
  * keyed by a tag of the source dir so different fixtures never collide.
  * (A production deployment would key on a table snapshot/version id
  * instead of a row-count heuristic; the fixtures are immutable files.)
  *
  * The probe-literal pushdown collects the probed bucket ids to the
  * driver: that set is O(queries × tables × probes) / O(queries × nProbe)
  * — bounded by the QUERY batch, never by the index — which is what makes
  * it a planner-side constant rather than a driver-side data loop. For
  * huge query batches the right shape flips to the plain equi-join
  * (`SimilaritySearch.lshTopK`), which this module leaves untouched.
  */
object AnnIndex {

  // ---------------------------------------------------------------- LSH

  final case class LshHandle(buckets: DataFrame, vecs: DataFrame,
      tables: Int, bits: Int)

  private def metaPath(base: String) = Paths.get(base, "_ann_meta.json")

  private def writeMeta(base: String, kv: (String, Long)*): Unit = {
    Files.createDirectories(Paths.get(base))
    Files.writeString(metaPath(base),
      kv.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}"))
  }

  private def readMeta(base: String): Map[String, Long] = {
    val p = metaPath(base)
    if (!Files.exists(p)) Map.empty
    else "\"([a-zA-Z_]+)\"\\s*:\\s*(-?\\d+)".r
      .findAllMatchIn(Files.readString(p))
      .map(m => m.group(1) -> m.group(2).toLong).toMap
  }

  private def lshBase(tag: String) = s"/tmp/graft_ann_lsh_$tag"

  /** Build (or reuse) the persisted LSH index over `index(vec_id,
    * embedding)`. One pass computes all `tables` signatures per vector;
    * both tables land bucketed + sorted through the catalog.
    */
  def ensureLsh(
      spark: SparkSession,
      sourceDir: String,
      index: DataFrame,
      tables: Int = 64,
      bits: Int = 12,
      storageBuckets: Int = 8): LshHandle = {
    import graft.functions.expressions.VectorExpressions.lsh_buckets
    val tag = IndexStore.pathTag(sourceDir)
    val base = lshBase(tag)
    val bucketsTable = s"graft_lsh_buckets_$tag"
    val vecsTable = s"graft_lsh_vecs_$tag"
    val n = index.count()
    val meta = readMeta(base)
    val fresh = meta.get("tables").contains(tables.toLong) &&
      meta.get("bits").contains(bits.toLong) &&
      meta.get("n_rows").contains(n) &&
      spark.catalog.tableExists(bucketsTable) &&
      spark.catalog.tableExists(vecsTable)
    if (!fresh) {
      val bucketRows = index.select(col("vec_id"),
        posexplode(lsh_buckets(col("embedding"), tables, bits))
          .as(Seq("tbl", "bucket")))
        .select(
          (col("tbl").cast("long") * (1L << bits) + col("bucket")).as("tb"),
          col("vec_id"))
      spark.sql(s"DROP TABLE IF EXISTS $bucketsTable")
      bucketRows.write.mode(SaveMode.Overwrite)
        .option("path", s"$base/buckets")
        .bucketBy(storageBuckets, "tb").sortBy("tb")
        .format("parquet").saveAsTable(bucketsTable)
      spark.sql(s"DROP TABLE IF EXISTS $vecsTable")
      index.select("vec_id", "embedding").write.mode(SaveMode.Overwrite)
        .option("path", s"$base/vecs")
        .bucketBy(storageBuckets, "vec_id").sortBy("vec_id")
        .format("parquet").saveAsTable(vecsTable)
      writeMeta(base, "tables" -> tables.toLong, "bits" -> bits.toLong,
        "n_rows" -> n)
    }
    LshHandle(spark.table(bucketsTable), spark.table(vecsTable), tables, bits)
  }

  /** Query the persisted LSH index: probe buckets come from the (small)
    * query side only; `tb IN (...)` pushes into the bucketed scan, and
    * candidates re-rank exactly. No index-side signature computation.
    */
  def queryLsh(
      queries: DataFrame,
      handle: LshHandle,
      k: Int = 4,
      probes: Int = 1): DataFrame = {
    import graft.functions.expressions.VectorExpressions.lsh_buckets_probe
    val qb = broadcast(queries
      .select(col("query_id"),
        posexplode(lsh_buckets_probe(col("query_vec"), handle.tables,
          handle.bits, probes)).as(Seq("pos", "bucket")))
      .select(col("query_id"),
        ((col("pos") / probes).cast("long") * (1L << handle.bits) +
          col("bucket")).as("tb")))
    // the probed-bucket literal set: bounded by queries × tables × probes
    val probeTbs = qb.select("tb").distinct().collect().map(_.getLong(0))
    val cand = handle.buckets
      .filter(col("tb").isin(probeTbs: _*))
      .join(qb, Seq("tb"))
      .select("query_id", "vec_id")
      .dropDuplicates("query_id", "vec_id")
    SimilaritySearch.rerank(cand, queries, handle.vecs, k)
  }

  // ---------------------------------------------------------------- IVF

  final case class IvfHandle(centroids: DataFrame, lists: DataFrame)

  private def ivfBase(tag: String) = s"/tmp/graft_ann_ivf_$tag"

  /** Build (or reuse) the persisted IVF index: k-means centroids (k-means++
    * style farthest-point seeding + Lloyd rounds, see
    * [[SimilaritySearch.kMeansCentroids]]) and inverted lists partitioned
    * by centroid, each list row carrying its vector so a probe needs no
    * second join.
    */
  def ensureIvf(
      spark: SparkSession,
      sourceDir: String,
      index: DataFrame,
      lists: Int = 32,
      iters: Int = 5): IvfHandle = {
    val tag = IndexStore.pathTag(sourceDir)
    val base = ivfBase(tag)
    val listsTable = s"graft_ivf_lists_$tag"
    val centsPath = s"$base/centroids"
    val n = index.count()
    val meta = readMeta(base)
    val fresh = meta.get("lists").contains(lists.toLong) &&
      meta.get("iters").contains(iters.toLong) &&
      meta.get("n_rows").contains(n) &&
      spark.catalog.tableExists(listsTable) &&
      Files.exists(Paths.get(centsPath))
    if (!fresh) {
      val cents = SimilaritySearch.kMeansCentroids(index, lists, iters)
      cents.write.mode(SaveMode.Overwrite).parquet(centsPath)
      val assigned = SimilaritySearch
        .assignWithVecs(index, spark.read.parquet(centsPath))
      spark.sql(s"DROP TABLE IF EXISTS $listsTable")
      assigned.write.mode(SaveMode.Overwrite)
        .option("path", s"$base/lists")
        .partitionBy("centroid_id")
        .format("parquet").saveAsTable(listsTable)
      writeMeta(base, "lists" -> lists.toLong, "iters" -> iters.toLong,
        "n_rows" -> n)
    }
    IvfHandle(spark.read.parquet(centsPath), spark.table(listsTable))
  }

  /** Query the persisted IVF index: rank centroids per query (broadcast,
    * tiny), push `centroid_id IN (probed)` into the partitioned scan, and
    * re-rank the probed lists' rows — no k-means, no assignment pass.
    */
  def queryIvf(
      queries: DataFrame,
      handle: IvfHandle,
      k: Int = 4,
      nProbe: Int = 2): DataFrame = {
    import graft.functions.VectorOps
    val qw = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(desc("qsim"), asc("centroid_id"))
    val probes = queries.crossJoin(broadcast(handle.centroids))
      .withColumn("qsim", VectorOps.cosine(col("query_vec"), col("centroid_vec")))
      .withColumn("qrk", row_number().over(qw))
      .filter(col("qrk") <= nProbe)
      .select(col("query_id"), col("centroid_id"))
    // probed partition literals: at most queries × nProbe ids
    val probedIds: Seq[Any] = probes.select("centroid_id").distinct()
      .collect().toIndexedSeq.map(_.get(0))
    val cand = handle.lists
      .filter(col("centroid_id").isin(probedIds: _*))
      .join(broadcast(probes), Seq("centroid_id"))
      .select("query_id", "vec_id", "embedding")
    SimilaritySearch.rerankWithVecs(cand, queries, k)
  }
}
