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
  *    the re-rank join. Queries broadcast their probed bucket ids and
  *    equi-join the bucket table on `tb` — no signature is recomputed
  *    over the index side, and the index scan is a single pass over a
  *    narrow (long, long) relation with no index-side shuffle.
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
  * The IVF probe collects its probed centroid ids to the driver as
  * partition literals: that set is O(queries × nProbe), capped by the
  * list count — bounded by the QUERY batch, never by the index — which
  * is what makes it a planner-side constant rather than a driver-side
  * data loop. The LSH probe set (queries × tables × probes, easily
  * 10^4+) is too large for literal pushdown and goes through a
  * broadcast join instead — see [[queryLsh]].
  */
object AnnIndex {

  // ---------------------------------------------------------------- LSH

  final case class LshHandle(buckets: DataFrame, vecs: DataFrame,
      tables: Int, bits: Int)

  private def metaPath(base: String) = Paths.get(base, "_ann_meta.json")

  /** Meta lands via temp-file + atomic rename, and is written only AFTER
    * the index tables are fully materialized — a crashed or concurrent
    * build leaves either the old meta (→ next ensure* rebuilds) or the
    * new complete state, never a half-readable meta pointing at
    * half-written tables. (Two concurrent builders over the SAME
    * immutable fixture write identical content, so last-writer-wins is
    * benign; a production deployment over mutable sources would key the
    * layout on a table snapshot id instead.)
    */
  private def writeMeta(base: String, kv: (String, Long)*): Unit = {
    Files.createDirectories(Paths.get(base))
    val tmp = Paths.get(base, s"_ann_meta.json.tmp${ProcessHandle.current.pid}")
    Files.writeString(tmp,
      kv.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}"))
    Files.move(tmp, metaPath(base),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Content fingerprint of the index frame: (row count, order-independent
    * xxhash64 checksum over id + embedding). One pass — the same scan the
    * old row-count freshness probe paid — but a source change that
    * preserves cardinality (row edits, id reshuffles) now invalidates the
    * persisted layout instead of silently reusing a stale index.
    */
  private def fingerprint(index: DataFrame): (Long, Long) = {
    // bit_xor, not sum: order-independent like sum but cannot overflow
    // under ANSI mode; rows are unique (vec_id is hashed in) so the
    // xor of per-row hashes keeps full sensitivity.
    val cols = index.columns.map(col).toIndexedSeq
    val r = index.agg(count(lit(1)), bit_xor(xxhash64(cols: _*))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Re-attach an external table written by an EARLIER process: the
    * parquet layout (and its meta) survive in the store, only the
    * session-catalog registration dies with the JVM. Registration is
    * DDL-only — no data pass, no rebuild.
    */
  private def registerExternal(spark: SparkSession, table: String,
      path: String, clusteredBy: Option[(String, Int)] = None,
      partitionedBy: Option[String] = None): Unit = {
    val schema = spark.read.parquet(path).schema
    val colsDdl = schema.fields
      .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
    val partDdl = partitionedBy
      .map(c => s" PARTITIONED BY ($c)").getOrElse("")
    val clusterDdl = clusteredBy.map { case (c, n) =>
      s" CLUSTERED BY ($c) SORTED BY ($c) INTO $n BUCKETS"
    }.getOrElse("")
    spark.sql(s"CREATE TABLE $table ($colsDdl) USING parquet" +
      s"$partDdl$clusterDdl LOCATION '$path'")
    if (partitionedBy.isDefined) spark.sql(s"MSCK REPAIR TABLE $table")
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
    val (n, fp) = fingerprint(index.select("vec_id", "embedding"))
    val meta = readMeta(base)
    val metaFresh = meta.get("tables").contains(tables.toLong) &&
      meta.get("bits").contains(bits.toLong) &&
      meta.get("buckets").contains(storageBuckets.toLong) &&
      meta.get("n_rows").contains(n) &&
      meta.get("checksum").contains(fp)
    val registered = spark.catalog.tableExists(bucketsTable) &&
      spark.catalog.tableExists(vecsTable)
    if (metaFresh && !registered) {
      // layout written by an earlier process: attach, don't rebuild
      spark.sql(s"DROP TABLE IF EXISTS $bucketsTable")
      spark.sql(s"DROP TABLE IF EXISTS $vecsTable")
      registerExternal(spark, bucketsTable, s"$base/buckets",
        clusteredBy = Some(("tb", storageBuckets)))
      registerExternal(spark, vecsTable, s"$base/vecs",
        clusteredBy = Some(("vec_id", storageBuckets)))
    } else if (!metaFresh) {
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
        "buckets" -> storageBuckets.toLong, "n_rows" -> n,
        "checksum" -> fp)
    }
    LshHandle(spark.table(bucketsTable), spark.table(vecsTable), tables, bits)
  }

  /** Query the persisted LSH index: probe buckets come from the (small)
    * query side only and reach the index through a broadcast equi-join
    * on `tb`; candidates re-rank exactly. No index-side signature
    * recomputation. The probe set is NOT materialized into an `IN
    * (literal, ...)` filter: at the shipped operating points it holds
    * queries × tables × probes ≈ 10^4+ bucket ids, and a 20k-literal
    * predicate costs seconds of optimizer/AQE time per stage (measured
    * 11 s → 0.4 s on q67 at sf0.1) while pruning nothing — every
    * storage bucket is hit once the probe set outnumbers them. The
    * broadcast hash join gives the same row-level filtering at scan
    * speed; at a 100 TB index the bucket table is a narrow
    * (long, long) relation, and the join remains one pass over it with
    * no shuffle of the index side.
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
    val cand = handle.buckets
      .join(qb, Seq("tb"))
      .select("query_id", "vec_id")
      .dropDuplicates("query_id", "vec_id")
    SimilaritySearch.rerank(cand, queries, handle.vecs, k)
  }

  // ---------------------------------------------------------------- IVF

  final case class IvfHandle(centroids: DataFrame, lists: DataFrame)

  private def ivfBase(tag: String) = s"/tmp/graft_ann_ivf_$tag"

  /** Build (or reuse) the persisted IVF index: k-means centroids
    * (deterministic hash-draw seeding + Lloyd rounds, see
    * [[SimilaritySearch.kMeansCentroids]] — farthest-first/k-means++
    * seeding was measured to DEGRADE recall at sf0.1 by outlier-chasing,
    * the classic k-center failure; see the q37 operating-point notes in
    * PipelineQueries) and inverted lists partitioned by centroid, each
    * list row carrying its vector so a probe needs no second join.
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
    val (n, fp) = fingerprint(index.select("vec_id", "embedding"))
    val meta = readMeta(base)
    val metaFresh = meta.get("lists").contains(lists.toLong) &&
      meta.get("iters").contains(iters.toLong) &&
      meta.get("n_rows").contains(n) &&
      meta.get("checksum").contains(fp) &&
      Files.exists(Paths.get(centsPath))
    val registered = spark.catalog.tableExists(listsTable)
    if (metaFresh && !registered) {
      // layout written by an earlier process: attach, don't rebuild
      spark.sql(s"DROP TABLE IF EXISTS $listsTable")
      registerExternal(spark, listsTable, s"$base/lists",
        partitionedBy = Some("centroid_id"))
    } else if (!metaFresh) {
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
        "n_rows" -> n, "checksum" -> fp)
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
