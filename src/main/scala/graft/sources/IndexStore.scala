package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import java.nio.file.{Files, Paths}

/** Persisted vector-index table (SURVEY.md §2.1 S4/S5 + §4 O1/T4).
  *
  * The reference's index is a Pinecone collection: created with
  * dim/metric (`/root/reference/AI.py:47-55`), upserted from chunks
  * (`AI.py:94-96`), memoized behind a 128-entry LRU keyed on the exact
  * chunk-text tuple (`AI.py:89-96`). Spark-native equivalents:
  *
  *  - DDL (S5): first write + a JSON sidecar recording dim/metric (the
  *    "table properties");
  *  - upsert sink (S4): idempotent parquet overwrite — exactly-once by
  *    rewrite, no partial-update states;
  *  - LRU memo (O1): `incremental` rebuild — only documents whose
  *    xxhash64(text) changed are re-chunked/re-embedded, the rest of the
  *    index is carried over. That is the memo semantics without a
  *    driver-side cache (content-addressed, works at any scale);
  *  - cache lifecycle (T4): `cached`/`uncache` map the LRU's
  *    keep-hot-in-memory role onto persist()/unpersist().
  */
object IndexStore {

  final case class Meta(dim: Int, metric: String)

  /** Deterministic short tag for a source path — used to derive
    * per-fixture layout paths and catalog table names so runs over
    * different inputs never collide on shared locations.
    */
  def pathTag(sourceDir: String): String =
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(sourceDir).toLong & 0xffffffffL)

  def create(spark: SparkSession, path: String, dim: Int,
      metric: String = "cosine"): Unit = {
    Files.createDirectories(Paths.get(path))
    Files.writeString(Paths.get(path, "_index_meta.json"),
      s"""{"dim": $dim, "metric": "$metric"}""")
  }

  def readMeta(path: String): Option[Meta] = {
    val p = Paths.get(path, "_index_meta.json")
    if (!Files.exists(p)) None
    else {
      val s = Files.readString(p)
      val dim = "\"dim\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toInt)
      val metric = "\"metric\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(s).map(_.group(1))
      dim.map(d => Meta(d, metric.getOrElse("cosine")))
    }
  }

  /** S4: write (overwrite) the index rows: (doc_id, chunk_id, text,
    * embedding, doc_hash).
    */
  def write(index: DataFrame, path: String): Unit =
    index.write.mode(SaveMode.Overwrite).parquet(s"$path/data")

  def read(spark: SparkSession, path: String): DataFrame =
    ParquetIO.read(spark, s"$path/data")

  def exists(path: String): Boolean =
    Files.exists(Paths.get(path, "data"))

  /** ERASE the given documents' rows from the simple index layout —
    * [[graft.operators.Governance.purge]]'s leg for the flagship
    * chunk-index sink (every chunk row, text and embedding included,
    * is the purged document's content). Side-dir + rename swap (the
    * DedupStore recipe: a crash inside the rename window leaves the
    * dir absent, which [[read]] fails loudly on — never a silently
    * emptied index); idempotent, with a bounded any-victim probe so a
    * replayed purge skips the rewrite. Returns rows removed.
    */
  def purge(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String = "doc_id"): Long = {
    if (!exists(path)) return 0L
    val victims = ids.select(ids(ids.columns.head).as(idCol)).distinct()
    val live = s"$path/data"
    if (ParquetIO.read(spark, live)
        .join(victims, Seq(idCol), "left_semi").limit(1)
        .collect().isEmpty)
      return 0L
    def rm(p: String): Unit =
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))
    val side = s"$path/data__compact"
    val garbage = s"$path/data__garbage_${ProcessHandle.current.pid}"
    rm(side)
    val before = ParquetIO.read(spark, live).count()
    val kept = ParquetIO.read(spark, live)
      .join(victims, Seq(idCol), "left_anti")
      .localCheckpoint(true)
    kept.write.mode(SaveMode.Overwrite).parquet(side)
    val nKept = kept.count()
    Files.move(Paths.get(live), Paths.get(garbage))
    if (nKept > 0) Files.move(Paths.get(side), Paths.get(live))
    else rm(side) // absent dir IS the empty state (the expireSeen rule)
    rm(garbage)
    before - nKept
  }

  /** O1: content-hash-gated incremental rebuild. `buildFn` chunk+embeds a
    * documents frame; only docs whose text hash is absent from the stored
    * index are rebuilt, unchanged index rows are carried over, rows for
    * vanished/changed docs are dropped. Returns the new index frame
    * (also persisted to `path`).
    */
  def incremental(
      spark: SparkSession,
      documents: DataFrame, // (doc_id, text)
      path: String)(
      buildFn: DataFrame => DataFrame): DataFrame = {
    val docsHashed = documents
      .withColumn("doc_hash", xxhash64(col("text")))
    val fresh =
      if (!exists(path)) buildFn(docsHashed)
      else {
        val old = read(spark, path)
        val oldKeys = old.select("doc_id", "doc_hash").distinct()
        val changedDocs = docsHashed.join(oldKeys,
          Seq("doc_id", "doc_hash"), "left_anti")
        val keep = old.join(
          docsHashed.select("doc_id", "doc_hash").distinct(),
          Seq("doc_id", "doc_hash"), "left_semi")
        keep.unionByName(buildFn(changedDocs))
      }
    // write to a temp subdir first, then swap — the source parquet can't
    // be overwritten while a plan is still reading it
    fresh.write.mode(SaveMode.Overwrite).parquet(s"$path/data_new")
    val dataPath = Paths.get(path, "data")
    if (Files.exists(dataPath)) {
      val tmp = Paths.get(path, "data_old")
      Files.move(dataPath, tmp)
      Files.move(Paths.get(path, "data_new"), dataPath)
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    } else {
      Files.move(Paths.get(path, "data_new"), dataPath)
    }
    read(spark, path)
  }

  /** T4/O1: keep the (reused) index hot across queries. */
  def cached(index: DataFrame): DataFrame = {
    index.persist(StorageLevel.MEMORY_AND_DISK)
    index
  }

  def uncache(index: DataFrame): Unit = index.unpersist()

  /** Bucketed + sort-ordered index layout (SURVEY.md §4 physical
    * execution): `bucketBy(key)`/`sortBy(key)` through the catalog, so
    * every subsequent join on the key against an equally-bucketed table
    * is co-located — the plan carries NO exchange (and no sort) on
    * either side. This is the storage half of the shuffle-minimization
    * story: pay one layout write, then every repeated index join (the
    * retrieval path hits the index per query batch) is shuffle-free.
    * At 100 TB the bucket count is sized to the executor count; here the
    * fixture default keeps bucket files non-trivial.
    */
  def writeBucketed(
      index: DataFrame,
      table: String,
      path: String,
      buckets: Int,
      key: String,
      sortCols: Seq[String] = Nil): Unit = {
    val spark = index.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val sorted = if (sortCols.isEmpty) Seq(key) else key +: sortCols
    index.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
