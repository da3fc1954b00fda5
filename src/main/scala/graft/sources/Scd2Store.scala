package graft.sources

import graft.operators.Scd2
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** PERSISTED SCD2 dimension store — the on-disk layout a warehouse
  * actually MERGEs CDC batches into (public art: Kimball SCD2 loads,
  * Delta/Iceberg MERGE INTO patterns). [[graft.operators.Scd2]]
  * rebuilds intervals from a complete feed; this applies change
  * BATCHES incrementally: close the affected keys' open intervals,
  * insert the new ones, leave every untouched key's rows on disk
  * unread.
  *
  * Layout: `dim/` parquet partitioned by `kb` (key hash bucket,
  * `pmod(xxhash64(key), KeyDirs)`) holding
  * (key, attrs..., valid_from, valid_to); `_scd2_meta.json` written
  * AFTER data via temp-file + atomic rename (the AnnIndex meta
  * discipline). A merge rewrites ONLY the batch's touched buckets
  * (dynamic partition overwrite scoped to this write — the
  * [[graft.operators.Backfill]] rule, never the session conf), so the
  * cost is O(touched buckets), not O(dimension): the 100 TB shape.
  *
  * Merge derivation: each stored interval's (valid_from, attrs) IS its
  * opening change, so the touched buckets' post-merge state is
  * `Scd2.fromChanges(stored openings ∪ batch)` — recomputed from
  * first principles per touched key. That makes the merge IDEMPOTENT
  * under replayed content by construction (a re-delivered change is an
  * exact duplicate of an opening, or folds as a no-op), which is what
  * makes crash-retry safe: a crash between the partition overwrite and
  * the meta commit leaves some buckets merged and some not, and the
  * retry re-derives byte-identical bucket content either way.
  *
  * Feed contract (the [[graft.streaming.StreamOps.streamingScd2]]
  * rule, store-checked): a change at-or-before a key's latest opening
  * must MATCH recorded history (same attrs as the interval covering
  * its ts — an at-least-once redelivery) — anything else is a history
  * rewrite and is refused LOUDLY before anything lands, because closed
  * intervals downstream consumers already read must never change.
  * `batchId` replay-skip: a batch id ≤ the committed `last_batch_id`
  * no-ops (the idempotent-foreachBatch contract).
  */
object Scd2Store {

  /** Key-bucket partition count. 64 keeps fixture layouts small; a
    * 100 TB dimension raises it (e.g. 4096) so merges prune harder.
    */
  val KeyDirs = 64

  private def base(spark: SparkSession, storeKey: String): String =
    s"${AnnIndex.annBase(spark)}/graft_scd2store_${IndexStore.pathTag(storeKey)}"

  private def metaPath(b: String) = Paths.get(b, "_scd2_meta.json")

  private def readMeta(b: String): Map[String, Long] = {
    val p = metaPath(b)
    if (!Files.exists(p)) Map.empty
    else "\"([a-zA-Z_]+)\"\\s*:\\s*(-?\\d+)".r
      .findAllMatchIn(Files.readString(p))
      .map(m => m.group(1) -> m.group(2).toLong).toMap
  }

  private def writeMeta(b: String, kv: (String, Long)*): Unit = {
    Files.createDirectories(Paths.get(b))
    val tmp = Paths.get(b, s"_scd2_meta.json.tmp${ProcessHandle.current.pid}")
    Files.writeString(tmp,
      kv.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}"))
    Files.move(tmp, metaPath(b),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def kbCol(keyCol: String) =
    pmod(xxhash64(col(keyCol)), lit(KeyDirs.toLong)).cast("int").as("kb")

  /** The stored dimension: (key, attrs..., valid_from, valid_to,
    * is_current) — [[graft.operators.Scd2.fromChanges]]'s exact output
    * shape, readable for joins/[[lookup]] without any merge machinery.
    * Empty-store reads fail loudly (no meta = never merged).
    */
  def readDim(spark: SparkSession, storeKey: String): DataFrame = {
    val b = base(spark, storeKey)
    require(readMeta(b).contains("last_batch_id"),
      s"no persisted SCD2 dimension for '$storeKey' ($b) — merge a " +
        "first change batch")
    spark.read.parquet(s"$b/dim").drop("kb")
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time lookup against the STORE —
    * [[graft.operators.Scd2.asOfLookup]] over [[readDim]].
    */
  def lookup(spark: SparkSession, storeKey: String, probes: DataFrame,
      keyCol: String, tsCol: String): DataFrame =
    Scd2.asOfLookup(probes, readDim(spark, storeKey), keyCol, tsCol)

  /** [[lookup]] for a BOUNDED probe set, reading ONLY the probes'
    * key-buckets: the probe keys' `kb` set (≤ [[KeyDirs]], collected
    * bounded) becomes a partition filter on the dimension scan, so a
    * point lookup prices at O(touched buckets) instead of O(dimension)
    * — at a 100 TB dimension that is the difference between a seek and
    * a table scan. Output-identical to [[lookup]] by construction
    * (a probe's interval can only live in its key's bucket);
    * Scd2StoreSpec pins both the parity and the pruned scan shape.
    */
  def lookupPruned(spark: SparkSession, storeKey: String,
      probes: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val b = base(spark, storeKey)
    require(readMeta(b).contains("last_batch_id"),
      s"no persisted SCD2 dimension for '$storeKey' ($b) — merge a " +
        "first change batch")
    val kbs = probes.select(kbCol(keyCol)).distinct()
      .collect().map(_.getInt(0)).sorted
    val dim = spark.read.parquet(s"$b/dim")
      .filter(col("kb").isin(kbs.map(Int.box): _*))
      .drop("kb")
      .withColumn("is_current", col("valid_to").isNull)
    Scd2.asOfLookup(probes, dim, keyCol, tsCol)
  }

  /** MERGE one CDC change batch `changes(keyCol, tsCol, attrCols...)`
    * into the persisted dimension (see object doc for semantics and
    * crash safety). Returns the post-merge dimension view. A replayed
    * `batchId` (≤ committed `last_batch_id`) skips — the store already
    * holds this batch's effect.
    */
  def merge(
      spark: SparkSession,
      storeKey: String,
      changes: DataFrame,
      keyCol: String,
      tsCol: String,
      attrCols: Seq[String],
      batchId: Long): DataFrame = {
    require(attrCols.nonEmpty, "merge: no attribute columns")
    val b = base(spark, storeKey)
    val meta = readMeta(b)
    val dimDir = s"$b/dim"
    if (meta.get("last_batch_id").exists(batchId <= _))
      return readDim(spark, storeKey)
    require(meta.isEmpty || Files.exists(Paths.get(dimDir)),
      s"SCD2 store '$storeKey' meta exists but the dim dir is missing " +
        "— corrupt layout; drop() and re-merge from the full feed")
    val batch = changes.select(
      (Seq(col(keyCol), col(tsCol)) ++ attrCols.map(col)): _*)
    val hasStore = Files.exists(Paths.get(dimDir))
    // touched buckets: bounded by KeyDirs, collected bounded
    val touched = batch.select(kbCol(keyCol)).distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) { // empty batch still commits its id
      require(hasStore,
        s"Scd2Store '$storeKey': first merge batch is empty — nothing " +
          "to build a dimension from")
      writeMeta(b, ("last_batch_id" -> batchId) +:
        meta.filterNot(_._1 == "last_batch_id").toSeq: _*)
      return readDim(spark, storeKey)
    }
    val stored =
      if (hasStore)
        spark.read.parquet(dimDir)
          .filter(col("kb").isin(touched.map(Int.box): _*))
      else null
    if (hasStore) {
      // history-rewrite guard (loud, before anything lands): a change
      // at-or-before its key's latest opening must fold against
      // recorded history — the interval covering its ts must carry the
      // SAME attrs (an at-least-once redelivery); a differing-attrs or
      // before-first-interval change would rewrite closed intervals
      val tup = struct(attrCols.map(col): _*)
      val latest = stored.groupBy(col(keyCol))
        .agg(max(col("valid_from")).as("__mf"))
      val covered = batch
        .join(latest, Seq(keyCol), "inner")
        .filter(col(tsCol) <= col("__mf"))
      val rewrites =
        if (covered.isEmpty) 0L
        else covered.alias("c").join(stored.alias("s"),
            col(s"c.$keyCol") === col(s"s.$keyCol") &&
              col(s"c.$tsCol") >= col("s.valid_from") &&
              (col("s.valid_to").isNull ||
                col(s"c.$tsCol") < col("s.valid_to")),
            "left")
          .filter(col("s.valid_from").isNull || // before first interval
            !(struct(attrCols.map(a => col(s"c.$a")): _*) <=>
              struct(attrCols.map(a => col(s"s.$a")): _*)))
          .count()
      require(rewrites == 0L,
        s"Scd2Store '$storeKey': $rewrites change(s) at-or-before their " +
          "key's latest opening do not match recorded history — a " +
          "history REWRITE, refused (closed intervals are already " +
          "consumed downstream); fix the feed or rebuild a fresh store " +
          "from the corrected full feed")
    }
    // each stored interval's (valid_from, attrs) IS its opening change:
    // re-derive the touched keys' full interval sets from openings ∪
    // batch — idempotent under any replayed/overlapping delivery
    val openings =
      if (hasStore)
        stored.select(
          (Seq(col(keyCol), col("valid_from").as(tsCol)) ++
            attrCols.map(col)): _*)
      else batch.limit(0)
    val merged = Scd2.fromChanges(
        openings.unionByName(batch).dropDuplicates(
          Seq(keyCol, tsCol) ++ attrCols),
        keyCol, tsCol, attrCols)
      .drop("is_current")
      .withColumn("kb", kbCol(keyCol))
    // rewrite ONLY the touched buckets; overwrite mode is scoped to
    // this write (Backfill rule — session conf untouched)
    merged.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("kb").parquet(dimDir)
    writeMeta(b, "last_batch_id" -> batchId) // meta-after-data
    readDim(spark, storeKey)
  }

  /** Remove the persisted layout (test/ops hygiene). */
  def drop(spark: SparkSession, storeKey: String): Unit = {
    val b = Paths.get(base(spark, storeKey))
    if (Files.exists(b))
      org.apache.commons.io.FileUtils.deleteDirectory(b.toFile)
  }
}
