package graft.sources

import graft.operators.{CorpusOps, Dedup}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** PERSISTED, STABLE train/val/test assignments for a GROWING corpus —
  * the incremental closure of [[CorpusOps.leakageFreeSplit]]. A
  * one-shot split re-run on corpus version N+1 can FLIP documents
  * across the boundary (a new smaller-id member changes a cluster's
  * representative, so its md5 bucket changes): a doc that trained in
  * v1 lands in v2's test set — exactly the train-on-test contamination
  * the split exists to prevent. This store makes assignments
  * WRITE-ONCE: a document's (rep_id, split) never changes after it is
  * assigned, and every increment keys its NEW documents on the
  * clusters' STORED identity.
  *
  * Batch semantics ([[assign]]): `pairs` are match edges among
  * newDocs ∪ already-assigned docs (the caller's stage — blocked,
  * banded, an incremental dedup-store probe; never all-pairs).
  * Assigned endpoints collapse to their STORED rep before the CC
  * closure, so a component either (a) touches exactly one stored
  * split — its new members ADOPT that split (rep = the minimum stored
  * rep among the touched, for a stable identity), (b) touches no
  * stored docs — a brand-new cluster, assigned by the rep's md5
  * bucket exactly as the batch operator would, or (c) touches stored
  * docs in TWO DIFFERENT splits — new evidence links clusters across
  * the boundary, which is leakage no assignment of the new docs can
  * repair: REFUSED LOUDLY (the fix is a full re-split of the corpus
  * version, a deliberate migration, not a silent flip).
  *
  * Store discipline (the [[DedupStore]] recipe): `assign/` parquet +
  * `_split_meta.json` written AFTER data via temp-file + atomic
  * rename; `batchId` replay-skip; crash-retry idempotent because a
  * retry first drops already-assigned docs from the batch (the
  * re-derivation assigns nothing twice and appends nothing new).
  */
object SplitStore {

  private def base(spark: SparkSession, storeKey: String): String =
    s"${AnnIndex.annBase(spark)}/graft_splitstore_${IndexStore.pathTag(storeKey)}"

  private def metaPath(b: String) = Paths.get(b, "_split_meta.json")

  private def readMeta(b: String): Map[String, Long] = {
    val p = metaPath(b)
    if (!Files.exists(p)) Map.empty
    else "\"([a-zA-Z_]+)\"\\s*:\\s*(-?\\d+)".r
      .findAllMatchIn(Files.readString(p))
      .map(m => m.group(1) -> m.group(2).toLong).toMap
  }

  private def writeMeta(b: String, kv: (String, Long)*): Unit = {
    Files.createDirectories(Paths.get(b))
    val tmp = Paths.get(b,
      s"_split_meta.json.tmp${ProcessHandle.current.pid}")
    Files.writeString(tmp,
      kv.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}"))
    Files.move(tmp, metaPath(b),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** All committed assignments: (doc_id, rep_id, split). */
  def read(spark: SparkSession, storeKey: String): DataFrame = {
    val b = base(spark, storeKey)
    require(readMeta(b).contains("last_batch_id"),
      s"no persisted split store for '$storeKey' ($b) — assign a " +
        "first batch")
    // a crash between the append and the meta commit can leave one
    // batch's rows twice; content is deterministic, so doc_id dedup
    // restores exactly-once reads
    spark.read.parquet(s"$b/assign")
      .dropDuplicates("doc_id")
  }

  /** Assign splits to `newDocs(doc_id)` given match `pairs(doc_id_a,
    * doc_id_b)` over newDocs ∪ assigned docs (see object doc), and
    * commit them. Returns the post-batch assignment set.
    */
  def assign(
      spark: SparkSession,
      storeKey: String,
      newDocs: DataFrame,
      pairs: DataFrame,
      buckets: Int = 10,
      trainBuckets: Int = 8,
      valBuckets: Int = 1,
      seed: Long = 77L,
      batchId: Long = 0L): DataFrame = {
    require(buckets >= 2 && trainBuckets >= 1 && valBuckets >= 0 &&
      trainBuckets + valBuckets < buckets,
      "assign: bucket spec must satisfy 0 < train, 0 <= val, " +
        "train + val < buckets")
    val b = base(spark, storeKey)
    val meta = readMeta(b)
    if (meta.get("last_batch_id").exists(batchId <= _))
      return read(spark, storeKey)
    val hasStore = Files.exists(Paths.get(s"$b/assign"))
    val assigned =
      if (hasStore) spark.read.parquet(s"$b/assign")
        .dropDuplicates("doc_id")
      else spark.emptyDataFrame
        .select(lit(0L).as("doc_id"), lit(0L).as("rep_id"),
          lit("").as("split")).limit(0)
    // crash-retry idempotence: docs a crashed attempt already appended
    // are NOT new — the retry assigns only the remainder
    val fresh = newDocs.select(col("doc_id"))
      .dropDuplicates("doc_id")
      .join(assigned.select("doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    // ENFORCE the edge contract (endpoints ∈ newDocs ∪ assigned):
    // an edge to a doc that is neither is evidence about a document
    // not being assigned in this batch — deferred until it arrives,
    // never allowed to become a cluster label (an unassigned id
    // standing as a rep would collide with that doc's own later
    // arrival)
    val known = fresh.select("doc_id")
      .unionByName(assigned.select("doc_id"))
    val scoped = pairs.select(col("doc_id_a"), col("doc_id_b"))
      .join(known.select(col("doc_id").as("doc_id_a")), Seq("doc_id_a"),
        "left_semi")
      .join(known.select(col("doc_id").as("doc_id_b")), Seq("doc_id_b"),
        "left_semi")
    // collapse assigned endpoints to their STORED rep, so the closure
    // runs over (new ids ∪ stored cluster identities)
    val repOf = assigned.select(col("doc_id"), col("rep_id"))
    val edges = scoped
      .join(repOf.select(col("doc_id").as("doc_id_a"),
        col("rep_id").as("__rep_a")), Seq("doc_id_a"), "left")
      .join(repOf.select(col("doc_id").as("doc_id_b"),
        col("rep_id").as("__rep_b")), Seq("doc_id_b"), "left")
      .select(
        coalesce(col("__rep_a"), col("doc_id_a")).as("doc_id_a"),
        coalesce(col("__rep_b"), col("doc_id_b")).as("doc_id_b"))
      .filter(col("doc_id_a") =!= col("doc_id_b"))
    val comp = Dedup.clustersAlternating(edges)
    // components' stored anchors: (component, min stored rep, splits)
    val anchors = comp
      .join(assigned.select(col("rep_id").as("doc_id"), col("split"))
        .dropDuplicates("doc_id"), Seq("doc_id"))
      .groupBy("cluster_id")
      .agg(min(col("doc_id")).as("__anchor_rep"),
        countDistinct(col("split")).as("__n_splits"),
        min(col("split")).as("__anchor_split"))
    val conflicts = anchors.filter(col("__n_splits") > 1).limit(1)
      .collect()
    require(conflicts.isEmpty, {
      val r = conflicts.head
      s"SplitStore '$storeKey': new match evidence links stored " +
        s"clusters across the split boundary (component of rep " +
        s"${r.get(1)} touches ${r.get(2)} splits) — no assignment of " +
        "the new docs can repair that leakage; re-split the corpus " +
        "version deliberately (fresh store) instead of silently " +
        "flipping committed assignments"
    })
    val newComp = fresh
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("__comp"))
    val rows = newComp
      .join(anchors.select(col("cluster_id").as("__comp"),
        col("__anchor_rep"), col("__anchor_split")), Seq("__comp"),
        "left")
      .select(col("doc_id"),
        coalesce(col("__anchor_rep"), col("__comp")).as("rep_id"),
        coalesce(col("__anchor_split"),
          CorpusOps.splitExpr(
            coalesce(col("__anchor_rep"), col("__comp")), seed,
            buckets, trainBuckets, valBuckets)).as("split"))
    if (!rows.isEmpty)
      rows.write.mode(SaveMode.Append).parquet(s"$b/assign")
    writeMeta(b, "last_batch_id" -> batchId) // meta-after-data
    read(spark, storeKey)
  }

  /** Remove the persisted layout (test/ops hygiene). */
  def drop(spark: SparkSession, storeKey: String): Unit = {
    val b = Paths.get(base(spark, storeKey))
    if (Files.exists(b))
      org.apache.commons.io.FileUtils.deleteDirectory(b.toFile)
  }
}
