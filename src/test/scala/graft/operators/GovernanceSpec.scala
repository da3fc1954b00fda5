package graft.operators

import graft.TestSpark
import graft.sources._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-store purge lifecycle: one Governance.purge walks every
  * persisted layout in scope, Governance.audit proves zero purged ids
  * served on ANY surface; crash-retry (same batchId) is idempotent;
  * re-adding a purged id into an ANN layout is refused until compact
  * folds the tombstones; the rewrite stores honestly FORGET (purged
  * content re-admits under a new id).
  */
class GovernanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val runTag = java.util.UUID.randomUUID.toString.take(8)
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // 48 vectors, dim 8, deterministic; ids 0..47 — victims are 0..3
  private def vecs = (0 until 48).map { i =>
    (i.toLong, Array.tabulate(8)(d =>
      math.sin(i * 0.7 + d * 1.3).toFloat))
  }.toDF("vec_id", "embedding")

  private def docs = (0 until 30).map { i =>
    (i.toLong, s"doc body ${i % 10} content token alpha beta " +
      s"gamma ${i % 7} delta")
  }.toDF("doc_id", "text")

  private val victims = Seq(0L, 1L, 2L, 3L).toDF("vec_id")

  test("full-scope purge: every ANN layout + postings + stores; " +
      "audit all-zero; crash-retry idempotent") {
    val k = (fam: String) => s"gv-$runTag-$fam"
    AnnIndex.ensureLsh(spark, k("lsh"), vecs, tables = 8, bits = 4,
      storageBuckets = 2)
    AnnIndex.ensureIvf(spark, k("ivf"), vecs, lists = 4, iters = 2)
    AnnIndex.ensureSq8(spark, k("sq8"), vecs, storageBuckets = 2)
    AnnIndex.ensureBq(spark, k("bq"), vecs, storageBuckets = 2)
    AnnIndex.ensureIvfSq8(spark, k("isq"), vecs, lists = 4, iters = 2,
      storageBuckets = 2)
    AnnIndex.ensureIvfPq(spark, k("ipq"), vecs, lists = 4,
      numSub = 4, ksub = 8, iters = 2, storageBuckets = 2)
    AnnIndex.ensureIvfBq(spark, k("ibq"), vecs, lists = 4, iters = 2,
      storageBuckets = 2)
    KeywordIndex.ensurePostings(spark, k("kw"), docs)
    DedupStore.dedupBatch(spark, k("dd"), docs, batchId = 1L)
    DedupStore.nearDedupBatch(spark, k("dd"), docs, batchId = 1L)
    SplitStore.assign(spark, k("sp"), docs.select("doc_id"),
      docs.select(col("doc_id").as("doc_id_a"),
        col("doc_id").as("doc_id_b")).limit(0), batchId = 1L)
    Scd2Store.merge(spark, k("s2"),
      Seq((0L, ts("2024-01-01 00:00:00"), "a"),
        (0L, ts("2024-01-02 00:00:00"), "b"),
        (9L, ts("2024-01-01 00:00:00"), "a")).toDF("key", "ts", "v"),
      "key", "ts", Seq("v"), batchId = 1L)
    val scope = Governance.PurgeScope(
      lsh = Seq(k("lsh")), ivf = Seq(k("ivf")), sq8 = Seq(k("sq8")),
      bq = Seq(k("bq")), ivfSq8 = Seq(k("isq")), ivfPq = Seq(k("ipq")),
      ivfBq = Seq(k("ibq")), postings = Seq(k("kw")),
      dedupSeen = Seq(k("dd")), dedupNear = Seq(k("dd")),
      splits = Seq(k("sp")), scd2 = Seq((k("s2"), "key")))
    val receipt = Governance.purge(spark, victims, scope,
      batchId = Some(1L))
    // both ledgers present, every scoped layout receipted
    assert(receipt.filter(col("action") === "tombstoned").count() === 8)
    assert(receipt.filter(col("action") === "rewritten").count() === 4)
    val audit1 = Governance.audit(spark, victims, scope)
    assert(audit1.agg(sum("n_served_purged")).head.getLong(0) === 0L)
    // crash-retry: the SAME purge again (replayed batch id) — no
    // double tombstones, rewrites no-op, audit still zero
    val lshTombsBefore = AnnIndex.openLsh(spark, k("lsh"))
    Governance.purge(spark, victims, scope, batchId = Some(1L))
    val audit2 = Governance.audit(spark, victims, scope)
    assert(audit2.agg(sum("n_served_purged")).head.getLong(0) === 0L)
    // survivors still served everywhere (purge is surgical): each ANN
    // survivor view holds exactly 44 ids, the stores their remainders
    assert(AnnIndex.openLsh(spark, k("lsh")).vecs.count() === 44L)
    assert(AnnIndex.openIvfSq8(spark, k("isq")).lists.count() === 44L)
    assert(SplitStore.read(spark, k("sp")).count() === 26L)
    assert(Scd2Store.readDim(spark, k("s2"))
      .select("key").distinct().count() === 1L)
    // the purged ids are no longer retrievable even by their own
    // vectors (pre-purge they self-match at rank 1)
    val q = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"))
    val served = AnnIndex.queryLsh(q, AnnIndex.openLsh(spark, k("lsh")),
      k = 4, probes = 8)
    assert(served.filter(col("vec_id") < 4).count() === 0L)
  }

  test("re-add of a purged id is refused until compact folds the " +
      "tombstones, then admitted (the ANN re-add contract)") {
    val key = s"gv-$runTag-readd"
    AnnIndex.ensureLsh(spark, key, vecs, tables = 8, bits = 4,
      storageBuckets = 2)
    Governance.purge(spark, victims,
      Governance.PurgeScope(lsh = Seq(key)), batchId = Some(1L))
    val readd = vecs.filter(col("vec_id") === 0L)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.upsertLsh(spark, key, readd, tables = 8, bits = 4,
        storageBuckets = 2, batchId = Some(2L))
    }
    assert(e.getMessage.contains("compactLsh"))
    AnnIndex.compactLsh(spark, key) // folds tombstones physically
    val h = AnnIndex.upsertLsh(spark, key, readd, tables = 8, bits = 4,
      storageBuckets = 2, batchId = Some(2L))
    assert(h.vecs.filter(col("vec_id") === 0L).count() === 1L)
  }

  test("rewrite stores honestly forget: purged content re-admits " +
      "under a new id; purged split doc re-assigns fresh") {
    val key = s"gv-$runTag-forget"
    DedupStore.dedupBatch(spark, key, docs, batchId = 1L)
    DedupStore.purgeDocs(spark, key, Seq(0L).toDF("doc_id"))
    // doc 0's text group (texts repeat mod 10 × mod 7 = every 70 —
    // unique here) arrives again under id 1000: ADMITTED
    val again = Seq((1000L, docs.filter(col("doc_id") === 0L)
      .head.getString(1))).toDF("doc_id", "text")
    val kept = DedupStore.dedupBatch(spark, key, again, batchId = 2L)
    assert(kept.count() === 1L)
    // while un-purged duplicate content is still dropped
    val dup = Seq((2000L, docs.filter(col("doc_id") === 1L)
      .head.getString(1))).toDF("doc_id", "text")
    assert(DedupStore.dedupBatch(spark, key, dup, batchId = 3L)
      .count() === 0L)
    // split store: purge then re-submit — assigned fresh, same split
    // as its surviving cluster would dictate (no evidence here, so its
    // own md5 bucket)
    val sk = s"gv-$runTag-sp2"
    val noPairs = docs.select(col("doc_id").as("doc_id_a"),
      col("doc_id").as("doc_id_b")).limit(0)
    val before = SplitStore.assign(spark, sk, docs.select("doc_id"),
      noPairs, batchId = 1L)
    val doc0Split = before.filter(col("doc_id") === 0L)
      .head.getString(2)
    SplitStore.purge(spark, sk, Seq(0L).toDF("doc_id"))
    assert(SplitStore.read(spark, sk).filter(col("doc_id") === 0L)
      .count() === 0L)
    val after = SplitStore.assign(spark, sk, Seq(0L).toDF("doc_id"),
      noPairs, batchId = 2L)
    // an orphan re-add lands by its own md5 bucket — identical here
    assert(after.filter(col("doc_id") === 0L).head.getString(2)
      === doc0Split)
  }

  test("index-store leg: the flagship chunk-index sink purges its " +
      "rows (text + embedding are the document's content); replayed " +
      "purge skips the rewrite; audit zero") {
    val path = java.nio.file.Files
      .createTempDirectory("idxpurge").toString
    val rows = Seq(
      (1L, 0L, "alpha body", Array(1f, 0f), 11L),
      (1L, 1L, "alpha tail", Array(0f, 1f), 11L),
      (2L, 0L, "beta body", Array(1f, 1f), 22L))
      .toDF("doc_id", "chunk_id", "text", "embedding", "doc_hash")
    IndexStore.write(rows, path)
    val scope = Governance.PurgeScope(indexStores = Seq(path))
    val receipt = Governance.purge(spark, Seq(1L).toDF("doc_id"), scope)
    assert(receipt.filter(col("surface") === "index_store")
      .head.getLong(3) === 2L)
    assert(IndexStore.read(spark, path).count() === 1L)
    assert(Governance.audit(spark, Seq(1L).toDF("doc_id"), scope)
      .agg(sum("n_served_purged")).head.getLong(0) === 0L)
    // replay: the any-victim probe skips the rewrite
    assert(IndexStore.purge(spark, path, Seq(1L).toDF("doc_id")) === 0L)
    // purging the remainder leaves the documented absent-empty state
    IndexStore.purge(spark, path, Seq(2L).toDF("doc_id"))
    assert(!IndexStore.exists(path))
  }

  test("graph-index leg: purge tombstones the graph layout (results " +
      "AND both edge endpoints audited); replayed purge folds away; " +
      "victims' own vectors retrieve survivors only") {
    import graft.sources.GraphIndex
    val key = s"gv-$runTag-graph"
    val pts = (0 until 48).map { i =>
      val theta = (i % 4) * 1.5 + (i / 4) * 0.01
      (i.toLong, Array(math.cos(theta).toFloat, math.sin(theta).toFloat))
    }.toDF("vec_id", "embedding")
    GraphIndex.ensureGraph(spark, key, pts, k = 4, rounds = 2,
      blockSize = 16, maxDegree = 12)
    val scope = Governance.PurgeScope(graphs = Seq(key))
    val victims = Seq(0L, 4L, 8L).toDF("doc_id")
    val receipt = Governance.purge(spark, victims, scope)
    assert(receipt.filter(col("surface") === "ann_graph")
      .head.getLong(3) === 3L)
    // served-nowhere across vecs AND both edge endpoints
    assert(Governance.audit(spark, victims, scope)
      .agg(sum("n_served_purged")).head.getLong(0) === 0L)
    // replayed purge folds away: tomb_rows stable
    Governance.purge(spark, victims, scope)
    assert(GraphIndex.graphMeta(spark, key)("tomb_rows") === 3L)
    // the victims' own vectors (the likeliest probes) serve survivors
    val probes = pts.filter(col("vec_id").isin(0L, 4L, 8L))
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"))
    val got = GraphIndex.queryGraph(spark, key, probes, k = 2,
      beam = 8, rounds = 3)
    assert(got.filter(col("vec_id").isin(0L, 4L, 8L)).count() === 0L)
    assert(got.count() > 0L)
  }

  test("purgeLogged: the compliance trail accumulates roster/receipt/" +
      "audit per batch; a replayed batch returns its STORED proof and " +
      "re-runs nothing; the log survives crash-retry without " +
      "double-logging") {
    val key = s"gv-$runTag-log"
    val logDir = java.nio.file.Files
      .createTempDirectory("purgelog").toString
    DedupStore.dedupBatch(spark, key, docs, batchId = 1L)
    val scope = Governance.PurgeScope(dedupSeen = Seq(key))
    val a1 = Governance.purgeLogged(spark,
      Seq(0L, 1L).toDF("doc_id"), scope, logDir, batchId = 1L)
    assert(a1.agg(sum("n_served_purged")).head.getLong(0) === 0L)
    Governance.purgeLogged(spark, Seq(2L).toDF("doc_id"), scope,
      logDir, batchId = 2L)
    assert(Governance.readPurgeLog(spark, logDir, "roster")
      .count() === 3L)
    assert(Governance.readPurgeLog(spark, logDir, "receipt")
      .count() === 2L)
    assert(Governance.readPurgeLog(spark, logDir, "audit")
      .count() === 2L) // one dedup surface row per batch
    // replayed batch id: stored proof back, store state untouched
    val before = DedupStore.seenCount(spark, key)
    val replayed = Governance.purgeLogged(spark,
      Seq(0L, 1L).toDF("doc_id"), scope, logDir, batchId = 1L)
    assert(replayed.agg(sum("n_served_purged")).head.getLong(0) === 0L)
    assert(DedupStore.seenCount(spark, key) === before)
    assert(Governance.readPurgeLog(spark, logDir, "roster")
      .count() === 3L) // no double-log
    // crash-retry: data appended, meta never committed — re-running
    // the SAME batch appends nothing twice
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(logDir, "_purgelog_meta.json"),
      """{"last_batch_id": 1}""")
    Governance.purgeLogged(spark, Seq(2L).toDF("doc_id"), scope,
      logDir, batchId = 2L)
    assert(Governance.readPurgeLog(spark, logDir, "roster")
      .count() === 3L)
    assert(Governance.readPurgeLog(spark, logDir, "audit")
      .count() === 2L)
    // compaction folds files, never records; the trail and the
    // replay window survive
    def nFiles(t: String): Long = {
      val s = java.nio.file.Files.walk(
        java.nio.file.Paths.get(logDir, t))
      try s.filter(p => p.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    val rosterBefore = Governance.readPurgeLog(spark, logDir, "roster")
      .collect().map(_.toSeq).toSet
    val fb = nFiles("roster")
    Governance.compactPurgeLog(spark, logDir, numFiles = 1)
    assert(nFiles("roster") <= math.min(fb, 1L))
    assert(Governance.readPurgeLog(spark, logDir, "roster")
      .collect().map(_.toSeq).toSet === rosterBefore)
    val again = Governance.purgeLogged(spark,
      Seq(0L, 1L).toDF("doc_id"), scope, logDir, batchId = 1L)
    assert(again.agg(sum("n_served_purged")).head.getLong(0) === 0L)
    assert(Governance.readPurgeLog(spark, logDir, "roster")
      .count() === 3L)
  }

  test("round-13 layouts under the purge contract: plaid tombstones " +
      "serve survivors exactly; impacts poison until rebuild; audit " +
      "proves both") {
    val kP = s"gv-$runTag-plaid"
    val kI = s"gv-$runTag-bmw"
    // plaid over a chunk table derived from vecs (3 chunks per doc)
    val chunks = vecs.select((col("vec_id") / 3).cast("long").as("doc_id"),
      col("vec_id"), col("embedding"))
    PlaidIndex.ensurePlaid(spark, kP, chunks, lists = 4, iters = 2)
    ImpactIndex.ensureImpacts(spark, kI, docs)
    val scope = Governance.PurgeScope(plaid = Seq(kP), impacts = Seq(kI))
    val vics = Seq(0L, 1L).toDF("doc_id")
    val receipt = Governance.purge(spark, vics, scope, batchId = Some(1L))
    assert(receipt.filter(col("action") === "tombstoned").count() === 1)
    assert(receipt.filter(col("action") === "poisoned").count() === 1)
    // audit: zero purged ids served anywhere (plaid anti-joined,
    // impacts refusing)
    val audit = Governance.audit(spark, vics, scope)
    assert(audit.agg(sum("n_served_purged")).head.getLong(0) === 0L)
    // crash-retry idempotent
    Governance.purge(spark, vics, scope, batchId = Some(1L))
    assert(Governance.audit(spark, vics, scope)
      .agg(sum("n_served_purged")).head.getLong(0) === 0L)
    // plaid still serves survivors; impacts refuses loudly
    val qt = (1 to 2).map(q => (q.toLong, 0,
      Array.tabulate(8)(d => math.sin(q * 0.9 + d).toFloat)))
      .toDF("query_id", "qpos", "qvec")
    val plaidServed = PlaidIndex.plaidTopK(spark, kP, qt, k = 2,
      nProbe = 4, mDocs = 16)
    assert(plaidServed.filter(col("doc_id") < 2).count() === 0L)
    assert(plaidServed.count() > 0L)
    val e = intercept[IllegalArgumentException] {
      ImpactIndex.wandTopK(spark, kI,
        Seq((1L, "alpha")).toDF("query_id", "query_text"), k = 2)
    }
    assert(e.getMessage.contains("poisoned"))
  }

  test("maintain: compacts only past-threshold layouts through their " +
      "journaled verbs; answers byte-identical; second run no-op; " +
      "replay windows survive the compaction") {
    val kL = s"gvm-$runTag-lsh"
    val kG = s"gvm-$runTag-g"
    val kK = s"gvm-$runTag-kw"
    // multi-file-set layouts: base + two replay-guarded upsert batches
    AnnIndex.ensureLsh(spark, kL, vecs.filter(col("vec_id") < 40),
      tables = 8, bits = 4, storageBuckets = 2)
    AnnIndex.upsertLsh(spark, kL,
      vecs.filter(col("vec_id") >= 40 && col("vec_id") < 44),
      tables = 8, bits = 4, storageBuckets = 2, batchId = Some(1L))
    AnnIndex.upsertLsh(spark, kL, vecs.filter(col("vec_id") >= 44),
      tables = 8, bits = 4, storageBuckets = 2, batchId = Some(2L))
    GraphIndex.ensureGraph(spark, kG, vecs.filter(col("vec_id") < 44),
      k = 4, rounds = 2, blockSize = 16, maxDegree = 12,
      storageBuckets = 2)
    GraphIndex.upsertGraph(spark, kG, vecs.filter(col("vec_id") >= 44),
      batchId = Some(1L))
    KeywordIndex.ensurePostings(spark, kK,
      docs.filter(col("doc_id") < 20))
    KeywordIndex.upsertPostings(spark, kK,
      docs.filter(col("doc_id") >= 20), batchId = Some(1L))
    // the dedup store's file FLOOR is its hb-partition count (~27 on
    // this fixture): a threshold below a layout's floor would
    // re-compact it every run — maintain's documented contract is
    // maxFiles at or above each scoped layout's floor, so the dedup
    // store rides a second maintain call at its own threshold below
    val kD = s"gvm-$runTag-dd"
    DedupStore.dedupBatch(spark, kD, docs.filter(col("doc_id") < 20),
      batchId = 1L)
    DedupStore.dedupBatch(spark, kD, docs.filter(col("doc_id") >= 20),
      batchId = 2L)
    val scope = Governance.PurgeScope(lsh = Seq(kL), graphs = Seq(kG),
      postings = Seq(kK))
    val probes = vecs.filter(col("vec_id") % 7 === 1)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec")).localCheckpoint(true)
    def answers() = (
      AnnIndex.queryLsh(probes, AnnIndex.openLsh(spark, kL), k = 3)
        .select("query_id", "rank", "vec_id").collect().map(_.toSeq).toSet,
      GraphIndex.queryGraph(spark, kG, probes, k = 2, beam = 8,
        rounds = 3).select("query_id", "rank", "vec_id")
        .collect().map(_.toSeq).toSet,
      graft.operators.KeywordSearch.bm25TopKFromPostings(
        Seq((1L, "alpha beta")).toDF("query_id", "query_text"),
        KeywordIndex.openPostings(spark, kK), k = 3)
        .select("query_id", "rank", "doc_id", "score")
        .collect().map(_.toSeq).toSet)
    val before = answers()
    // threshold 5: above each layout's post-compaction floor (2-bucket
    // tables land ~2 files each), below the appended-file-set counts
    val run1 = Governance.maintain(spark, scope, maxFiles = 5)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(run1.size === 3)
    assert(run1.forall { case (_, fb, fa, c) => !c || fa < fb },
      s"compaction must reduce file counts: $run1")
    assert(run1.exists(_._4), s"nothing compacted: $run1")
    assert(answers() === before,
      "maintenance changed a served answer")
    val run2 = Governance.maintain(spark, scope, maxFiles = 5)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(run2.count(_._4) === 0,
      s"second maintenance run must be a no-op: $run2")
    // replay windows survive: a replayed upsert batch is still skipped
    val nAfter = AnnIndex.openLsh(spark, kL).vecs.count()
    AnnIndex.upsertLsh(spark, kL, vecs.filter(col("vec_id") >= 44),
      tables = 8, bits = 4, storageBuckets = 2, batchId = Some(2L))
    assert(AnnIndex.openLsh(spark, kL).vecs.count() === nAfter,
      "compaction must not reopen the upsert replay window")
    // dedup-seen leg: at a threshold at/above the store's hb floor the
    // examined row appears and repeated runs never flap
    val dScope = Governance.PurgeScope(dedupSeen = Seq(kD))
    val d1 = Governance.maintain(spark, dScope, maxFiles = 40)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(d1.size === 1 && d1.head._1 === "dedup_seen")
    val d2 = Governance.maintain(spark, dScope, maxFiles = 40)
      .collect().map(r => r.getBoolean(4)).toSeq
    assert(!d2.head, s"dedup leg must not flap: $d1 then $d2")
    // the store still answers after maintenance passes
    assert(DedupStore.dedupBatch(spark, kD,
      docs.filter(col("doc_id") < 3), batchId = 3L).count() === 0L)
    // a scoped-but-missing layout fails loudly, the purge discipline
    val e = intercept[IllegalArgumentException] {
      Governance.maintain(spark,
        Governance.PurgeScope(lsh = Seq(s"gvm-$runTag-none")))
    }
    assert(e.getMessage.contains("no persisted"))
  }

  test("maintain auto-floor: a BELOW-floor threshold compacts once " +
      "and then no-ops — never recompacts an at-floor layout every " +
      "run (the fe661ac footgun, automated)") {
    val kD = s"gvm-$runTag-floor"
    DedupStore.dedupBatch(spark, kD, docs.filter(col("doc_id") < 20),
      batchId = 1L)
    DedupStore.dedupBatch(spark, kD, docs.filter(col("doc_id") >= 20),
      batchId = 2L)
    val scope = Governance.PurgeScope(dedupSeen = Seq(kD))
    // maxFiles=1 is far below the store's hb-partition floor (~27):
    // before the auto-floor this recompacted every run
    val r1 = Governance.maintain(spark, scope, maxFiles = 1)
      .collect().map(r => (r.getLong(2), r.getLong(3),
        r.getBoolean(4))).head
    assert(r1._3 && r1._2 < r1._1,
      s"first below-floor run must fold the appended file sets: $r1")
    val r2 = Governance.maintain(spark, scope, maxFiles = 1)
      .collect().map(r => (r.getLong(2), r.getLong(3),
        r.getBoolean(4))).head
    assert(!r2._3,
      s"an at-floor layout must not recompact under a below-floor " +
        s"threshold: $r1 then $r2")
    // the bucketed families hit their bucket-count floor the same way
    val kL = s"gvm-$runTag-floorlsh"
    AnnIndex.ensureLsh(spark, kL, vecs.filter(col("vec_id") < 40),
      tables = 8, bits = 4, storageBuckets = 2)
    AnnIndex.upsertLsh(spark, kL, vecs.filter(col("vec_id") >= 40),
      tables = 8, bits = 4, storageBuckets = 2, batchId = Some(1L))
    val lScope = Governance.PurgeScope(lsh = Seq(kL))
    val l1 = Governance.maintain(spark, lScope, maxFiles = 1)
      .collect().map(r => r.getBoolean(4)).head
    val l2 = Governance.maintain(spark, lScope, maxFiles = 1)
      .collect().map(r => r.getBoolean(4)).head
    assert(l1 && !l2,
      "a bucketed layout must fold once then sit at its bucket floor")
  }

  test("maintain plaid leg: the upsert-batch file accumulation folds " +
      "through compactPlaid at a below-floor threshold (auto-floor), " +
      "answers identical, second run no-op") {
    val kP = s"gvm-$runTag-plaid"
    val chunks = (0 until 90).map { i =>
      val doc = i / 3
      val theta = (doc % 4) * 1.5 + (i % 3) * 0.05
      (doc.toLong, i.toLong,
        Array(math.cos(theta).toFloat, math.sin(theta).toFloat))
    }.toDF("doc_id", "vec_id", "embedding")
    PlaidIndex.ensurePlaid(spark, kP,
      chunks.filter(col("doc_id") < 20), lists = 4, iters = 2)
    PlaidIndex.upsertPlaid(spark, kP,
      chunks.filter(col("doc_id") >= 20 && col("doc_id") < 25),
      batchId = Some(1L))
    PlaidIndex.upsertPlaid(spark, kP,
      chunks.filter(col("doc_id") >= 25), batchId = Some(2L))
    val qt = Seq((1L, 0, Array(math.cos(1.5).toFloat,
      math.sin(1.5).toFloat))).toDF("query_id", "qpos", "qvec")
    def answers() = PlaidIndex.plaidTopK(spark, kP, qt, k = 3,
      nProbe = 4, mDocs = 40).select("query_id", "rank", "doc_id")
      .collect().map(_.toSeq).toSet
    val before = answers()
    val scope = Governance.PurgeScope(plaid = Seq(kP))
    val r1 = Governance.maintain(spark, scope, maxFiles = 1)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).head
    assert(r1._1 === "plaid")
    assert(r1._4 && r1._3 < r1._2,
      s"plaid leg must fold the upsert file sets: $r1")
    assert(answers() === before, "maintenance changed a plaid answer")
    val r2 = Governance.maintain(spark, scope, maxFiles = 1)
      .collect().map(r => r.getBoolean(4)).head
    assert(!r2, "second plaid maintenance run must be a no-op " +
      "(auto-floor: occupied partitions + one doccent file)")
  }

  test("maintain line-dedup leg: the per-batch file-set accumulation " +
      "folds through compactLineDedup; replayed batches still " +
      "reconstruct; second run no-op") {
    val kD = s"gvm-$runTag-lines"
    val d1 = docs.filter(col("doc_id") < 20)
    val d2 = docs.filter(col("doc_id") >= 20)
    DedupStore.lineDedupBatch(spark, kD, d1, batchId = 1L, maxDf = 2)
    val out2 = DedupStore.lineDedupBatch(spark, kD, d2, batchId = 2L,
      maxDf = 2).select("doc_id", "text", "n_lines", "n_cut")
      .collect().map(_.toSeq).toSet
    val filesBefore = DedupStore.readLineDf(spark, kD).inputFiles.length
    val scope = Governance.PurgeScope(dedupLines = Seq(kD))
    val r1 = Governance.maintain(spark, scope, maxFiles = 1)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).head
    assert(r1._1 === "dedup_lines")
    assert(r1._2 === filesBefore.toLong)
    assert(r1._4 && r1._3 < r1._2,
      s"line store must fold its per-batch file sets: $r1")
    // rows survived verbatim: the replayed batch reconstructs its
    // original output from the compacted store
    val replay = DedupStore.lineDedupBatch(spark, kD, d2, batchId = 2L,
      maxDf = 2).select("doc_id", "text", "n_lines", "n_cut")
      .collect().map(_.toSeq).toSet
    assert(replay === out2,
      "compaction changed a replayed line-dedup answer")
    val r2 = Governance.maintain(spark, scope, maxFiles = 1)
      .collect().map(r => r.getBoolean(4)).head
    assert(!r2, "second line-dedup maintenance run must be a no-op")
  }

  test("maintain dedup_near leg: the sigs fold width clamps to the " +
      "threshold — a below-8 threshold folds once then no-ops " +
      "instead of recompacting every run (the r14 advice defect); " +
      "replayed batches still reconstruct") {
    val kN = s"gvm-$runTag-near"
    DedupStore.nearDedupBatch(spark, kN,
      docs.filter(col("doc_id") < 15), batchId = 1L)
    val out2 = DedupStore.nearDedupBatch(spark, kN,
      docs.filter(col("doc_id") >= 15), batchId = 2L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val scope = Governance.PurgeScope(dedupNear = Seq(kN))
    val r1 = Governance.maintain(spark, scope, maxFiles = 1)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).head
    assert(r1._1 === "dedup_near")
    assert(r1._4 && r1._3 < r1._2,
      s"near store must fold its per-batch file sets: $r1")
    val r2 = Governance.maintain(spark, scope, maxFiles = 1)
      .collect().map(r => r.getBoolean(4)).head
    assert(!r2,
      "an at-floor near store must not recompact under a below-floor " +
        "threshold — the sigs fold width must clamp to it")
    // the fold changed files, not rows: the replayed batch
    // reconstructs its original kept set from the compacted store
    val replay = DedupStore.nearDedupBatch(spark, kN,
      docs.filter(col("doc_id") >= 15), batchId = 2L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(replay === out2,
      "compaction changed a replayed near-dedup answer")
    // INTERMEDIATE thresholds must converge too: a second store driven
    // at maxFiles=3 folds once then no-ops — the first fix attempt
    // (sigs width = min(8, maxFiles)) closed only maxFiles=1, because
    // any width above the flat dir's path-derived floor of 1 leaves
    // the layout above the estimate and recompacting forever
    val kN3 = s"gvm-$runTag-near3"
    DedupStore.nearDedupBatch(spark, kN3,
      docs.filter(col("doc_id") < 15), batchId = 1L)
    DedupStore.nearDedupBatch(spark, kN3,
      docs.filter(col("doc_id") >= 15), batchId = 2L)
    val scope3 = Governance.PurgeScope(dedupNear = Seq(kN3))
    val r3a = Governance.maintain(spark, scope3, maxFiles = 3)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .head
    assert(r3a._3 && r3a._2 < r3a._1,
      s"near store must fold at an intermediate threshold: $r3a")
    val r3b = Governance.maintain(spark, scope3, maxFiles = 3)
      .collect().map(r => r.getBoolean(4)).head
    assert(!r3b,
      "an at-floor near store must not recompact at maxFiles=3 — the " +
        "fold width must land at the path-derived floor, not at the " +
        "threshold")
  }

  test("maintain plaid leg measures the FOLDABLE surfaces only: a " +
      "tombstoned layout folds once then no-ops — the tombs data " +
      "files compactPlaid never folds must not count against the " +
      "floor (the r14 advice defect)") {
    val kP = s"gvm-$runTag-ptomb"
    val chunks = (0 until 90).map { i =>
      val doc = i / 3
      val theta = (doc % 4) * 1.5 + (i % 3) * 0.05
      (doc.toLong, i.toLong,
        Array(math.cos(theta).toFloat, math.sin(theta).toFloat))
    }.toDF("doc_id", "vec_id", "embedding")
    PlaidIndex.ensurePlaid(spark, kP,
      chunks.filter(col("doc_id") < 25), lists = 4, iters = 2)
    PlaidIndex.upsertPlaid(spark, kP,
      chunks.filter(col("doc_id") >= 25), batchId = Some(1L))
    // two delete batches → a multi-file tombs dir the fold keeps
    PlaidIndex.deletePlaid(spark, kP, Seq(3L).toDF("doc_id"),
      batchId = Some(1L))
    PlaidIndex.deletePlaid(spark, kP, Seq(7L).toDF("doc_id"),
      batchId = Some(2L))
    val qt = Seq((1L, 0, Array(math.cos(1.5).toFloat,
      math.sin(1.5).toFloat))).toDF("query_id", "qpos", "qvec")
    def answers() = PlaidIndex.plaidTopK(spark, kP, qt, k = 3,
      nProbe = 4, mDocs = 40).select("query_id", "rank", "doc_id")
      .collect().map(_.toSeq).toSet
    val before = answers()
    val scope = Governance.PurgeScope(plaid = Seq(kP))
    val r1 = Governance.maintain(spark, scope, maxFiles = 1)
      .collect().map(r => (r.getLong(2), r.getLong(3),
        r.getBoolean(4))).head
    assert(r1._3 && r1._2 < r1._1,
      s"tombstoned plaid layout must fold its upsert file sets: $r1")
    assert(answers() === before,
      "maintenance changed a tombstoned-plaid answer")
    val r2 = Governance.maintain(spark, scope, maxFiles = 1)
      .collect().map(r => r.getBoolean(4)).head
    assert(!r2,
      "a tombstoned at-floor plaid layout must not recompact every " +
        "run — tombs files are not foldable and must not be measured")
    // the tombstones themselves survive the fold (deletion fold is
    // the re-cluster) and the victims stay unserved
    assert(PlaidIndex.openPlaid(spark, kP).lists
      .filter(col("doc_id").isin(3L, 7L)).count() === 0L)
  }

  test("maintain sketch_panes leg: the per-batch pane accumulation " +
      "folds through compactPanes; the merged sketch is identical; " +
      "below-floor second run no-op") {
    val kS = s"gvm-$runTag-sketch"
    def items(lo: Int, hi: Int) = (lo until hi).map(i =>
      (i % 3, s"item-${i % 17}")).toDF("grp", "item")
    SketchStore.update(spark, kS, items(0, 20), "grp", col("item"),
      batchId = 1L, k = 16, seed = 7L)
    SketchStore.update(spark, kS, items(20, 40), "grp", col("item"),
      batchId = 2L, k = 16, seed = 7L)
    SketchStore.update(spark, kS, items(40, 60), "grp", col("item"),
      batchId = 3L, k = 16, seed = 7L)
    def merged() = SketchStore.read(spark, kS)
      .select(col("grp"), array_sort(col("kmv")).as("kmv"))
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1))).toSet
    val before = merged()
    val scope = Governance.PurgeScope(sketches = Seq(kS))
    val r1 = Governance.maintain(spark, scope, maxFiles = 1)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).head
    assert(r1._1 === "sketch_panes")
    assert(r1._4 && r1._3 < r1._2,
      s"sketch store must fold its pane file sets: $r1")
    assert(merged() === before,
      "pane compaction changed the merged sketch")
    val r2 = Governance.maintain(spark, scope, maxFiles = 1)
      .collect().map(r => r.getBoolean(4)).head
    assert(!r2, "second sketch maintenance run must be a no-op")
    // a TRUE replay of the last folded batch no-ops: its original pane
    // is gone (the surviving batch_id=3 pane is the MERGED sketch), so
    // the verify floor must cover it — a floor of last−1 would fail
    // this replay's content verification against the fold
    SketchStore.update(spark, kS, items(40, 60), "grp", col("item"),
      batchId = 3L, k = 16, seed = 7L)
    assert(merged() === before,
      "a replayed folded batch must not change the merged sketch")
    // the store still ingests after the fold (fresh batch id past the
    // folded horizon)
    SketchStore.update(spark, kS, items(60, 70), "grp", col("item"),
      batchId = 4L, k = 16, seed = 7L)
    assert(SketchStore.read(spark, kS).count() === 3L)
    // and the fold horizon SURVIVES that ingest: update's meta rewrite
    // must carry verify_floor through, or this true replay of a folded
    // id — whose original pane no longer exists — would fail its
    // content verification against the merged pane instead of no-opping
    val afterIngest = SketchStore.read(spark, kS)
      .select(col("grp"), array_sort(col("kmv")).as("kmv"))
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1))).toSet
    SketchStore.update(spark, kS, items(40, 60), "grp", col("item"),
      batchId = 3L, k = 16, seed = 7L)
    assert(SketchStore.read(spark, kS)
      .select(col("grp"), array_sort(col("kmv")).as("kmv"))
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1))).toSet
      === afterIngest,
      "a folded-batch replay after a post-fold ingest must no-op")
  }

  test("maintain opqIvfPq leg: upsert-batch file sets fold through " +
      "the inner store's compact verb; answers identical; replay " +
      "window survives; second run no-op") {
    val kO = s"gvm-$runTag-opq"
    AnnIndex.ensureOpqIvfPq(spark, kO, vecs.filter(col("vec_id") < 40),
      lists = 4, iters = 2, numSub = 4, ksub = 16, pqIters = 2,
      storageBuckets = 2)
    AnnIndex.upsertOpqIvfPq(spark, kO,
      vecs.filter(col("vec_id") >= 40 && col("vec_id") < 44),
      batchId = Some(1L))
    AnnIndex.upsertOpqIvfPq(spark, kO, vecs.filter(col("vec_id") >= 44),
      batchId = Some(2L))
    val q = vecs.filter(col("vec_id") % 7 === 1)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec")).localCheckpoint(true)
    def answers() = AnnIndex.queryOpqIvfPq(q,
      AnnIndex.openOpqIvfPq(spark, kO), k = 3, nProbe = 4, m = 48)
      .select("query_id", "rank", "vec_id")
      .collect().map(_.toSeq).toSet
    val before = answers()
    val scope = Governance.PurgeScope(opqIvfPq = Seq(kO))
    val r1 = Governance.maintain(spark, scope, maxFiles = 1)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).head
    assert(r1._1 === "ann_opqivfpq")
    assert(r1._4 && r1._3 < r1._2,
      s"opq leg must fold the inner upsert file sets: $r1")
    assert(answers() === before,
      "maintenance changed a composed-OPQ answer")
    val r2 = Governance.maintain(spark, scope, maxFiles = 1)
      .collect().map(r => r.getBoolean(4)).head
    assert(!r2, "second opq maintenance run must be a no-op")
    // the inner replay window survives the fold
    val n = AnnIndex.openOpqIvfPq(spark, kO).inner.vecs.count()
    AnnIndex.upsertOpqIvfPq(spark, kO, vecs.filter(col("vec_id") >= 44),
      batchId = Some(2L))
    assert(AnnIndex.openOpqIvfPq(spark, kO).inner.vecs.count() === n,
      "fold must not reopen the composed upsert replay window")
  }
}
