package graft.sources

import graft.TestSpark
import graft.operators.SimilaritySearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted OPQ (rotate-then-PQ): the parametric eigenvalue
  * allocation hand-computed (including the sub-1-eigenvalue case the
  * naive greedy degenerates on), and the stored-rotation lifecycle —
  * ensure/reuse/open/query with the serve-time query rotation.
  */
class OpqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val runTag = java.util.UUID.randomUUID.toString.take(8)

  test("balancedOrder: per-subspace eigenvalue products equalize — " +
      "hand-computed, including the all-sub-1 spectrum") {
    // eigvals > 1: [8,4,2,1], 2 subspaces → {8,1} and {4,2}, both
    // product 8
    val o1 = SimilaritySearch.balancedOrder(Array(8.0, 4.0, 2.0, 1.0), 2)
    assert(o1.toSeq === Seq(0, 3, 1, 2))
    // eigvals < 1 (every real embedding spectrum here): [.8,.4,.2,.1]
    // → {.8,.1} and {.4,.2}, both product .08 — the naive min-load
    // greedy piles everything into one bucket on this input
    val o2 = SimilaritySearch.balancedOrder(Array(0.8, 0.4, 0.2, 0.1), 2)
    assert(o2.toSeq === Seq(0, 3, 1, 2))
    // unsorted input is sorted by energy first
    val o3 = SimilaritySearch.balancedOrder(Array(0.2, 0.8, 0.1, 0.4), 2)
    assert(o3.toSeq === Seq(1, 2, 3, 0))
  }

  test("persisted lifecycle: ensure builds rotation+codebook+codes+" +
      "vecs; a re-ensure fingerprint-reuses; open serves without a " +
      "freshness probe; served top-k equals exact kNN") {
    val key = s"opq-$runTag"
    // front-loaded then scrambled 8-dim fixture: energy off-axis
    val d = 8
    val m0 = Array.tabulate(d * d) { kk =>
      val i = kk / d; val j = kk % d
      math.sin(i * 7919.0 + j * 104729.0) +
        math.sin(j * 7919.0 + i * 104729.0)
    }
    val (_, qc) = SimilaritySearch.jacobiEig(m0, d)
    val mix = SimilaritySearch.RotationModel(
      Array.tabulate(d * d)(kk => qc((kk % d) * d + kk / d)),
      Array.fill(d)(0.0), d)
    val raw = (0 until 64).map { i =>
      (i.toLong, Array.tabulate(d)(c =>
        (math.sin(i * 1.7 + c) * math.pow(0.7, c)).toFloat))
    }.toDF("vec_id", "embedding")
    val scrambled = SimilaritySearch.rotate(raw, mix)
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .localCheckpoint(true)
    val h1 = AnnIndex.ensureOpq(spark, key, scrambled, numSub = 4,
      ksub = 16, iters = 2, storageBuckets = 2)
    assert(h1.rotation.count() === d.toLong)
    assert(h1.codes.count() === 64L && h1.vecs.count() === 64L)
    // reuse: same content fingerprints → no rebuild (codes files stay)
    val h2 = AnnIndex.ensureOpq(spark, key, scrambled, numSub = 4,
      ksub = 16, iters = 2, storageBuckets = 2)
    assert(h2.codes.count() === 64L)
    assert(AnnIndex.opqExists(spark, key, numSub = 4, ksub = 16))
    // open + query: serve-time rotation, exact rerank — equals exact
    val h = AnnIndex.openOpq(spark, key)
    val q = scrambled.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"))
    val served = AnnIndex.queryOpq(q, h, k = 3, m = 32)
      .select("query_id", "rank", "vec_id")
      .collect().map(_.toSeq).toSet
    val exact = SimilaritySearch.bruteForceTopKAgg(q, scrambled, 3)
      .select("query_id", "rank", "vec_id")
      .collect().map(_.toSeq).toSet
    assert(served === exact)
  }

  test("OPQ∘IVF-PQ composition: the inner layout is a REAL IVF-PQ " +
      "store, so deleteIvfPq against the inner key tombstones the " +
      "composed index (deletes compose for free)") {
    val key = s"opqivf-$runTag"
    val d = 8
    val raw = (0 until 64).map { i =>
      (i.toLong, Array.tabulate(d)(c =>
        (math.sin(i * 1.7 + c) * math.pow(0.7, c)).toFloat))
    }.toDF("vec_id", "embedding").localCheckpoint(true)
    val h = AnnIndex.ensureOpqIvfPq(spark, key, raw, lists = 4,
      iters = 2, numSub = 4, ksub = 16, pqIters = 2,
      storageBuckets = 2)
    assert(h.rotation.count() === d.toLong)
    val q = raw.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"))
    // full probe + wide rerank: served equals exact on the fixture
    val served = AnnIndex.queryOpqIvfPq(q, h, k = 3, nProbe = 4, m = 32)
      .select("query_id", "rank", "vec_id")
      .collect().map(_.toSeq).toSet
    val exact = SimilaritySearch.bruteForceTopKAgg(q, raw, 3)
      .select("query_id", "rank", "vec_id")
      .collect().map(_.toSeq).toSet
    assert(served === exact)
    // delete through Governance.purge's composed leg (it routes to
    // the inner key); the composed query serves survivors only and
    // the audit proves it
    import graft.operators.Governance
    val scope = Governance.PurgeScope(opqIvfPq = Seq(key))
    Governance.purge(spark, Seq(0L, 1L).toDF("vec_id"), scope,
      batchId = Some(1L))
    assert(Governance.audit(spark, Seq(0L, 1L).toDF("vec_id"), scope)
      .agg(org.apache.spark.sql.functions.sum("n_served_purged"))
      .head.getLong(0) === 0L)
    val h2 = AnnIndex.openOpqIvfPq(spark, key)
    val after = AnnIndex.queryOpqIvfPq(q, h2, k = 3, nProbe = 4, m = 32)
    assert(after.filter(col("vec_id") < 2).count() === 0L)
    assert(after.count() === 12L) // 4 queries x k=3, from survivors
  }

  test("upsertOpqIvfPq: the batch rides the STORED rotation — the " +
      "upserted layout serves exact kNN over the grown corpus at " +
      "full probes; batchId replay-skips; ensure over the grown " +
      "corpus recognizes the composed fingerprint (no retrain)") {
    val key = s"opqup-$runTag"
    val d = 8
    val raw = (0 until 64).map { i =>
      (i.toLong, Array.tabulate(d)(c =>
        (math.sin(i * 1.7 + c) * math.pow(0.7, c)).toFloat))
    }.toDF("vec_id", "embedding").localCheckpoint(true)
    AnnIndex.ensureOpqIvfPq(spark, key,
      raw.filter(col("vec_id") < 48), lists = 4, iters = 2,
      numSub = 4, ksub = 16, pqIters = 2, storageBuckets = 2)
    AnnIndex.upsertOpqIvfPq(spark, key,
      raw.filter(col("vec_id") >= 48), batchId = Some(1L))
    val h = AnnIndex.openOpqIvfPq(spark, key)
    assert(h.inner.vecs.count() === 64L,
      "the upserted tail did not land in the inner store")
    val q = raw.filter(col("vec_id") % 16 === 0)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("query_vec"))
    val served = AnnIndex.queryOpqIvfPq(q, h, k = 3, nProbe = 4, m = 64)
      .select("query_id", "rank", "vec_id")
      .collect().map(_.toSeq).toSet
    val exact = SimilaritySearch.bruteForceTopKAgg(q, raw, 3)
      .select("query_id", "rank", "vec_id")
      .collect().map(_.toSeq).toSet
    assert(served === exact,
      "upserted composed serve diverged from exact kNN at full probes")
    // replay: the same batchId is skipped end-to-end
    AnnIndex.upsertOpqIvfPq(spark, key,
      raw.filter(col("vec_id") >= 48), batchId = Some(1L))
    assert(AnnIndex.openOpqIvfPq(spark, key).inner.vecs.count() === 64L,
      "a replayed upsert batch re-appended")
    // the composed outer fingerprint makes the grown corpus FRESH:
    // re-ensure must not retrain the rotation (file untouched)
    val rotFile = java.nio.file.Paths.get(
      new java.net.URI(h.rotation.inputFiles.head))
    val mtime = java.nio.file.Files.getLastModifiedTime(rotFile)
    AnnIndex.ensureOpqIvfPq(spark, key, raw, lists = 4, iters = 2,
      numSub = 4, ksub = 16, pqIters = 2, storageBuckets = 2)
    assert(java.nio.file.Files.getLastModifiedTime(rotFile) === mtime,
      "ensure over the upserted corpus retrained the rotation — the " +
        "outer fingerprint did not compose")
  }

  test("deleteOpqIvfPq invalidates the outer checksum: after the " +
      "tombstone FOLD, ensure over the pre-delete corpus REBUILDS " +
      "(re-admitting the erased ids its claimed source contains) " +
      "instead of silently reusing a layout missing the purged " +
      "vectors") {
    val key = s"opqdel-$runTag"
    val d = 8
    val raw = (0 until 64).map { i =>
      (i.toLong, Array.tabulate(d)(c =>
        (math.sin(i * 3.1 + c) * math.pow(0.7, c)).toFloat))
    }.toDF("vec_id", "embedding").localCheckpoint(true)
    AnnIndex.ensureOpqIvfPq(spark, key, raw, lists = 4, iters = 2,
      numSub = 4, ksub = 16, pqIters = 2, storageBuckets = 2)
    AnnIndex.deleteOpqIvfPq(spark, key,
      raw.filter(col("vec_id") < 8).select("vec_id"), batchId = Some(1L))
    // survivors-only serving while tombstoned (the anti-join contract)
    assert(AnnIndex.openOpqIvfPq(spark, key).inner.vecs.count() === 56L)
    // the fold removes the tombstones — the exact state the stale
    // outer fingerprint would have mis-certified as the full corpus
    AnnIndex.compactOpqIvfPq(spark, key)
    AnnIndex.ensureOpqIvfPq(spark, key, raw, lists = 4, iters = 2,
      numSub = 4, ksub = 16, pqIters = 2, storageBuckets = 2)
    val h = AnnIndex.openOpqIvfPq(spark, key)
    assert(h.inner.vecs.count() === 64L,
      "ensure over the pre-delete corpus must rebuild the purged " +
        "layout back to the claimed rows — the invalidated outer " +
        "checksum exists exactly so this cannot silently reuse")
    // and the UN-folded tombstoned state is equally un-reusable (the
    // inner tombFree probe): delete again, ensure over the survivors
    // this time — the honest rebuild direction both ways
    AnnIndex.deleteOpqIvfPq(spark, key,
      raw.filter(col("vec_id") < 8).select("vec_id"), batchId = Some(2L))
    val survivors = raw.filter(col("vec_id") >= 8)
    AnnIndex.ensureOpqIvfPq(spark, key, survivors, lists = 4, iters = 2,
      numSub = 4, ksub = 16, pqIters = 2, storageBuckets = 2)
    val h2 = AnnIndex.openOpqIvfPq(spark, key)
    assert(h2.inner.vecs.count() === 56L &&
      h2.inner.vecs.filter(col("vec_id") < 8).count() === 0L,
      "ensure over the survivors must rebuild clean (tombFree)")
  }

  test("upsertOpqIvfPq crash window (invalidate-before-append): a " +
      "torn layout — inner store ahead, outer checksum invalidated — " +
      "can never be reused by ensure; the rebuild restores exactly " +
      "the claimed corpus") {
    val key = s"opqtorn-$runTag"
    val d = 8
    val raw = (0 until 64).map { i =>
      (i.toLong, Array.tabulate(d)(c =>
        (math.cos(i * 2.3 + c) * math.pow(0.75, c)).toFloat))
    }.toDF("vec_id", "embedding").localCheckpoint(true)
    val base = raw.filter(col("vec_id") < 48)
    AnnIndex.ensureOpqIvfPq(spark, key, base, lists = 4, iters = 2,
      numSub = 4, ksub = 16, pqIters = 2, storageBuckets = 2)
    // reproduce the exact state a crash inside upsertOpqIvfPq leaves:
    // the verb invalidates the outer checksum FIRST, then the inner
    // append commits, then it dies before the final outer meta write —
    // run the full upsert and surgically roll the outer meta back to
    // the invalidated form (checksum absent, n_rows still the base's)
    AnnIndex.upsertOpqIvfPq(spark, key,
      raw.filter(col("vec_id") >= 48), batchId = Some(1L))
    val metaBase = s"${AnnIndex.annBase(spark)}" +
      s"/graft_ann_opqivfpq_${IndexStore.pathTag(key)}"
    val m = AnnIndex.readMeta(metaBase)
    AnnIndex.writeMetaFull(metaBase,
      (m - "checksum" - "n_rows").toSeq ++ Seq("n_rows" -> 48L), Nil)
    assert(AnnIndex.openOpqIvfPq(spark, key).inner.vecs.count() === 64L)
    // ensure over the PRE-upsert corpus: a checksum-less outer meta is
    // un-matchable, so this REBUILDS — under the old commit ordering
    // (outer fingerprint intact while the inner ran ahead) it would
    // have silently reused a layout serving 16 vec_ids the claimed
    // source does not contain
    AnnIndex.ensureOpqIvfPq(spark, key, base, lists = 4, iters = 2,
      numSub = 4, ksub = 16, pqIters = 2, storageBuckets = 2)
    val h = AnnIndex.openOpqIvfPq(spark, key)
    assert(h.inner.vecs.count() === 48L,
      "ensure over the pre-upsert corpus must rebuild the torn " +
        "layout down to exactly the claimed rows")
    assert(h.inner.vecs.filter(col("vec_id") >= 48).count() === 0L,
      "the torn tail must not survive the recovery rebuild")
  }
}
