package graft.sources

import graft.TestSpark
import graft.operators.LateInteraction
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PLAID-clustered late-interaction serving: identity to the full-scan
  * MaxSim at a safe margin, probe restriction semantics, assignment
  * invariants, lifecycle freshness.
  */
class PlaidIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val runTag = java.util.UUID.randomUUID.toString.take(8)

  // 4 angular clusters of chunk vectors; 3 chunks per doc, docs cycle
  // through clusters so MaxSim structure is non-trivial
  private def chunks: DataFrame = (0 until 120).map { i =>
    val doc = i / 3
    val theta = (doc % 4) * 1.5 + (i % 3) * 0.05 + (doc / 4) * 0.01
    (doc.toLong, i.toLong,
      Array(math.cos(theta).toFloat, math.sin(theta).toFloat))
  }.toDF("doc_id", "vec_id", "embedding")

  private def queryTokens: DataFrame = (1 to 3).flatMap { q =>
    (0 until 2).map { p =>
      val theta = q * 1.5 + p * 0.3
      (q.toLong, p,
        Array(math.cos(theta).toFloat, math.sin(theta).toFloat))
    }
  }.toDF("query_id", "qpos", "qvec")

  private def hits(df: DataFrame): Set[(Long, Int, Long)] =
    df.select("query_id", "rank", "doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("plaidTopK equals the full-scan MaxSim at a generous margin, " +
      "and at full probes/shortlist it is exhaustively identical") {
    val key = s"plaid-$runTag-a"
    PlaidIndex.ensurePlaid(spark, key, chunks, lists = 4, iters = 3)
    val full = hits(LateInteraction.maxSimTopK(queryTokens, chunks, k = 3))
    // full probes + full shortlist ⇒ stage 1 IS the full scan
    assert(hits(PlaidIndex.plaidTopK(spark, key, queryTokens, k = 3,
      nProbe = 4, mDocs = 40)) === full)
    // the shipped-margin shape (still generous at this fixture size)
    assert(hits(PlaidIndex.plaidTopK(spark, key, queryTokens, k = 3,
      nProbe = 2, mDocs = 8)) === full)
  }

  test("every chunk lands in exactly one list; assignment is to the " +
      "argmax-cosine centroid (ties centroid_id asc)") {
    val key = s"plaid-$runTag-b"
    val h = PlaidIndex.ensurePlaid(spark, key, chunks, lists = 4,
      iters = 3)
    assert(h.lists.count() === chunks.count())
    assert(h.lists.groupBy("vec_id").count()
      .filter(col("count") =!= 1).count() === 0)
    // stored assignment beats (or ties, id-asc) every other centroid
    val better = h.lists
      .join(h.centroids.select(col("centroid_id").as("stored_cid"),
        col("centroid_vec").as("stored_vec")),
        col("centroid_id") === col("stored_cid"))
      .crossJoin(broadcast(h.centroids
        .select(col("centroid_id").as("other_cid"),
          col("centroid_vec").as("other_vec"))))
      .withColumn("s_sim", graft.functions.VectorOps.cosine(
        col("embedding"), col("stored_vec")))
      .withColumn("o_sim", graft.functions.VectorOps.cosine(
        col("embedding"), col("other_vec")))
      .filter(col("o_sim") > col("s_sim") + 1e-12 ||
        (col("o_sim") === col("s_sim") &&
          col("other_cid") < col("stored_cid")))
    assert(better.count() === 0)
  }

  test("stage-1 scores are restricted to probed lists (lower bound of " +
      "the true per-token max) and candidates stay within probed docs") {
    val key = s"plaid-$runTag-c"
    val h = PlaidIndex.ensurePlaid(spark, key, chunks, lists = 4,
      iters = 3)
    val s1 = PlaidIndex.plaidStage1(queryTokens, h, nProbe = 1)
    val fullScores = LateInteraction.maxSimTopK(queryTokens, chunks,
      k = 40).select(col("query_id"), col("doc_id"),
      col("score").as("full_score"))
    val over = s1.join(fullScores, Seq("query_id", "doc_id"))
      .filter(col("ascore") > col("full_score") + 1e-9)
    assert(over.count() === 0,
      "probed stage-1 score exceeded the full-scan score")
  }

  test("deletePlaid: victims served nowhere, survivors exact, replayed " +
      "delete skips, ensure over the original source rebuilds clean") {
    val key = s"plaid-$runTag-del"
    PlaidIndex.ensurePlaid(spark, key, chunks, lists = 4, iters = 3)
    val victims = Seq(3L, 7L).toDF("doc_id")
    assert(PlaidIndex.deletePlaid(spark, key, victims,
      batchId = Some(1L)) === 2L)
    // replay folds away
    assert(PlaidIndex.deletePlaid(spark, key, victims,
      batchId = Some(1L)) === 2L)
    val served = PlaidIndex.plaidTopK(spark, key, queryTokens, k = 3,
      nProbe = 4, mDocs = 40)
    assert(served.filter(col("doc_id").isin(3L, 7L)).count() === 0L,
      "a deleted doc surfaced through plaid MaxSim")
    // survivor serving is EXACT at the total-coverage point
    val survivors = chunks.filter(!col("doc_id").isin(3L, 7L))
    assert(hits(served) === hits(LateInteraction.maxSimTopK(queryTokens,
      survivors, k = 3)))
    // tombstoned layout fails freshness; ensure rebuilds and clears
    PlaidIndex.ensurePlaid(spark, key, chunks, lists = 4, iters = 3)
    assert(hits(PlaidIndex.plaidTopK(spark, key, queryTokens, k = 3,
      nProbe = 4, mDocs = 40)) === hits(LateInteraction.maxSimTopK(
      queryTokens, chunks, k = 3)))
  }

  test("freshness: unchanged content reuses, changed content rebuilds; " +
      "openPlaid without an ensure fails loudly") {
    val key = s"plaid-$runTag-d"
    PlaidIndex.ensurePlaid(spark, key, chunks, lists = 4, iters = 2)
    val p = java.nio.file.Paths.get(
      s"/tmp/graft_plaid_${IndexStore.pathTag(key)}/lists")
    val m1 = java.nio.file.Files.getLastModifiedTime(p)
    PlaidIndex.ensurePlaid(spark, key, chunks, lists = 4, iters = 2)
    assert(java.nio.file.Files.getLastModifiedTime(p) === m1)
    val moved = chunks.withColumn("embedding",
      when(col("vec_id") === 0L,
        typedlit(Array(0.0f, 1.0f))).otherwise(col("embedding")))
    PlaidIndex.ensurePlaid(spark, key, moved, lists = 4, iters = 2)
    assert(java.nio.file.Files.getLastModifiedTime(p) !== m1)
    val e = intercept[IllegalArgumentException] {
      PlaidIndex.openPlaid(spark, s"plaid-$runTag-never")
    }
    assert(e.getMessage.contains("ensurePlaid"))
  }

  test("upsertPlaid: tail assigned to the STORED centroids, serving " +
      "equals the full-scan MaxSim; membership stays exactly the " +
      "lists' distinct pairs; a later ensure over the upserted corpus " +
      "reuses (the fingerprint composes)") {
    val key = s"plaid-$runTag-up"
    val baseC = chunks.filter(col("doc_id") < 30)
    val tailC = chunks.filter(col("doc_id") >= 30)
    PlaidIndex.ensurePlaid(spark, key, baseC, lists = 4, iters = 3)
    val centsBefore = spark.read.parquet(
      s"/tmp/graft_plaid_${IndexStore.pathTag(key)}/centroids")
      .collect().map(_.toString).sorted
    val h = PlaidIndex.upsertPlaid(spark, key, tailC)
    // centroids untouched: assignment-only ingest
    assert(spark.read.parquet(
      s"/tmp/graft_plaid_${IndexStore.pathTag(key)}/centroids")
      .collect().map(_.toString).sorted === centsBefore)
    assert(h.lists.count() === chunks.count())
    // the membership table COVERS the lists' distinct pairs exactly
    // (as a SET — upsert appends its batch's pairs without reading
    // the store, so a re-touched (doc, centroid) may duplicate until
    // compactPlaid folds it; every consumer takes distinct ids)
    val want = h.lists.select("doc_id", "centroid_id").distinct()
    val got = h.docCentroids.select("doc_id", "centroid_id").distinct()
    assert(got.count() === want.count())
    assert(got.exceptAll(want).count() === 0L)
    // every tail chunk sits under its argmax stored centroid: compare
    // against a fresh assignment of the full set (the q72 invariant)
    val full = hits(LateInteraction.maxSimTopK(queryTokens, chunks, k = 3))
    assert(hits(PlaidIndex.plaidTopK(spark, key, queryTokens, k = 3,
      nProbe = 4, mDocs = 40)) === full)
    // fingerprint composition: ensure over base+tail reuses, no rebuild
    val p = java.nio.file.Paths.get(
      s"/tmp/graft_plaid_${IndexStore.pathTag(key)}/lists")
    val m1 = java.nio.file.Files.getLastModifiedTime(p)
    PlaidIndex.ensurePlaid(spark, key, chunks, lists = 4, iters = 3)
    assert(java.nio.file.Files.getLastModifiedTime(p) === m1,
      "ensure over the upserted corpus rebuilt — fingerprint did not " +
        "compose")
  }

  test("upsertPlaid lifecycle guards: batchId replay-skips, the drift " +
      "gate refuses an overwhelming tail, tombstoned doc ids clash " +
      "loudly, absent layout fails loudly") {
    val key = s"plaid-$runTag-guards"
    val baseC = chunks.filter(col("doc_id") < 30)
    PlaidIndex.ensurePlaid(spark, key, baseC, lists = 4, iters = 3)
    val batch = chunks.filter(col("doc_id") === 30L)
    val h1 = PlaidIndex.upsertPlaid(spark, key, batch, batchId = Some(5L))
    val n1 = h1.lists.count()
    // replayed batch folds away — no double-append
    assert(PlaidIndex.upsertPlaid(spark, key, batch, batchId = Some(5L))
      .lists.count() === n1)
    // drift gate: base 90 rows + tail already 3; a 120-row batch would
    // take the tail past ratio 1.0
    val big = (0 until 120).map(i => (1000L + i, 10000L + i,
      Array(1.0f, 0.0f))).toDF("doc_id", "vec_id", "embedding")
    val eDrift = intercept[IllegalStateException] {
      PlaidIndex.upsertPlaid(spark, key, big)
    }
    assert(eDrift.getMessage.contains("drift gate"))
    // tombstone clash: re-adding a deleted doc must fail loudly
    PlaidIndex.deletePlaid(spark, key, Seq(2L).toDF("doc_id"))
    val eClash = intercept[IllegalArgumentException] {
      PlaidIndex.upsertPlaid(spark, key,
        chunks.filter(col("doc_id") === 2L))
    }
    assert(eClash.getMessage.contains("tombstoned"))
    val eAbsent = intercept[IllegalArgumentException] {
      PlaidIndex.upsertPlaid(spark, s"plaid-$runTag-never", batch)
    }
    assert(eAbsent.getMessage.contains("ensurePlaid"))
  }

  test("ensurePlaidUpserted is run-idempotent: second call over the " +
      "same base/tail touches nothing; a changed tail rebuilds to " +
      "base and re-upserts") {
    val key = s"plaid-$runTag-eup"
    val baseC = chunks.filter(col("doc_id") < 30)
    val tailC = chunks.filter(col("doc_id") >= 30)
    PlaidIndex.ensurePlaidUpserted(spark, key, baseC, tailC,
      lists = 4, iters = 3)
    val p = java.nio.file.Paths.get(
      s"/tmp/graft_plaid_${IndexStore.pathTag(key)}/lists")
    val m1 = java.nio.file.Files.getLastModifiedTime(p)
    val h2 = PlaidIndex.ensurePlaidUpserted(spark, key, baseC, tailC,
      lists = 4, iters = 3)
    assert(java.nio.file.Files.getLastModifiedTime(p) === m1)
    assert(h2.lists.count() === chunks.count())
    // different tail → stale combined meta → rebuild-to-base + upsert
    val tail2 = tailC.filter(col("doc_id") < 35)
    val h3 = PlaidIndex.ensurePlaidUpserted(spark, key, baseC, tail2,
      lists = 4, iters = 3)
    assert(h3.lists.count() === baseC.count() + tail2.count())
  }

  test("plaidTopKQuantized equals the full-scan MaxSim: exhaustively " +
      "at full probes/shortlist (the exact rerank absorbs int8 " +
      "rounding), and at the shipped-margin shape; stored codes are " +
      "exactly quantize_i8 of the stored embeddings") {
    import graft.functions.expressions.VectorExpressions.quantize_i8
    val key = s"plaid-$runTag-q"
    val h = PlaidIndex.ensurePlaid(spark, key, chunks, lists = 4,
      iters = 3)
    val full = hits(LateInteraction.maxSimTopK(queryTokens, chunks, k = 3))
    assert(hits(PlaidIndex.plaidTopKQuantized(spark, key, queryTokens,
      k = 3, nProbe = 4, mDocs = 40)) === full)
    assert(hits(PlaidIndex.plaidTopKQuantized(spark, key, queryTokens,
      k = 3, nProbe = 2, mDocs = 8)) === full)
    // codes parity: the stored int8 columns re-derive from the stored
    // floats — build and upsert share one withCodes definition
    PlaidIndex.upsertPlaid(spark, key, (200 until 206).map { i =>
      (100L + i / 3, 1000L + i,
        Array(math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat))
    }.toDF("doc_id", "vec_id", "embedding"))
    val mismatched = PlaidIndex.openPlaid(spark, key).lists
      .filter(col("codes") =!= quantize_i8(col("embedding")))
      .count()
    assert(mismatched === 0L,
      "stored codes drifted from quantize_i8(stored embedding)")
    // a quantized serve over the upserted layout still matches the
    // full scan over base+tail at generous margins
    val allChunks = chunks.unionByName((200 until 206).map { i =>
      (100L + i / 3, 1000L + i,
        Array(math.cos(i * 0.7).toFloat, math.sin(i * 0.7).toFloat))
    }.toDF("doc_id", "vec_id", "embedding"))
    assert(hits(PlaidIndex.plaidTopKQuantized(spark, key, queryTokens,
      k = 3, nProbe = 4, mDocs = 60)) ===
      hits(LateInteraction.maxSimTopK(queryTokens, allChunks, k = 3)))
  }

  test("plaidTopKFiltered: pre-filter semantics — top-k within the " +
      "allowed set equals the full-scan MaxSim over ONLY the allowed " +
      "docs; nothing disallowed served; a filter smaller than k " +
      "still returns every allowed doc") {
    val key = s"plaid-$runTag-f"
    PlaidIndex.ensurePlaid(spark, key, chunks, lists = 4, iters = 3)
    val allowed = (0 until 40).map(_.toLong).filter(_ % 3 != 1)
      .toDF("doc_id")
    val got = PlaidIndex.plaidTopKFiltered(spark, key, queryTokens,
      allowed, k = 3, nProbe = 4, mDocs = 40)
    assert(got.filter(col("doc_id") % 3 === 1).count() === 0L,
      "a disallowed doc surfaced through the filtered serve")
    assert(hits(got) === hits(LateInteraction.maxSimTopK(queryTokens,
      chunks.filter(col("doc_id") % 3 =!= 1), k = 3)))
    // pre-filter, not post-filter: a 2-doc allowed set fills both
    // slots instead of being starved by filtered-out top-k winners
    val tiny = Seq(17L, 31L).toDF("doc_id")
    val gotTiny = PlaidIndex.plaidTopKFiltered(spark, key, queryTokens,
      tiny, k = 2, nProbe = 4, mDocs = 40)
    assert(gotTiny.groupBy("query_id").count()
      .filter(col("count") =!= 2).count() === 0L,
      "a restrictive filter starved the top-k — post-filter semantics")
    assert(hits(gotTiny) === hits(LateInteraction.maxSimTopK(queryTokens,
      chunks.filter(col("doc_id").isin(17L, 31L)), k = 2)))
  }

  test("plaidTopKFilteredQuantized: the quantized filtered serve " +
      "equals the full-scan MaxSim over ONLY the allowed docs; " +
      "nothing disallowed served; a filter smaller than k still " +
      "fills every slot (pre-filter semantics survive quantization)") {
    val key = s"plaid-$runTag-fq"
    PlaidIndex.ensurePlaid(spark, key, chunks, lists = 4, iters = 3)
    val allowed = (0 until 40).map(_.toLong).filter(_ % 3 != 1)
      .toDF("doc_id")
    val got = PlaidIndex.plaidTopKFilteredQuantized(spark, key,
      queryTokens, allowed, k = 3, nProbe = 4, mDocs = 40)
    assert(got.filter(col("doc_id") % 3 === 1).count() === 0L,
      "a disallowed doc surfaced through the quantized filtered serve")
    assert(hits(got) === hits(LateInteraction.maxSimTopK(queryTokens,
      chunks.filter(col("doc_id") % 3 =!= 1), k = 3)))
    val tiny = Seq(17L, 31L).toDF("doc_id")
    val gotTiny = PlaidIndex.plaidTopKFilteredQuantized(spark, key,
      queryTokens, tiny, k = 2, nProbe = 4, mDocs = 40)
    assert(gotTiny.groupBy("query_id").count()
      .filter(col("count") =!= 2).count() === 0L,
      "a restrictive filter starved the quantized top-k")
    assert(hits(gotTiny) === hits(LateInteraction.maxSimTopK(queryTokens,
      chunks.filter(col("doc_id").isin(17L, 31L)), k = 2)))
  }

  test("a torn upsert retry's duplicated rows change no served answer " +
      "and compactPlaid reconciles the physical table with the " +
      "intended corpus (the (doc_id, vec_id) dedup)") {
    import org.apache.spark.sql.SaveMode
    val key = s"plaid-$runTag-torn"
    PlaidIndex.ensurePlaid(spark, key,
      chunks.filter(col("doc_id") < 33), lists = 4, iters = 3)
    PlaidIndex.upsertPlaid(spark, key,
      chunks.filter(col("doc_id") >= 33), batchId = Some(1L))
    def served() = hits(PlaidIndex.plaidTopK(spark, key, queryTokens,
      k = 3, nProbe = 4, mDocs = 40))
    val before = served()
    val nIntended = PlaidIndex.openPlaid(spark, key).lists.count()
    // simulate the documented torn window: the batch's rows re-append
    // whole (membership + lists), the state a crash between the lists
    // append and the meta commit followed by a same-batch retry leaves
    val tag = IndexStore.pathTag(key)
    val dup = spark.table(s"graft_plaid_lists_$tag")
      .filter(col("doc_id") >= 33).localCheckpoint(true)
    dup.select("doc_id", "centroid_id").distinct()
      .write.mode(SaveMode.Append).format("parquet")
      .saveAsTable(s"graft_plaid_doccent_$tag")
    dup.write.mode(SaveMode.Append).partitionBy("centroid_id")
      .format("parquet").saveAsTable(s"graft_plaid_lists_$tag")
    spark.catalog.refreshTable(s"graft_plaid_lists_$tag")
    spark.catalog.refreshTable(s"graft_plaid_doccent_$tag")
    assert(PlaidIndex.openPlaid(spark, key).lists.count() > nIntended,
      "the torn-retry simulation failed to duplicate rows")
    assert(served() === before,
      "torn-retry duplicates changed a served answer")
    PlaidIndex.compactPlaid(spark, key)
    assert(PlaidIndex.openPlaid(spark, key).lists.count() === nIntended,
      "compaction must reconcile the physical rows with the intended " +
        "corpus (meta n_rows)")
    assert(served() === before,
      "the reconciling fold changed a served answer")
  }

  test("compactPlaid folds the upsert's per-batch file sets: fewer " +
      "files, served answers byte-identical, upsert replay window " +
      "survives, tombstones NOT folded (re-cluster is the fold)") {
    val key = s"plaid-$runTag-cp"
    val baseC = chunks.filter(col("doc_id") < 25)
    PlaidIndex.ensurePlaid(spark, key, baseC, lists = 4, iters = 3)
    PlaidIndex.upsertPlaid(spark, key,
      chunks.filter(col("doc_id") >= 25 && col("doc_id") < 33),
      batchId = Some(1L))
    PlaidIndex.upsertPlaid(spark, key,
      chunks.filter(col("doc_id") >= 33), batchId = Some(2L))
    // extra chunks for EXISTING docs near their original direction:
    // their (doc, centroid) pairs re-append → doccent duplicates the
    // fold below must clear
    PlaidIndex.upsertPlaid(spark, key, (0 until 6).map { d =>
      val theta = (d % 4) * 1.5 + 0.02
      (d.toLong, 5000L + d,
        Array(math.cos(theta).toFloat, math.sin(theta).toFloat))
    }.toDF("doc_id", "vec_id", "embedding"), batchId = Some(3L))
    PlaidIndex.deletePlaid(spark, key, Seq(5L).toDF("doc_id"),
      batchId = Some(1L))
    def served() = hits(PlaidIndex.plaidTopK(spark, key, queryTokens,
      k = 3, nProbe = 4, mDocs = 40))
    val before = served()
    val h0 = PlaidIndex.openPlaid(spark, key)
    val filesBefore = (h0.lists.inputFiles ++
      h0.docCentroids.inputFiles).distinct.length
    val h1 = PlaidIndex.compactPlaid(spark, key)
    val filesAfter = (h1.lists.inputFiles ++
      h1.docCentroids.inputFiles).distinct.length
    assert(filesAfter < filesBefore,
      s"compaction must reduce files: $filesBefore -> $filesAfter")
    assert(served() === before,
      "compaction changed a served answer")
    // tombstones survive the FILE fold: the deletion fold is the
    // re-cluster, and the victim stays unserved
    assert(PlaidIndex.openPlaid(spark, key).lists
      .filter(col("doc_id") === 5L).count() === 0L)
    // the fold dedup'd the re-appended membership pairs
    val dc = PlaidIndex.openPlaid(spark, key).docCentroids
    assert(dc.count() ===
      dc.select("doc_id", "centroid_id").distinct().count(),
      "compaction left duplicate membership pairs")
    // replayed upsert batch still skips after the fold
    val n = PlaidIndex.openPlaid(spark, key).lists.count()
    PlaidIndex.upsertPlaid(spark, key,
      chunks.filter(col("doc_id") >= 33), batchId = Some(2L))
    assert(PlaidIndex.openPlaid(spark, key).lists.count() === n,
      "fold must not reopen the upsert replay window")
  }

  test("a changed chunk-to-doc mapping with identical vectors rebuilds " +
      "(the fingerprint covers doc_id)") {
    val key = s"plaid-$runTag-remap"
    PlaidIndex.ensurePlaid(spark, key, chunks, lists = 4, iters = 2)
    // same (vec_id, embedding) rows, chunks reattributed to other docs
    val remapped = chunks.withColumn("doc_id",
      (col("doc_id") + 1) % 40)
    PlaidIndex.ensurePlaid(spark, key, remapped, lists = 4, iters = 2)
    val h = PlaidIndex.openPlaid(spark, key)
    assert(h.lists.filter(col("vec_id") === 0L)
      .head.getAs[Long]("doc_id") === 1L,
      "reassigned doc_id must be served after the rebuild")
  }
}
