package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** ST1–ST6 driven as REAL streams via MemoryStream (SURVEY.md §2.9):
  * watermarked tumbling windows with late-data drop, session windows,
  * stream dedup, and the flatMapGroupsWithState session-state operator
  * with the reference's clear semantics.
  */
class StreamOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, t: String, user: Long, typ: String, v: Double) =
    StreamOps.Event(id, Timestamp.valueOf(t), user, typ, v, "{}")

  test("streaming dedup-store export: micro-batches dedup against the " +
      "persisted store; kept rows land partitioned by batch, exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.DedupStore
    val key = "stream-dedup-" + java.util.UUID.randomUUID().toString.take(8)
    val outDir = java.nio.file.Files
      .createTempDirectory("dedup_out").toString
    try {
      val mem = MemoryStream[(Long, String)]
      val q = StreamOps.streamingDedupStore(
        mem.toDF().toDF("doc_id", "text"), key, outDir).start()
      mem.addData((1L, "x x"), (2L, "x x"), (3L, "y"))
      q.processAllAvailable()
      mem.addData((4L, "x x"), (5L, "z"), (6L, "z"))
      q.processAllAvailable()
      q.stop()
      val out = spark.read.parquet(outDir)
        .select("doc_id", "batch_id").as[(Long, Long)].collect().toSet
      assert(out === Set((1L, 0L), (3L, 0L), (5L, 1L)))
      assert(DedupStore.seenCount(spark, key) === 3L)
      // compaction folds the per-batch files; answers unchanged and a
      // later batch still dedups against the folded store
      DedupStore.compactSeen(spark, key)
      val k3 = DedupStore.dedupBatch(spark, key,
        Seq((7L, "z"), (8L, "w")).toDF("doc_id", "text"), batchId = 2L)
        .select("doc_id").as[Long].collect().toSet
      assert(k3 === Set(8L))
    } finally DedupStore.drop(spark, key)
  }

  test("streaming distinct panes: micro-batched ingest serves the same " +
      "per-group sketch as a one-shot batch build — boundaries are " +
      "invisible") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.SketchStore
    import graft.operators.Sketches
    val key = "stream-kmv-" + java.util.UUID.randomUUID().toString.take(8)
    try {
      val mem = MemoryStream[(String, String)]
      val q = StreamOps.streamingDistinctPanes(
        mem.toDF().toDF("grp", "it"), key, "grp", "it", k = 8,
        seed = 5L).start()
      val r1 = (1 to 20).map(i => ("a", s"x$i")) ++
        (1 to 5).map(i => ("b", s"y$i"))
      val r2 = (15 to 30).map(i => ("a", s"x$i")) ++
        (1 to 20).map(i => ("b", s"y$i"))
      mem.addData(r1: _*)
      q.processAllAvailable()
      mem.addData(r2: _*)
      q.processAllAvailable()
      q.stop()
      val served = SketchStore.read(spark, key)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val direct = Sketches.kmvSketch((r1 ++ r2).toDF("grp", "it"),
        "grp", col("it"), 8, 5L)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(served === direct)
      assert(served("a").size === 8) // truncation live (30 distinct > k)
    } finally SketchStore.drop(spark, key)
  }

  test("streaming heavy hitters: the sketch over all triggers keeps every " +
      "guaranteed item with a bounded estimate; state is the sketch, not " +
      "the stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val out = StreamOps.streamingHeavyHitters(
      mem.toDF().toDF("item"), "item", capacity = 8)
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("hh_stream").start()
    val b1 = Seq.fill(40)("aaa") ++ (1 to 30).map(i => s"n$i")
    val b2 = Seq.fill(25)("bbb") ++ (31 to 60).map(i => s"n$i")
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    val row = spark.table("hh_stream").collect().head
    q.stop()
    val items = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val delta = row.getLong(1)
    val truth = (b1 ++ b2).groupBy(identity).view.mapValues(_.size.toLong)
    // guarantee: anything with true count > delta is present, and every
    // estimate is within [true - delta, true]
    truth.filter(_._2 > delta).foreach { case (it, c) =>
      assert(items.contains(it), s"$it (count $c) missing, delta=$delta")
    }
    items.foreach { case (it, est) =>
      val c = truth(it)
      assert(est <= c && c <= est + delta, s"$it est=$est true=$c delta=$delta")
    }
    assert(items.contains("aaa") && items.contains("bbb"))
  }

  test("streaming drift gate: an in-distribution batch scores ~0, a " +
      "shifted batch trips the 0.25 drift bar, per trigger") {
    implicit val sqlCtx = spark.sqlContext
    val ref = (1 to 200).map(i => Tuple1((i % 10).toDouble)).toDF("m")
    val mem = MemoryStream[Double]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    val q = StreamOps.streamingDriftGate(
      mem.toDF().toDF("m"), ref, "m", buckets = 4, lo = 0, hi = 10) {
      (id, psi) => got += ((id, psi))
    }.start()
    mem.addData((1 to 100).map(i => (i % 10).toDouble): _*) // same dist
    q.processAllAvailable()
    mem.addData((1 to 100).map(i => (i % 10) + 20.0): _*) // hard shift
    q.processAllAvailable()
    q.stop()
    assert(got.size === 2)
    assert(got(0)._2 < 0.1, s"in-distribution batch drifted: ${got(0)}")
    assert(got(1)._2 > 0.25, s"shifted batch not flagged: ${got(1)}")
  }

  private def runStream(name: String, events: Seq[StreamOps.Event],
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      outputMode: String = "append"): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = build(mem.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode(outputMode)
      .start()
    mem.addData(events: _*)
    q.processAllAvailable()
    // a second, far-future batch advances the watermark so closed
    // windows flush in append mode
    mem.addData(ev(9999, "2024-06-01 00:00:00", 999, "flush", 0.0))
    q.processAllAvailable()
    q.stop()
    spark.table(name).collect().toSeq
  }

  test("ST1+ST3: watermarked tumbling window aggregates and drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.windowedAgg(mem.toDF(), "10 minutes", None, "10 minutes")
      .writeStream.format("memory").queryName("st1_out")
      .outputMode("append").start()
    // batch 1 establishes the watermark at 01:30 - 10m = 01:20
    mem.addData(
      ev(1, "2024-01-01 00:05:00", 1, "click", 1.0),
      ev(2, "2024-01-01 00:07:00", 1, "click", 2.0),
      ev(3, "2024-01-01 01:30:00", 2, "view", 5.0))
    q.processAllAvailable()
    // batch 2: event-time 00:01 < watermark → dropped (ST3)
    mem.addData(ev(4, "2024-01-01 00:01:00", 1, "click", 100.0))
    q.processAllAvailable()
    // batch 3 pushes the watermark far ahead so all windows flush
    mem.addData(ev(9999, "2024-06-01 00:00:00", 999, "flush", 0.0))
    q.processAllAvailable()
    q.stop()
    val clicks = spark.table("st1_out").collect().toSeq
      .filter(_.getString(2) == "click")
    assert(clicks.size === 1)
    assert(clicks.head.getLong(3) === 2L) // the late 100.0 event is NOT counted
    assert(clicks.head.getDouble(4) === 3.0)
  }

  test("ST2: session window merges events within the gap") {
    val events = Seq(
      ev(1, "2024-01-01 00:00:00", 1, "a", 1.0),
      ev(2, "2024-01-01 00:10:00", 1, "a", 1.0), // same session (10m < 30m)
      ev(3, "2024-01-01 01:00:00", 1, "a", 1.0), // 50m gap → new session
      ev(4, "2024-01-01 00:00:00", 2, "a", 1.0))
    val rows = runStream("st2_out", events,
      df => StreamOps.sessionWindowAgg(df, "30 minutes", "30 minutes"))
    val u1 = rows.filter(_.getLong(2) == 1L)
    assert(u1.map(_.getLong(3)).sorted === Seq(1L, 2L))
  }

  test("ST6: streaming dedup by event_id") {
    val events = Seq(
      ev(1, "2024-01-01 00:00:00", 1, "a", 1.0),
      ev(1, "2024-01-01 00:00:30", 1, "a", 1.0), // duplicate id
      ev(2, "2024-01-01 00:01:00", 1, "a", 1.0))
    val rows = runStream("st6_out", events,
      df => StreamOps.dedupEvents(df, "10 minutes")
        .groupBy().count().toDF("n"), outputMode = "complete")
    assert(rows.last.getLong(0) === 3L) // 2 uniques + the flush event
  }

  test("S7: events fixture replays as a real stream and aggregates like batch") {
    val q = StreamOps.windowedAgg(
        StreamOps.eventsStream(spark, graft.TestSpark.Sf0001), "1 hour")
      .writeStream.format("memory").queryName("s7_out")
      .outputMode("complete") // complete mode: every window in the result table
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val total = spark.table("s7_out").agg(sum("n")).collect().head.getLong(0)
    assert(total === 1000L) // all sf0.001 events arrived through the stream
  }

  test("streaming parquet sink: windowed agg lands on disk with a checkpoint") {
    val out = java.nio.file.Files.createTempDirectory("graft_stream_out")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt")
    val q = StreamOps.windowedAgg(
        StreamOps.eventsStream(spark, graft.TestSpark.Sf0001), "1 hour",
        None, "0 seconds") // zero lateness: every window closes at EOF
      .writeStream.format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val written = spark.read.parquet(out.toString)
    // append mode only emits windows the watermark has passed; with the
    // fixture's 30-day span all but the final hour's windows flush
    assert(written.count() > 0)
    assert(written.columns.toSeq ==
      Seq("window_start", "window_end", "event_type", "n", "sum_value"))
  }

  test("streaming retrieval: per-batch results equal the batch retrieve") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "spark joins shuffle data across partitions for the merge"),
      (2L, "vector indexes answer similarity queries with cosine scores"),
      (3L, "completely unrelated cooking recipe with flour and sugar"))
      .toDF("doc_id", "text")
    val index = graft.rag.RagPipeline.buildIndex(spark, docs, chunkSize = 60)
      .cache()
    val queryRows = Seq(1L -> "spark shuffle merge", 2L -> "cosine vector query")
    val expected = graft.rag.RagPipeline
      .retrieve(queryRows.toDF("query_id", "query_text"), index, k = 2)
      .select("query_id", "rank", "chunk_id").collect().map(_.toSeq).toSet

    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val q = StreamOps.streamingRetrieve(
      mem.toDF().toDF("query_id", "query_text"), index, k = 2) {
      (batch, _) =>
        got ++= batch.select("query_id", "rank", "chunk_id")
          .collect().map(_.toSeq)
    }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    mem.addData(queryRows: _*)
    q.awaitTermination(120000)
    assert(got.toSet === expected)
  }

  test("end-to-end persisted-index streams: vectors upserted in one " +
      "stream are served to the next query batch of the other") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.AnnIndex
    val emb = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select("vec_id", "embedding")
    val src = s"stream-e2e-${java.util.UUID.randomUUID().toString.take(8)}"
    // index the base 90%; the 10% tail arrives by stream
    AnnIndex.ensureLsh(spark, src,
      emb.filter(col("vec_id") % 10 =!= 7), tables = 16, bits = 6)
    val tail = emb.filter(col("vec_id") % 10 === 7)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    // stream 1: ingest the tail into the persisted index
    val vecsIn = MemoryStream[(Long, Array[Float])]
    val ingest = StreamOps.streamingIndexUpsert(
      vecsIn.toDF().toDF("vec_id", "embedding"), src, tables = 16, bits = 6)
      .start()
    vecsIn.addData(tail.toIndexedSeq: _*)
    ingest.processAllAvailable()
    ingest.stop()

    // stream 2: query with the upserted vectors themselves
    val queryRows = tail.take(8).map { case (id, v) => (id, v) }
    val qIn = MemoryStream[(Long, Array[Float])]
    val got = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val ask = StreamOps.streamingIndexRetrieve(
      qIn.toDF().toDF("query_id", "query_vec"), src, k = 4, probes = 8) {
      (batch, _) =>
        got ++= batch.select("query_id", "rank", "vec_id")
          .collect().map(_.toSeq)
    }.start()
    qIn.addData(queryRows.toIndexedSeq: _*)
    ask.processAllAvailable()
    ask.stop()

    // every stream-ingested vector is findable: self-match at rank 1
    val rank1 = got.filter(_(1) == 1).map(r => r(0) -> r(2)).toMap
    assert(queryRows.forall { case (id, _) => rank1.get(id).contains(id) },
      s"missing self-matches: $rank1")
    // and the streamed results equal the batch path on the same index
    val batchExpected = AnnIndex.queryLsh(
      queryRows.toSeq.toDF("query_id", "query_vec"),
      AnnIndex.openLsh(spark, src), k = 4, probes = 8)
      .select("query_id", "rank", "vec_id").collect().map(_.toSeq).toSet
    assert(got.toSet === batchExpected)
  }

  test("end-to-end persisted SQ8 streams: streamed quantized appends " +
      "converge to the full index and serve the exact kNN") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.AnnIndex
    import graft.operators.SimilaritySearch
    val emb = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select("vec_id", "embedding")
    val src = s"stream-sq8-${java.util.UUID.randomUUID().toString.take(8)}"
    AnnIndex.ensureSq8(spark, src, emb.filter(col("vec_id") % 10 =!= 7))
    val tail = emb.filter(col("vec_id") % 10 === 7)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    val vecsIn = MemoryStream[(Long, Array[Float])]
    val ingest = StreamOps.streamingSq8Upsert(
      vecsIn.toDF().toDF("vec_id", "embedding"), src).start()
    vecsIn.addData(tail.toIndexedSeq: _*)
    ingest.processAllAvailable()
    ingest.stop()

    // the streamed index answers EXACTLY like a brute-force scan of the
    // full vector set (upsert ≡ rebuild by construction + q103 identity)
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = SimilaritySearch.bruteForceTopK(q, emb, k = 4)
      .select("query_id", "rank", "vec_id").collect().map(_.toSeq).toSet

    val qIn = MemoryStream[(Long, Array[Float])]
    val got = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val ask = StreamOps.streamingSq8Retrieve(
      qIn.toDF().toDF("query_id", "query_vec"), src, k = 4, m = 32) {
      (batch, _) =>
        got ++= batch.select("query_id", "rank", "vec_id")
          .collect().map(_.toSeq)
    }.start()
    qIn.addData(q.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray)).toIndexedSeq: _*)
    ask.processAllAvailable()
    ask.stop()
    assert(got.toSet === exact)
  }

  test("streamingSq8Delete: a streamed id feed tombstones the persisted " +
      "index; serving answers exact-kNN-minus-deleted") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.AnnIndex
    import graft.operators.SimilaritySearch
    val emb = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select("vec_id", "embedding")
    val src = s"stream-sq8del-${java.util.UUID.randomUUID().toString.take(8)}"
    AnnIndex.ensureSq8(spark, src, emb)

    val idsIn = MemoryStream[Long]
    val del = StreamOps.streamingSq8Delete(
      idsIn.toDF().toDF("vec_id"), src).start()
    idsIn.addData(0L to 7L: _*)
    del.processAllAvailable()
    del.stop()

    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val expected = SimilaritySearch.bruteForceTopK(q,
        emb.filter(col("vec_id") >= 8), k = 4)
      .select("query_id", "rank", "vec_id").collect().map(_.toSeq).toSet
    val served = AnnIndex.querySq8(q, AnnIndex.openSq8(spark, src),
        k = 4, m = 32)
      .select("query_id", "rank", "vec_id").collect().map(_.toSeq).toSet
    assert(served === expected)
  }

  test("streaming IVF-PQ twins: streamed stored-model appends converge " +
      "and the streamed query serves the composed path") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.AnnIndex
    import graft.operators.SimilaritySearch
    val emb = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select("vec_id", "embedding")
    val src = s"stream-ivfpq-${java.util.UUID.randomUUID().toString.take(8)}"
    val h0 = AnnIndex.ensureIvfPq(spark, src,
      emb.filter(col("vec_id") % 10 =!= 7), lists = 8, iters = 2,
      numSub = 16, ksub = 64, pqIters = 2)
    val tail = emb.filter(col("vec_id") % 10 === 7)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    val vecsIn = MemoryStream[(Long, Array[Float])]
    val ingest = StreamOps.streamingIvfPqUpsert(
      vecsIn.toDF().toDF("vec_id", "embedding"), src).start()
    vecsIn.addData(tail.toIndexedSeq: _*)
    ingest.processAllAvailable()
    ingest.stop()

    // streamed layout ≡ a full stored-model assignment over all vectors
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val expected = SimilaritySearch.ivfPqTopK(q, emb, h0.centroids,
        k = 4, nProbe = 3, m = 64, numSub = 16, ksub = 64,
        codebooks = Some(h0.codebook))
      .select("query_id", "rank", "vec_id").collect().map(_.toSeq).toSet

    val qIn = MemoryStream[(Long, Array[Float])]
    val got = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val ask = StreamOps.streamingIvfPqRetrieve(
      qIn.toDF().toDF("query_id", "query_vec"), src, k = 4, nProbe = 3,
      m = 64) { (batch, _) =>
      got ++= batch.select("query_id", "rank", "vec_id")
        .collect().map(_.toSeq)
    }.start()
    qIn.addData(q.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray)).toIndexedSeq: _*)
    ask.processAllAvailable()
    ask.stop()
    assert(got.toSet === expected)
  }

  test("streaming composed deletes: streamed tombstone feeds serve " +
      "composed-kNN-minus-deleted on IVF-SQ8 and IVF-PQ, parity with " +
      "batch delete") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.AnnIndex
    import graft.operators.SimilaritySearch
    val emb = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val survivors = emb.filter(col("vec_id") >= 8)
    val tag = java.util.UUID.randomUUID().toString.take(8)

    val src1 = s"stream-ivfsq8del-$tag"
    val h1 = AnnIndex.ensureIvfSq8(spark, src1, emb, lists = 8, iters = 3)
    val ids1 = MemoryStream[Long]
    val del1 = StreamOps.streamingIvfSq8Delete(
      ids1.toDF().toDF("vec_id"), src1).start()
    ids1.addData(0L to 7L: _*)
    del1.processAllAvailable()
    del1.stop()
    val exp1 = SimilaritySearch.ivfTopK(q, survivors, h1.centroids,
        k = 4, nProbe = 3)
      .select("query_id", "rank", "vec_id").collect().map(_.toSeq).toSet
    assert(AnnIndex.queryIvfSq8(q, AnnIndex.openIvfSq8(spark, src1),
        k = 4, nProbe = 3, m = 16)
      .select("query_id", "rank", "vec_id").collect().map(_.toSeq).toSet
      === exp1)
    // a replayed delete batch (same micro-batch id) is skipped: replay
    // the SAME stream from a fresh MemoryStream at batch id 0 with
    // different ids — the counter already covers id 0, nothing appends
    val tombsBefore = spark.read.parquet(
      s"/tmp/graft_ann_ivfsq8_${graft.sources.IndexStore.pathTag(src1)}/tombs")
      .count()
    val ids1r = MemoryStream[Long]
    val del1r = StreamOps.streamingIvfSq8Delete(
      ids1r.toDF().toDF("vec_id"), src1).start()
    ids1r.addData(8L, 9L)
    del1r.processAllAvailable()
    del1r.stop()
    assert(spark.read.parquet(
      s"/tmp/graft_ann_ivfsq8_${graft.sources.IndexStore.pathTag(src1)}/tombs")
      .count() === tombsBefore,
      "a replayed delete micro-batch id must be skipped")

    val src2 = s"stream-ivfpqdel-$tag"
    val h2 = AnnIndex.ensureIvfPq(spark, src2, emb, lists = 8, iters = 2)
    val ids2 = MemoryStream[Long]
    val del2 = StreamOps.streamingIvfPqDelete(
      ids2.toDF().toDF("vec_id"), src2).start()
    ids2.addData(0L to 7L: _*)
    del2.processAllAvailable()
    del2.stop()
    val exp2 = SimilaritySearch.ivfTopK(q, survivors, h2.centroids,
        k = 4, nProbe = 3)
      .select("query_id", "rank", "vec_id").collect().map(_.toSeq).toSet
    assert(AnnIndex.queryIvfPq(q, AnnIndex.openIvfPq(spark, src2),
        k = 4, nProbe = 3, m = 128)
      .select("query_id", "rank", "vec_id").collect().map(_.toSeq).toSet
      === exp2)
  }

  test("end-to-end persisted BQ streams: streamed 1-bit appends " +
      "converge, streamed queries serve, streamed tombstones delete") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.AnnIndex
    import graft.operators.SimilaritySearch
    import graft.functions.expressions.VectorExpressions.tile_jitter
    val tiled = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select(col("vec_id"),
        tile_jitter(col("vec_id"), col("embedding"), reps = 24,
          sigma = 2.0).as("embedding"))
      .localCheckpoint(true)
    val src = s"stream-bq-${java.util.UUID.randomUUID().toString.take(8)}"
    AnnIndex.ensureBq(spark, src, tiled.filter(col("vec_id") % 10 =!= 7))
    val tail = tiled.filter(col("vec_id") % 10 === 7)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    val vecsIn = MemoryStream[(Long, Array[Float])]
    val ingest = StreamOps.streamingBqUpsert(
      vecsIn.toDF().toDF("vec_id", "embedding"), src).start()
    vecsIn.addData(tail.toIndexedSeq: _*)
    ingest.processAllAvailable()
    ingest.stop()

    val q = tiled.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = SimilaritySearch.bruteForceTopK(q, tiled, k = 4)
      .select("query_id", "rank", "vec_id").collect().map(_.toSeq).toSet
    val qIn = MemoryStream[(Long, Array[Float])]
    val got = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val ask = StreamOps.streamingBqRetrieve(
      qIn.toDF().toDF("query_id", "query_vec"), src, k = 4, m = 256) {
      (batch, _) =>
        got ++= batch.select("query_id", "rank", "vec_id")
          .collect().map(_.toSeq)
    }.start()
    qIn.addData(q.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray)).toIndexedSeq: _*)
    ask.processAllAvailable()
    ask.stop()
    assert(got.toSet === exact)

    // streamed tombstones: serving answers exact-kNN-minus-deleted
    val idsIn = MemoryStream[Long]
    val del = StreamOps.streamingBqDelete(
      idsIn.toDF().toDF("vec_id"), src).start()
    idsIn.addData(0L to 7L: _*)
    del.processAllAvailable()
    del.stop()
    val expectedDel = SimilaritySearch.bruteForceTopK(q,
        tiled.filter(col("vec_id") >= 8), k = 4)
      .select("query_id", "rank", "vec_id").collect().map(_.toSeq).toSet
    assert(AnnIndex.queryBq(q, AnnIndex.openBq(spark, src), k = 4,
        m = 256)
      .select("query_id", "rank", "vec_id").collect().map(_.toSeq).toSet
      === expectedDel)
  }

  test("streaming IVF-BQ twins: streamed stored-centroid appends " +
      "converge, streamed queries serve the composed path, streamed " +
      "tombstones delete") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.AnnIndex
    import graft.operators.SimilaritySearch
    import graft.functions.expressions.VectorExpressions.tile_jitter
    val tiled = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select(col("vec_id"),
        tile_jitter(col("vec_id"), col("embedding"), reps = 24,
          sigma = 2.0).as("embedding"))
      .localCheckpoint(true)
    val src = s"stream-ivfbq-${java.util.UUID.randomUUID().toString.take(8)}"
    val h0 = AnnIndex.ensureIvfBq(spark, src,
      tiled.filter(col("vec_id") % 10 =!= 7), lists = 8, iters = 3)
    val tail = tiled.filter(col("vec_id") % 10 === 7)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    val vecsIn = MemoryStream[(Long, Array[Float])]
    val ingest = StreamOps.streamingIvfBqUpsert(
      vecsIn.toDF().toDF("vec_id", "embedding"), src, lists = 8,
      iters = 3).start()
    vecsIn.addData(tail.toIndexedSeq: _*)
    ingest.processAllAvailable()
    ingest.stop()

    val q = tiled.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val expected = SimilaritySearch.ivfBqTopK(q, tiled, h0.centroids,
        k = 4, nProbe = 4, m = 256)
      .select("query_id", "rank", "vec_id").collect().map(_.toSeq).toSet
    val qIn = MemoryStream[(Long, Array[Float])]
    val got = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val ask = StreamOps.streamingIvfBqRetrieve(
      qIn.toDF().toDF("query_id", "query_vec"), src, k = 4, nProbe = 4,
      m = 256) { (batch, _) =>
      got ++= batch.select("query_id", "rank", "vec_id")
        .collect().map(_.toSeq)
    }.start()
    qIn.addData(q.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray)).toIndexedSeq: _*)
    ask.processAllAvailable()
    ask.stop()
    assert(got.toSet === expected)

    val idsIn = MemoryStream[Long]
    val del = StreamOps.streamingIvfBqDelete(
      idsIn.toDF().toDF("vec_id"), src).start()
    idsIn.addData(0L to 7L: _*)
    del.processAllAvailable()
    del.stop()
    val expDel = SimilaritySearch.ivfTopK(q,
        tiled.filter(col("vec_id") >= 8), h0.centroids, k = 4, nProbe = 4)
      .select("query_id", "rank", "vec_id").collect().map(_.toSeq).toSet
    assert(AnnIndex.queryIvfBq(q, AnnIndex.openIvfBq(spark, src),
        k = 4, nProbe = 4, m = 256)
      .select("query_id", "rank", "vec_id").collect().map(_.toSeq).toSet
      === expDel)
  }

  test("streamingContractGate: passing rows land in main, violations " +
      "in quarantine (never dropped), one audit row per trigger") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("contractgate").toString
    val (mainD, quarD, audD) =
      (s"$base/main", s"$base/quarantine", s"$base/audit")
    val mem = MemoryStream[(Long, Double)]
    val q = StreamOps.streamingContractGate(
      mem.toDF().toDF("id", "value"), col("value") <= 10.0,
      mainD, quarD, audD).start()
    mem.addData((1L, 5.0), (2L, 15.0), (3L, 7.0))
    q.processAllAvailable()
    mem.addData((4L, 25.0), (5L, 1.0))
    q.processAllAvailable()
    q.stop()
    val main = spark.read.parquet(mainD).select("id").as[Long]
      .collect().toSet
    val quar = spark.read.parquet(quarD).select("id").as[Long]
      .collect().toSet
    assert(main === Set(1L, 3L, 5L))
    assert(quar === Set(2L, 4L))
    val audit = spark.read.parquet(audD)
      .select("batch_id", "n_rows", "n_violations")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(audit === Set((0L, 3L, 1L), (1L, 2L, 1L)))
    // REPLAY idempotence (the manifestBatch discipline): a restarted
    // stream re-running already-committed trigger ids against the same
    // dirs SKIPS them — the trusted main output never double-counts
    val mem2 = MemoryStream[(Long, Double)]
    val q2 = StreamOps.streamingContractGate(
      mem2.toDF().toDF("id", "value"), col("value") <= 10.0,
      mainD, quarD, audD).start()
    mem2.addData((1L, 5.0), (2L, 15.0), (3L, 7.0)) // replayed batch 0
    q2.processAllAvailable()
    mem2.addData((4L, 25.0), (5L, 1.0)) // replayed batch 1
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.parquet(mainD).count() === 3L)
    assert(spark.read.parquet(quarD).count() === 2L)
    assert(spark.read.parquet(audD).count() === 2L)
    // replay-skip is CONTENT-VERIFIED (the manifestBatch discipline):
    // a fresh-checkpoint stream (ids restart at 0) carrying DIFFERENT
    // content at a committed id must fail loudly, never silently drop
    // new data from the trusted main output
    val mem3 = MemoryStream[(Long, Double)]
    val q3 = StreamOps.streamingContractGate(
      mem3.toDF().toDF("id", "value"), col("value") <= 10.0,
      mainD, quarD, audD).start()
    mem3.addData((100L, 2.0), (101L, 3.0)) // NEW data at batch id 0
    val ex = intercept[
        org.apache.spark.sql.streaming.StreamingQueryException] {
      q3.processAllAvailable()
    }
    q3.stop()
    assert(ex.getCause.getMessage.contains("NOT a replay"))
    assert(spark.read.parquet(mainD).count() === 3L) // nothing landed
  }

  test("streamingPurge: an erasure-request stream purges per trigger " +
      "with the logged compliance trail; a restarted stream's " +
      "replayed ids return stored proofs, never re-run") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Governance
    import graft.sources.DedupStore
    val key = s"spurge-${java.util.UUID.randomUUID.toString.take(8)}"
    val logDir = java.nio.file.Files
      .createTempDirectory("spurgelog").toString
    val docs = (0 until 20).map(i => (i.toLong, s"body $i unique"))
      .toDF("doc_id", "text")
    DedupStore.dedupBatch(spark, key, docs, batchId = 1L)
    val scope = Governance.PurgeScope(dedupSeen = Seq(key))
    val mem = MemoryStream[Long]
    val q = StreamOps.streamingPurge(
      mem.toDF().toDF("doc_id"), scope, logDir).start()
    mem.addData(0L, 1L)
    q.processAllAvailable()
    mem.addData(2L)
    q.processAllAvailable()
    q.stop()
    assert(DedupStore.seenCount(spark, key) === 17L)
    assert(Governance.readPurgeLog(spark, logDir, "roster")
      .count() === 3L)
    assert(Governance.readPurgeLog(spark, logDir, "audit")
      .agg(sum("n_served_purged")).head.getLong(0) === 0L)
    // restarted stream, trigger ids from 0: replays skip, the store
    // and the trail are untouched
    val mem2 = MemoryStream[Long]
    val q2 = StreamOps.streamingPurge(
      mem2.toDF().toDF("doc_id"), scope, logDir).start()
    mem2.addData(0L, 1L)
    q2.processAllAvailable()
    q2.stop()
    assert(DedupStore.seenCount(spark, key) === 17L)
    assert(Governance.readPurgeLog(spark, logDir, "roster")
      .count() === 3L)
    DedupStore.drop(spark, key)
  }

  test("streamingManifest: running totals equal the batch manifest at " +
      "every trigger boundary; a replayed batch id never double-counts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Lineage
    val store = java.nio.file.Files
      .createTempDirectory("manifest").toString
    val docs = graft.Tables.load(spark, TestSpark.Sf0001, "documents")
      .select("doc_id", "text")
    val rows = docs.as[(Long, String)].collect()
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val mem = MemoryStream[(Long, String)]
    val canon = concat_ws(":", col("doc_id"), col("text"))
    val q = StreamOps.streamingManifest(
      mem.toDF().toDF("doc_id", "text"), store, canon).start()
    mem.addData(b1.toIndexedSeq: _*)
    q.processAllAvailable()
    val mid = Lineage.readManifest(store)
    val expectedMid = Lineage.tableManifest("t",
        docs.filter(col("doc_id").isin(b1.map(r => Long.box(r._1)): _*)),
        canon).head
    assert(mid._1 === expectedMid.getLong(1))
    assert(mid._2 === BigInt(expectedMid.getString(2)))
    mem.addData(b2.toIndexedSeq: _*)
    q.processAllAvailable()
    q.stop()
    val fin = Lineage.readManifest(store)
    val expectedAll = Lineage.tableManifest("t", docs, canon).head
    assert(fin._1 === expectedAll.getLong(1))
    assert(fin._2 === BigInt(expectedAll.getString(2)))
    // a replayed earlier micro-batch id is skipped, not double-counted
    Lineage.manifestBatch(store, docs.limit(3).toDF(), canon,
      batchId = 0L)
    assert(Lineage.readManifest(store) === fin)
    // a replay of the LAST id with identical content verifies + no-ops
    Lineage.manifestBatch(store,
      docs.filter(col("doc_id").isin(b2.map(r => Long.box(r._1)): _*))
        .toDF(), canon, batchId = 1L)
    assert(Lineage.readManifest(store) === fin)
    // a restarted batch counter (same id, different content) refuses
    val ex = intercept[IllegalArgumentException] {
      Lineage.manifestBatch(store, docs.limit(3).toDF(), canon,
        batchId = 1L)
    }
    assert(ex.getMessage.contains("NOT a replay"))
    // a present-but-garbled manifest fails LOUDLY — defaulting a
    // missing field to 0 would silently re-fold earlier batches and
    // corrupt the documented-exact running totals
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(store, "_manifest.json"),
      """{"n_rows": 12""") // truncated mid-write shape
    val corrupt = intercept[IllegalStateException] {
      Lineage.readManifest(store)
    }
    assert(corrupt.getMessage.contains("corrupt manifest"))
  }

  test("streamingScd2: closed intervals across any trigger split equal " +
      "the batch operator; no-op changes fold; monotone contract " +
      "refused loudly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val feed = Seq(
      StreamOps.ChangeRow(1L, ts("2024-01-01 00:00:00"), "bronze"),
      StreamOps.ChangeRow(1L, ts("2024-01-02 00:00:00"), "bronze"), // no-op
      StreamOps.ChangeRow(1L, ts("2024-01-03 00:00:00"), "gold"),
      StreamOps.ChangeRow(2L, ts("2024-01-02 00:00:00"), "gold"),
      StreamOps.ChangeRow(1L, ts("2024-01-05 00:00:00"), "silver"),
      StreamOps.ChangeRow(2L, ts("2024-01-06 00:00:00"), "bronze"),
      // sentinel changes close every open interval so the streamed
      // CLOSED set is complete and comparable to the batch operator
      StreamOps.ChangeRow(1L, ts("2024-02-01 00:00:00"), "__end"),
      StreamOps.ChangeRow(2L, ts("2024-02-01 00:00:00"), "__end"))
    val batchExpected = graft.operators.Scd2.fromChanges(
        feed.toDF(), "key", "ts", Seq("value"))
      .filter(col("valid_to").isNotNull && col("value") =!= "__end")
      .select("key", "value", "valid_from", "valid_to")
      .collect().map(_.toSeq).toSet
    // split the feed mid-key-history (rows 0-3 | rest): state must
    // carry the open interval across the trigger boundary
    val mem = MemoryStream[StreamOps.ChangeRow]
    val out = StreamOps.streamingScd2(spark, mem.toDS())
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("scd2_out").start()
    mem.addData(feed.take(4): _*)
    q.processAllAvailable()
    mem.addData(feed.drop(4): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("scd2_out")
      .filter(col("value") =!= "__end")
      .select("key", "value", "valid_from", "valid_to")
      .collect().map(_.toSeq).toSet
    assert(streamed === batchExpected)
    // an EXACT duplicate of the opening change (same ts, same value) is
    // normal at-least-once CDC redelivery: folds as a no-op, matching
    // the batch operator — the stream must NOT fail
    val memDup = MemoryStream[StreamOps.ChangeRow]
    val qDup = StreamOps.streamingScd2(spark, memDup.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("scd2_dup").start()
    memDup.addData(StreamOps.ChangeRow(8L, ts("2024-01-05 00:00:00"), "a"))
    qDup.processAllAvailable()
    memDup.addData( // redelivered opening change, then a real change
      StreamOps.ChangeRow(8L, ts("2024-01-05 00:00:00"), "a"),
      StreamOps.ChangeRow(8L, ts("2024-01-07 00:00:00"), "b"))
    qDup.processAllAvailable()
    qDup.stop()
    assert(spark.table("scd2_dup").select("key", "value", "valid_from",
        "valid_to").collect().map(_.toSeq).toSet ===
      Set(Seq(8L, "a", ts("2024-01-05 00:00:00"),
        ts("2024-01-07 00:00:00"))))
    // a change at-or-before the open interval breaks the per-key
    // monotone CDC contract and must fail the trigger loudly
    val mem2 = MemoryStream[StreamOps.ChangeRow]
    val q2 = StreamOps.streamingScd2(spark, mem2.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("scd2_bad").start()
    mem2.addData(StreamOps.ChangeRow(9L, ts("2024-01-05 00:00:00"), "a"))
    q2.processAllAvailable()
    mem2.addData(StreamOps.ChangeRow(9L, ts("2024-01-01 00:00:00"), "b"))
    val ex = intercept[Exception] { q2.processAllAvailable() }
    assert(ex.getMessage != null)
    q2.stop()
    // same ts as the open interval but a DIFFERENT value is a genuine
    // history rewrite, not a redelivery — still refused loudly
    val mem3 = MemoryStream[StreamOps.ChangeRow]
    val q3 = StreamOps.streamingScd2(spark, mem3.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("scd2_bad2").start()
    mem3.addData(StreamOps.ChangeRow(7L, ts("2024-01-05 00:00:00"), "a"))
    q3.processAllAvailable()
    mem3.addData(StreamOps.ChangeRow(7L, ts("2024-01-05 00:00:00"), "b"))
    val ex3 = intercept[Exception] { q3.processAllAvailable() }
    assert(ex3.getMessage != null)
    q3.stop()
  }

  test("streamingGraphUpsert: micro-batched vectors are searched into " +
      "the persisted graph per trigger; a restarted stream's replayed " +
      "trigger ids skip; the ingested nodes serve") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.sources.GraphIndex
    val key = s"graphs-${java.util.UUID.randomUUID.toString.take(8)}"
    def vec(i: Long) = {
      val theta = (i % 4) * 1.5 + (i / 4) * 0.01
      (i, Array(math.cos(theta).toFloat, math.sin(theta).toFloat))
    }
    GraphIndex.ensureGraph(spark, key,
      (0L until 40L).map(vec).toDF("vec_id", "embedding"),
      k = 4, rounds = 2, blockSize = 16, maxDegree = 12)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamOps.streamingGraphUpsert(
      mem.toDF().toDF("vec_id", "embedding"), key, beam = 8,
      rounds = 2).start()
    mem.addData(vec(40L), vec(41L))
    q.processAllAvailable()
    mem.addData(vec(42L), vec(43L))
    q.processAllAvailable()
    q.stop()
    assert(GraphIndex.openGraph(spark, key).vecs.count() === 44L)
    // restarted stream replays trigger ids from 0: the store skips
    val mem2 = MemoryStream[(Long, Array[Float])]
    val q2 = StreamOps.streamingGraphUpsert(
      mem2.toDF().toDF("vec_id", "embedding"), key, beam = 8,
      rounds = 2).start()
    mem2.addData(vec(40L), vec(41L))
    q2.processAllAvailable()
    q2.stop()
    assert(GraphIndex.openGraph(spark, key).vecs.count() === 44L)
    // an ingested node serves: probe just past cluster 0's far edge —
    // streamed node 40 sits at theta .10, base cluster-0 stops at .09,
    // so the nearest neighbor of theta .104 is the streamed node
    val th = 0.104
    val got = GraphIndex.queryGraph(spark, key,
      Seq((9L, Array(math.cos(th).toFloat, math.sin(th).toFloat)))
        .toDF("query_id", "query_vec"), k = 1, beam = 8, rounds = 3)
      .select("vec_id").as[Long].collect()
    assert(got.toSeq === Seq(40L))
  }

  test("streamingScd2Store: micro-batch CDC merges land in the " +
      "persisted dimension; at any trigger boundary the store equals " +
      "fromChanges over everything ingested; replayed ids skip") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val key = s"scd2s-${java.util.UUID.randomUUID.toString.take(8)}"
    val feed = Seq(
      (1L, ts("2024-01-01 00:00:00"), "bronze"),
      (2L, ts("2024-01-02 00:00:00"), "gold"),
      (1L, ts("2024-01-03 00:00:00"), "gold"),
      (1L, ts("2024-01-05 00:00:00"), "silver"),
      (2L, ts("2024-01-06 00:00:00"), "bronze"))
    val (b1, b2) = feed.splitAt(3)
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = StreamOps.streamingScd2Store(
      mem.toDF().toDF("user_id", "ts", "tier"), key, "user_id", "ts",
      Seq("tier")).start()
    mem.addData(b1: _*)
    q.processAllAvailable()
    def dimSet() = graft.sources.Scd2Store.readDim(spark, key)
      .select("user_id", "tier", "valid_from", "valid_to")
      .collect().map(_.toSeq).toSet
    def expect(rows: Seq[(Long, java.sql.Timestamp, String)]) =
      graft.operators.Scd2.fromChanges(
          rows.toDF("user_id", "ts", "tier"), "user_id", "ts",
          Seq("tier"))
        .select("user_id", "tier", "valid_from", "valid_to")
        .collect().map(_.toSeq).toSet
    assert(dimSet() === expect(b1))
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val full = dimSet()
    assert(full === expect(feed))
    // a restarted stream (fresh ids from 0) replays committed ids —
    // the store skips them and the dimension is unchanged
    val mem2 = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q2 = StreamOps.streamingScd2Store(
      mem2.toDF().toDF("user_id", "ts", "tier"), key, "user_id", "ts",
      Seq("tier")).start()
    mem2.addData(b1: _*)
    q2.processAllAvailable()
    q2.stop()
    assert(dimSet() === full)
    graft.sources.Scd2Store.drop(spark, key)
  }

  test("streamingSplitAssign: micro-batched corpus increments get " +
      "write-once splits; later triggers adopt stored cluster splits; " +
      "a restarted stream's replayed ids skip") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val key = s"splits-${java.util.UUID.randomUUID.toString.take(8)}"
    // static edge set; each trigger contributes the edges touching it
    val edges = Seq((2L, 4L), (1L, 2L)).toDF("doc_id_a", "doc_id_b")
      .localCheckpoint(true)
    def pairsOf(b: org.apache.spark.sql.DataFrame) = edges
      .join(b.select(col("doc_id").as("doc_id_a")), Seq("doc_id_a"),
        "left_semi")
      .unionByName(edges.join(b.select(col("doc_id").as("doc_id_b")),
        Seq("doc_id_b"), "left_semi").select("doc_id_a", "doc_id_b"))
      .dropDuplicates()
    val mem = MemoryStream[Long]
    val q = StreamOps.streamingSplitAssign(
      mem.toDF().toDF("doc_id"), key, pairsOf).start()
    mem.addData(2L, 4L, 6L)
    q.processAllAvailable()
    val snap = graft.sources.SplitStore.read(spark, key)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2)))).toMap
    assert(snap.keySet === Set(2L, 4L, 6L))
    assert(snap(2L) === snap(4L)) // shared cluster {2,4}
    mem.addData(1L)
    q.processAllAvailable()
    q.stop()
    val fin = graft.sources.SplitStore.read(spark, key)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2)))).toMap
    assert(fin(1L) === snap(2L)) // adopted the committed assignment
    snap.foreach { case (d, v) => assert(fin(d) === v) }
    // restarted stream, ids from 0: replayed ids skip, state unchanged
    val mem2 = MemoryStream[Long]
    val q2 = StreamOps.streamingSplitAssign(
      mem2.toDF().toDF("doc_id"), key, pairsOf).start()
    mem2.addData(2L, 4L, 6L)
    q2.processAllAvailable()
    q2.stop()
    assert(graft.sources.SplitStore.read(spark, key).count() === 4L)
    graft.sources.SplitStore.drop(spark, key)
  }

  test("streamingSplitAssign onConflict=quarantine: a cross-split " +
      "conflict trigger quarantines the component, admits the rest, " +
      "and the STREAM SURVIVES (batch/stream parity on the admitted " +
      "set); the default refusal kills the stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.sources.SplitStore
    // engineer singletons 1 (train) and 2 (test) — the SplitStoreSpec
    // conflict fixture, driven as a stream
    def bucket(rep: Long, sd: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hx = md.digest(s"$rep:$sd".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      java.lang.Long.parseLong(hx, 16) % 10
    }
    val sd = (0L to 5000L).find(s =>
      bucket(1L, s) < 8 && bucket(2L, s) == 9).get
    val edges = Seq((3L, 1L), (3L, 2L)).toDF("doc_id_a", "doc_id_b")
      .localCheckpoint(true)
    def pairsOf(b: org.apache.spark.sql.DataFrame) = edges
      .join(b.select(col("doc_id").as("doc_id_a")), Seq("doc_id_a"),
        "left_semi")
    val key = s"splitsq-${java.util.UUID.randomUUID.toString.take(8)}"
    val mem = MemoryStream[Long]
    val q = StreamOps.streamingSplitAssign(
      mem.toDF().toDF("doc_id"), key, pairsOf, seed = sd,
      onConflict = "quarantine").start()
    mem.addData(1L, 2L)
    q.processAllAvailable()
    mem.addData(3L, 4L) // 3 links train-1 and test-2; 4 is clean
    q.processAllAvailable() // the stream SURVIVES the conflict
    mem.addData(5L) // and keeps ingesting
    q.processAllAvailable()
    q.stop()
    val assigned = SplitStore.read(spark, key)
      .select("doc_id").as[Long].collect().toSet
    assert(assigned === Set(1L, 2L, 4L, 5L))
    assert(SplitStore.readConflicts(spark, key)
      .select("doc_id").as[Long].collect().toSet === Set(3L))
    // batch/stream parity on the admitted set: the batch verb with the
    // same triggers produces the identical assignment rows
    val bkey = s"$key-batch"
    val noP = edges.limit(0)
    SplitStore.assign(spark, bkey, Seq(1L, 2L).toDF("doc_id"), noP,
      seed = sd, batchId = 0L)
    SplitStore.assign(spark, bkey, Seq(3L, 4L).toDF("doc_id"),
      edges, seed = sd, batchId = 1L, onConflict = "quarantine")
    SplitStore.assign(spark, bkey, Seq(5L).toDF("doc_id"), noP,
      seed = sd, batchId = 2L)
    val a = SplitStore.read(spark, key)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    val b = SplitStore.read(spark, bkey)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(a === b)
    // the default refusal: same conflict kills the stream loudly
    val key2 = s"$key-refuse"
    val mem2 = MemoryStream[Long]
    val q2 = StreamOps.streamingSplitAssign(
      mem2.toDF().toDF("doc_id"), key2, pairsOf, seed = sd).start()
    mem2.addData(1L, 2L)
    q2.processAllAvailable()
    mem2.addData(3L)
    val ex = intercept[
        org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    q2.stop()
    assert(ex.getCause.getMessage.contains("leakage"))
    SplitStore.drop(spark, key); SplitStore.drop(spark, bkey)
    SplitStore.drop(spark, key2)
  }

  test("streamingChat: the reference's ask loop end-to-end — history " +
      "conditions the next batch's retrieval; clear resets it") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "spark joins shuffle data across partitions for the merge step"),
      (2L, "vector indexes answer similarity queries with cosine scores"),
      (3L, "watermarks bound event time state in streaming aggregation"))
      .toDF("doc_id", "text")
    val index = graft.rag.RagPipeline.buildIndex(spark, docs, chunkSize = 60)
      .cache()
    val got = scala.collection.mutable.Map[Long, Seq[(Long, String, String)]]()
    val mem = MemoryStream[(Long, Long, String)]
    val q = StreamOps.streamingChat(
      mem.toDF().toDF("query_id", "user_id", "question"), index, k = 2) {
      (batch, id) =>
        got(id) = batch.select("query_id", "question", "answer")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
          .toSeq
    }.start()
    // batch 0: no history — answers come from the bare question
    mem.addData((1L, 7L, "spark shuffle merge"))
    q.processAllAvailable()
    // batch 1: user 7's history must now prefix the condensed query —
    // so the SAME question retrieves like the batch-path augmented query
    mem.addData((2L, 7L, "cosine vector query"))
    q.processAllAvailable()
    // batch 2: clear, then ask again in a later batch
    mem.addData((3L, 7L, "clear"))
    q.processAllAvailable()
    mem.addData((4L, 7L, "cosine vector query"))
    q.processAllAvailable()
    q.stop()

    def batchAnswer(queryText: String): String =
      graft.rag.RagPipeline.postProcess(
        graft.rag.RagPipeline.assembleContext(
          graft.rag.RagPipeline.retrieve(
            Seq((99L, queryText)).toDF("query_id", "query_text"), index, 2))
          .withColumnRenamed("context", "answer"))
        .select("answer").head().getString(0)

    val a1 = got(0).head._3
    assert(a1 === batchAnswer("spark shuffle merge"))
    // batch 1's condensed query = "q1 a1 q2" (one prior turn)
    val a2 = got(1).head._3
    assert(a2 === batchAnswer(s"spark shuffle merge $a1 cosine vector query"))
    // after clear, the same question answers as if fresh
    val a4 = got(3).head._3
    assert(a4 === batchAnswer("cosine vector query"))
    // and history genuinely mattered: the pre-clear answer used it
    assert(got(1).head._2 === "cosine vector query")
  }

  test("streamingChat serves the ask loop through the HYBRID " +
      "(dense+BM25 RRF) retriever when plugged in") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "spark joins shuffle data across partitions for the merge step"),
      (2L, "vector indexes answer similarity queries with cosine scores"),
      (3L, "watermarks bound event time state in streaming aggregation"))
      .toDF("doc_id", "text")
    val index = graft.rag.RagPipeline.buildIndex(spark, docs, chunkSize = 60)
      .cache()
    val got = scala.collection.mutable.Map[Long, Seq[(Long, String)]]()
    val mem = MemoryStream[(Long, Long, String)]
    val q = StreamOps.streamingChat(
      mem.toDF().toDF("query_id", "user_id", "question"), index, k = 2,
      retriever = graft.rag.RagPipeline.hybridRetrieve(_, _, _)) {
      (batch, id) =>
        got(id) = batch.select("query_id", "answer")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    }.start()
    mem.addData((1L, 7L, "spark shuffle merge"))
    q.processAllAvailable()
    q.stop()
    val expected = graft.rag.RagPipeline.postProcess(
      graft.rag.RagPipeline.assembleContext(
        graft.rag.RagPipeline.hybridRetrieve(
          Seq((99L, "spark shuffle merge")).toDF("query_id", "query_text"),
          index, 2))
        .withColumnRenamed("context", "answer"))
      .select("answer").head().getString(0)
    assert(got(0).head._2 === expected)
  }

  test("streamingChat serves the ask loop from the PERSISTED index pair " +
      "(LSH buckets + BM25 postings) via persistedHybridRetriever") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "spark joins shuffle data across partitions for the merge step"),
      (2L, "vector indexes answer similarity queries with cosine scores"),
      (3L, "watermarks bound event time state in streaming aggregation"))
      .toDF("doc_id", "text")
    val index = graft.rag.RagPipeline.buildIndex(spark, docs, chunkSize = 60)
      .cache()
    val srcDir = "memfix!chatpersist"
    val got = scala.collection.mutable.Map[Long, Seq[(Long, String)]]()
    val mem = MemoryStream[(Long, Long, String)]
    val q = StreamOps.streamingChat(
      mem.toDF().toDF("query_id", "user_id", "question"), index, k = 2,
      retriever = StreamOps.persistedHybridRetriever(srcDir)) {
      (batch, id) =>
        got(id) = batch.select("query_id", "answer")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    }.start()
    mem.addData((1L, 7L, "spark shuffle merge"))
    q.processAllAvailable()
    q.stop()
    // the streaming answer must equal the BATCH persisted-pair answer on
    // the same stored layouts (the fingerprint-reuse path) — streaming
    // adds plumbing, never a different ranking
    val expected = graft.rag.RagPipeline.postProcess(
      graft.rag.RagPipeline.assembleContext(
        graft.rag.RagPipeline.hybridRetrievePersisted(spark, srcDir,
          Seq((99L, "spark shuffle merge")).toDF("query_id", "query_text"),
          index, 2))
        .withColumnRenamed("context", "answer"))
      .select("answer").head().getString(0)
    assert(got(0).head._2 === expected)
    index.unpersist()
  }

  test("streamingChat serves the ask loop from the PERSISTED PLAID " +
      "layout (quantized two-stage late interaction) — answers " +
      "byte-identical to the full-scan-MaxSim chat loop across " +
      "history-conditioned batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.LateInteraction
    import org.apache.spark.sql.DataFrame
    val docs = Seq(
      (1L, "spark joins shuffle data across partitions for the merge step"),
      (2L, "vector indexes answer similarity queries with cosine scores"),
      (3L, "watermarks bound event time state in streaming aggregation"),
      (4L, "broadcast joins avoid the shuffle for small dimension tables"))
      .toDF("doc_id", "text")
    val index = graft.rag.RagPipeline.buildIndex(spark, docs, chunkSize = 60)
      .cache()
    // the identity twin: full-scan MaxSim over every chunk, same
    // doc-level context assembly — the reference ranking the quantized
    // clustered serve must reproduce at a covering operating point
    val fullScan: (DataFrame, DataFrame, Int) => DataFrame =
      (queries, idx, k) =>
        LateInteraction.maxSimTopK(LateInteraction.queryTokens(queries),
          idx.select(col("doc_id"), col("chunk_id").as("vec_id"),
            col("embedding")), k)
          .join(StreamOps.docConcatText(idx), Seq("doc_id"))
          .select("query_id", "rank", "doc_id", "score", "text")
    val srcDir = "memfix!chatplaid"
    def runLoop(retr: (DataFrame, DataFrame, Int) => DataFrame)
        : Map[Long, Seq[(Long, String)]] = {
      val got = scala.collection.mutable.Map[Long, Seq[(Long, String)]]()
      val mem = MemoryStream[(Long, Long, String)]
      val q = StreamOps.streamingChat(
        mem.toDF().toDF("query_id", "user_id", "question"), index, k = 2,
        retriever = retr) { (batch, id) =>
        got(id) = batch.select("query_id", "answer")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
          .sortBy(_._1)
      }.start()
      mem.addData((1L, 7L, "spark shuffle merge"), (2L, 8L, "cosine vector"))
      q.processAllAvailable()
      // batch 1 retrieves through user 7's HISTORY-conditioned query —
      // the longer token stream also rides the quantized stage 1
      mem.addData((3L, 7L, "watermark streaming state"))
      q.processAllAvailable()
      q.stop()
      got.toMap
    }
    // nProbe covers all 4 lists and mDocs covers the corpus: the
    // stage-1 margin argument is vacuous at spec scale by construction
    // (the measured margins live in MaxSimTune), so any diff is a
    // plumbing bug, not an operating-point miss
    val servedPlaid = runLoop(StreamOps.persistedPlaidRetriever(srcDir,
      nProbe = 4, mDocs = 8, lists = 4))
    val servedFull = runLoop(fullScan)
    assert(servedPlaid === servedFull,
      "the persisted-PLAID chat loop diverged from the full-scan " +
        "MaxSim chat loop")
    // and the layout genuinely served: it exists with the corpus rows
    assert(graft.sources.PlaidIndex.plaidExists(spark, srcDir))
    index.unpersist()
  }

  test("streaming adaptive profiles: incremental (sum, count) state " +
      "equals the batch VectorMeanAgg profile; adaptive retrieval " +
      "through the streamed profiles matches the batch path") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.UserQuestion]
    val q = StreamOps.streamingProfiles(spark, mem.toDS())
      .writeStream.format("memory").queryName("profiles_out")
      .outputMode("append").start()
    def t(s: String) = Timestamp.valueOf(s)
    mem.addData(
      StreamOps.UserQuestion(7L, t("2024-01-01 10:00:00"),
        "customer order value table"),
      StreamOps.UserQuestion(8L, t("2024-01-01 10:00:01"),
        "window agg batch row"))
    q.processAllAvailable()
    // a second batch extends user 7's profile incrementally
    mem.addData(StreamOps.UserQuestion(7L, t("2024-01-01 10:05:00"),
      "orders revenue report"))
    q.processAllAvailable()
    q.stop()
    val latest = spark.table("profiles_out").as[StreamOps.UserProfile]
      .collect().groupBy(_.user_id).map(_._2.maxBy(_.n_questions)).toSeq
    val hist = Seq(
      (7L, "customer order value table"), (7L, "orders revenue report"),
      (8L, "window agg batch row")).toDF("user_id", "question")
    val batch = graft.rag.RagPipeline.profilesOf(hist)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(latest.map(_.user_id).toSet === batch.keySet)
    latest.foreach { p =>
      val b = batch(p.user_id)
      assert(p.profile_vec.length === b.length)
      p.profile_vec.zip(b).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-9,
          s"user ${p.user_id}: streamed $x vs batch $y")
      }
    }
    // serving equality: adaptive retrieval through the STREAMED profiles
    // ranks identically to the batch path recomputing from raw history
    val docs = Seq(
      (1L, "customer order revenue value in the orders table"),
      (2L, "window aggregation over rows in a batch"),
      (3L, "vector similarity index answers cosine queries"))
      .toDF("doc_id", "text")
    val index = graft.rag.RagPipeline.buildIndex(spark, docs, chunkSize = 60)
      .cache()
    val queries = Seq((1L, 7L, "data processing"), (2L, 8L, "data processing"))
      .toDF("query_id", "user_id", "query_text")
    val profDf = spark.createDataset(latest)
      .select(col("user_id"), col("profile_vec"))
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "chunk_id")
        .as[(Long, Int, Long)].collect().toSet
    val viaStream = hits(graft.rag.RagPipeline.adaptiveRetrieveWithProfiles(
      queries, profDf, index, k = 2, alpha = 0.3))
    val viaBatch = hits(graft.rag.RagPipeline.adaptiveRetrieve(
      queries, hist, index, k = 2, alpha = 0.3))
    assert(viaStream === viaBatch)
    // the full serving composition — incrementally-maintained profiles
    // blended against the PERSISTED LSH index — returns the same rows:
    // neither the profiles nor the index are recomputed per call
    val dir = java.nio.file.Files
      .createTempDirectory("adpt_stream_persist").toString
    val viaPersisted = hits(graft.rag.RagPipeline
      .adaptiveRetrievePersistedWithProfiles(spark, dir, queries, profDf,
        index, k = 2, alpha = 0.3))
    assert(viaPersisted === viaBatch)
    // ...and through the QUANTIZED composed serving path too: streamed
    // profiles blended against the persisted SQ8 codes (q151's identity
    // closed over incrementally-maintained state)
    val viaQuantized = hits(graft.rag.RagPipeline
      .adaptiveRetrieveQuantizedWithProfiles(spark, dir + "!q", queries,
        profDf, index, k = 2, alpha = 0.3))
    assert(viaQuantized === viaBatch)
    index.unpersist()
  }

  test("ST4/ST5: per-session state accumulates and clear resets") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val out = StreamOps.sessionState(spark, mem.toDS(), maxTypes = 3)
    val q = out.writeStream.format("memory").queryName("st4_out")
      .outputMode("append").start()
    mem.addData(
      ev(1, "2024-01-01 00:00:00", 1, "signup", 1.0),
      ev(2, "2024-01-01 00:01:00", 1, "click", 2.0))
    q.processAllAvailable()
    mem.addData(ev(3, "2024-01-01 00:02:00", 1, "purchase", 4.0))
    q.processAllAvailable()
    mem.addData(ev(4, "2024-01-01 00:03:00", 1, "clear", 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("st4_out")
      .select("n_events", "sum_value", "last_types")
      .as[(Long, Double, Seq[String])].collect()
    // batch 1: accumulated 2 events; batch 2: 3 events total (state carried)
    assert(rows.contains((2L, 3.0, Seq("signup", "click"))))
    assert(rows.contains((3L, 7.0, Seq("signup", "click", "purchase"))))
    // batch 3: clear resets to empty
    assert(rows.contains((0L, 0.0, Seq.empty[String])))
  }

  test("ST4 TTL: idle session state expires after the watermark passes its timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val out = StreamOps.sessionState(spark, mem.toDS(), maxTypes = 3,
      stateTtlMs = 60000L, watermark = "1 minute")
    val q = out.writeStream.format("memory").queryName("st4_ttl_out")
      .outputMode("append").start()
    mem.addData(ev(1, "2024-01-01 00:00:00", 1, "click", 1.0))
    q.processAllAvailable()
    // another user's far-future events advance the watermark well past
    // user 1's last_ts + TTL; the second batch (no user-1 data) lets the
    // EventTimeTimeout fire and evict user 1's state
    mem.addData(ev(2, "2024-01-01 12:00:00", 2, "view", 1.0))
    q.processAllAvailable()
    mem.addData(ev(3, "2024-01-01 12:01:00", 2, "view", 1.0))
    q.processAllAvailable()
    // user 1 returns: state must have been reset — n_events restarts at 1
    mem.addData(ev(4, "2024-01-01 12:02:00", 1, "click", 5.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("st4_ttl_out")
      .filter(col("user_id") === 1L)
      .select("n_events", "sum_value")
      .as[(Long, Double)].collect().toSeq
    assert(rows.contains((1L, 1.0))) // before expiry
    assert(rows.contains((1L, 5.0))) // fresh state after expiry
    assert(!rows.contains((2L, 6.0))) // state did NOT survive the TTL
  }

  test("streamingBudgetAdmit: trigger-by-trigger verdicts equal the " +
      "batch prefix rule; a budget crossed mid-stream stays closed " +
      "across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.BudgetDoc]
    val out = StreamOps.streamingBudgetAdmit(spark, mem.toDS(), budget = 100L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("budget_stream").start()
    // source A: 40+40 admitted in trigger 1; the 30 in trigger 2
    // overflows (110) and CLOSES A — the later 5 must stay rejected.
    // source B: stays under budget throughout.
    mem.addData(
      StreamOps.BudgetDoc("A", 1L, 40L), StreamOps.BudgetDoc("A", 2L, 40L),
      StreamOps.BudgetDoc("B", 3L, 50L))
    q.processAllAvailable()
    mem.addData(
      StreamOps.BudgetDoc("A", 4L, 30L), StreamOps.BudgetDoc("A", 5L, 5L),
      StreamOps.BudgetDoc("B", 6L, 45L))
    q.processAllAvailable()
    val got = spark.table("budget_stream")
      .select("doc_id", "cum_tok", "admitted")
      .as[(Long, Long, Boolean)].collect().toSet
    q.stop()
    assert(got === Set(
      (1L, 40L, true), (2L, 80L, true), (3L, 50L, true),
      (4L, 110L, false), (5L, 115L, false), (6L, 95L, true)))
    // parity with the batch operator over the same docs in doc_id order
    val batchDocs = Seq(
      ("A", 1L, "w " * 40), ("A", 2L, "w " * 40), ("B", 3L, "w " * 50),
      ("A", 4L, "w " * 30), ("A", 5L, "w " * 5), ("B", 6L, "w " * 45))
      .toDF("source", "doc_id", "text")
    val batch = graft.operators.CorpusOps
      .budgetAdmit(batchDocs, "source", "doc_id", budget = 100L)
      .select("doc_id", "cum_tok", "admitted")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(batch === got)
  }

  test("streamingFunnel: first-match chain across triggers equals the " +
      "batch funnel; a click before the first view never counts; the " +
      "entry-anchored window cuts late conversions; converted stays " +
      "converted") {
    implicit val sqlCtx = spark.sqlContext
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val mem = MemoryStream[StreamOps.FunnelEvent]
    val out = StreamOps.streamingFunnel(spark, mem.toDS(),
      steps = Seq("view", "click", "purchase"),
      withinMicros = Some(10L * 60 * 1000000)) // 10 minutes
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("funnel_stream").start()
    // user 1: click at :01 BEFORE its first view at :02 -> that click
    //         must not count; the :05 click and :08 purchase do.
    // user 2: view :00, click :03, purchase at :15 -> outside the
    //         10-min window anchored at :00 -> cut.
    // user 3: view only.
    mem.addData(
      StreamOps.FunnelEvent(1L, "click", t(1)),
      StreamOps.FunnelEvent(1L, "view", t(2)),
      StreamOps.FunnelEvent(2L, "view", t(0)),
      StreamOps.FunnelEvent(3L, "view", t(4)))
    q.processAllAvailable()
    mem.addData(
      StreamOps.FunnelEvent(1L, "click", t(5)),
      StreamOps.FunnelEvent(2L, "click", t(3)), // LATE vs contract? no:
      // user 2's trigger-2 rows are still after its trigger-1 rows
      StreamOps.FunnelEvent(1L, "purchase", t(8)),
      StreamOps.FunnelEvent(2L, "purchase", t(15)),
      StreamOps.FunnelEvent(1L, "view", t(9))) // already past step 1
    q.processAllAvailable()
    val hits = spark.table("funnel_stream")
      .select("user_id", "step", "step_name")
      .as[(Long, Int, String)].collect().toSet
    q.stop()
    assert(hits === Set(
      (1L, 1, "view"), (1L, 2, "click"), (1L, 3, "purchase"),
      (2L, 1, "view"), (2L, 2, "click"),
      (3L, 1, "view")))
    // parity: batch funnelCounts over the same events
    val all = Seq(
      (1L, "click", t(1)), (1L, "view", t(2)), (2L, "view", t(0)),
      (3L, "view", t(4)), (1L, "click", t(5)), (2L, "click", t(3)),
      (1L, "purchase", t(8)), (2L, "purchase", t(15)), (1L, "view", t(9)))
      .toDF("user_id", "event_type", "ts")
    val batch = graft.operators.Funnel.funnelCounts(all,
        Seq("view", "click", "purchase"), within = Some("10 minutes"))
      .select("step", "n_users").as[(Int, Long)].collect().toMap
    val streamCounts = hits.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(batch === streamCounts)
  }

  test("streamingSamplePerGroup: every snapshot equals the batch " +
      "deterministic sample over everything ingested so far; state " +
      "bounded at k; re-delivery folds idempotently") {
    implicit val sqlCtx = spark.sqlContext
    def batchSample(keys: Seq[Long]): Seq[Long] =
      graft.operators.CorpusOps.samplePerGroup(
          keys.map(k => (k, "g")).toDF("doc_id", "grp"),
          "grp", k = 3, key = col("doc_id"), seed = 11L)
        .orderBy("rank").select("key").as[Long].collect().toSeq
    val mem = MemoryStream[StreamOps.SampleItem]
    val out = StreamOps.streamingSamplePerGroup(spark, mem.toDS(),
      k = 3, seed = 11L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sample_stream").start()
    val t1 = (0L until 10L)
    val t2 = (10L until 25L)
    mem.addData(t1.map(StreamOps.SampleItem("g", _)): _*)
    q.processAllAvailable()
    // trigger 2 includes a REDELIVERY of key 0 — must not change ranks
    mem.addData((t2 :+ 0L).map(StreamOps.SampleItem("g", _)): _*)
    q.processAllAvailable()
    val snaps = spark.table("sample_stream")
      .as[StreamOps.SampleSnapshot].collect()
      .map(s => s.seq_no -> s.keys.toSeq).toMap
    q.stop()
    assert(snaps(1L) === batchSample(t1))
    assert(snaps(2L) === batchSample(t1 ++ t2))
    assert(snaps.values.forall(_.size <= 3))
  }

  test("end-to-end PLAID streams: streamed chunk ingest extends the " +
      "clustered layout (assignment to stored centroids) and the " +
      "quantized retrieve stream serves the full-scan MaxSim answers; " +
      "a restarted-ingest replay folds away") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.PlaidIndex
    import graft.operators.LateInteraction
    def chunkRows(from: Int, until: Int) = (from until until).map { i =>
      val doc = i / 3
      val theta = (doc % 4) * 1.5 + (i % 3) * 0.05 + (doc / 4) * 0.01
      (doc.toLong, i.toLong,
        Array(math.cos(theta).toFloat, math.sin(theta).toFloat))
    }
    val src = s"stream-plaid-${java.util.UUID.randomUUID().toString.take(8)}"
    PlaidIndex.ensurePlaid(spark,
      src, chunkRows(0, 90).toDF("doc_id", "vec_id", "embedding"),
      lists = 4, iters = 3)
    val tail = chunkRows(90, 120)
    val in = MemoryStream[(Long, Long, Array[Float])]
    val ingest = StreamOps.streamingPlaidUpsert(
      in.toDF().toDF("doc_id", "vec_id", "embedding"), src).start()
    in.addData(tail.toIndexedSeq: _*)
    ingest.processAllAvailable()
    ingest.stop()
    val n = PlaidIndex.openPlaid(spark, src).lists.count()
    assert(n === 120L, s"streamed tail missing from the layout: $n")
    // retrieve through the quantized serving stream
    val qTokens = (1 to 3).flatMap { q =>
      (0 until 2).map { p =>
        val theta = q * 1.5 + p * 0.3
        (q.toLong, p,
          Array(math.cos(theta).toFloat, math.sin(theta).toFloat))
      }
    }
    val qIn = MemoryStream[(Long, Int, Array[Float])]
    val got = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val ask = StreamOps.streamingPlaidRetrieve(
      qIn.toDF().toDF("query_id", "qpos", "qvec"), src, k = 3,
      nProbe = 4, mDocs = 40) { (batch, _) =>
      got ++= batch.select("query_id", "rank", "doc_id")
        .collect().map(_.toSeq)
    }.start()
    qIn.addData(qTokens.toIndexedSeq: _*)
    ask.processAllAvailable()
    ask.stop()
    val expected = LateInteraction.maxSimTopK(
        qTokens.toDF("query_id", "qpos", "qvec"),
        chunkRows(0, 120).toDF("doc_id", "vec_id", "embedding"), k = 3)
      .select("query_id", "rank", "doc_id").collect().map(_.toSeq).toSet
    assert(got.toSet === expected,
      "streamed quantized PLAID serving diverged from the full scan")
    // a restarted ingest replays its trigger ids: the layout must not
    // double-append (foreachBatch exactly-once contract)
    val in2 = MemoryStream[(Long, Long, Array[Float])]
    val replay = StreamOps.streamingPlaidUpsert(
      in2.toDF().toDF("doc_id", "vec_id", "embedding"), src).start()
    in2.addData(tail.toIndexedSeq: _*)
    replay.processAllAvailable()
    replay.stop()
    assert(PlaidIndex.openPlaid(spark, src).lists.count() === 120L,
      "restarted ingest re-applied a replayed batch")
  }
}
