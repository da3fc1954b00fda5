package graft.operators

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Dedup (A9), as-of join (J6), sessionization and similarity-search
  * invariants on hand-built inputs with known answers.
  */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("exact dedup keeps min doc_id per identical text") {
    val d = docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y", 4L -> "a b c")
    val out = Dedup.exact(d).select("keep_doc_id", "n_copies")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 3L, 3L -> 1L))
  }

  test("ngram jaccard finds the near-identical pair and only it") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",
      3L -> "completely unrelated text with different words entirely")
    val out = Dedup.ngramJaccard(d, k = 3, threshold = 0.3)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)))
  }

  test("hot-shingle skew: the doc-frequency cap bounds candidate blowup, exact unions survive") {
    // 100 docs share ONE ubiquitous shingle (hot1 hot2 hot3) and are
    // otherwise unique; one planted near-dup pair shares many rare
    // shingles. At 100x scale the hot shingle alone would make the
    // shingle equi-join quadratic on that key.
    val filler = (1 to 100).map(i =>
      (i.toLong, s"hot1 hot2 hot3 u${i}a u${i}b u${i}c u${i}d"))
    val planted = Seq(
      200L -> "rare alpha beta gamma delta epsilon zeta eta",
      201L -> "rare alpha beta gamma delta epsilon zeta theta")
    val d = (filler ++ planted).toDF("doc_id", "text")

    // uncapped: every filler pair is a candidate via the hot shingle and
    // passes a low threshold -> quadratic output (C(100,2) hot pairs)
    val uncapped = Dedup.ngramJaccard(d, k = 3, threshold = 0.05,
      maxShingleDocFreq = 1000L)
      .select("doc_id_a", "doc_id_b", "jaccard")
      .as[(Long, Long, Double)].collect()
    assert(uncapped.length === 100 * 99 / 2 + 1)

    // capped at 16: the hot shingle identifies nothing and is dropped
    // from candidate generation -> only the planted pair remains
    val capped = Dedup.ngramJaccard(d, k = 3, threshold = 0.05,
      maxShingleDocFreq = 16L)
      .select("doc_id_a", "doc_id_b", "jaccard")
      .as[(Long, Long, Double)].collect()
    assert(capped.map(p => (p._1, p._2)).toSet === Set((200L, 201L)))

    // capping prunes candidates only — the emitted jaccard keeps the
    // EXACT union size, so surviving pairs score identically
    val plantedUncapped = uncapped.find(p => p._1 == 200L && p._2 == 201L).get
    assert(capped.head._3 === plantedUncapped._3)
  }

  test("minhash LSH candidates contain the high-jaccard pair (recall)") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta iota",
      3L -> "one two three four five six seven eight")
    val out = Dedup.minHashLsh(d, k = 2, numHashes = 32, bands = 16,
      threshold = 0.3)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 2L)))
    assert(!out.contains((1L, 3L)) && !out.contains((2L, 3L)))
  }

  test("property: TopKAgg equals the window top-k on adversarial random data") {
    import graft.functions.expressions.TopKAgg.top_k
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 5) {
      val n = 200 + round * 100
      // few distinct scores -> dense ties; unique ids; one singleton
      // group smaller than k
      val rows = (1 to n).map { i =>
        (rnd.nextInt(12).toLong, (rnd.nextInt(7) * 0.125), i.toLong)
      } :+ ((99L, 1.0, 0L))
      val df = rows.toDF("g", "score", "id")
      val k = 1 + round % 4
      val viaAgg = df.groupBy("g")
        .agg(top_k(col("score"), col("id"), k).as("topk"))
        .select(col("g"), posexplode(col("topk")).as(Seq("pos", "hit")))
        .select(col("g"), (col("pos") + 1).cast("int").as("rank"),
          col("hit.id").as("id"), col("hit.score").as("score"))
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      val w = Window.partitionBy("g").orderBy(desc("score"), asc("id"))
      val viaWindow = df
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("g", "rank", "id", "score")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(viaAgg === viaWindow, s"round $round k=$k")
    }
  }

  test("TopKAgg with fewer rows than k returns all rows ranked") {
    import graft.functions.expressions.TopKAgg.top_k
    val df = Seq((1L, 0.9, 10L), (1L, 0.5, 11L))
      .toDF("query_id", "score", "vec_id")
      .groupBy("query_id")
      .agg(top_k(col("score"), col("vec_id"), 4).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
    val rows = df.select(col("pos"), col("hit.id"))
      .as[(Int, Long)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq((0, 10L), (1, 11L)))
  }

  test("as-of with right side entirely after left times yields all nulls") {
    val ev = Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00"), 7L))
      .toDF("event_id", "ts", "user_id")
    val ord = Seq((7L, Timestamp.valueOf("2025-01-01 00:00:00"), 100L))
      .toDF("o_custkey", "o_orderdate", "o_orderkey")
    val native = graft.plans.AsOfJoinPlan.asOfNative(spark, ev, ord,
      "user_id", "o_custkey", "ts", "o_orderdate", Seq("o_orderkey"), "o_orderkey")
    val row = native.select("o_orderkey").collect().head
    assert(row.isNullAt(0))
  }

  test("cluster assignment: chains merge to min id, singletons keep their id") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 4L))
      .toDF("doc_id_a", "doc_id_b")
    val out = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L, 4L -> 4L, 9L -> 4L))
  }

  test("clusters converges on a chain within maxIter, fails loudly beyond it") {
    // a 9-node chain: min label 1 walks one hop per round -> 8 rounds
    val chain = (1 to 8).map(i => (i.toLong, (i + 1).toLong))
      .toDF("doc_id_a", "doc_id_b")
    val ok = Dedup.clusters(chain, maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(ok.values.toSet === Set(1L))
    // insufficient rounds must throw, not return mid-propagation labels
    intercept[IllegalStateException] {
      Dedup.clusters(chain, maxIter = 3)
    }
  }

  test("simhash: identical texts hamming 0; near texts < far texts") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "alpha beta gamma delta epsilon zeta eta iota",
      4L -> "unrelated corpus speaks of other topics wholly")
    val hashes = d.select(col("doc_id"), Dedup.simHash(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(hashes(1L) === hashes(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashes(1L), hashes(3L)) < ham(hashes(1L), hashes(4L)))
  }

  test("as-of join picks the latest right row <= left time, null when none") {
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-10 00:00:00"), 7L),
      (2L, Timestamp.valueOf("2024-01-20 00:00:00"), 7L),
      (3L, Timestamp.valueOf("2024-01-01 00:00:00"), 8L))
      .toDF("event_id", "ts", "user_id")
    val ord = Seq(
      (7L, Timestamp.valueOf("2024-01-05 00:00:00"), 100L, 10.0),
      (7L, Timestamp.valueOf("2024-01-15 00:00:00"), 101L, 20.0),
      (8L, Timestamp.valueOf("2024-02-01 00:00:00"), 102L, 30.0))
      .toDF("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    val out = AsOfJoin.asOf(ev, ord, "user_id", "o_custkey", "ts",
      "o_orderdate", Seq("o_orderkey", "o_totalprice"), "o_orderkey")
      .select("event_id", "o_orderkey").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(out === Map(1L -> 100L, 2L -> 101L, 3L -> -1L))
  }

  test("as-of join tie at equal timestamp: greatest tiebreak wins; boundary is inclusive") {
    val ev = Seq((1L, Timestamp.valueOf("2024-01-05 00:00:00"), 7L))
      .toDF("event_id", "ts", "user_id")
    val ord = Seq(
      (7L, Timestamp.valueOf("2024-01-05 00:00:00"), 100L, 1.0),
      (7L, Timestamp.valueOf("2024-01-05 00:00:00"), 101L, 2.0))
      .toDF("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    val out = AsOfJoin.asOf(ev, ord, "user_id", "o_custkey", "ts",
      "o_orderdate", Seq("o_orderkey"), "o_orderkey")
      .select("o_orderkey").as[Long].head()
    assert(out === 101L)
  }

  test("native as-of plan (custom Strategy+Exec) equals the union+window as-of") {
    val ev = graft.Tables.load(spark, TestSpark.Sf0001, "events")
      .select("event_id", "ts", "user_id")
    val ord = graft.Tables.load(spark, TestSpark.Sf0001, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("timestamp").as("o_orderdate"),
        col("o_orderkey"), col("o_totalprice"))
    val viaWindow = AsOfJoin.asOf(ev, ord, "user_id", "o_custkey", "ts",
      "o_orderdate", Seq("o_orderkey", "o_totalprice"), "o_orderkey")
      .select("event_id", "o_orderkey").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val viaNative = graft.plans.AsOfJoinPlan.asOfNative(spark, ev, ord,
      "user_id", "o_custkey", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"), "o_orderkey")
      .select("event_id", "o_orderkey").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(viaNative.size === viaWindow.size)
    assert(viaNative === viaWindow)
  }

  test("sessionize: gap >= 30min starts a new session") {
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 5L, 1.0),
      (2L, Timestamp.valueOf("2024-01-01 00:10:00"), 5L, 2.0),
      (3L, Timestamp.valueOf("2024-01-01 00:40:00"), 5L, 3.0), // exactly 30m
      (4L, Timestamp.valueOf("2024-01-01 02:00:00"), 5L, 4.0))
      .toDF("event_id", "ts", "user_id", "value")
    val out = Sessionize.sessions(ev, gapSeconds = 1800L)
      .select("session_seq", "n_events").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("brute-force kNN: self is rank 1, ranks are contiguous, scores non-increasing") {
    val emb = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val out = SimilaritySearch.bruteForceTopK(q, emb, k = 4)
      .select("query_id", "rank", "vec_id", "score")
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2) }
    out.foreach { case (qid, rows) =>
      assert(rows.map(_._2).toSeq === Seq(1, 2, 3, 4))
      assert(rows.head._3 === qid) // self-match at rank 1
      assert(rows.head._4 > 0.999999)
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a._4 >= b._4)
        case _ =>
      }
    }
  }

  test("LSH ANN results are a subset of the index with valid cosines") {
    val emb = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val out = SimilaritySearch.lshTopK(q, emb, k = 4, tables = 8, bits = 6)
      .select("query_id", "rank", "vec_id", "score")
      .as[(Long, Int, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, r, _, s) =>
      assert(r >= 1 && r <= 4); assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9)
    }
    // self-bucket guarantee: a query always collides with itself
    val byQ = out.groupBy(_._1)
    byQ.foreach { case (qid, rows) => assert(rows.head._3 === qid) }
  }

  test("language id picks the language with most marker hits") {
    val d = docs(1L -> "the value of the table is a row",
      2L -> "el que de la una en los")
    val out = TextAnalysis.languageId(d)
      .select("doc_id", "predicted_lang").as[(Long, String)].collect().toMap
    assert(out(1L) === "en")
    assert(out(2L) === "es")
  }

  test("rolling fingerprint: identical text → identical min-hash; shifted window stability") {
    val d = docs(
      1L -> "a b c d e f g h i j",
      2L -> "a b c d e f g h i j",
      3L -> "z z a b c d e f g h i j") // superset: shares all windows of 1
    val out = TextAnalysis.fingerprint(d.toDF(), k = 5)
      .select("doc_id", "fingerprint_min", "n_windows")
      .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 === out(2L)._1)
    assert(out(1L)._2 === 6) // 10 tokens, k=5 → 6 windows
    // doc 3 contains every window of doc 1, so its min is <= doc 1's min
    assert(out(3L)._1 <= out(1L)._1)
  }

  test("TopKAgg path returns exactly the window-ranking kNN result") {
    val emb = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val viaWindow = SimilaritySearch.bruteForceTopK(q, emb, k = 4)
      .select("query_id", "rank", "vec_id", "score")
      .as[(Long, Int, Long, Double)].collect().toSet
    val viaAgg = SimilaritySearch.bruteForceTopKAgg(q, emb, k = 4)
      .select("query_id", "rank", "vec_id", "score")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(viaAgg === viaWindow)
  }

  test("A8: typed VectorMeanAgg equals the posexplode centroid path") {
    val emb = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
    val viaAgg = emb.groupBy(col("label"))
      .agg(graft.functions.VectorMeanAgg.asColumn(col("embedding")).as("m"))
      .select(col("label"), posexplode(col("m")).as(Seq("dim", "v")))
      .as[(Int, Int, Double)].collect()
      .map { case (l, d, v) => (l, d) -> v }.toMap
    val viaExplode = SimilaritySearch.labelCentroids(emb)
      .select(col("centroid_id"), posexplode(col("centroid_vec")).as(Seq("dim", "v")))
      .as[(Int, Int, Double)].collect()
      .map { case (l, d, v) => (l, d) -> v }.toMap
    assert(viaAgg.keySet === viaExplode.keySet)
    viaAgg.foreach { case (k, v) =>
      assert(math.abs(v - viaExplode(k)) < 1e-9, s"centroid mismatch at $k")
    }
  }

  test("char-trigram language id: marker-vocab texts classify to their language") {
    val d = docs(1L -> "the value of the table is a row",
      2L -> "el que de la una en los")
    val out = TextAnalysis.languageIdNgram(d)
      .select("doc_id", "predicted_lang_ngram").as[(Long, String)].collect().toMap
    assert(out(1L) === "en")
    assert(out(2L) === "es")
  }

  test("multimodal resize bounds payloads and is identity for small ones") {
    import graft.multimodal.Multimodal
    val media = Seq(
      Multimodal.MediaRow(1L, "image", Array.fill[Byte](300)(7)),
      Multimodal.MediaRow(2L, "audio", Array.fill[Byte](10)(3)))
      .toDS()
    val out = Multimodal.resize(media, targetBytes = 64).collect()
      .map(r => r.media_id -> r.payload.length).toMap
    assert(out(1L) <= 75 && out(1L) >= 50) // stride rounding tolerance
    assert(out(2L) === 10)
  }

  test("token counts: empty, spaces, normal") {
    val d = Seq("", "   ", "a b  c", "one").toDF("text")
      .withColumn("n", TextAnalysis.tokenCount(col("text")))
    assert(d.select("n").as[Int].collect().toSeq === Seq(0, 0, 3, 1))
  }

  test("BMP decode: encoder round-trip, row padding, top-down variant, " +
      "corrupt input → None") {
    import graft.multimodal.Multimodal
    // width 2 → 6 pixel bytes/row, padded to 8: a decoder that summed the
    // stride bytes (or skipped padding wrongly) gets a different checksum
    val px = Map((0, 0) -> (1, 2, 3), (1, 0) -> (4, 5, 6),
      (0, 1) -> (7, 8, 9), (1, 1) -> (10, 11, 12))
    val bmp = Multimodal.encodeBmp(2, 2, (x, y) => px((x, y)))
    assert(bmp.length === 54 + 8 * 2) // padded stride
    val img = Multimodal.decodeBmp(bmp).get
    assert(img.width === 2 && img.height === 2)
    assert(img.pixelSum === (1 to 12).sum)
    // top-down variant: negate the height field; checksum is unchanged
    val topDown = bmp.clone()
    val negH = -2
    topDown(22) = (negH & 0xff).toByte
    topDown(23) = ((negH >> 8) & 0xff).toByte
    topDown(24) = ((negH >> 16) & 0xff).toByte
    topDown(25) = ((negH >> 24) & 0xff).toByte
    assert(Multimodal.decodeBmp(topDown).get.pixelSum === (1 to 12).sum)
    // corrupt/unsupported inputs: wrong magic, truncated, 8bpp
    assert(Multimodal.decodeBmp("not a bmp".getBytes).isEmpty)
    assert(Multimodal.decodeBmp(bmp.take(40)).isEmpty)
    val bpp8 = bmp.clone(); bpp8(28) = 8
    assert(Multimodal.decodeBmp(bpp8).isEmpty)
    // truncated pixel data (header promises more rows than present)
    assert(Multimodal.decodeBmp(bmp.dropRight(4)).isEmpty)
  }

  test("bilinearResize: hand-computed 2x2→4x4 upscale — half-pixel " +
      "source mapping, edge clamp, half-up rounding; center crop") {
    import graft.multimodal.Multimodal
    // corner values chosen so interpolation genuinely mixes all four
    // neighbors (a linear ramp can't distinguish bilinear from the
    // closed form); every channel carries the same value
    val corners = Map((0, 0) -> 0, (1, 0) -> 100, (0, 1) -> 200,
      (1, 1) -> 40)
    val bmp = Multimodal.encodeBmp(2, 2,
      (x, y) => { val v = corners((x, y)); (v, v, v) })
    val img = Multimodal.decodeBmpRgb(bmp).get
    val up = Multimodal.bilinearResize(img, 4, 4)
    // sx = (dx+0.5)/2 − 0.5 → clamped weights wx = 0, ¼, ¾, 1; the
    // 16 interpolated values, rounded half-up, row-major top-down:
    val expected = Seq(
      0, 25, 75, 100,
      50, 59, 76, 85,
      150, 126, 79, 55,
      200, 160, 80, 40)
    assert(up.pixels.toSeq === expected.map(v => v * 0x010101))
    assert(up.pixelSum === 3L * expected.sum)
    // center crop 4x4 → 2x2 takes offsets (1,1): the middle block
    val crop = Multimodal.centerCrop(up, 2, 2)
    assert(crop.pixels.toSeq ===
      Seq(59, 76, 126, 79).map(v => v * 0x010101))
    // downscale identity: a constant image resizes to itself
    val const = Multimodal.encodeBmp(4, 4, (_, _) => (9, 9, 9))
    val down = Multimodal.bilinearResize(
      Multimodal.decodeBmpRgb(const).get, 2, 2)
    assert(down.pixels.toSeq === Seq.fill(4)(9 * 0x010101))
  }

  test("BMP decode: 32bpp BGRA and 8bpp palettized checksum like their " +
      "24bpp twin (alpha ignored, palette expanded)") {
    import graft.multimodal.Multimodal
    // 54 bytes of file+DIB header; the palette (if any) is appended by
    // the caller and dataOff points past it
    def header(dataOff: Int, w: Int, h: Int, bpp: Int, fileSize: Int,
        clrUsed: Int): Array[Byte] = {
      val out = new Array[Byte](54)
      def i32(off: Int, v: Int): Unit = {
        out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
        out(off + 2) = ((v >> 16) & 0xff).toByte
        out(off + 3) = ((v >> 24) & 0xff).toByte
      }
      out(0) = 'B'; out(1) = 'M'
      i32(2, fileSize); i32(10, dataOff); i32(14, 40)
      i32(18, w); i32(22, h); out(26) = 1; out(28) = bpp.toByte
      i32(30, 0); i32(46, clrUsed)
      out
    }
    // 32bpp, 2x2, same colors as the 24bpp test (1..12), alpha 0xAA:
    // stride 8, no padding
    val px = Seq((1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12))
    val body32 = Array(
      px(2), px(3), // bottom row first (bottom-up)
      px(0), px(1)).flatMap { case (r, g, b) =>
      Array(b.toByte, g.toByte, r.toByte, 0xAA.toByte) }
    val bmp32 = header(54, 2, 2, 32, 54 + 16, 0) ++ body32
    val img32 = Multimodal.decodeBmp(bmp32).get
    assert(img32.width === 2 && img32.height === 2)
    assert(img32.pixelSum === (1 to 12).sum) // alpha excluded
    // 8bpp, 2x2, 2-entry palette; indices [[0,1],[1,0]]; stride 4
    val palette = Array[Byte](1, 2, 3, 0, 10, 20, 30, 0) // BGRX entries
    val rows8 = Array[Byte](1, 0, 0, 0, /* bottom row idx 1,0 + pad */
      0, 1, 0, 0) /* top row idx 0,1 + pad */
    val bmp8 = header(14 + 40 + 8, 2, 2, 8, 14 + 40 + 8 + 8, 2) ++
      palette ++ rows8
    val img8 = Multimodal.decodeBmp(bmp8).get
    assert(img8.width === 2 && img8.height === 2)
    assert(img8.pixelSum === 2L * (1 + 2 + 3) + 2L * (10 + 20 + 30))
    // palette index out of range → None, not a crash
    val bad = bmp8.clone(); bad(14 + 40 + 8) = 7 // index 7 of a 2-entry palette
    assert(Multimodal.decodeBmp(bad).isEmpty)
    // 16bpp stays unsupported → None
    val b16 = bmp32.clone(); b16(28) = 16
    assert(Multimodal.decodeBmp(b16).isEmpty)
  }

  test("PNG decode: lossless encoder round-trip; format-strict; " +
      "corrupt input → None") {
    import graft.multimodal.Multimodal
    val px = Map((0, 0) -> (1, 2, 3), (1, 0) -> (4, 5, 6),
      (0, 1) -> (7, 8, 9), (1, 1) -> (10, 11, 12))
    val png = Multimodal.encodePng(2, 2, (x, y) => px((x, y)))
    val img = Multimodal.decodePng(png).get
    assert(img.width === 2 && img.height === 2)
    assert(img.pixelSum === (1 to 12).sum) // lossless: exact checksum
    // format-strict: a BMP payload is not a PNG
    val bmp = Multimodal.encodeBmp(2, 2, (x, y) => px((x, y)))
    assert(Multimodal.decodePng(bmp).isEmpty)
    // corrupt: magic intact but stream truncated → None, not a throw
    assert(Multimodal.decodePng(png.take(20)).isEmpty)
    assert(Multimodal.decodePng("not a png".getBytes).isEmpty)
    assert(Multimodal.decodePng(Array.emptyByteArray).isEmpty)
  }

  test("WAV decode: stereo 16-bit encoder round-trip with exact " +
      "(count, sum, peak); extra chunks tolerated; corrupt/non-PCM → None") {
    import graft.multimodal.Multimodal
    // stereo ramp with a negative excursion: sample(f, c) = 100·f − 50 + c
    val wav = Multimodal.encodeWav(2, 8000, 4, (f, c) => 100 * f - 50 + c)
    val a = Multimodal.decodeWav(wav).get
    assert(a.channels === 2 && a.sampleRate === 8000 &&
      a.bitsPerSample === 16)
    assert(a.nSamples === 4L)
    // sum over f=0..3, c=0..1 of (100f − 50 + c) = 2·(600 − 200) + 4 = 804
    assert(a.sampleSum === 804L)
    assert(a.peak === 251) // f=3, c=1 → 251; |−50| smaller
    // a LIST chunk between fmt and data must be skipped, not fatal
    val extra = new java.io.ByteArrayOutputStream()
    extra.write(wav, 0, 36) // RIFF..fmt chunk end
    extra.write("LIST".getBytes); extra.write(Array[Byte](4, 0, 0, 0))
    extra.write("INFO".getBytes)
    extra.write(wav, 36, wav.length - 36) // data chunk
    val withList = extra.toByteArray
    // patch RIFF size for the inserted 12 bytes
    val rs = wav.length - 8 + 12
    withList(4) = (rs & 0xff).toByte; withList(5) = ((rs >> 8) & 0xff).toByte
    assert(Multimodal.decodeWav(withList).map(_.sampleSum) === Some(804L))
    // corrupt: wrong magic, truncated data, non-PCM format tag
    assert(Multimodal.decodeWav("RIFFnope".getBytes).isEmpty)
    assert(Multimodal.decodeWav(wav.take(40)).isEmpty)
    val nonPcm = wav.clone(); nonPcm(20) = 3 // IEEE float tag
    assert(Multimodal.decodeWav(nonPcm).isEmpty)
    // truncated mid-data: header promises more frames than present →
    // the declared chunk size overruns the buffer → None, not a crash
    assert(Multimodal.decodeWav(wav.dropRight(3)).isEmpty)
  }

  test("MP4 box walk: encoder round-trip recovers brand/timescale/" +
      "duration/tracks/dims; 64-bit and to-EOF sizes; corrupt → None") {
    import graft.multimodal.Multimodal
    val mp4 = Multimodal.encodeMp4("isom", 600, 3000L,
      Seq(("vide", 320, 240), ("soun", 0, 0)))
    val m = Multimodal.decodeMp4(mp4).get
    assert(m.brand === "isom" && m.timescale === 600 &&
      m.durationUnits === 3000L)
    assert(m.nTracks === 2 && m.nVideo === 1 && m.nAudio === 1)
    assert(m.width === 320 && m.height === 240)
    // audio-only container: no video dims
    val audioOnly = Multimodal.decodeMp4(
      Multimodal.encodeMp4("M4A ", 44100, 44100L, Seq(("soun", 0, 0)))).get
    assert(audioOnly.nVideo === 0 && audioOnly.width === 0)
    // a trailing box with size==0 (to EOF, §4.2) is legal
    val withFree = mp4 ++ Array[Byte](0, 0, 0, 0) ++ "free".getBytes
    assert(Multimodal.decodeMp4(withFree).map(_.nTracks) === Some(2))
    // a 64-bit largesize box before moov is walked correctly
    val big = {
      val free = Array[Byte](0, 0, 0, 1) ++ "free".getBytes ++
        Array[Byte](0, 0, 0, 0, 0, 0, 0, 16)
      val ftypEnd = 8 + ((mp4(0) & 0xff) << 24 | (mp4(1) & 0xff) << 16 |
        (mp4(2) & 0xff) << 8 | (mp4(3) & 0xff)) - 8
      mp4.take(ftypEnd) ++ free ++ mp4.drop(ftypEnd)
    }
    assert(Multimodal.decodeMp4(big).map(_.width) === Some(320))
    // corrupt: truncation, non-mp4 bytes, overrunning declared size
    assert(Multimodal.decodeMp4(mp4.take(30)).isEmpty)
    assert(Multimodal.decodeMp4("nope".getBytes).isEmpty)
    val overrun = mp4.clone(); overrun(3) = 127 // ftyp size > file
    assert(Multimodal.decodeMp4(overrun).isEmpty)
  }

  test("GIF decode: palette-lossless via ImageIO; format-strict") {
    import graft.multimodal.Multimodal
    // write a GIF through ImageIO to fixture it, decode through the
    // format-strict entry; a SINGLE-color image is palette-exact by
    // construction (the writer's quantizer cannot move a 1-color
    // palette, unlike multi-color fixtures)
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 2).foreach(y => (0 until 2).foreach(x =>
      img.setRGB(x, y, (10 << 16) | (20 << 8) | 30)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val gif = bos.toByteArray
    val g = Multimodal.decodeGif(gif).get
    assert(g.width === 2 && g.height === 2)
    assert(g.pixelSum === 4L * (10 + 20 + 30))
    // a PNG payload is not a GIF
    val png = Multimodal.encodePng(2, 2, (_, _) => (1, 2, 3))
    assert(Multimodal.decodeGif(png).isEmpty)
    assert(Multimodal.decodeGif(gif.take(10)).isEmpty)
  }

  test("JPEG decode: exact dimensions, checksum within lossy tolerance; " +
      "format-strict; corrupt input → None") {
    import graft.multimodal.Multimodal
    // a flat gray card: JPEG reproduces constant blocks almost exactly,
    // so the decoded checksum must land within a tight band of the
    // ideal value — catches channel-order/color-space mistakes (an RGB
    // swap of (128,128,128) is invariant, so also probe a color card)
    val w = 16; val h = 16
    val gray = Multimodal.encodeJpeg(w, h, (_, _) => (128, 128, 128))
    val gImg = Multimodal.decodeJpeg(gray).get
    assert(gImg.width === w && gImg.height === h)
    val idealGray = 3L * 128 * w * h
    assert(math.abs(gImg.pixelSum - idealGray) <= idealGray / 50,
      s"gray checksum ${gImg.pixelSum} vs ideal $idealGray")
    val red = Multimodal.encodeJpeg(w, h, (_, _) => (200, 30, 30))
    val rImg = Multimodal.decodeJpeg(red).get
    val idealRed = (200L + 30 + 30) * w * h
    assert(math.abs(rImg.pixelSum - idealRed) <= idealRed / 20,
      s"red checksum ${rImg.pixelSum} vs ideal $idealRed")
    // format-strict + corrupt
    val png = Multimodal.encodePng(2, 2, (_, _) => (1, 2, 3))
    assert(Multimodal.decodeJpeg(png).isEmpty)
    assert(Multimodal.decodeJpeg(gray.take(8)).isEmpty)
  }

  test("embeddingCosineClustered: sound (subset of exact, all >= " +
      "threshold), and identical vectors always pair") {
    import graft.TestSpark
    val emb = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .filter(col("vec_id") < 64).select("vec_id", "embedding")
      // vec 1000 duplicates vec 0: identical vectors rank their
      // centroids identically, so they MUST share a list and pair
      .unionByName(graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
        .filter(col("vec_id") === 0)
        .select((col("vec_id") + 1000).as("vec_id"), col("embedding")))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id_a", "vec_id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Dedup.embeddingCosineExact(emb, 0.35))
    val got = Dedup.embeddingCosineClustered(emb, 0.35,
      lists = 4, assignTop = 2, iters = 2)
    assert(got.filter(col("cos") < 0.35).count() === 0)
    val gotPairs = pairs(got)
    assert((gotPairs -- exact).isEmpty, "unsound pair emitted")
    assert(gotPairs.contains((0L, 1000L)), "identical vectors not paired")
  }

  test("embeddingCosineClustered with precomputed centroids equals the " +
      "in-call training (persisted-IVF reuse path)") {
    import graft.TestSpark
    val emb = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .filter(col("vec_id") < 128).select("vec_id", "embedding")
    val pre = graft.operators.SimilaritySearch.kMeansCentroids(emb, 4, 2)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id_a", "vec_id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val trained = pairs(Dedup.embeddingCosineClustered(emb, 0.35,
      lists = 4, assignTop = 2, iters = 2))
    val reused = pairs(Dedup.embeddingCosineClustered(emb, 0.35,
      lists = 999, assignTop = 2, iters = 999, // ignored when provided
      centroids = Some(pre)))
    assert(reused === trained)
    assert(pre.count() === 4)
  }

  test("embeddingCosineClustered reuses the persisted IVF index's " +
      "centroids (train once per corpus, the serving shape)") {
    import graft.TestSpark
    val emb = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select("vec_id", "embedding")
    val h = graft.sources.AnnIndex.ensureIvf(spark,
      s"opspec-ivfreuse-${java.util.UUID.randomUUID.toString.take(8)}",
      emb, lists = 8, iters = 3)
    val approx = Dedup.embeddingCosineClustered(emb, 0.35,
      centroids = Some(h.centroids))
      .select("vec_id_a", "vec_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.embeddingCosineExact(emb, 0.35)
      .select("vec_id_a", "vec_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.nonEmpty)
    assert((approx -- exact).isEmpty, "clustered pairing must stay sound")
  }

  test("embeddingCosine below the LSH floor fails loudly past " +
      "spark.graft.dedup.maxExactRows instead of running O(n²)") {
    val emb = (0L until 8L).map(i =>
      (i, Array.fill(4)(i.toFloat + 1f))).toDF("vec_id", "embedding")
    spark.conf.set("spark.graft.dedup.maxExactRows", "4")
    try {
      val e = intercept[IllegalArgumentException] {
        Dedup.embeddingCosine(emb, threshold = 0.35)
      }
      assert(e.getMessage.contains("maxExactRows"), e.getMessage)
      // at or under the cap the exact path still runs
      spark.conf.set("spark.graft.dedup.maxExactRows", "8")
      assert(Dedup.embeddingCosine(emb, threshold = 0.35).count() > 0)
      // the LSH mode is not gated: same 8 rows, threshold above the floor
      spark.conf.set("spark.graft.dedup.maxExactRows", "4")
      Dedup.embeddingCosine(emb, threshold = 0.9).count() // must not throw
    } finally spark.conf.unset("spark.graft.dedup.maxExactRows")
  }

  test("repetition signals: per-row fold matches hand counts; " +
      "degenerate short docs don't divide by zero") {
    val d = docs(
      1L -> "a a a b", // top word 'a' ×3/4; bigrams: a a, a a, a b → 2 distinct of 3
      2L -> "x y z w", // all unique: top 1/4, 3 distinct bigrams of 3
      3L -> "solo")
    val out = TextAnalysis.repetitionSignals(d)
      .select("doc_id", "n_tok", "top_word_frac", "dup_bigram_frac")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 4L, 0.75, math.rint((1.0 - 2.0 / 3) * 1e6) / 1e6)))
    assert(out(2L) === ((2L, 4L, 0.25, 0.0)))
    assert(out(3L) === ((3L, 1L, 1.0, 0.0))) // no bigrams → 0.0, no NaN
  }

  test("gopher signals: hand-computed top-n-gram char coverage and " +
      "duplicated-n-gram token coverage; single-token doc yields zeros") {
    val d = docs(
      // 2-grams: "a b"x3 -> 3x3=9 chars of 13; 3-grams "a b a"x2 -> 10;
      // 4-grams "a b a b"x2 -> 14 (overlaps double-count chars, the
      // published formula's behavior); no repeated 5..10-gram
      1L -> "a b a b a b c",
      // "p q r s t" repeats at positions 0 and 5 -> dup5 covers all 10
      // tokens; every 6..10-gram is unique
      2L -> "p q r s t p q r s t",
      3L -> "solo")
    val out = TextAnalysis.gopherSignals(d)
      .select("doc_id", "n_tok", "top2_frac", "top3_frac", "top4_frac",
        "dup5_frac", "dup6_frac", "dup10_frac")
      .as[(Long, Long, Double, Double, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 7L, 0.692308, 0.769231, 1.076923, 0.0, 0.0, 0.0)))
    assert(out(2L) === ((2L, 10L, 0.315789, 0.526316, 0.736842, 1.0, 0.0, 0.0)))
    assert(out(3L) === ((3L, 1L, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)))
  }

  test("heavy hitters: sketch-pruned exact top-k equals brute force, " +
      "survives purge pressure, and refuses to return uncertifiable output") {
    // 3 clear heavy unigrams + 300 distinct singletons; capacity 8 forces
    // many purges, yet the top-3 counts dominate delta
    val heavy = Seq.fill(200)("aaa") ++ Seq.fill(150)("bbb") ++
      Seq.fill(120)("ccc")
    val noise = (1 to 200).map(i => s"n$i")
    // interleave so the heavy items arrive spread across the stream
    // (purges happen between their occurrences, exercising delta)
    val stream = heavy.zipAll(noise, "", "").flatMap {
      case (a, b) => Seq(a, b).filter(_.nonEmpty) }
    val d = docs(1L -> stream.mkString(" "))
    val out = Frequency.topNgramsExact(d, n = 1, k = 3, capacity = 8)
      .as[(Int, String, Long)].collect().toSeq
    assert(out === Seq((1, "aaa", 200L), (2, "bbb", 150L), (3, "ccc", 120L)))

    // multi-row/multi-partition corpus: partial sketches merge; exact
    // trigram counts match a hand count
    val d2 = docs(
      1L -> "x y z x y z x y z",
      2L -> "x y z q r s",
      3L -> "q r s q r s").repartition(3)
    val out2 = Frequency.topNgramsExact(d2, n = 3, k = 2, capacity = 64)
      .as[(Int, String, Long)].collect().toSeq
    // "x y z": 3 (doc1 pos 0,3,6... positional windows: doc1 has 7 windows,
    // x y z at 0,3,6 -> 3) + 1 (doc2) = 4; "q r s": doc2 1 + doc3 2 = 3
    assert(out2 === Seq((1, "x y z", 4L), (2, "q r s", 3L)))

    // uncertifiable: a flat distribution against a tiny sketch — the
    // k-th count cannot exceed delta, so the operator must throw, not
    // return a plausible-but-unproven ranking
    val flat = docs(1L -> ((1 to 400).map(i => s"u$i u$i") ++
      Seq.fill(5)("a") ++ Seq.fill(5)("b") ++ Seq.fill(5)("c"))
      .mkString(" "))
    val e = intercept[IllegalArgumentException] {
      Frequency.topNgramsExact(flat, n = 1, k = 3, capacity = 4)
    }
    assert(e.getMessage.contains("NOT certifiable"))
  }

  test("heavy hitters on a Zipf stream: certification passes WITH a " +
      "nonzero delta (q147's fixture — purges actually happened)") {
    // the q147 harmonic-bucketing construction: rank-r token count
    // ∝ 1/(r(r+1)), ~141 distinct over M=4999 — capacity 64 < distinct
    // forces MG purges, yet the top counts dominate the tracked mass
    val m = 4999
    val stream = (0 until 500).flatMap(d =>
      (0 until 16).map(i => s"z${m / ((d * 16 + i) % m + 1)}"))
    val d = docs(1L -> stream.mkString(" ")).repartition(4)
    val (top, delta) = Frequency.topNgramsExactWithDelta(
      d, n = 1, k = 10, capacity = 64)
    val out = top.as[(Int, String, Long)].collect().toSeq
    assert(delta > 0L, "Zipf fixture must force purges (delta > 0) — " +
      "otherwise certification is vacuous like the near-uniform corpus")
    // independent exact count
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (g, c) => (-c, g) }.take(10)
      .zipWithIndex.map { case ((g, c), i) => (i + 1, g, c) }
    assert(out === truth)
  }

  test("z-order: endpoint interleave is bit-exact; the layout keeps " +
      "partition envelopes tight in BOTH columns where a 1-D sort cannot") {
    // endpoints quantize to 0 / 65535, so the Morton key is closed-form
    val ends = Seq((0L, 0L), (0L, 65535L), (65535L, 0L), (65535L, 65535L))
      .toDF("a", "b")
    val z = Layout.withZValue(ends, Seq("a", "b"))
      .select("a", "b", "zval").as[(Long, Long, Long)].collect().toSet
    assert(z === Set(
      (0L, 0L, 0L),
      (0L, 65535L, 0x55555555L),      // b owns the even bit positions
      (65535L, 0L, 0xAAAAAAAAL),      // a owns the odd (higher) ones
      (65535L, 65535L, 0xFFFFFFFFL)))

    // 64x64 uniform grid into 16 range partitions: the Morton layout
    // yields quadrant-like envelopes (tight in x AND y); sorting by x
    // alone leaves every partition spanning ALL of y. A thin-in-y box
    // query (y <= 7, any x) then intersects <= 6 z-partitions vs all
    // 16 x-sorted ones — the data-skipping claim, measured.
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    def envelopes(laid: org.apache.spark.sql.DataFrame) = laid
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("y").as("mny"), max("y").as("mxy"),
        min("x").as("mnx"), max("x").as("mxx"))
      .collect()
    val zEnv = envelopes(Layout.zorderLayout(grid, Seq("x", "y"), 16))
    val xEnv = envelopes(grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions("x"))
    assert(zEnv.length === 16 && xEnv.length === 16)
    val zHit = zEnv.count(_.getLong(1) <= 7L) // min(y) <= 7 intersects
    val xHit = xEnv.count(_.getLong(1) <= 7L)
    assert(xHit === 16, s"1-D sort should not prune on y: $xHit")
    assert(zHit <= 6, s"z-order should keep y envelopes tight: $zHit")
  }

  test("quality classifier: GD separates a planted vocabulary signal, " +
      "loss falls, scoring is a pure projection of the trained model") {
    // two disjoint vocabularies -> linearly separable presence features
    val pos = (1 to 12).map(i =>
      (i.toLong, s"good fine solid clean w$i", 1.0))
    val neg = (13 to 24).map(i =>
      (i.toLong, s"junk noise broken spam w$i", 0.0))
    val d = (pos ++ neg).toDF("doc_id", "text", "y")
    val m = QualityClassifier.train(d, "y", dim = 64, iters = 30, lr = 5.0)
    assert(m.finalLoss < 0.3 * m.initLoss,
      s"loss ${m.initLoss} -> ${m.finalLoss} did not converge")
    val scored = QualityClassifier.score(d, m)
      .select("doc_id", "y", "quality_prob", "quality_pred")
      .as[(Long, Double, Double, Int)].collect()
    assert(scored.forall(r => r._4 === r._2.toInt),
      "separable corpus must classify perfectly")
    // every positive outranks every negative in probability
    val minPos = scored.filter(_._2 == 1.0).map(_._3).min
    val maxNeg = scored.filter(_._2 == 0.0).map(_._3).max
    assert(minPos > maxNeg)

    // degenerate single-class corpus: the bias alone carries it
    val onesOnly = pos.toDF("doc_id", "text", "y")
    val m1 = QualityClassifier.train(onesOnly, "y", dim = 64,
      iters = 20, lr = 5.0)
    val s1 = QualityClassifier.score(onesOnly, m1)
      .select("quality_pred").as[Int].collect()
    assert(s1.forall(_ === 1))
  }

  test("ranking metrics: hand-computed recall/MRR/nDCG, graded gains, " +
      "zero-qrels query reports zeros") {
    val run = Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L),
      (2L, 1, 10L)).toDF("query_id", "rank", "doc_id")
    // query 1: rel 3 at rank 1, rel 1 at rank 3; an unretrieved rel-2
    // doc caps recall at 2/3 and lifts ideal DCG. query 2: no qrels.
    val qrels = Seq((1L, 10L, 3L), (1L, 12L, 1L), (1L, 99L, 2L))
      .toDF("query_id", "doc_id", "rel")
    val out = Evaluation.rankingMetrics(run, qrels, k = 3)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val dcg = 7.0 / 1.0 + 1.0 / 2.0 // (2^3-1)/log2(2) + (2^1-1)/log2(4)
    val idcg = 7.0 + 3.0 / (math.log(3.0) / math.log(2.0)) + 1.0 / 2.0
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(1L) === ((1L, 3L, r6(2.0 / 3.0), 1.0, r6(dcg / idcg))))
    assert(out(2L) === ((2L, 0L, 0.0, 0.0, 0.0)))
  }

  test("sketch-salted skew join: output identical to the plain join " +
      "when one key dominates; empty-hot-list and cold-only corpora survive") {
    // one hot key (1000 rows) + a cold tail; small side has extras that
    // must not leak (inner semantics)
    val big = ((1 to 1000).map(_ => (7L, "hot")) ++
      (1 to 50).map(i => (100L + i, s"cold$i"))).toDF("k", "payload")
    val small = ((7L, "dimHOT") +: (1 to 50).map(i => (100L + i, s"dim$i")) :+
      (9999L, "unmatched")).toDF("sk", "name")
    val plain = big.join(small, col("k") === col("sk"))
      .groupBy("name").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = SkewJoin.sketchSaltedEquiJoin(big, small, "k", "sk",
      salts = 4, capacity = 8)
      .groupBy("name").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
    assert(plain("dimHOT") === 1000L)

    // a corpus with no repeated keys at a generous capacity: every key
    // is a sketch survivor (hot list = all) — still identical output
    val flat = (1 to 20).map(i => (i.toLong, "x")).toDF("k", "payload")
    val flatOut = SkewJoin.sketchSaltedEquiJoin(flat, small, "k", "sk",
      salts = 4, capacity = 64).count()
    assert(flatOut === flat.join(small, col("k") === col("sk")).count())
  }

  test("bloom-pruned join: output identical to the plain join, and the " +
      "probe actually prunes the big side before the shuffle") {
    val big = (0 until 1000).map(i => (i.toLong, s"row$i"))
      .toDF("k", "payload")
    val small = (0 until 50).map(i => (i.toLong, s"dim$i"))
      .toDF("sk", "name")
    val plain = big.join(small, col("k") === col("sk"))
      .select("k", "name").as[(Long, String)].collect().sorted.toSeq
    val pruned = BloomJoin.bloomPrunedJoin(big, small, "k", "sk",
      expectedItems = 1000L)
      .select("k", "name").as[(Long, String)].collect().sorted.toSeq
    assert(pruned === plain && plain.length === 50)
    // the prune alone: all 50 matches survive; false positives stay a
    // small fraction of the 950 non-matching keys at this sizing
    val kept = BloomJoin.bloomPrune(big, small, "k", "sk",
      expectedItems = 1000L).count()
    assert(kept >= 50 && kept <= 100,
      s"bloom should pass ~50 of 1000 rows, passed $kept")
  }

  test("pageRank: matches an independent in-memory reference on a graph " +
      "with weights, a dangling node and an isolated node; mass sums to 1") {
    val edges = Seq(
      ("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "b", 2.0),
      ("d", "a", 1.0)) // e is isolated, d has no in-edges, none dangling yet
    val nodes = Seq("a", "b", "c", "d", "e") // e: isolated AND dangling
    val got = GraphRank.pageRank(
      edges.toDF("src", "dst", "w"), nodes.toDF("node"), iters = 10)
      .as[(String, Double)].collect().toMap
    // independent reference: dense in-memory iteration
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = nodes.map(_ -> 1.0 / 5).toMap
    for (_ <- 1 to 10) {
      val dang = nodes.filterNot(out.contains).map(r).sum
      val contrib = nodes.map { v =>
        v -> edges.filter(_._2 == v)
          .map { case (u, _, w) => r(u) * w / out(u) }.sum
      }.toMap
      r = nodes.map(v =>
        v -> (0.15 / 5 + 0.85 * (contrib(v) + dang / 5))).toMap
    }
    nodes.foreach(v => assert(math.abs(got(v) - r(v)) < 1e-9,
      s"$v: ${got(v)} vs ${r(v)}"))
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("incremental dedup store: cross-batch first-arrival-wins, " +
      "within-batch min-id, replay reconstructs the original answer") {
    import graft.sources.DedupStore
    val key = "spec://" +
      java.nio.file.Files.createTempDirectory("dedupstore").toString
    try {
      val b1 = docs(1L -> "x x x", 2L -> "x x x", 3L -> "y y")
      val b2 = docs(4L -> "x x x", 5L -> "z", 6L -> "z")
      val k1 = DedupStore.dedupBatch(spark, key, b1, batchId = 1L)
        .select("doc_id").as[Long].collect().toSet
      assert(k1 === Set(1L, 3L)) // min id per duplicate group
      val k2 = DedupStore.dedupBatch(spark, key, b2, batchId = 2L)
        .select("doc_id").as[Long].collect().toSet
      assert(k2 === Set(5L)) // "x x x" already seen; z keeps min id
      assert(DedupStore.seenCount(spark, key) === 3L)
      // crash-retry: the replayed batch appends nothing and returns
      // the identical kept set
      val k2again = DedupStore.dedupBatch(spark, key, b2, batchId = 2L)
        .select("doc_id").as[Long].collect().toSet
      assert(k2again === k2)
      assert(DedupStore.seenCount(spark, key) === 3L)
      // first-arrival wins: a LOWER id arriving later is still a dup
      val k3 = DedupStore.dedupBatch(spark, key, docs(0L -> "y y"),
        batchId = 3L).count()
      assert(k3 === 0L)
      // a REUSED batch id over different content is NOT a replay: the
      // store must refuse instead of serving the old batch's answer
      val e = intercept[IllegalArgumentException] {
        DedupStore.dedupBatch(spark, key,
          docs(50L -> "brand new content"), batchId = 2L).count()
      }
      assert(e.getMessage.contains("NOT a replay"))
      // retention: expiring batches < 3 forgets batch-1/2 fingerprints,
      // so previously-seen content is novel again under a NEW batch id
      DedupStore.expireSeen(spark, key, keepFromBatchId = 3L)
      assert(DedupStore.seenCount(spark, key) === 0L) // batch 3 kept 0
      val k4 = DedupStore.dedupBatch(spark, key, docs(60L -> "x x x"),
        batchId = 4L).count()
      assert(k4 === 1L, "expired fingerprints must be forgotten")
    } finally DedupStore.drop(spark, key)
  }

  test("weighted sampling: priorities match an independent md5 " +
      "reimplementation; huge weight dominates; zero weight is excluded") {
    val rows = Seq((1L, 5.0), (2L, 1e9), (3L, 0.0), (4L, 7.0), (5L, 2.0))
    val d = rows.toDF("doc_id", "w")
    val got = CorpusOps.sampleWeighted(d, k = 3, col("w"), col("doc_id"),
      seed = 42L)
      .select("rank", "doc_id", "logpri")
      .as[(Int, Long, Double)].collect().toSeq.sortBy(_._1)
    // independent reference: java MessageDigest md5, same 13-hex-digit
    // uniform, same ln(u)/w priority
    def pri(id: Long, w: Double): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id:42".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      val hv = java.lang.Long.parseLong(hex, 16).toDouble
      math.log((hv + 0.5) / math.pow(16.0, 13.0)) / w
    }
    val expect = rows.filter(_._2 > 0.0)
      .map { case (id, w) => (id, pri(id, w)) }
      .sortBy { case (id, p) => (-p, id) }.take(3)
      .zipWithIndex.map { case ((id, p), i) => (i + 1, id, p) }
    assert(got.map(r => (r._1, r._2)) === expect.map(e => (e._1, e._2)))
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-12) }
    assert(got.head._2 === 2L, "the 1e9-weight row must win rank 1")
    assert(!got.exists(_._2 === 3L), "zero-weight rows have no mass")
  }

  test("incremental NEAR-dup store: within-batch clusters keep min id, " +
      "cross-batch signature probe drops near-dups of stored docs, replay " +
      "reconstructs") {
    import graft.sources.DedupStore
    val key = "spec-near://" +
      java.nio.file.Files.createTempDirectory("neardup").toString
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep green forest tonight"
    try {
      val b1 = docs(
        1L -> base,
        2L -> (base + " extra"), // near-dup of 1 (same batch cluster)
        3L -> "completely different words that never overlap anything here at all today")
      val k1 = DedupStore.nearDedupBatch(spark, key, b1, batchId = 1L)
        .select("doc_id").as[Long].collect().toSet
      assert(k1 === Set(1L, 3L))
      val b2 = docs(
        4L -> (base + " addendum"), // near-dup of STORED 1
        5L -> "fresh content with its own vocabulary nothing shared with previous documents whatsoever",
        6L -> "planted pair alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
        7L -> "planted pair alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu")
      val k2 = DedupStore.nearDedupBatch(spark, key, b2, batchId = 2L)
        .select("doc_id").as[Long].collect().toSet
      assert(k2 === Set(5L, 6L))
      // crash-retry reconstructs the identical kept set, appends nothing
      val k2b = DedupStore.nearDedupBatch(spark, key, b2, batchId = 2L)
        .select("doc_id").as[Long].collect().toSet
      assert(k2b === k2)
    } finally DedupStore.dropNear(spark, key)
  }

  test("dedup store crash window: a retry after append-but-no-meta " +
      "re-derives the original kept set and the store stays exactly-once") {
    import graft.sources.{DedupStore, IndexStore}
    val key = "spec-crash://" +
      java.nio.file.Files.createTempDirectory("dedupcrash").toString
    val b = s"/tmp/graft_dedupstore_${IndexStore.pathTag(key)}"
    val metaPath = java.nio.file.Paths.get(b, "_dedup_meta.json")
    try {
      DedupStore.dedupBatch(spark, key,
        docs(1L -> "x x x", 2L -> "y y"), batchId = 1L).count()
      val metaAfter1 = java.nio.file.Files.readString(metaPath)
      val b2 = docs(3L -> "x x x", 4L -> "z", 5L -> "z")
      val k2 = DedupStore.dedupBatch(spark, key, b2, batchId = 2L)
        .select("doc_id").as[Long].collect().toSet
      assert(k2 === Set(4L))
      // simulate the crash: batch 2's fps rows are committed but the
      // meta write never happened — rewind the meta to the batch-1 state
      java.nio.file.Files.writeString(metaPath, metaAfter1)
      val retry = DedupStore.dedupBatch(spark, key, b2, batchId = 2L)
        .select("doc_id").as[Long].collect().toSet
      assert(retry === k2,
        "retry must re-derive the ORIGINAL kept set, not an empty one")
      assert(DedupStore.seenCount(spark, key) === 3L)
      // each fingerprint lands exactly once (no duplicate re-append)
      val fps = spark.read.parquet(s"$b/fps")
      assert(fps.count() === fps.select("h").distinct().count())
    } finally DedupStore.drop(spark, key)
  }

  test("line-dedup store: cross-batch df accumulation with first-" +
      "arrival leniency; replay reconstructs; crash window idempotent") {
    import graft.sources.{DedupStore, IndexStore}
    val key = "spec-linestore://" +
      java.nio.file.Files.createTempDirectory("linestore").toString
    val b = s"/tmp/graft_dedupstore_${IndexStore.pathTag(key)}_lines"
    val metaPath = java.nio.file.Paths.get(b, "_dedup_meta.json")
    def outOf(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id", "text", "n_cut")
        .as[(Long, String, Long)].collect()
        .map { case (i, t, c) => i -> ((t, c)) }.toMap
    try {
      // BOILER df=3 in batch 1: under maxDf=4 -> survives (leniency)
      val b1 = docs(1L -> "BOILER\nalpha", 2L -> "BOILER\nbeta",
        3L -> "BOILER\ngamma")
      val o1 = outOf(DedupStore.lineDedupBatch(spark, key, b1,
        batchId = 1L, maxDf = 4))
      assert(o1(1L) === (("BOILER\nalpha", 0L)))
      assert(DedupStore.lineCount(spark, key) === 4L) // BOILER + 3 uniques
      val metaAfter1 = java.nio.file.Files.readString(metaPath)
      // batch 2 pushes BOILER to df=5 > 4 -> cut from batch 2 onward
      val b2 = docs(4L -> "BOILER\ndelta", 5L -> "BOILER\nepsilon")
      val o2 = outOf(DedupStore.lineDedupBatch(spark, key, b2,
        batchId = 2L, maxDf = 4))
      assert(o2 === Map(4L -> (("delta", 1L)), 5L -> (("epsilon", 1L))))
      // replay: identical output, nothing re-appended
      val n2 = DedupStore.lineCount(spark, key)
      val o2r = outOf(DedupStore.lineDedupBatch(spark, key, b2,
        batchId = 2L, maxDf = 4))
      assert(o2r === o2)
      assert(DedupStore.lineCount(spark, key) === n2)
      // crash window: batch-2 rows committed, meta not — retry must
      // re-derive the original answer and keep the store exactly-once
      java.nio.file.Files.writeString(metaPath, metaAfter1)
      val o2c = outOf(DedupStore.lineDedupBatch(spark, key, b2,
        batchId = 2L, maxDf = 4))
      assert(o2c === o2)
      // meta accounting survives the crash-retry: the increment counts
      // the FULL batch frame, so rows the crashed attempt committed
      // (on disk, never counted) are not lost from n_rows
      assert(DedupStore.lineCount(spark, key) === n2)
      val rows = spark.read.parquet(s"$b/linedf")
      assert(rows.count() ===
        rows.select("lh", "batch_id").distinct().count())
      // a restarted batch counter (same id, different content) refuses
      intercept[IllegalArgumentException] {
        DedupStore.lineDedupBatch(spark, key,
          docs(9L -> "unrelated\ncontent"), batchId = 2L, maxDf = 4)
          .count()
      }
    } finally DedupStore.dropLines(spark, key)
  }

  test("purgeLineContributions: erasure decrements the purged docs' " +
      "line contributions; the purged store equals a fresh store over " +
      "the SURVIVORS (the parity invariant); shared lines remain at " +
      "the survivors' count; idempotent") {
    import graft.sources.{DedupStore, IndexStore}
    val key = "spec-linepurge://" +
      java.nio.file.Files.createTempDirectory("linepurge").toString
    val key2 = "spec-linepurge2://" +
      java.nio.file.Files.createTempDirectory("linepurge2").toString
    val b = s"/tmp/graft_dedupstore_${IndexStore.pathTag(key)}_lines"
    def totals(dir: String): Map[Long, Long] =
      spark.read.parquet(dir).groupBy("lh")
        .agg(org.apache.spark.sql.functions.sum("df").as("t"))
        .as[(Long, Long)].collect().toMap
    val b1 = docs(1L -> "BOILER\nalpha", 2L -> "BOILER\nbeta")
    val b2 = docs(3L -> "BOILER\ngamma", 4L -> "solo\nline")
    try {
      DedupStore.lineDedupBatch(spark, key, b1, batchId = 1L,
        maxDf = 10).count()
      DedupStore.lineDedupBatch(spark, key, b2, batchId = 2L,
        maxDf = 10).count()
      // purge docs 1 and 4 (their pre-deletion text supplied)
      val victims = docs(1L -> "BOILER\nalpha", 4L -> "solo\nline")
      val n = DedupStore.purgeLineContributions(spark, key, victims,
        purgeBatchId = 1L)
      assert(n === 4L) // 2 distinct lines per purged doc
      // parity: equals a fresh store built from survivors 2 and 3
      DedupStore.lineDedupBatch(spark, key2,
        docs(2L -> "BOILER\nbeta"), batchId = 1L, maxDf = 10).count()
      DedupStore.lineDedupBatch(spark, key2,
        docs(3L -> "BOILER\ngamma"), batchId = 2L, maxDf = 10).count()
      val b2dir = s"/tmp/graft_dedupstore_${IndexStore.pathTag(key2)}_lines"
      assert(totals(s"$b/linedf") === totals(s"$b2dir/linedf"))
      // BOILER (shared) survives at the survivors' df=2; the purged
      // docs' unique lines are gone
      val t = totals(s"$b/linedf")
      assert(t.values.toSeq.sorted === Seq(1L, 1L, 2L))
      // a decrement is NOT naturally idempotent — the replay guard is
      // what makes crash-retry safe: a replayed purge id SKIPS (else
      // it would strip the SURVIVORS' units)
      assert(DedupStore.purgeLineContributions(spark, key, victims,
        purgeBatchId = 1L) === 0L)
      assert(totals(s"$b/linedf") === t)
      // a later purge advances the counter; its replay skips too
      val preP2 = t
      val victims2 = docs(2L -> "BOILER\nbeta")
      DedupStore.purgeLineContributions(spark, key, victims2,
        purgeBatchId = 2L)
      val afterP2 = totals(s"$b/linedf")
      assert(afterP2.values.toSeq.sorted === Seq(1L, 1L))
      assert(DedupStore.purgeLineContributions(spark, key, victims2,
        purgeBatchId = 2L) === 0L)
      assert(totals(s"$b/linedf") === afterP2)
      assert(preP2.values.sum - afterP2.values.sum === 2L)
      // crash window: journal committed (swap done, counter never
      // written — the side dir is gone, live holds the new content) —
      // the next store entry rolls the COUNTER forward from the
      // journal, so a retry of that purge id replay-skips instead of
      // double-decrementing the survivors
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(b, "_purge_journal.json"),
        s"""{"side": "linedf__purge_999", "purge_batch_id": 3, """ +
          s""""n_kept": ${afterP2.size}}""")
      assert(DedupStore.purgeLineContributions(spark, key,
        docs(3L -> "BOILER\ngamma"), purgeBatchId = 3L) === 0L)
      assert(totals(s"$b/linedf") === afterP2) // survivors untouched
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(b, "_purge_journal.json")))
    } finally {
      DedupStore.dropLines(spark, key); DedupStore.dropLines(spark, key2)
    }
  }

  test("near-dup store crash window + compactNear/expireNear parity") {
    import graft.sources.{DedupStore, IndexStore}
    val key = "spec-nearcrash://" +
      java.nio.file.Files.createTempDirectory("nearcrash").toString
    val b = s"/tmp/graft_dedupstore_${IndexStore.pathTag(key)}_near"
    val metaPath = java.nio.file.Paths.get(b, "_dedup_meta.json")
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep green forest tonight"
    try {
      DedupStore.nearDedupBatch(spark, key,
        docs(1L -> base,
          2L -> "completely different words that never overlap anything here at all today"),
        batchId = 1L).count()
      val metaAfter1 = java.nio.file.Files.readString(metaPath)
      val b2 = docs(
        3L -> (base + " addendum"), // near-dup of STORED 1
        4L -> "fresh content with its own vocabulary nothing shared with previous documents whatsoever")
      val k2 = DedupStore.nearDedupBatch(spark, key, b2, batchId = 2L)
        .select("doc_id").as[Long].collect().toSet
      assert(k2 === Set(4L))
      // crash between append and meta commit: rewind meta, retry
      java.nio.file.Files.writeString(metaPath, metaAfter1)
      val retry = DedupStore.nearDedupBatch(spark, key, b2, batchId = 2L)
        .select("doc_id").as[Long].collect().toSet
      assert(retry === k2,
        "retry must re-derive the original kept set (own partial rows " +
          "must not band-match the batch against itself)")
      // exactly-once store rows after the retry
      val sigs = spark.read.parquet(s"$b/sigs")
      assert(sigs.count() === sigs.select("doc_id").distinct().count())
      // compaction preserves behavior: the probe still drops a
      // near-dup of a stored doc, and file counts shrink to O(dirs)
      DedupStore.compactNear(spark, key)
      val k3 = DedupStore.nearDedupBatch(spark, key,
        docs(5L -> (base + " postscript")), batchId = 3L).count()
      assert(k3 === 0L, "post-compaction probe must still see stored docs")
      // retention: expiring everything before batch 4 forgets the
      // stored signatures — previously near-dup content is kept again
      DedupStore.expireNear(spark, key, keepFromBatchId = 4L)
      val k4 = DedupStore.nearDedupBatch(spark, key,
        docs(6L -> (base + " reprise")), batchId = 4L).count()
      assert(k4 === 1L, "expired near-dup signatures must be forgotten")
    } finally DedupStore.dropNear(spark, key)
  }

  test("embeddingDrift: identical snapshots read unmoved (centroid_cos " +
      "1, psi ~ 0); a rotated snapshot drifts on every signal") {
    import graft.operators.Drift
    val a = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.8f, 0.2f)), (4L, Array(0.95f, 0.05f)))
      .toDF("vec_id", "embedding")
    val same = Drift.embeddingDrift(a, a, buckets = 4).head()
    assert(same.getAs[Double]("centroid_cos") === 1.0)
    // same buckets both sides → every contrib is exactly 0
    assert(same.getAs[Double]("psi") === 0.0)
    assert(same.getAs[Double]("ref_norm_avg")
      === same.getAs[Double]("cur_norm_avg"))
    // current snapshot rotated 90°: centroid cosine collapses to ~0 and
    // the cos-to-ref-centroid mass moves buckets → psi over threshold
    val b = Seq(
      (1L, Array(0.0f, 1.0f)), (2L, Array(-0.1f, 0.9f)),
      (3L, Array(-0.2f, 0.8f)), (4L, Array(-0.05f, 0.95f)))
      .toDF("vec_id", "embedding")
    val moved = Drift.embeddingDrift(a, b, buckets = 4).head()
    assert(math.abs(moved.getAs[Double]("centroid_cos")) < 0.25)
    assert(moved.getAs[Double]("psi") > 0.25)
  }

  test("embeddingDrift refuses snapshots of different dimension (a " +
      "model swap must fail loudly, not truncate into a mild score)") {
    import graft.operators.Drift
    val d2 = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val d3 = Seq((1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Drift.embeddingDrift(d2, d3, buckets = 4).collect()
    }
    assert(e.getMessage.contains("dim=2") && e.getMessage.contains("dim=3"),
      e.getMessage)
  }

  test("sampleWeighted refuses duplicate key values; Drift.psi refuses " +
      "an empty side; per-group heavy hitters accept a non-string group") {
    // duplicate keys: the A-Res per-item contract is violated — raise,
    // don't over-sample
    val dup = Seq((1L, 5.0), (1L, 3.0), (2L, 4.0)).toDF("doc_id", "w")
    val e = intercept[Exception] {
      CorpusOps.sampleWeighted(dup, k = 2, col("w"), col("doc_id"),
        seed = 7L).collect()
    }
    assert(e.getMessage.contains("duplicate key"), e.getMessage)

    import graft.operators.Drift
    val some = (1 to 10).map(i => Tuple1(i.toDouble)).toDF("m")
    val none = some.filter(col("m") < 0)
    val e2 = intercept[Exception] {
      Drift.psi(none, some, col("m"), buckets = 4, lo = 0, hi = 10)
        .collect()
    }
    assert(e2.getMessage.contains("EMPTY"), e2.getMessage)
    val e3 = intercept[Exception] {
      Drift.psi(some, none, col("m"), buckets = 4, lo = 0, hi = 10)
        .collect()
    }
    assert(e3.getMessage.contains("EMPTY"), e3.getMessage)

    // integer group column: no ClassCastException, output keeps the type
    val d = Seq((1L, 7, Seq.fill(20)("aa").mkString(" ")),
      (2L, 9, Seq.fill(15)("bb").mkString(" ")))
      .toDF("doc_id", "domain", "text")
    val out = Frequency.topNgramsExactByGroup(d, "domain", n = 1, k = 1,
      capacity = 32)
    assert(out.schema("domain").dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(out.as[(Int, Int, String, Long)].collect().toSet ===
      Set((7, 1, "aa", 20L), (9, 1, "bb", 15L)))
  }

  test("removeContaminatedSpans cuts exactly the benchmark-matching run " +
      "and leaves clean docs byte-identical") {
    val bench = docs(100L -> "one two three four five six seven eight")
    val corpus = docs(
      // the benchmark 8-gram sits mid-document -> that span is cut
      1L -> "aa bb one two three four five six seven eight cc dd",
      2L -> "totally clean words that never overlap anything at all here")
    val out = CorpusOps.removeContaminatedSpans(corpus, bench, n = 8,
        minSpanTokens = 8)
      .select("doc_id", "cleaned_text", "n_removed_tok")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, "aa bb cc dd", 8L)))
    assert(out(2L)._2 ===
      "totally clean words that never overlap anything at all here")
    assert(out(2L)._3 === 0L)
  }

  test("trimOutliers keeps the interpolated-percentile interior; " +
      "normalizeText composes NFC + whitespace + control stripping") {
    val d = (1 to 20).map(i => (i.toLong, i.toDouble)).toDF("id", "m")
    val kept = CorpusOps.trimOutliers(d, "m", 0.10, 0.90)
      .select("id").as[Long].collect().toSet
    // p10 of 1..20 = 2.9, p90 = 18.1 -> kept 3..18
    assert(kept === (3L to 18L).toSet)

    // decomposed a + COMBINING ACUTE, tab run, BEL, ANGSTROM SIGN
    val t = Seq((1L, "a\u0301b  c\tde\u0007 \u212B "))
      .toDF("doc_id", "text")
    val norm = TextAnalysis.normalizeText(t)
      .select("norm_text").as[String].head()
    assert(norm === "\u00E1b c de \u00C5",
      norm.map(_.toInt.toHexString).mkString(","))
    // a control char BETWEEN spaces must not leave a double space
    // (controls map to space BEFORE the whitespace collapse)
    val norm2 = TextAnalysis.normalizeText(
      Seq((1L, "a \u0007 b")).toDF("doc_id", "text"))
      .select("norm_text").as[String].head()
    assert(norm2 === "a b", norm2.map(_.toInt.toHexString).mkString(","))
  }

  test("PSI drift: identical corpora score ~0, a hard shift scores big, " +
      "hand-computed two-bucket case is exact") {
    import graft.operators.Drift
    val a = (1 to 100).map(i => Tuple1((i % 10).toDouble)).toDF("m")
    val same = Drift.psi(a, a, col("m"), buckets = 4, lo = 0, hi = 10)
      .select("psi").as[Double].head()
    assert(same === 0.0)
    val shifted = (1 to 100).map(i => Tuple1((i % 10) + 20.0)).toDF("m")
    val big = Drift.psi(a, shifted, col("m"), buckets = 4, lo = 0, hi = 10)
      .select("psi").as[Double].head()
    assert(big > 0.25, s"hard shift must read as drift: $big")
    // hand case: 2 buckets, ref 10/0, cur 5/5 (clamped)
    val r2 = (1 to 10).map(_ => Tuple1(0.0)).toDF("m")
    val c2 = ((1 to 5).map(_ => Tuple1(0.0)) ++
      (1 to 5).map(_ => Tuple1(9.0))).toDF("m")
    val got = Drift.psi(r2, c2, col("m"), buckets = 2, lo = 0, hi = 10)
      .select("bucket", "contrib").as[(Int, Double)].collect().toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val pr0 = 10.5 / 11.0; val pc0 = 5.5 / 11.0
    val pr1 = 0.5 / 11.0; val pc1 = 5.5 / 11.0
    assert(got(0) === r6((pc0 - pr0) * math.log(pc0 / pr0)))
    assert(got(1) === r6((pc1 - pr1) * math.log(pc1 / pr1)))
  }

  test("per-group heavy hitters: exact per-group top-k with per-group " +
      "certification; a purged small group refuses instead of guessing") {
    val d = Seq(
      (1L, "en", Seq.fill(30)("aa").mkString(" ") + " " +
        Seq.fill(20)("bb").mkString(" ")),
      (2L, "de", Seq.fill(25)("xx").mkString(" ") + " " +
        Seq.fill(10)("yy").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val out = Frequency.topNgramsExactByGroup(d, "lang", n = 1, k = 2,
      capacity = 64)
      .as[(String, Int, String, Long)].collect().toSet
    assert(out === Set(("en", 1, "aa", 30L), ("en", 2, "bb", 20L),
      ("de", 1, "xx", 25L), ("de", 2, "yy", 10L)))
    // flat group under a tiny sketch: per-group refusal
    val flat = Seq((1L, "en",
      ((1 to 300).map(i => s"u$i u$i") ++ Seq.fill(5)("a") ++
        Seq.fill(5)("b")).mkString(" "))).toDF("doc_id", "lang", "text")
    val e = intercept[IllegalArgumentException] {
      Frequency.topNgramsExactByGroup(flat, "lang", n = 1, k = 2,
        capacity = 4)
    }
    assert(e.getMessage.contains("NOT certifiable"))
  }

  test("contamination flags exactly the docs sharing an n-gram with the " +
      "benchmark, counting distinct overlaps") {
    val bench = docs(100L -> "one two three four five six seven eight nine")
    val corpus = docs(
      // contains 'one..eight' and 'two..nine' → 2 distinct 8-shingles hit
      1L -> "zz one two three four five six seven eight nine yy",
      2L -> "one two three four five six seven DIFFERENT eight nine",
      3L -> "totally unrelated words that never overlap anything at all ok")
    val out = CorpusOps.contamination(corpus, bench, n = 8)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 2L))
  }

  test("redactPii substitutes placeholders and counts removals; " +
      "clean text passes through untouched") {
    val d = Seq(
      (1L, "mail bob.smith+x@sub.example.org and call 555-0199 today"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.io c@d.co and 555-1234 555-9999"))
      .toDF("doc_id", "text")
    val out = CorpusOps.redactPii(d)
      .select("doc_id", "n_emails", "n_phones", "redacted")
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._4 === "mail <EMAIL> and call <PHONE> today")
    assert((out(1L)._2, out(1L)._3) === ((1, 1)))
    assert(out(2L) === ((2L, 0, 0, "no pii here at all")))
    assert((out(3L)._2, out(3L)._3) === ((2, 2)))
    assert(out(3L)._4 === "two mails <EMAIL> <EMAIL> and <PHONE> <PHONE>")
  }

  test("stratified sampling is deterministic, honors per-stratum rates, " +
      "and drops strata without a rate") {
    val d = (0L until 400L).map(i =>
      (i, if (i % 2 == 0) "big" else "off", s"doc text $i"))
      .toDF("doc_id", "stratum", "text")
    val sampled = CorpusOps.sampleStratified(d, "stratum", col("doc_id"),
      Map("big" -> 0.25, "zero" -> 0.0))
    val rows = sampled.select("doc_id", "stratum").as[(Long, String)]
      .collect().toSet
    assert(rows.forall(_._2 == "big"), "unrated strata must be dropped")
    // 200 'big' rows at 25%: the md5 prefix is uniform, expect 50 ± wide slack
    assert(rows.size > 20 && rows.size < 80, s"got ${rows.size}")
    // determinism: a second run returns the identical set
    val again = CorpusOps.sampleStratified(d, "stratum", col("doc_id"),
      Map("big" -> 0.25, "zero" -> 0.0))
      .select("doc_id", "stratum").as[(Long, String)].collect().toSet
    assert(again === rows)
    // frac >= 1 keeps everything in the stratum
    val all = CorpusOps.sampleStratified(d, "stratum", col("doc_id"),
      Map("off" -> 1.0)).count()
    assert(all === 200L)
  }

  test("dupShingleStats: cross-doc shingle sharing counted, within-doc " +
      "repeats don't count as duplication; short docs absent") {
    val d = docs(
      1L -> "a b c d e f", // shares 'a b c' with doc 2
      2L -> "a b c x y z",
      3L -> "p q r s t u", // unique text
      4L -> "w x") // < 3 tokens: no shingles
    val out = CorpusOps.dupShingleStats(d, n = 3)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // doc 1: shingles {abc, bcd, cde, def} — 1 of 4 shared
    assert(out(1L) === ((1L, 4L, 0.25)))
    assert(out(2L) === ((2L, 4L, 0.25)))
    assert(out(3L) === ((3L, 4L, 0.0)))
    assert(!out.contains(4L))
    // a doc repeating its own shingle is NOT cross-doc duplication
    val self = docs(10L -> "m n o m n o", 11L -> "k k k k k")
    val s2 = CorpusOps.dupShingleStats(self, n = 3)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(s2(10L)._3 === 0.0)
    assert(s2(11L) === ((11L, 1L, 0.0))) // one distinct shingle, unshared
  }

  test("removeDuplicateSpans: a shared run >= minSpan is cut from both " +
      "docs, short shared runs and unique text survive") {
    val d = docs(
      1L -> "a b c d e f g h", // shares "a b c d e f" (6 tok) with doc 2
      2L -> "z z a b c d e f q",
      3L -> "p q r", // unique
      4L -> "m n o x1 y1", // shares only "m n o" (3 tok) with doc 5:
      5L -> "m n o x2 y2") //   span 3 < minSpan 4 → survives
    val out = CorpusOps.removeDuplicateSpans(d, n = 3, minSpanTokens = 4)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: dup 3-shingle starts 0..3 → island covers tokens 0..5
    // (span 6 >= 4) → cut → "g h"; 6 tokens, 12 chars removed
    assert(out(1L) === ((1L, "g h", 8L, 6L, 12L)))
    // doc 2: starts 2..5 → tokens 2..7 cut → "z z q"
    assert(out(2L) === ((2L, "z z q", 9L, 6L, 12L)))
    assert(out(3L) === ((3L, "p q r", 3L, 0L, 0L)))
    // "m n o" is duplicated but its island spans only 3 tokens < 4
    assert(out(4L) === ((4L, "m n o x1 y1", 5L, 0L, 0L)))
    assert(out(5L) === ((5L, "m n o x2 y2", 5L, 0L, 0L)))
    // a doc whose whole text is a duplicated span empties out
    val d2 = docs(10L -> "u v w x", 11L -> "u v w x y")
    val o2 = CorpusOps.removeDuplicateSpans(d2, n = 4, minSpanTokens = 4)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(o2(10L) === ((10L, "", 4L, 4L, 7L)))
    assert(o2(11L) === ((11L, "y", 5L, 4L, 8L)))
  }

  test("bpeMerges: the classic low/lower run — argmax per round with " +
      "the (cnt desc, lhs, rhs) tie-break, greedy merge, coverage") {
    val d = docs(1L -> "low low lower")
    // freqs: low=2, lower=1. Round 1 pairs: (l,o)=3, (o,w)=3, (w,e)=1,
    // (e,r)=1 → tie 3/3 broken by lhs: "l" < "o" → merge (l,o).
    // Round 2: (lo,w)=3, (w,e)=1, (e,r)=1 → merge (lo,w).
    // Round 3: lower=[low,e,r]: (low,e)=1, (e,r)=1 → tie broken by
    // lhs: "e" < "low" → merge (e,r).
    // After: low→[low] (×2), lower→[low,er] → avg = (1·2+2·1)/3.
    val out = CorpusOps.bpeMerges(d, numMerges = 3)
      .as[(Int, String, String, String, Long, Double)].collect()
      .sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3, r._4, r._5)).toSeq === Seq(
      (1, "l", "o", "lo", 3L),
      (2, "lo", "w", "low", 3L),
      (3, "e", "r", "er", 1L)))
    assert(out.forall(_._6 === math.rint(4.0 / 3 * 1e6) / 1e6))
    // early stop: a fully-merged vocabulary yields fewer rows
    val tiny = CorpusOps.bpeMerges(docs(1L -> "ab ab"), numMerges = 5)
      .as[(Int, String, String, String, Long, Double)].collect()
    assert(tiny.map(r => (r._1, r._2, r._3, r._4, r._5)).toSeq ===
      Seq((1, "a", "b", "ab", 2L)))
    assert(tiny.head._6 === 1.0)
  }

  test("bpeMergesLocal (counts-formulation driver trainer) is row-identical " +
      "to the distributed exact path at B=1") {
    val tiny = docs(1L -> "low low lower lowest newest",
      2L -> "new newer newest wide widest low")
    val a = CorpusOps.bpeMerges(tiny, numMerges = 10)
      .as[(Int, String, String, String, Long, Double)].collect()
      .sortBy(_._1).toSeq
    val b = CorpusOps.bpeMergesLocal(tiny, numMerges = 10)
      .as[(Int, String, String, String, Long, Double)].collect()
      .sortBy(_._1).toSeq
    assert(a === b)
    // and on the real fixture corpus at the q101 depth
    val fix = graft.Tables.load(spark, graft.TestSpark.Sf0001, "documents")
    val fa = CorpusOps.bpeMerges(fix, numMerges = 12)
      .as[(Int, String, String, String, Long, Double)].collect()
      .sortBy(_._1).toSeq
    val fb = CorpusOps.bpeMergesLocal(fix, numMerges = 12)
      .as[(Int, String, String, String, Long, Double)].collect()
      .sortBy(_._1).toSeq
    assert(fa === fb)
    // maxVocab guard fails loudly instead of collecting an over-sized vocab
    val e = intercept[IllegalArgumentException] {
      CorpusOps.bpeMergesLocal(fix, numMerges = 2, maxVocab = 3)
    }
    assert(e.getMessage.contains("maxVocab"))
  }

  test("bpeMerges batchSize: batched rounds always select the true top " +
      "pair first, and B=1 stays the exact reference") {
    val tiny = docs(1L -> "low low lower lowest newest",
      2L -> "new newer newest wide widest low")
    val ref = CorpusOps.bpeMerges(tiny, numMerges = 8)
      .as[(Int, String, String, String, Long, Double)].collect()
      .sortBy(_._1).toSeq
    val batched = CorpusOps.bpeMerges(tiny, numMerges = 8, batchSize = 4)
      .as[(Int, String, String, String, Long, Double)].collect()
      .sortBy(_._1).toSeq
    // same merge COUNT, and each round's first selection is the true
    // greedy argmax (the documented guarantee; later in-batch picks may
    // diverge when a merge creates a higher-count pair — measured in
    // BpeTune/BASELINE.md). Coverage is excluded: a diverged merge SET
    // legitimately realizes different compression.
    assert(batched.size === ref.size)
    assert(batched.head.productIterator.toSeq.take(5) ===
      ref.head.productIterator.toSeq.take(5))
    // steps stay densely sequential across rounds (a starved or
    // conflicted selection defers pairs, never skips step numbers)
    assert(batched.map(_._1) === (1 to batched.size))
    // every batched pair's recorded count is its true round-start
    // adjacency count: for the FIRST round that is the count over the
    // original character vocabulary, independently recomputable here
    val charPairs = Seq("low low lower lowest newest",
      "new newer newest wide widest low")
      .flatMap(_.split(" ")).filter(_.nonEmpty)
      .flatMap(w => w.toCharArray.map(_.toString).sliding(2)
        .filter(_.size == 2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
    batched.takeWhile { r =>
      // first-round selections are those whose pair exists over the
      // initial char vocab with exactly the recorded count
      charPairs.get((r._2, r._3)).contains(r._5)
    } match {
      case firstRound => assert(firstRound.nonEmpty,
        "first batched round must record true round-start counts")
    }
  }

  test("bpeEncode applies learned merges: the low/lower run's realized " +
      "token counts per document") {
    val d = docs(1L -> "low low lower", 2L -> "low")
    val merges = CorpusOps.bpeMerges(d, numMerges = 3)
      .orderBy("step").select("lhs", "rhs")
      .as[(String, String)].collect().toSeq
    // merges: (l,o) (lo,w) (e,r) → low = 1 token, lower = [low, er] = 2
    val out = CorpusOps.bpeEncode(d, merges)
      .select("doc_id", "n_words", "n_tokens", "chars_per_token")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 3L, 4L, math.rint(11.0 / 4 * 1e6) / 1e6)))
    assert(out(2L) === ((2L, 1L, 1L, 3.0)))
    // encoding with merges from THIS corpus realizes exactly the
    // training run's average symbols per word (the q101 coverage stat)
    val cov = CorpusOps.bpeMerges(d, numMerges = 3)
      .select("avg_symbols_per_word").as[Double].head()
    val realized = CorpusOps.bpeEncode(d, merges)
      .agg(sum("n_tokens"), sum("n_words")).as[(Long, Long)].head()
    assert(math.rint(realized._1.toDouble / realized._2 * 1e6) / 1e6 === cov)
  }

  test("mixturePlan: the binding stratum keeps everything, others thin " +
      "to the target proportions; downsample-only invariant holds") {
    // tokens: A=1000, B=100, shares: A=0.5, B=0.5 → T* = min(2000, 200)
    // = 200 → rate_A = 0.1 (thinned), rate_B = 1.0 (binding)
    val d = (0 until 100).map(i => (i.toLong,
      if (i < 50) "A" else "B",
      Seq.fill(if (i < 50) 20 else 2)("w").mkString(" ")))
      .toDF("doc_id", "stratum", "text")
    val out = CorpusOps.mixturePlan(d, "stratum",
      Map("A" -> 0.5, "B" -> 0.5))
      .select("stratum", "n_docs", "n_tok", "rate", "exp_tok")
      .as[(String, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("A") === (("A", 50L, 1000L, 0.1, 100L)))
    assert(out("B") === (("B", 50L, 100L, 1.0, 100L)))
    // the realized mix hits the target shares exactly: 100/100 tokens
  }

  test("mixturePlan: a target stratum absent from the corpus fails " +
      "loudly instead of silently renormalizing the mix") {
    val d = Seq((1L, "A", "w w w")).toDF("doc_id", "stratum", "text")
    val ex = intercept[Exception] {
      CorpusOps.mixturePlan(d, "stratum", Map("A" -> 0.5, "ZZ" -> 0.5))
        .collect()
    }
    assert(ex.getMessage.contains("ZZ"))
  }

  test("hexThreshold: near-1 fractions clamp to ffff (keep ~all), " +
      "never the 5-char '10000' that would invert the compare") {
    assert(CorpusOps.hexThreshold(0.999999) === "ffff")
    assert(CorpusOps.hexThreshold(1.0) === "zzzz")
    assert(CorpusOps.hexThreshold(0.0) === "0000")
    assert(CorpusOps.hexThreshold(0.5) === "8000")
    // and the sampler keeps ~everything at frac just below 1
    val d = (0 until 200).map(i => (i.toLong, "s", "t"))
      .toDF("doc_id", "stratum", "text")
    val kept = CorpusOps.sampleStratified(d, "stratum", col("doc_id"),
      Map("s" -> 0.999999)).count()
    assert(kept >= 195L, s"expected ~all 200 kept, got $kept")
  }

  test("vocabulary: rank order is (cnt desc, word asc), coverage " +
      "accumulates to the true token-mass fraction") {
    val d = docs(1L -> "b b b a a c", 2L -> "a b d")
    // counts: b=4, a=3, c=1, d=1 (total 9); top-3 = b, a, c (tie c<d)
    val out = CorpusOps.vocabulary(d, topV = 3)
      .as[(Int, String, Long, Double)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq((1, "b", 4L), (2, "a", 3L), (3, "c", 1L)))
    assert(out.map(_._4).toSeq ===
      Seq(math.rint(4.0 / 9 * 1e6) / 1e6, math.rint(7.0 / 9 * 1e6) / 1e6,
        math.rint(8.0 / 9 * 1e6) / 1e6))
  }

  test("packSequences: offsets are per-shard cumsums, straddling docs " +
      "span the right sequence range") {
    val d = Seq(
      (1L, "s1", "a b c"), // shard s1: 3 toks, off 0, seq 0..0
      (2L, "s1", Seq.fill(6)("w").mkString(" ")), // off 3, 6 toks → 3..8 spans seq 0→1 at budget 8
      (3L, "s1", "x y"), // off 9 → seq 1
      (4L, "s2", "p q r")) // independent shard: off 0
      .toDF("doc_id", "source", "text")
    val out = CorpusOps.packSequences(d, "source", "doc_id", budget = 8)
      .select("doc_id", "n_tok", "start_off", "first_seq", "last_seq")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 3L, 0L, 0L, 0L)))
    assert(out(2L) === ((2L, 6L, 3L, 0L, 1L))) // straddles the 8-token boundary
    assert(out(3L) === ((3L, 2L, 9L, 1L, 1L)))
    assert(out(4L) === ((4L, 3L, 0L, 0L, 0L)))
  }

  test("int8 quantization: known codes, exact integer dot, zero-vector safety") {
    import graft.functions.expressions.VectorExpressions.{dot_i8, max_abs, quantize_i8}
    val d = Seq(
      (1L, Seq(1.0f, -0.5f, 0.0f, 0.254f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val rows = d.select(col("vec_id"), quantize_i8(col("embedding")).as("c"),
        max_abs(col("embedding")).as("m"))
      .as[(Long, Array[Byte], Double)].collect().map(r => r._1 -> r).toMap
    // round(x * 127 / max|x|): 1.0→127, -0.5→-63 (Math.round half-up),
    // 0→0, 0.254→32
    assert(rows(1L)._2.toSeq === Seq[Byte](127, -63, 0, 32))
    assert(rows(1L)._3 === 1.0)
    assert(rows(2L)._2.toSeq === Seq[Byte](0, 0, 0, 0)) // all-zero input
    val dot = d.filter(col("vec_id") === 1L)
      .select(dot_i8(quantize_i8(col("embedding")),
        quantize_i8(col("embedding"))).as("s"))
      .as[Long].head()
    assert(dot === 127L * 127 + 63L * 63 + 32L * 32)
  }

  test("SQ8 quantized-scan ANN is output-identical to exact kNN at m=32") {
    val emb = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = SimilaritySearch.bruteForceTopK(q, emb, k = 4)
      .select("query_id", "rank", "vec_id", "score")
      .as[(Long, Int, Long, Double)].collect().toSet
    val sq8 = SimilaritySearch.quantizedTopK(q, emb, k = 4, m = 32)
      .select("query_id", "rank", "vec_id", "score")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(sq8 === exact)
  }

  test("PQ ANN is output-identical to exact kNN at the shipped operating point") {
    val emb = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = SimilaritySearch.bruteForceTopK(q, emb, k = 4)
      .select("query_id", "rank", "vec_id", "score")
      .as[(Long, Int, Long, Double)].collect().toSet
    val pq = SimilaritySearch.pqTopK(q, emb, k = 4, m = 64, numSub = 16,
        ksub = 64, iters = 2)
      .select("query_id", "rank", "vec_id", "score")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(pq === exact)
  }

  test("IVF-PQ is output-identical to float IVF at the same probes " +
      "(the PQ layer adds no recall loss)") {
    val emb = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select("vec_id", "embedding")
    val q = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val cents = SimilaritySearch.kMeansCentroids(emb, k = 16, iters = 3)
    val ivf = SimilaritySearch.ivfTopK(q, emb, cents, k = 4, nProbe = 6)
      .select("query_id", "rank", "vec_id")
      .as[(Long, Int, Long)].collect().toSet
    val ivfpq = SimilaritySearch.ivfPqTopK(q, emb, cents, k = 4,
        nProbe = 6, m = 64, numSub = 16, ksub = 64, iters = 2)
      .select("query_id", "rank", "vec_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(ivfpq === ivf)
    assert(ivfpq.nonEmpty)
  }

  test("rocchioTopK: beta=0 reduces to plain exact kNN (a positive " +
      "scalar on the query cannot reorder cosine); beta>0 pulls the " +
      "ranking toward the feedback centroid on a controlled fixture") {
    val emb = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select("vec_id", "embedding")
    val q = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "vec_id")
        .as[(Long, Int, Long)].collect().toSet
    val plain = key(SimilaritySearch.bruteForceTopKAgg(q, emb, 4))
    val reduced = key(SimilaritySearch.rocchioTopK(q, emb, k = 4,
      fetchK = 8, alpha = 2.0, beta = 0.0))
    assert(reduced === plain)
    // controlled fixture: query on the x-axis; its top-2 pseudo-rel
    // docs lean +y (centroid (0.75, 0.65)), so the expanded query
    // q' = q + 4·m = (4, 2.6) flips rank 3 from the -y doc 4
    // (cos(q', d4) = 0.067) to the +y doc 3 (cos(q', d3) = 0.545) —
    // hand-computed; plain top-3 keeps doc 4 (cos(q, d4) = 0.6 beats
    // doc 3's 0)
    val idx = Seq(
      (1L, Array(0.8f, 0.6f)), (2L, Array(0.7f, 0.7f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.6f, -0.8f)))
      .toDF("vec_id", "embedding")
    val q1 = Seq((7L, Array(1.0f, 0.0f))).toDF("query_id", "query_vec")
    val plain1 = SimilaritySearch.bruteForceTopKAgg(q1, idx, 3)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(plain1.toSeq === Seq(1L, 2L, 4L))
    val fb = SimilaritySearch.rocchioTopK(q1, idx, k = 3, fetchK = 2,
      alpha = 1.0, beta = 4.0)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(fb.toSeq === Seq(1L, 2L, 3L))
  }

  test("mmrRerank composes with a swapped-in ANN fetch: identical MMR " +
      "output when the fetch is row-identical to exact") {
    val emb = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .select("vec_id", "embedding")
    val q = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val viaExact = SimilaritySearch.mmrTopK(q, emb, k = 4, fetchK = 20,
        lambda = 0.5)
      .select("query_id", "rank", "vec_id")
      .as[(Long, Int, Long)].collect().toSet
    // the q59 recall-1.0 LSH point: fetch is row-identical to exact,
    // so the greedy stage must produce the identical diversified set
    val lshFetch = SimilaritySearch.lshTopK(q, emb, k = 20, tables = 64,
      bits = 12, probes = 48)
    val viaLsh = SimilaritySearch.mmrRerank(lshFetch, emb, k = 4,
        lambda = 0.5)
      .select("query_id", "rank", "vec_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(viaLsh === viaExact)
    assert(viaLsh.nonEmpty)
  }

  test("PQ ADC is exact when every distinct subvector earns its own centroid") {
    import graft.functions.expressions.PqExpressions._
    // 3 vectors, dim 4, numSub=2 ⇒ 6 subvectors, ≤3 distinct per
    // subspace; ksub=4 ≥ distinct count, so Lloyd converges to the
    // subvectors themselves and the ADC "approximation" is the exact
    // dot product.
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 2.0f)),
      (2L, Seq(0.0f, 1.0f, 2.0f, 0.0f)),
      (3L, Seq(1.0f, 1.0f, 1.0f, 1.0f))).toDF("vec_id", "embedding")
    val cb = SimilaritySearch.pqCodebooks(vecs, numSub = 2, ksub = 4, iters = 3)
    val flat = SimilaritySearch.collectCodebook(cb, numSub = 2, ksub = 4)
    val qv = Seq((9L, Seq(1.0f, 2.0f, 3.0f, 4.0f))).toDF("query_id", "query_vec")
    val adc = vecs.crossJoin(qv)
      .select(col("vec_id"),
        pq_adc_dot(pq_encode(col("embedding"), flat, 2, 4),
          pq_table(col("query_vec"), flat, 2, 4)).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(adc(1L) - (1.0 + 8.0)) < 1e-9)
    assert(math.abs(adc(2L) - (2.0 + 6.0)) < 1e-9)
    assert(math.abs(adc(3L) - 10.0) < 1e-9)
  }

  test("PQ kernels fail loudly on dimension/codebook mismatches") {
    import graft.functions.expressions.PqExpressions._
    val flat = new Array[Double](2 * 4 * 2) // numSub=2, ksub=4, dsub=2
    val bad = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse(""))
      .mkString(" | ")
    val e1 = intercept[Exception] {
      bad.select(pq_encode(col("embedding"), flat, 2, 4)).collect()
    }
    assert(chain(e1).contains("pq_encode"))
    // codes from a numSub=3 codebook scored against a numSub=2 table
    val v = Seq((1L, Seq(1.0f, 2.0f, 3.0f, 4.0f, 5.0f, 6.0f)))
      .toDF("vec_id", "embedding")
    val flat3 = new Array[Double](3 * 4 * 2) // numSub=3, ksub=4, dsub=2
    val tab = new Array[Double](2 * 4 * 3)   // numSub=2 table, ksub=4... 24 % 3 = 0
    val e2 = intercept[Exception] {
      v.select(pq_adc_dot(pq_encode(col("embedding"), flat3, 3, 4),
        lit(tab.take(7)))).collect() // 7 % 3 != 0 → must throw
    }
    assert(chain(e2).contains("pq_adc_dot"))
  }

  test("MMR greedy selection matches the hand-computed trade-off at two lambdas") {
    val index = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.8f, 0.6f)),
      (3L, Seq(0.6f, 0.8f)),
      (4L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val q = Seq((9L, Seq(1.0f, 0.0f))).toDF("query_id", "query_vec")
    // λ=0.7 favors relevance: 1 (rel 1.0), 2 (.7·.8−.3·.8=.32),
    // 3 (.7·.6−.3·max(.6,.96)=.132)
    val hi = SimilaritySearch.mmrTopK(q, index, k = 3, fetchK = 4,
        lambda = 0.7)
      .orderBy("rank").select("vec_id", "mmr_score")
      .as[(Long, Double)].collect()
    assert(hi.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(math.abs(hi(0)._2 - 1.0) < 1e-6)
    assert(math.abs(hi(1)._2 - 0.32) < 1e-6)
    assert(math.abs(hi(2)._2 - 0.132) < 1e-6)
    // λ=0.3 favors diversity: 1, then 4 (orthogonal, .3·0−.7·0=0 beats
    // 2's −.32 and 3's −.24), then 2 (−.32 beats 3's −.38)
    val lo = SimilaritySearch.mmrTopK(q, index, k = 3, fetchK = 4,
        lambda = 0.3)
      .orderBy("rank").select("vec_id").as[Long].collect()
    assert(lo.toSeq === Seq(1L, 4L, 2L))
  }

  test("globalShuffle is a permutation, replayable locally, and invariant " +
      "to input partitioning") {
    val d = docs((1L to 97L).map(i => i -> s"doc $i"): _*)
    val out = CorpusOps.globalShuffle(d, "doc_id", seed = 42L)
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(out.values.toSeq.sorted === (0L until 97L).toSeq)
    // independent local replay of the md5 permutation
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long): String = md.digest(s"$id:42".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expected = (1L to 97L).sortBy(id => (key(id), id))
      .zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(out === expected)
    // a different physical input layout yields the identical permutation
    val out2 = CorpusOps.globalShuffle(d.repartition(7), "doc_id",
        seed = 42L, partitions = 3)
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(out2 === expected)
  }

  test("compressionSignals: repetition compresses far better than " +
      "high-entropy text; ratio bounds and doubling subadditivity hold") {
    val rep = "spam ham " * 60                  // 540 chars of repetition
    val mixed = (1 to 60).map(i => s"w${i * 37 % 101}x${i * 53 % 89}")
      .mkString(" ")                            // varied, little repetition
    val d = docs(1L -> rep, 2L -> mixed, 3L -> "")
    val out = TextAnalysis.compressionSignals(d)
      .select("doc_id", "raw_len", "deflate_len", "compress_ratio")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === rep.length.toLong)
    assert(out(1L)._4 < 0.1, s"repetition should crush: ${out(1L)}")
    assert(out(2L)._4 > out(1L)._4 * 3,
      s"varied text must compress worse: ${out(2L)} vs ${out(1L)}")
    assert(out(2L)._4 > 0.0 && out(2L)._4 <= 1.5)
    assert(out(3L)._4 === 1.0) // empty doc: nothing to judge
    // doubling subadditivity — the back-reference property q122 pins
    // corpus-wide
    import graft.functions.expressions.TextExpressions.deflate_stats
    val sub = d.filter(col("doc_id") =!= 3)
      .select(col("doc_id"),
        deflate_stats(col("text")).getField("deflate_len").as("one"),
        deflate_stats(concat(col("text"), col("text")))
          .getField("deflate_len").as("two"))
      .as[(Long, Long, Long)].collect()
    sub.foreach { case (id, one, two) =>
      assert(two < 2 * one, s"doc $id: deflate(2t)=$two !< 2*deflate(t)=$one")
    }
  }

  test("lmScore reproduces the hand-computed interpolated bigram entropy") {
    val d = docs(1L -> "a a b", 2L -> "a b")
    val out = TextAnalysis.lmScore(d)
      .select("doc_id", "n_tok", "cross_entropy")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // corpus: N=5, V={a,b}, c(a)=3, c(b)=2; c(a,a)=1, c(a,b)=2; α=.1, λ=.7
    val denU = 5.0 + 0.1 * 2
    val pUa = 3.1 / denU; val pUb = 2.1 / denU
    val pAA = 0.7 * (1.1 / 3.2) + 0.3 * pUa
    val pAB = 0.7 * (2.1 / 3.2) + 0.3 * pUb
    def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
    val ce1 = r6(-(math.log(pUa) + math.log(pAA) + math.log(pAB)) / 3.0)
    val ce2 = r6(-(math.log(pUa) + math.log(pAB)) / 2.0)
    assert(out(1L)._2 === 3L)
    assert(out(1L)._3 === ce1)
    assert(out(2L) === ((2L, 2L, ce2)))
  }

  test("truncatedTopK: d=dim is exactly the full scan; truncated scores " +
      "are true full-dim cosines (re-rank soundness)") {
    val emb = graft.Tables.load(spark, TestSpark.Sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val exact = SimilaritySearch.bruteForceTopK(q, emb, k = 4)
      .select("query_id", "rank", "vec_id", "score")
      .as[(Long, Int, Long, Double)].collect()
    // untruncated: coarse ranking IS the exact ranking → identity
    val full = SimilaritySearch.truncatedTopK(q, emb, k = 4, d = 64, m = 8)
      .select("query_id", "rank", "vec_id", "score")
      .as[(Long, Int, Long, Double)].collect()
    assert(full.toSet === exact.toSet)
    // truncated coarse pass: every returned score must still be the
    // TRUE full-dim cosine (the re-rank recomputes it), k rows per query
    val exactScores = exact.map(r => (r._1, r._3) -> r._4).toMap
    val trunc = SimilaritySearch.truncatedTopK(q, emb, k = 4, d = 16, m = 8)
      .select("query_id", "rank", "vec_id", "score")
      .as[(Long, Int, Long, Double)].collect()
    assert(trunc.map(_._1).distinct.length === 5)
    trunc.groupBy(_._1).values.foreach(rows =>
      assert(rows.map(_._2).sorted.toSeq === Seq(1, 2, 3, 4)))
    trunc.foreach { case (qid, _, vid, s) =>
      exactScores.get((qid, vid)).foreach(es => assert(math.abs(s - es) < 1e-12))
    }
  }

  test("lmScore ranks a rare-token doc above a common-token doc") {
    val common = (1 to 20).map(i => (i.toLong, "the cat sat on the mat"))
    val d = (common :+ (99L, "zq xv qj wk pf gz")).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(d)
      .select("doc_id", "cross_entropy").as[(Long, Double)].collect().toMap
    assert(out(99L) > out(1L)) // gibberish = high cross-entropy
    assert(out(1L) === out(2L)) // identical docs score identically
  }

  test("groupSplit: a group can NEVER straddle splits, fractions are " +
      "respected over many groups, malformed fractions raise") {
    val d = (0L until 600L).map(i => (i, i / 3L)).toDF("doc_id", "grp")
    val out = CorpusOps.groupSplit(d, "grp",
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), seed = 7L)
    // leakage invariant: every group maps to exactly one split
    val straddle = out.groupBy("grp")
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1).count()
    assert(straddle === 0L)
    // all three splits populated; realized group fractions near target
    // (200 groups, md5-uniform — train should hold a clear majority)
    val byS = out.select("grp", "split").distinct()
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byS.keySet === Set("train", "val", "test"))
    assert(byS("train") > 140 && byS("train") < 190, byS.toString)
    // same (group, seed) -> same split regardless of the row set
    val out2 = CorpusOps.groupSplit(d.filter(col("doc_id") % 2 === 0),
      "grp", Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), seed = 7L)
    val m1 = out.select("grp", "split").distinct()
      .as[(Long, String)].collect().toMap
    val m2 = out2.select("grp", "split").distinct()
      .as[(Long, String)].collect().toMap
    assert(m2.forall { case (g, s) => m1(g) == s })
    intercept[IllegalArgumentException] {
      CorpusOps.groupSplit(d, "grp", Seq(("a", 0.5), ("b", 0.4)))
    }
    intercept[IllegalArgumentException] {
      CorpusOps.groupSplit(d, "grp", Seq(("a", 0.5), ("a", 0.5)))
    }
  }

  test("importanceWeights: documents dense in target-domain tokens " +
      "outweigh off-domain ones; the empty target raises loudly") {
    val d = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "gamma delta gamma delta", false),
      (3L, "alpha beta gamma delta", false))
      .toDF("doc_id", "text", "is_tgt")
    val w = TextAnalysis.importanceWeights(d, col("is_tgt"))
      .select("doc_id", "log_w").as[(Long, Double)].collect().toMap
    // doc 1 is pure target vocabulary, doc 2 pure off-target, doc 3
    // mixed: strict ordering
    assert(w(1L) > w(3L) && w(3L) > w(2L), w.toString)
    val e = intercept[Exception] {
      TextAnalysis.importanceWeights(d, lit(false)).collect()
    }
    assert(e.getMessage.contains("importanceWeights") ||
      (e.getCause != null &&
        e.getCause.getMessage.contains("importanceWeights")), e.getMessage)
  }

  test("temperatureShares: T=1 reproduces the natural mixture, higher T " +
      "flattens toward uniform, shares stay normalized") {
    val d = Seq.tabulate(90)(i =>
        (i.toLong, ("w " * (if (i < 80) 10 else 1)).trim,
          if (i < 80) "big" else "small"))
      .toDF("doc_id", "text", "lang")
    def shares(t: Double) = CorpusOps.temperatureShares(d, "lang", t)
      .select("lang", "nat_share", "target_share")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val s1 = shares(1.0)
    assert(math.abs(s1("big")._2 - s1("big")._1) < 1e-6)
    val s4 = shares(4.0)
    // T=4 pulls the small stratum up, the big one down — toward uniform
    assert(s4("small")._2 > s1("small")._2)
    assert(s4("big")._2 < s1("big")._2)
    assert(math.abs(s4.values.map(_._2).sum - 1.0) < 1e-5)
    intercept[IllegalArgumentException] {
      CorpusOps.temperatureShares(d, "lang", 0.0)
    }
  }

  test("tokenizerFertility: a language whose words the merges cover " +
      "encodes at lower fertility than one they never touch") {
    val d = Seq(
      (1L, "abab abab abab", "cov"),
      (2L, "xyzq xyzq xyzq", "unc"))
      .toDF("doc_id", "text", "lang")
    // merges hand-build the 'abab' word: (a,b) -> ab, (ab,ab) -> abab
    val out = CorpusOps.tokenizerFertility(d,
        Seq(("a", "b"), ("ab", "ab")))
      .select("lang", "fertility").as[(String, Double)].collect().toMap
    assert(out("cov") === 1.0) // one symbol per word
    assert(out("unc") === 4.0) // four chars, no merge applies
  }

  test("winnowing: a shared run of w+k-1 tokens yields a shared " +
      "fingerprint (the paper's guarantee); disjoint docs share none; " +
      "the df-cap kills ubiquitous boilerplate pairs") {
    // k=4, w=4: guarantee threshold = 7 shared consecutive tokens
    val shared = "p1 p2 p3 p4 p5 p6 p7"
    val d = docs(
      1L -> s"a1 a2 a3 $shared a4 a5",
      2L -> s"b1 b2 $shared b3 b4 b5",
      3L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")
    val fps = Dedup.winnowFingerprints(d).cache()
    val byDoc = fps.as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "docs sharing a 7-token run must share a fingerprint")
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
    val pairs = Dedup.winnowPairs(fps, dfCap = 10, minShared = 1)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
    // a fingerprint in MORE than dfCap docs forms no pairs
    val boiler = docs((1L to 12L).map(i =>
      i -> s"x1 x2 x3 x4 x5 x6 x7"): _*)
    val bp = Dedup.winnowPairs(Dedup.winnowFingerprints(boiler),
      dfCap = 10, minShared = 1).count()
    assert(bp === 0L)
    fps.unpersist()
  }

  test("robustOutliers: the median/MAD rule flags a huge outlier a " +
      "mean/stddev rule would let poison its own threshold; zero-MAD " +
      "strata flag anything off the median") {
    // 90..110 (median 100, MAD 5 -> threshold 17.5) plus a 1e6 spike:
    // the spike would inflate a stddev-based threshold to ~2e5 and a
    // genuinely aberrant 200 would hide; under MAD it cannot
    val d = ((90 to 110).map(_.toDouble) ++ Seq(200.0, 1e6))
      .zipWithIndex.map { case (v, i) => (i.toLong, v, "a") }
      .toDF("doc_id", "x", "grp")
    val out = CorpusOps.robustOutliers(d, "x", "grp")
      .select("doc_id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(out(22L)) // the 1e6 spike
    assert(out(21L)) // 200: dev 100 > 17.5 — flagged despite the spike
    assert(!out(0L) && !out(20L)) // 90 and 110 are inside the band
    val zero = Seq((1L, 5.0, "z"), (2L, 5.0, "z"), (3L, 5.0, "z"),
      (4L, 7.0, "z")).toDF("doc_id", "x", "grp")
    val zo = CorpusOps.robustOutliers(zero, "x", "grp")
      .select("doc_id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(zo === Map(1L -> false, 2L -> false, 3L -> false, 4L -> true))
  }

  test("bootstrapCI: a constant metric collapses the interval to the " +
      "constant; a spread metric straddles the point; replicate count " +
      "bounded by b; low-b guard") {
    val const = (0L until 30L).map(i => (i, 0.5)).toDF("query_id", "m")
    val c = Evaluation.bootstrapCI(const, "m", b = 100, seed = 1L)
      .as[(Double, Double, Double, Long)].head()
    assert(c === ((0.5, 0.5, 0.5, 100L)))
    // all-zero-weight replicates are possible but vanishingly rare at
    // 30 queries — b_eff == b here is the expected (and asserted) case
    val spread = (0L until 30L).map(i => (i, if (i < 15) 0.0 else 1.0))
      .toDF("query_id", "m")
    val s = Evaluation.bootstrapCI(spread, "m", b = 200, seed = 2L)
      .as[(Double, Double, Double, Long)].head()
    assert(s._1 === 0.5)
    assert(s._2 < 0.5 && s._3 > 0.5, s"CI must straddle the point: $s")
    assert(s._2 > 0.2 && s._3 < 0.8,
      s"95% CI of a balanced 0/1 metric over 30 queries is ~±0.18: $s")
    assert(s._4 === 200L)
    intercept[IllegalArgumentException] {
      Evaluation.bootstrapCI(spread, "m", b = 10)
    }
  }

  test("jacobiEig: hand 2x2 and diagonal cases; rotationModel is " +
      "orthonormal, eigenvalue-descending, and an exact isometry") {
    // [[3,1],[1,3]] -> eigenvalues 4 and 2
    val (ev, _) = SimilaritySearch.jacobiEig(
      Array(3.0, 1.0, 1.0, 3.0), 2)
    assert(ev.sorted.reverse.zip(Seq(4.0, 2.0))
      .forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // a fixture-fitted model: R R^T = I, spectrum desc, dots preserved
    val emb = graft.Tables.load(spark, graft.TestSpark.Sf0001, "embeddings")
    val m = SimilaritySearch.rotationModel(emb)
    val d = m.dim
    for (r <- 0 until d; c <- r until d) {
      var s = 0.0
      for (k <- 0 until d) s += m.rot(r * d + k) * m.rot(c * d + k)
      assert(math.abs(s - (if (r == c) 1.0 else 0.0)) < 1e-9,
        s"R R^T [$r,$c] = $s")
    }
    assert(m.eigvals.zip(m.eigvals.tail).forall { case (a, b) => a >= b - 1e-12 })
    // isometry on real rows: pairwise dot products unchanged
    import graft.functions.expressions.VectorExpressions.dot_f
    val two = emb.filter(col("vec_id") < 2).cache()
    val before = two.as("a").crossJoin(two.as("b"))
      .select(dot_f(col("a.embedding"), col("b.embedding")))
      .as[Double].collect().sorted
    val rot2 = SimilaritySearch.rotate(two, m).cache()
    val after = rot2.as("a").crossJoin(rot2.as("b"))
      .select(dot_f(col("a.embedding"), col("b.embedding")))
      .as[Double].collect().sorted
    assert(before.zip(after).forall { case (x, y) => math.abs(x - y) < 1e-8 })
    two.unpersist(); rot2.unpersist()
  }

  test("SecondMomentAgg hand case; MatVecF known product and " +
      "dimension-mismatch throw") {
    import graft.functions.expressions.VectorExpressions.mat_vec
    val s = Seq(Array(1.0f, 2.0f), Array(3.0f, 4.0f)).toDF("v")
      .select(graft.functions.SecondMomentAgg.asColumn(col("v")))
      .as[Array[Double]].head()
    // E[x x^T] of (1,2),(3,4): [[5,7],[7,10]]
    assert(s.toSeq === Seq(5.0, 7.0, 7.0, 10.0))
    val y = Seq(Array(1.0f, 2.0f)).toDF("v")
      .select(mat_vec(col("v"), Array(0.0, 1.0, 1.0, 0.0), 2))
      .as[Array[Double]].head()
    assert(y.toSeq === Seq(2.0, 1.0)) // swap matrix
    intercept[Exception] {
      Seq(Array(1.0f, 2.0f, 3.0f)).toDF("v")
        .select(mat_vec(col("v"), Array(0.0, 1.0, 1.0, 0.0), 2))
        .collect()
    }
  }

  test("calibration: hand-computed reliability table and ECE; " +
      "perfectly calibrated input scores ECE ~ bin-width noise only") {
    // bin 7 [0.7, 0.8): conf 0.75, acc 1.0 -> gap 0.25 over 2 of 4 rows
    // bin 2 [0.2, 0.3): conf 0.25, acc 0.5 -> gap 0.25 over 2 of 4 rows
    val d = Seq((0.7, true), (0.8 - 1e-9, true), (0.2, false), (0.3 - 1e-9, true))
      .toDF("p", "ok")
    val out = Evaluation.calibration(d, "p", "ok", bins = 10)
      .select("bin", "n", "conf", "acc", "ece")
      .as[(Int, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet === Set(2, 7))
    assert(math.abs(out(7)._3 - 0.75) < 1e-6); assert(out(7)._4 === 1.0)
    assert(math.abs(out(2)._3 - 0.25) < 1e-6); assert(out(2)._4 === 0.5)
    assert(math.abs(out(7)._5 - 0.25) < 1e-6) // (2/4)*0.25 + (2/4)*0.25
    // score exactly 1.0 folds into the top bin, not bin 10
    val top = Evaluation.calibration(
      Seq((1.0, true)).toDF("p", "ok"), "p", "ok").select("bin")
      .as[Int].collect()
    assert(top === Array(9))
    intercept[IllegalArgumentException] {
      Evaluation.calibration(d, "p", "ok", bins = 1)
    }
  }

  test("languageIdWithConf: predictions identical to languageId; conf " +
      "is the Laplace share and sums sensibly") {
    val docs = graft.Tables.load(spark, graft.TestSpark.Sf0001, "documents")
    val a = TextAnalysis.languageId(docs)
      .select("doc_id", "predicted_lang", "marker_hits")
      .as[(Long, String, Int)].collect()
      .map { case (i, pl, h) => i -> ((pl, h)) }.toMap
    val b = TextAnalysis.languageIdWithConf(docs)
      .select("doc_id", "predicted_lang", "marker_hits", "total_hits",
        "lang_conf")
      .collect()
    assert(b.forall { r =>
      a(r.getLong(0)) == ((r.getString(1), r.getInt(2)))
    })
    assert(b.forall { r =>
      val conf = r.getDouble(4)
      math.abs(conf - (r.getInt(2) + 1.0) / (r.getInt(3) + 5.0)) < 1e-12 &&
        conf > 0.0 && conf <= 1.0
    })
  }

  test("TileJitterF: bit-identical to the composed transform/md5/conv " +
      "column formulation the DuckDB oracle replays") {
    import graft.functions.expressions.VectorExpressions.tile_jitter
    val emb = graft.Tables.load(spark, graft.TestSpark.Sf0001, "embeddings")
      .filter(col("vec_id") < 20)
    val rms = sqrt(aggregate(col("embedding"), lit(0.0d),
      (a, x) => a + x.cast("double") * x.cast("double")) / lit(64.0))
    val u = (i: org.apache.spark.sql.Column) =>
      conv(substring(md5(concat(col("vec_id").cast("string"), lit(":"),
        i.cast("string"))), 1, 13), 16, 10).cast("double") /
        lit(4503599627370496.0) - lit(0.5)
    val composed = emb.select(col("vec_id"),
      transform(sequence(lit(1), lit(1536)), i =>
        (element_at(col("embedding"), ((i - 1) % 64) + 1).cast("double")
          + lit(2.0) * rms * u(i)).cast("float")).as("v"))
      .as[(Long, Array[Float])].collect().toMap
    val kernel = emb.select(col("vec_id"),
      tile_jitter(col("vec_id"), col("embedding"), reps = 24,
        sigma = 2.0).as("v"))
      .as[(Long, Array[Float])].collect().toMap
    assert(kernel.keySet === composed.keySet)
    assert(kernel.forall { case (k, v) => v.sameElements(composed(k)) })
  }

  test("sign_pack/hamming: LSB-first bit layout pinned, zero clears the " +
      "bit, distances exact, dimension mismatch throws") {
    import graft.functions.expressions.VectorExpressions.{hamming, sign_pack}
    val d = Seq(
      (1L, Seq(1.0f, -1.0f, 0.0f, 2.0f, -3.0f, 4.0f, 5.0f, -6.0f, 7.0f)),
      (2L, Seq(-1.0f, -1.0f, 0.0f, 2.0f, -3.0f, 4.0f, 5.0f, -6.0f, 7.0f)))
      .toDF("id", "v")
    val codes = d.select(col("id"), sign_pack(col("v")).as("c"))
      .as[(Long, Array[Byte])].collect().toMap
    // v1 signs: + - 0 + - + + - +  -> bits 0,3,5,6 of byte0, bit 0 of byte1
    assert(codes(1L).toSeq === Seq[Byte]((1 + 8 + 32 + 64).toByte, 1))
    assert(codes(2L).toSeq === Seq[Byte]((8 + 32 + 64).toByte, 1))
    val h = d.select(hamming(sign_pack(col("v")),
        lit(codes(1L)))).as[Int].collect().toSeq
    assert(h.sorted === Seq(0, 1))
    val ex = intercept[Exception] {
      Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f, -1.0f, 1.0f, 1.0f,
        1.0f, 1.0f, 1.0f)))
        .toDF("a", "b")
        .select(hamming(sign_pack(col("a")), sign_pack(col("b"))))
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("binaryTopK: recall 1.0 on sign-separated clusters; m >= k " +
      "guard; ranks deterministic") {
    import graft.functions.expressions.VectorExpressions.sign_pack
    // 3 clusters with disjoint sign patterns over 16 dims; queries are
    // cluster members -> Hamming shortlist must contain the cluster
    val base = Seq(
      Seq.fill(16)(1.0f),
      Seq.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f),
      Seq.fill(16)(-1.0f))
    val rows = for {
      c <- 0 until 3; r <- 0 until 5
    } yield ((c * 5 + r).toLong,
      base(c).zipWithIndex.map { case (x, i) =>
        x * (1.0f + 0.01f * ((r * 7 + i) % 5)) })
    val emb = rows.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val got = SimilaritySearch.binaryTopK(q, emb, k = 4, m = 8)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    // every hit is in the query's own cluster
    assert(got.forall { case (qid, vid) => qid / 5 === vid / 5 })
    assert(got.length === 12)
    intercept[IllegalArgumentException] {
      SimilaritySearch.binaryTopK(q, emb, k = 4, m = 2)
    }
  }

  test("interleaveBySource: the round-robin invariant — every rank " +
      "block holds each source exactly once (until one runs dry); " +
      "deterministic across runs and row order") {
    val d = (0L until 12L).map(i => (i, s"s${i % 3}"))
      .toDF("doc_id", "source")
    val out = CorpusOps.interleaveBySource(d, "source", col("doc_id"),
        seed = 4L)
      .select("doc_id", "source", "rank_in_source", "interleave_u")
      .as[(Long, String, Int, Double)].collect()
    // balanced 3 sources x 4 docs: ranks 1..4, each rank = all 3 sources
    (1 to 4).foreach { r =>
      assert(out.filter(_._3 == r).map(_._2).toSet === Set("s0", "s1", "s2"))
    }
    // the training order never puts two same-source docs adjacent
    // WITHIN a rank block (by construction) and the rotation key is
    // shared per (source, rank)
    val ordered = out.sortBy(t => (t._3, t._4, t._1))
    ordered.grouped(3).foreach(b => assert(b.map(_._2).distinct.size === 3))
    // determinism under row order
    val out2 = CorpusOps.interleaveBySource(d.orderBy(rand(1)), "source",
        col("doc_id"), seed = 4L)
      .select("doc_id", "source", "rank_in_source", "interleave_u")
      .as[(Long, String, Int, Double)].collect()
    assert(out2.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
    // an unbalanced source runs dry: later blocks shrink, never crash
    val d2 = d.unionByName(Seq((100L, "s0")).toDF("doc_id", "source"))
    val o3 = CorpusOps.interleaveBySource(d2, "source", col("doc_id"), 4L)
      .filter(col("rank_in_source") === 5)
      .select("source").as[String].collect()
    assert(o3.toSeq === Seq("s0"))
  }

  test("kmvSketch: k smallest DISTINCT md5-52bit hashes, pinned by an " +
      "independent MessageDigest replay; partitioning/merge-order and " +
      "duplicate-item invariance") {
    val items = ('a' to 'z').map(c => ("g", c.toString)).toDF("grp", "item")
    val out = Sketches.kmvSketch(items, "grp", col("item"), k = 5, 3L)
      .select("kmv").as[Seq[Long]].head()
    // independent reference: first 13 md5 hex digits of "<item>:3"
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = java.lang.Long.parseLong(
      md.digest(s"$s:3".getBytes("UTF-8")).map("%02x".format(_))
        .mkString.take(13), 16)
    val expected = ('a' to 'z').map(c => h(c.toString))
      .distinct.sorted.take(5)
    assert(out === expected)
    // duplicates and physical layout cannot move the sketch
    val dup = (items.union(items).union(items)).repartition(7)
    val out2 = Sketches.kmvSketch(dup, "grp", col("item"), k = 5, 3L)
      .select("kmv").as[Seq[Long]].head()
    assert(out2 === expected)
  }

  test("kmvDistinct: exact below k (est == true count), estimator " +
      "formula (k-1)/u_k when full; est within 3 sigma on a 2000-item " +
      "stream") {
    val small = (1 to 7).map(i => ("g", s"it$i")).toDF("grp", "item")
    val r1 = Sketches.kmvDistinct(small, "grp", col("item"), k = 16, 5L)
      .select("sk_size", "est_distinct").as[(Int, Double)].head()
    assert(r1 === ((7, 7.0)))
    val big = (1 to 2000).map(i => ("g", s"item$i")).toDF("grp", "item")
    val r2 = Sketches.kmvDistinct(big, "grp", col("item"), k = 128, 5L)
      .select("sk_size", "h_max", "est_distinct")
      .as[(Int, Long, Double)].head()
    assert(r2._1 === 128)
    assert(r2._3 === 127.0 / (r2._2.toDouble / 4503599627370496.0))
    // Beyer et al.: sd ~ n/sqrt(k-2) => 3 sigma ~ 535 here
    assert(math.abs(r2._3 - 2000.0) < 535.0,
      s"KMV estimate ${r2._3} implausibly far from 2000")
  }

  test("kmvOverlap: identical sets -> jaccard 1 and est_inter == " +
      "est_union; disjoint sets -> 0; union sketch == sketch of the " +
      "union; maxGroups guard throws") {
    val a = (1 to 400).map(i => ("A", s"x$i"))
    val b = (1 to 400).map(i => ("B", s"x$i"))   // identical item set
    val c = (1 to 400).map(i => ("C", s"y$i"))   // disjoint from both
    val items = (a ++ b ++ c).toDF("grp", "item")
    val out = Sketches.kmvOverlap(items, "grp", col("item"), k = 64, 9L)
      .select("grp_a", "grp_b", "union_k", "est_union", "jaccard_est",
        "est_inter")
      .as[(String, String, Int, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val ab = out(("A", "B"))
    assert(ab._5 === 1.0 && ab._6 === ab._4)
    assert(out(("A", "C"))._5 === 0.0 && out(("A", "C"))._6 === 0.0)
    // union-sketch validity: est_union(A,C) == est_distinct of the
    // relabeled union corpus (the k-smallest-of-merge IS a KMV of it)
    val unioned = (a ++ c).map { case (_, it) => ("U", it) }
      .toDF("grp", "item")
    val estU = Sketches.kmvDistinct(unioned, "grp", col("item"), 64, 9L)
      .select("est_distinct").as[Double].head()
    assert(out(("A", "C"))._4 === estU)
    val ex = intercept[IllegalArgumentException] {
      Sketches.kmvOverlap(items, "grp", col("item"), k = 64, 9L,
        maxGroups = 2)
    }
    assert(ex.getMessage.contains("maxGroups"))
  }

  test("Histogram.globalRank: ranks equal the total-order position on " +
      "shuffled multi-partition input; ties broken by the tie column") {
    val d = spark.range(1, 101).toDF("k")
      .withColumn("v", col("k") % 10) // heavy ties
      .repartition(7)
    val out = Histogram.globalRank(d, Seq("v", "k"), nPart = 5)
      .select("v", "k", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = out.map(t => (t._1, t._2)).sortBy(identity)
      .zipWithIndex.map { case ((v, k), i) => (v, k, i + 1L) }.toSet
    assert(out.toSet === expected)
  }

  test("Histogram.equiDepth pins a hand case (N=10, B=4: spans " +
      "3/2/3/2, rank boundaries 3,5,8,10); rangeSelectivity " +
      "interpolates exactly") {
    val d = (1 to 10).map(i => (i * 10.0, i.toLong)).toDF("v", "k")
    val h = Histogram.equiDepth(d, "v", "k", buckets = 4, nPart = 3)
      .orderBy("bucket")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3)))
    assert(h === Array((1, 10.0, 30.0, 3L), (2, 30.0, 50.0, 2L),
      (3, 50.0, 80.0, 3L), (4, 80.0, 100.0, 2L)))
    assert(h.map(_._4).sum === 10L)
    // x = 40 -> bucket1 full (3) + bucket2 half (1) = 4 exact rows <= 40
    val preds = Seq((0L, 40.0), (1L, 5.0), (2L, 500.0))
      .toDF("pred_id", "x")
    val est = Histogram.rangeSelectivity(
      Histogram.equiDepth(d, "v", "k", 4, 3), preds)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(est(0L) === 4.0)
    assert(est(1L) === 0.0)
    assert(est(2L) === 10.0)
  }

  test("SnapshotDiff: all four ops classified on a hand case; counts " +
      "agree; non-key schema mismatch throws") {
    val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "x")
    val v2 = Seq((1L, "a", 10.0), (2L, "b", 99.0), (4L, "d", 40.0))
      .toDF("k", "s", "x")
    val ops = SnapshotDiff.diff(v1, v2, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ops === Map(1L -> "unchanged", 2L -> "update",
      3L -> "delete", 4L -> "insert"))
    val counts = SnapshotDiff.diffCounts(v1, v2, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("unchanged" -> 1L, "update" -> 1L,
      "delete" -> 1L, "insert" -> 1L))
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(v1, v2.withColumnRenamed("x", "y"), Seq("k"))
    }
    // a non-unique key has no diff semantics (m x n pairing) — refused
    val dup = intercept[IllegalArgumentException] {
      SnapshotDiff.diff(v1.union(v1), v2, Seq("k"))
    }
    assert(dup.getMessage.contains("not unique"))
    // null-pattern injectivity: a value MIGRATING between columns
    // across nulls — (a=1,b=null) vs (a=null,b=1) — is a real update;
    // a null-skipping fingerprint would hash both sides identically
    // and silently classify it 'unchanged'
    val n1 = Seq((1L, Some(1L), Option.empty[Long]),
      (2L, Some(7L), Some(8L))).toDF("k", "a", "b")
    val n2 = Seq((1L, Option.empty[Long], Some(1L)),
      (2L, Some(7L), Some(8L))).toDF("k", "a", "b")
    val nOps = SnapshotDiff.diff(n1, n2, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nOps === Map(1L -> "update", 2L -> "unchanged"))
  }

  test("SnapshotDiff.changeRows maintains a grouped view through " +
      "group-migrating updates: base + signed deltas == direct " +
      "recompute") {
    val v1 = Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g2", 30L),
      (4L, "g2", 40L)).toDF("k", "g", "x")
    // delete 4; migrate 3 to g1 with a new value; insert 5 in g3
    val v2 = Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g1", 31L),
      (5L, "g3", 50L)).toDF("k", "g", "x")
    val base = v1.groupBy("g").agg(count(lit(1)).as("n"),
      sum("x").as("sx"))
    val inc = base.join(
        SnapshotDiff.changeRows(v1, v2, Seq("k")).groupBy("g")
          .agg(sum("sign").as("dn"),
            sum(col("sign") * col("x")).as("dx")),
        Seq("g"), "full_outer")
      .na.fill(0L, Seq("n", "sx", "dn", "dx"))
      .select(col("g"), (col("n") + col("dn")).as("n"),
        (col("sx") + col("dx")).as("sx"))
      .filter(col("n") > 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val direct = v2.groupBy("g").agg(count(lit(1)).as("n"),
        sum("x").as("sx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(inc === direct)
    assert(direct === Set(("g1", 3L, 61L), ("g3", 1L, 50L)))
  }

  test("SketchStore: incremental panes merge to the direct sketch; " +
      "replayed batch id verifies and no-ops; imposter batch under a " +
      "committed id and parameter drift fail loudly") {
    import graft.sources.SketchStore
    val key = s"sketchstore-spec-${System.nanoTime()}"
    try {
      val all = (1 to 300).map(i => ("g" + i % 3, s"item$i"))
        .toDF("grp", "it")
      SketchStore.update(spark, key, all.filter($"it".substr(5, 9)
        .cast("int") <= 150), "grp", col("it"), 1L, k = 32, seed = 5L)
      SketchStore.update(spark, key, all.filter($"it".substr(5, 9)
        .cast("int") > 150), "grp", col("it"), 2L, k = 32, seed = 5L)
      val direct = Sketches.kmvSketch(all, "grp", col("it"), 32, 5L)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val stored = SketchStore.read(spark, key)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      assert(stored === direct)
      // replay: same batch id + same content -> verified no-op
      SketchStore.update(spark, key, all.filter($"it".substr(5, 9)
        .cast("int") > 150), "grp", col("it"), 2L, k = 32, seed = 5L)
      assert(SketchStore.read(spark, key)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1))
        .toMap === direct)
      // imposter content under a committed id must fail loudly
      val ex = intercept[IllegalArgumentException] {
        SketchStore.update(spark, key,
          Seq(("g0", "unrelated")).toDF("grp", "it"), "grp", col("it"),
          2L, k = 32, seed = 5L)
      }
      assert(ex.getMessage.contains("NOT a replay"))
      // parameter drift must fail loudly
      val ex2 = intercept[IllegalArgumentException] {
        SketchStore.update(spark, key, all, "grp", col("it"), 3L,
          k = 64, seed = 5L)
      }
      assert(ex2.getMessage.contains("do not merge"))
    } finally SketchStore.drop(spark, key)
  }

  test("kmvNovelty: a strict-subset group has zero novelty, its " +
      "superset's novelty is exact below k; disjoint groups are fully " +
      "novel; maxGroups guard throws") {
    // A = {x1..x40}, B = {x1..x10} (subset), C = {y1..y25} (disjoint)
    val items = ((1 to 40).map(i => ("A", s"x$i")) ++
      (1 to 10).map(i => ("B", s"x$i")) ++
      (1 to 25).map(i => ("C", s"y$i"))).toDF("grp", "it")
    // k=128 > 65 distinct items -> every sketch IS its set: estimates
    // are exact set arithmetic
    val out = Sketches.kmvNovelty(items, "grp", col("it"), 128, 3L)
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2)))
      .toMap
    assert(out("B")._1 === 0 && out("B")._2 === 0.0)
    assert(out("A")._1 === 30 && out("A")._2 === 30.0)
    assert(out("C")._1 === 25 && out("C")._2 === 25.0)
    val ex = intercept[IllegalArgumentException] {
      Sketches.kmvNovelty(items, "grp", col("it"), 128, 3L, maxGroups = 2)
    }
    assert(ex.getMessage.contains("maxGroups"))
    // a LONE group has an empty complement: it must report everything
    // novel, not vanish through an inner join on the empty pairing
    val lone = Sketches.kmvNovelty(
      items.filter(col("grp") === "A"), "grp", col("it"), 128, 3L)
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2)))
      .toMap
    assert(lone === Map("A" -> ((40, 40.0))))
  }

  test("CountMin: bucket replays MessageDigest md5-52bit mod w; point " +
      "estimates never undercount and are exact at collision-free " +
      "width") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_))
        .mkString.take(13), 16)
    val b = Seq("x").toDF("t")
      .select(CountMin.bucket(col("t"), 2, 64, 19L)).as[Long].head()
    assert(b === h("x:21") % 64)
    val items = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"))
      .map(("all", _)).toDF("grp", "tok")
    val probes = Seq("a", "b", "c").map(("all", _)).toDF("grp", "tok")
    for (w <- Seq(4, 4096)) { // narrow (collisions) and wide (exact)
      val cms = CountMin.cmsByGroup(items, "grp", col("tok"), 3, w, 19L)
      val est = CountMin.pointEstimates(cms, probes, "tok", 3, w, 19L)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(est("a") >= 5 && est("b") >= 3 && est("c") >= 1,
        s"w=$w undercounted: $est")
      if (w == 4096) assert(est === Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
    }
  }

  test("CountMin.joinSizeEstimates: >= the true inner product always, " +
      "== it at collision-free width") {
    val a = Seq.fill(4)("t1") ++ Seq.fill(2)("t2") ++ Seq("t3")
    val bb = Seq.fill(3)("t1") ++ Seq.fill(5)("t4")
    val items = (a.map(("A", _)) ++ bb.map(("B", _))).toDF("grp", "tok")
    val exactIp = 4L * 3L // only t1 shared
    for (w <- Seq(2, 4096)) {
      val cms = CountMin.cmsByGroup(items, "grp", col("tok"), 3, w, 7L)
      val est = CountMin.joinSizeEstimates(cms)
        .select("est_join").as[Long].head()
      assert(est >= exactIp, s"w=$w undercounted join size: $est")
      if (w == 4096) assert(est === exactIp)
    }
  }

  test("ZOrder.interleave pins known Morton codes; quantize maps " +
      "bounds to [0, 2^bits) inclusive-exclusive") {
    val d = Seq((5L, 3L)).toDF("x", "y") // 0b101, 0b011
    val z = d.select(ZOrder.interleave(col("x"), col("y"), 3).as("z"))
      .as[Long].head()
    // x bits -> positions 0,2,4 (1+0+16); y bits -> 1,3,5 (2+8+0)
    assert(z === 27L)
    val q = Seq((10L, 10L), (19L, 10L), (20L, 10L)).toDF("v", "mn")
      .select(ZOrder.quantize(col("v"), col("mn"), lit(20L), 8).as("q"))
      .as[Long].collect()
    assert(q(0) === 0L)          // v == mn
    assert(q(2) === 232L)        // v == mx stays below 2^8
    assert(q.forall(x => x >= 0 && x < 256))
  }

  test("pruningPanel: on a uniform grid, z-order strictly beats the " +
      "1-D sort on rows scanned for square predicates, at equal hits") {
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val p = ZOrder.pruningPanel(grid, "x", "y", bits = 6, nBuckets = 16,
      nRects = 12)
      .groupBy("layout")
      .agg(sum("rows_scanned").as("scanned"), sum("true_hits").as("hits"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(p("zorder")._2 === p("xsort")._2, "hit counts must agree")
    assert(p("zorder")._1 < p("xsort")._1,
      s"z-order lost its pruning edge: $p")
  }

  test("kmvMergeAgg: merged per-pane sketches equal the direct sketch " +
      "of the union set (truncation active), regardless of pane split") {
    val ev = Seq("d1" -> "u1", "d1" -> "u2", "d1" -> "u3", "d2" -> "u2",
      "d2" -> "u4", "d3" -> "u5", "d3" -> "u6", "d3" -> "u1")
      .toDF("d", "u")
    val direct = Sketches.kmvSketch(ev.withColumn("g", lit("all")), "g",
      col("u"), 4, 1L).select("kmv").as[Seq[Long]].head()
    assert(direct.size === 4) // 6 distinct users > k — truncation real
    for (paneCol <- Seq("d", "u")) { // day panes AND degenerate 1-row panes
      val panes = Sketches.kmvSketch(ev, paneCol, col("u"), 4, 1L)
      val merged = panes.agg(Sketches.kmvMergeAgg(col("kmv"), 4))
        .as[Seq[Long]].head()
      assert(merged === direct, s"pane split by $paneCol diverged")
    }
  }

  test("columnStats: pinned tiny-frame stats (counts, nulls, canonical " +
      "min/max, avg_len, exact ndv, est == exact below k); unknown " +
      "column throws") {
    val d = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 17.5, "aa"), (2L, null, "bbb"), (2L, 3.25, null),
      (5L, 3.25, "aa")).toDF("id", "x", "s")
    val out = Analyze.columnStats(d, Seq("id", "x", "s"), k = 16,
      seed = 7L, exact = true).collect()
      .map(r => r.getString(0) -> r).toMap
    val id = out("id")
    assert(id.getLong(1) === 4 && id.getLong(2) === 0)       // cnt, nulls
    assert(id.getString(4) === "1" && id.getString(5) === "5") // min,max
    assert(id.getLong(7) === 3 && id.getDouble(3) === 3.0)   // ndv exact
    assert(id.getDouble(8) === 0.0)                          // rel_err
    val x = out("x")
    assert(x.getLong(1) === 3 && x.getLong(2) === 1)
    assert(x.getString(4) === "3.250000" && x.getString(5) === "17.500000")
    // "17.500000"(9) + "3.250000"(8) + "3.250000"(8) over 3 rows
    assert(x.getDouble(6) === math.rint(25.0 / 3.0 * 1e6) / 1e6)
    assert(x.getLong(7) === 2)
    val s = out("s")
    assert(s.getLong(1) === 3 && s.getLong(2) === 1 && s.getLong(7) === 2)
    assert(s.getDouble(6) === math.rint(7.0 / 3.0 * 1e6) / 1e6)
    intercept[IllegalArgumentException] {
      Analyze.columnStats(d, Seq("nope"), 16, 7L, exact = false)
    }
  }

  test("columnStats: timestamp canonicalization matches strftime-to-" +
      "seconds; production (exact=false) plan is Expand-free with ONE " +
      "data aggregate") {
    val d = Seq(Tuple1(Timestamp.valueOf("2024-03-15 12:34:56")))
      .toDF("ts")
    val r = Analyze.columnStats(d, Seq("ts"), 16, 7L, exact = false)
      .collect().head
    assert(r.getString(4) === "2024-03-15 12:34:56")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val big = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("a", "b")
      val plan = Analyze.columnStats(big, Seq("a", "b"), 16, 7L,
        exact = false).queryExecution.executedPlan
      val expands = plan.collect {
        case e: org.apache.spark.sql.execution.ExpandExec => e }
      // the only Expand allowed is none at all: the unpivot is a
      // projection over ONE aggregated row, planned as Generate
      assert(expands.isEmpty,
        s"exact=false stats pass grew an Expand:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("bpeEncodeTokens: known merges yield the exact symbol stream; " +
      "round trip holds; multi-space input normalizes") {
    val d = Seq((1L, "abab ab  cd"), (2L, "zz")).toDF("doc_id", "text")
    // merges: (a,b) then (ab,ab): "abab" -> [abab], "ab" -> [ab],
    // "cd" -> [c, d], "zz" -> [z, z]
    val out = CorpusOps.bpeEncodeTokens(d,
        Seq(("a", "b"), ("ab", "ab")))
      .select("doc_id", "n_words", "n_tokens", "tokens_str", "rt_ok")
      .as[(Long, Long, Long, String, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 3L, 4L, "abab|ab|c|d", true)))
    assert(out(2L) === ((2L, 1L, 2L, "z|z", true)))
  }

  test("ivfBqTopK: output-identical to the float IVF path when the " +
      "shortlist covers the probed lists; m >= k guard") {
    val base = Seq(
      Seq.fill(16)(1.0f),
      Seq.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f),
      Seq.fill(16)(-1.0f))
    val rows = for {
      c <- 0 until 3; r <- 0 until 6
    } yield ((c * 6 + r).toLong,
      base(c).zipWithIndex.map { case (x, i) =>
        x * (1.0f + 0.02f * ((r * 5 + i) % 4)) })
    val emb = rows.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") % 6 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val cents = SimilaritySearch.kMeansCentroids(emb, k = 3, iters = 3)
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "vec_id")
        .as[(Long, Int, Long)].collect().toSet
    val fl = hits(SimilaritySearch.ivfTopK(q, emb, cents, k = 4, nProbe = 1))
    val bq = hits(SimilaritySearch.ivfBqTopK(q, emb, cents, k = 4,
      nProbe = 1, m = 16))
    assert(bq === fl)
    assert(bq.nonEmpty)
    intercept[IllegalArgumentException] {
      SimilaritySearch.ivfBqTopK(q, emb, cents, k = 4, nProbe = 1, m = 2)
    }
  }

  test("dedupLines: corpus-frequent lines cut, order and blanks kept, " +
      "whitespace lines never counted, fully-cut doc becomes empty") {
    // "BOILER" appears in 3 docs (maxDf=2 -> cut); "rare" in 2 (kept);
    // doc 4 is banner-only (fully cut); blank lines never count as df
    // and always survive in kept docs
    val d = Seq(
      (1L, "BOILER\nalpha one\n\nbeta two"),
      (2L, "BOILER\nrare line\ngamma three"),
      (3L, "intro\nBOILER\nrare line"),
      (4L, "BOILER"),
      (5L, " \n \n ")).toDF("doc_id", "text")
    val out = Dedup.dedupLines(d, maxDf = 2)
      .select("doc_id", "text", "n_lines", "n_cut")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === (("alpha one\n\nbeta two", 3L, 1L)))
    assert(out(2L) === (("rare line\ngamma three", 3L, 1L)))
    assert(out(3L) === (("intro\nrare line", 3L, 1L)))
    assert(out(4L) === (("", 1L, 1L)))
    assert(out(5L) === ((" \n \n ", 0L, 0L))) // blanks untouched
    // df boundary: exactly maxDf occurrences survive
    val kept = Dedup.dedupLines(d.filter(col("doc_id") <= 2), maxDf = 2)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(kept(1L).startsWith("BOILER\n"))
  }

  test("samplePerGroup: deterministic across runs and row order, exact " +
      "k per large group, all rows for small groups, stable under " +
      "adding other groups") {
    val d = (0L until 100L).map(i => (i, if (i < 90) "big" else "small"))
      .toDF("doc_id", "grp")
    val s1 = CorpusOps.samplePerGroup(d, "grp", k = 7,
      col("doc_id"), seed = 3L)
      .as[(String, Int, Long)].collect().toSet
    assert(s1.count(_._1 == "big") === 7)
    assert(s1.count(_._1 == "small") === 7) // 10 rows but k=7
    val s2 = CorpusOps.samplePerGroup(d.orderBy(rand(42)), "grp", k = 7,
      col("doc_id"), seed = 3L)
      .as[(String, Int, Long)].collect().toSet
    assert(s2 === s1) // row order irrelevant
    // the big group's winners don't change when another group grows
    val d3 = d.unionByName((200L until 260L).map(i => (i, "other"))
      .toDF("doc_id", "grp"))
    val s3 = CorpusOps.samplePerGroup(d3, "grp", k = 7,
      col("doc_id"), seed = 3L)
      .as[(String, Int, Long)].collect().toSet
    assert(s3.filter(_._1 == "big") === s1.filter(_._1 == "big"))
  }

  test("funnelCounts: first-match ordering — a click BEFORE the first " +
      "view doesn't count; the window anchored at entry cuts late " +
      "conversions; counts are monotone") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val e = Seq(
      // user 1 completes in order within the window
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-02 10:00:00")),
      (1L, "purchase", ts("2024-01-03 10:00:00")),
      // user 2 clicked BEFORE the first view: no step-2 credit
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      // user 3 clicks only after the 7-day window expires
      (3L, "view", ts("2024-01-01 10:00:00")),
      (3L, "click", ts("2024-01-09 10:00:01")),
      // user 4 never views: not even in step 1
      (4L, "purchase", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.funnelCounts(e, Seq("view", "click", "purchase"),
        within = Some("7 DAYS"))
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(out === Seq((1, "view", 3L), (2, "click", 1L),
      (3, "purchase", 1L)))
    // no window: user 3's late click now counts
    val open = Funnel.funnelCounts(e, Seq("view", "click"))
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(open === Seq((1, "view", 3L), (2, "click", 2L)))
  }

  test("retentionCohorts: offset-0 cell equals the cohort size; a " +
      "returning user lands in the right offset cell") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00")), // Mon, cohort wk of Jan 1
      (1L, ts("2024-01-10 10:00:00")), // offset 1
      (2L, ts("2024-01-03 10:00:00")), // same cohort
      (3L, ts("2024-01-08 10:00:00")), // next week's cohort
      (3L, ts("2024-01-22 10:00:00"))) // offset 2
      .toDF("user_id", "ts")
    val out = Funnel.retentionCohorts(e)
      .select("cohort_week", "week_offset", "n_active", "cohort_size")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(out === Set(
      ("2024-01-01", 0, 2L, 2L), ("2024-01-01", 1, 1L, 2L),
      ("2024-01-08", 0, 1L, 1L), ("2024-01-08", 2, 1L, 1L)))
  }

  test("hardNegatives drops judged-relevant hits and renumbers; a fully " +
      "relevant top-k yields honestly fewer rows") {
    val run = Seq((1L, 1, 10L, 9.0), (1L, 2, 11L, 8.0), (1L, 3, 12L, 7.0),
      (2L, 1, 20L, 5.0), (2L, 2, 21L, 4.0))
      .toDF("query_id", "rank", "doc_id", "score")
    val qrels = Seq((1L, 11L, 2L), (2L, 20L, 1L), (2L, 21L, 1L))
      .toDF("query_id", "doc_id", "rel")
    val out = Evaluation.hardNegatives(run, qrels, n = 2)
      .as[(Long, Int, Long, Double)].collect().toSet
    // query 1: 11 removed, 10 and 12 renumbered 1, 2; query 2: all
    // relevant -> zero negatives, not fabricated ones
    assert(out === Set((1L, 1, 10L, 9.0), (1L, 2, 12L, 7.0)))
  }

  test("budgetAdmit: the prefix rule — rejected docs advance the " +
      "running total, so a crossed budget closes the stratum") {
    val d = Seq(("A", 1L, "w " * 40), ("A", 2L, "w " * 50),
      ("A", 3L, "w " * 30), ("A", 4L, "w " * 5), ("B", 5L, "w " * 10))
      .toDF("source", "doc_id", "text")
    val out = CorpusOps.budgetAdmit(d, "source", "doc_id", budget = 100L)
      .select("doc_id", "cum_tok", "admitted")
      .as[(Long, Long, Boolean)].collect().toSet
    // doc 3 overflows (120); doc 4 would fit a greedy rule (125 > 100
    // still rejected) — the stratum is closed
    assert(out === Set((1L, 40L, true), (2L, 90L, true),
      (3L, 120L, false), (4L, 125L, false), (5L, 10L, true)))
    intercept[IllegalArgumentException] {
      CorpusOps.budgetAdmit(d, "source", "doc_id", budget = 0L)
    }
  }

  test("perplexityBuckets: per-language terciles — each language splits " +
      "into nonempty head/middle/tail with head holding the lowest ppl") {
    // 9 distinct-fluency docs per lang: repeated fluent text scores low,
    // unique token soup scores high
    val rows = for {
      lang <- Seq("aa", "bb"); i <- 0 until 9
    } yield ((lang.hashCode.toLong * 100 + i),
      if (i < 3) "the cat sat on the mat the cat sat"
      else if (i < 6) s"the cat sat on mat$i the dog ran"
      else s"zq$i xv$i wk$i jj$i qq$i pp$i",
      lang)
    val d = rows.toDF("doc_id", "text", "lang")
    val out = TextAnalysis.perplexityBuckets(d)
      .select("lang", "bucket", "ppl").as[(String, String, Double)]
      .collect()
    for (l <- Seq("aa", "bb")) {
      val g = out.filter(_._1 == l)
      val byB = g.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
      assert(byB.keySet === Set("head", "middle", "tail"), byB.keySet)
      assert(byB("head").max <= byB("middle").min)
      assert(byB("middle").max <= byB("tail").min)
    }
  }

  test("RecordLinkage: blocked pairs respect the block boundary and " +
      "distance cap; resolveEntities collapses transitively; a " +
      "degenerate block is refused") {
    val recs = Seq(
      (1L, "red widget", "b1"), (2L, "red widgets", "b1"), // d=1 pair
      (3L, "red wadgets", "b1"), // d=1 to 2 -> transitive with 1
      (4L, "red spanner", "b1"), // same block, too far
      (5L, "red widget", "b2"), // identical name, DIFFERENT block
      (6L, "blue bolt", "b1")) // different block
      .toDF("id", "name", "blk")
    val pairs = RecordLinkage.blockedPairs(recs, "id", "name",
        concat_ws("|", split(col("name"), " ").getItem(0), col("blk")),
        maxDist = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (2L, 3L), (1L, 3L)))
    val ents = RecordLinkage.resolveEntities(recs, "id", "name",
        concat_ws("|", split(col("name"), " ").getItem(0), col("blk")),
        maxDist = 2)
      .as[(Long, Long)].collect().toMap
    assert(ents === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 6L))
    val ex = intercept[IllegalArgumentException] {
      RecordLinkage.blockedPairs(recs, "id", "name", lit("const"),
        maxDist = 2, maxBlock = 3)
    }
    assert(ex.getMessage.contains("maxBlock"))
  }

  test("leakageFreeSplit: every near-dup cluster lands WHOLE in one " +
      "split (no pair straddles a boundary); singletons key on their " +
      "own id; the bucketing is deterministic in the seed") {
    val ids = (1L to 12L).toDF("doc_id")
    // clusters {1,2,3} (transitive via 1-2, 2-3) and {7,9}; rest single
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L))
      .toDF("doc_id_a", "doc_id_b")
    val out = CorpusOps.leakageFreeSplit(ids, "doc_id", pairs, seed = 77L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(out.size === 12)
    // cluster co-location: reps are the min ids, members share a split
    assert(out(1L)._1 === 1L && out(2L)._1 === 1L && out(3L)._1 === 1L)
    assert(out(1L)._2 === out(2L)._2 && out(2L)._2 === out(3L)._2)
    assert(out(7L)._1 === 7L && out(9L)._1 === 7L)
    assert(out(7L)._2 === out(9L)._2)
    assert(out(5L)._1 === 5L) // singleton is its own rep
    // the arithmetic is the documented md5-52bit bucket mod 10
    def bucket(rep: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hx = md.digest(s"$rep:77".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      java.lang.Long.parseLong(hx, 16) % 10
    }
    out.foreach { case (_, (rep, split)) =>
      val b = bucket(rep)
      val expect = if (b < 8) "train" else if (b == 8) "val" else "test"
      assert(split === expect, s"rep $rep bucket $b")
    }
    // all three splits are reachable (teeth: the CASE isn't constant):
    // pick seeds driver-side that put rep 5 in val and in test, then
    // confirm the operator lands doc 5 there
    def bucketAt(rep: Long, sd: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hx = md.digest(s"$rep:$sd".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      java.lang.Long.parseLong(hx, 16) % 10
    }
    val seedVal = (0L to 2000L).find(bucketAt(5L, _) == 8L).get
    val seedTest = (0L to 2000L).find(bucketAt(5L, _) == 9L).get
    def splitOf(sd: Long): String = CorpusOps.leakageFreeSplit(
      ids, "doc_id", pairs, seed = sd)
      .filter(col("doc_id") === 5L).select("split").head.getString(0)
    assert(splitOf(seedVal) === "val")
    assert(splitOf(seedTest) === "test")
    // nonsense bucket spec refused
    intercept[IllegalArgumentException] {
      CorpusOps.leakageFreeSplit(ids, "doc_id", pairs, buckets = 4,
        trainBuckets = 3, valBuckets = 1)
    }
  }

  test("RecordLinkage.scoredPairs: Fellegi-Sunter log-odds by hand — " +
      "agreement adds log2(m/u), disagreement log2((1-m)/(1-u)); " +
      "nulls disagree; closure rides the scored matches") {
    import RecordLinkage.FieldAgreement
    val recs = Seq(
      (1L, "red widget", "tA", 10),
      (2L, "red widgets", "tA", 10), // vs 1: all three agree
      (3L, "red widget", "tB", 10), // vs 1/2: name+size agree
      (4L, "red spanner", "tA", 10), // name too far from all
      (5L, "red widget", "tB", 99)) // vs 3: name+type agree
      .toDF("id", "name", "typ", "size")
    val fields = Seq(
      FieldAgreement("name", (a, b) => levenshtein(a, b) <= 2, 0.9, 0.1),
      FieldAgreement("typ", (a, b) => a === b, 0.8, 0.3),
      FieldAgreement("size", (a, b) => a === b, 0.7, 0.2))
    val blk = split(col("name"), " ").getItem(0)
    val got = RecordLinkage.scoredPairs(recs, "id", fields, blk,
        minScore = 3.0)
      .select(col("id_a"), col("id_b"), round(col("score"), 6))
      .as[(Long, Long, Double)].collect().toSet
    // hand arithmetic: name ±log2(9) = ±3.169925; typ +log2(8/3) =
    // +1.415037 / −log2(7/2) = −1.807355; size +log2(7/2) / −log2(8/3)
    //  (1,2): 3.169925+1.415037+1.807355 = 6.392317
    //  (1,3)/(2,3): 3.169925−1.807355+1.807355 = 3.169925
    //  (3,5): 3.169925+1.415037−1.415037 = 3.169925
    //  (1,5)/(2,5): 3.169925−1.807355−1.415037 < 3 → dropped
    //  (2,4): −3.169925+1.415037+1.807355 ≈ 0.05 → dropped
    assert(got === Set((1L, 2L, 6.392317), (1L, 3L, 3.169925),
      (2L, 3L, 3.169925), (3L, 5L, 3.169925)))
    // a null field value is DISAGREEMENT, not a null score
    val withNull = Seq((1L, "red widget", "tA", 10),
      (2L, "red widgets", null.asInstanceOf[String], 10))
      .toDF("id", "name", "typ", "size")
    val np = RecordLinkage.scoredPairs(withNull, "id", fields, blk,
        minScore = 3.0)
      .select("agree_typ", "score").collect()
    assert(np.length === 1 && !np.head.getBoolean(0) &&
      math.abs(np.head.getDouble(1) - 3.169925) < 1e-5)
    // transitive closure over the scored matches: {1,2,3,5} → 1
    val ents = RecordLinkage.resolveEntitiesScored(recs, "id", fields,
        blk, minScore = 3.0)
      .as[(Long, Long)].collect().toMap
    assert(ents === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 1L))
    // m ≤ u is a nonsense spec and refused at construction
    intercept[IllegalArgumentException] {
      FieldAgreement("x", (a, b) => a === b, 0.2, 0.5)
    }
  }

  test("Scd2.fromChanges folds no-op changes into open intervals; " +
      "asOfLookup reads features as they WERE") {
    def ts(s: String) = Timestamp.valueOf(s)
    val feed = Seq(
      (1L, ts("2024-01-01 00:00:00"), "bronze"),
      (1L, ts("2024-01-02 00:00:00"), "bronze"), // no-op: folds
      (1L, ts("2024-01-03 00:00:00"), "gold"),
      (1L, ts("2024-01-05 00:00:00"), "silver"),
      (2L, ts("2024-01-04 00:00:00"), "gold"))
      .toDF("user_id", "ts", "tier")
    val scd = Scd2.fromChanges(feed, "user_id", "ts", Seq("tier"))
    val rows = scd.select("user_id", "tier", "valid_from", "valid_to",
        "is_current")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))
      .toSet
    assert(rows === Set(
      (1L, "bronze", ts("2024-01-01 00:00:00"),
        Some(ts("2024-01-03 00:00:00")), false),
      (1L, "gold", ts("2024-01-03 00:00:00"),
        Some(ts("2024-01-05 00:00:00")), false),
      (1L, "silver", ts("2024-01-05 00:00:00"), None, true),
      (2L, "gold", ts("2024-01-04 00:00:00"), None, true)))
    // point-in-time: the probe at 01-04 reads gold (not silver — that
    // is the future); a probe BEFORE the first interval reads nothing
    val probes = Seq((1L, ts("2024-01-04 12:00:00")),
      (1L, ts("2023-12-25 00:00:00")))
      .toDF("user_id", "ts")
    val got = Scd2.asOfLookup(probes, scd, "user_id", "ts")
      .select("user_id", "ts", "tier")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.getString(2)))).toSet
    assert(got === Set(
      (1L, ts("2024-01-04 12:00:00"), Some("gold")),
      (1L, ts("2023-12-25 00:00:00"), None)))
  }

  test("DataContract: each check counts its violations exactly; the " +
      "panel carries live failures, not just passes") {
    import DataContract._
    val users = Seq((Some(1L), "a"), (Some(1L), "b"), (Some(2L), "c"),
      (None, "d")).toDF("uid", "name")
    val events = Seq((1L, 5.0), (2L, 15.0), (9L, 3.0))
      .toDF("uid", "value")
    val out = panel(Seq(
      unique("u1_uid_unique", "users", users, "uid"),
      notNull("u2_uid_notnull", "users", users, "uid"),
      refIntegrity("u3_events_users_fk", "events", events, "uid",
        users.filter(col("uid").isNotNull), "uid"),
      expect("u4_value_cap", "events", events, col("value") <= 10)))
      .select("check_name", "n_rows", "n_violations", "passed")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // uid 1 duplicated (1 excess) + 1 null = 2 violations of 4 rows
    assert(out("u1_uid_unique") === ((4L, 2L, false)))
    assert(out("u2_uid_notnull") === ((4L, 1L, false)))
    // uid 9 is an orphan
    assert(out("u3_events_users_fk") === ((3L, 1L, false)))
    assert(out("u4_value_cap") === ((3L, 1L, false)))
  }

  test("DataContract: checks build LAZILY (zero jobs at construction); " +
      "panelFused computes an N-check panel in ONE scan, row-for-row " +
      "equal to the per-check panel; route splits like the gate") {
    import DataContract._
    val li = graft.Tables.load(spark, graft.TestSpark.Sf0001, "lineitem")
    val orders = graft.Tables.load(spark, graft.TestSpark.Sf0001,
      "orders")
    // a 100 TB contract panel must not execute while being BUILT —
    // unique/refIntegrity used to run 2-3 driver-synchronized jobs in
    // their constructors
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      unique("f1", "lineitem", li, "l_partkey")
      refIntegrity("f2", "lineitem", li, "l_orderkey", orders,
        "o_orderkey")
      expect("f3", "lineitem", li, col("l_quantity") >= 1)
      Thread.sleep(500) // listener-bus drain window
      assert(jobs === 0, s"check construction ran $jobs eager job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
    val preds = Seq(
      "p1" -> (col("l_quantity") >= 1),
      "p2" -> (col("l_quantity") <= 10),
      "p3" -> col("l_shipdate").isNotNull)
    val fused = panelFused("lineitem", li, preds)
    // one aggregate pass: exactly ONE parquet scan in the plan
    val plan = fused.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans === 1, s"fused panel scans the table $scans times:\n$plan")
    val fusedRows = fused.collect().map(_.toSeq).toSet
    val perCheck = panel(preds.map { case (n, p) =>
      expect(n, "lineitem", li, p)
    }).collect().map(_.toSeq).toSet
    assert(fusedRows === perCheck)
    assert(fusedRows.nonEmpty)
    // route: the batch twin of the streaming gate split
    val ev = Seq((1L, 5.0), (2L, 15.0), (3L, 7.0)).toDF("id", "value")
    val routed = route(ev, col("value") <= 10.0)
    assert(routed.main.select("id").as[Long].collect().toSet
      === Set(1L, 3L))
    assert(routed.quarantine.select("id").as[Long].collect().toSet
      === Set(2L))
    val a = routed.audit.head
    assert((a.getLong(0), a.getLong(1)) === ((3L, 1L)))
  }
}
