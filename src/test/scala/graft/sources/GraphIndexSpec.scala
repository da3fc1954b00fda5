package graft.sources

import graft.TestSpark
import graft.operators.KnnGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted graph-ANN lifecycle: build/attach parity with the
  * in-memory search, snapshot reuse, the HNSW-style upsert (edges
  * discovered by search, reachable via the stored reverse direction,
  * batch replay no-op), tombstone deletes (served nowhere, re-add
  * refused, rebuild clears), and crashed-delete orphan sweep.
  */
class GraphIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val runTag = java.util.UUID.randomUUID.toString.take(8)

  // 60 points in 4 tight angular clusters — deterministic neighborhoods
  private def pts(ids: Range): DataFrame = ids.map { i =>
    val theta = (i % 4) * 1.5 + (i / 4) * 0.01
    (i.toLong, Array(math.cos(theta).toFloat, math.sin(theta).toFloat))
  }.toDF("vec_id", "embedding")

  private def base = pts(0 until 60)

  private def queriesOf(df: DataFrame) =
    df.select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

  private def hits(df: DataFrame): Set[(Long, Int, Long)] =
    df.select("query_id", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("persisted queryGraph is row-identical to in-memory graphSearch " +
      "at the same operating point") {
    val key = s"gspec-$runTag-a"
    val h = GraphIndex.ensureGraph(spark, key, base, k = 4, rounds = 2,
      blockSize = 16, maxDegree = 12)
    val q = queriesOf(base.filter(col("vec_id") % 15 === 2))
    val persisted = hits(GraphIndex.queryGraph(spark, key, q, k = 2,
      beam = 8, rounds = 2))
    val inMemory = hits(KnnGraph.graphSearch(q, base,
      h.edges.select("src", "dst"), k = 2, beam = 8, rounds = 2,
      assumeUndirected = true))
    assert(persisted === inMemory)
    assert(persisted.nonEmpty)
  }

  test("snapshot-id reuse skips the rebuild; tombstoned layout forces it") {
    val key = s"gspec-$runTag-b"
    GraphIndex.ensureGraph(spark, key, base, k = 4, rounds = 2,
      blockSize = 16, maxDegree = 12, snapshotId = Some("v1"))
    val edgesDir = new java.io.File(
      s"/tmp/graft_ann_graph_${IndexStore.pathTag(key)}/edges")
    val sig1 = edgesDir.listFiles().map(f => f.getName -> f.lastModified)
      .toSet
    // same snapshot id: O(1) trust, no rebuild
    GraphIndex.ensureGraph(spark, key, base, k = 4, rounds = 2,
      blockSize = 16, maxDegree = 12, snapshotId = Some("v1"))
    assert(edgesDir.listFiles().map(f => f.getName -> f.lastModified)
      .toSet === sig1)
    // delete → tombstoned layout no longer equals its source: ensure
    // rebuilds and clears the tombstones
    GraphIndex.deleteGraph(spark, key, Seq(3L).toDF("vec_id"))
    assert(GraphIndex.graphMeta(spark, key)("tomb_rows") === 1L)
    GraphIndex.ensureGraph(spark, key, base, k = 4, rounds = 2,
      blockSize = 16, maxDegree = 12, snapshotId = Some("v1"))
    assert(GraphIndex.graphMeta(spark, key)("tomb_rows") === 0L)
  }

  test("upsert: searched-in edges make new nodes reachable (reverse " +
      "direction stored); batch replay is a no-op") {
    val key = s"gspec-$runTag-c"
    GraphIndex.ensureGraph(spark, key, base, k = 4, rounds = 2,
      blockSize = 16, maxDegree = 12)
    // four new nodes, one per cluster (ids 60..63 → theta of cluster)
    val tail = pts(60 until 64)
    GraphIndex.upsertGraph(spark, key, tail, batchId = Some(1L))
    val nAfter = GraphIndex.openGraph(spark, key).vecs.count()
    assert(nAfter === 64L)
    GraphIndex.upsertGraph(spark, key, tail, batchId = Some(1L)) // replay
    assert(GraphIndex.openGraph(spark, key).vecs.count() === 64L)
    // a held-out probe just past cluster 0's far edge must retrieve the
    // upserted node 60 (theta .15 — base cluster-0 thetas stop at .14)
    val th = 0.155
    val probe = Seq((999L, Array(math.cos(th).toFloat, math.sin(th).toFloat)))
      .toDF("query_id", "query_vec")
    val got = GraphIndex.queryGraph(spark, key, probe, k = 1, beam = 8,
      rounds = 3).select("vec_id").as[Long].collect()
    assert(got.toSeq === Seq(60L))
  }

  test("delete: victims served nowhere (their own vectors as probes), " +
      "re-add refused until rebuild, replayed delete folds away") {
    val key = s"gspec-$runTag-d"
    GraphIndex.ensureGraph(spark, key, base, k = 4, rounds = 2,
      blockSize = 16, maxDegree = 12)
    val victims = base.filter(col("vec_id") < 8)
    GraphIndex.deleteGraph(spark, key, victims.select("vec_id"))
    assert(GraphIndex.graphMeta(spark, key)("tomb_rows") === 8L)
    // replay: already-tombstoned ids fold away
    GraphIndex.deleteGraph(spark, key, victims.select("vec_id"))
    assert(GraphIndex.graphMeta(spark, key)("tomb_rows") === 8L)
    val served = GraphIndex.queryGraph(spark, key, queriesOf(victims),
      k = 4, beam = 16, rounds = 3)
    assert(served.filter(col("vec_id") < 8).count() === 0L)
    assert(served.count() > 0L) // survivors still serve the probes
    // re-adding a tombstoned id is refused loudly
    val e = intercept[IllegalArgumentException] {
      GraphIndex.upsertGraph(spark, key, pts(0 until 1), batchId = Some(9L))
    }
    assert(e.getMessage.contains("tombstoned"))
  }

  test("compactGraph folds tombstones physically: served view " +
      "unchanged, layout tombFree, deleted id honestly re-admits") {
    val key = s"gspec-$runTag-f"
    GraphIndex.ensureGraph(spark, key, base, k = 4, rounds = 2,
      blockSize = 16, maxDegree = 12)
    GraphIndex.deleteGraph(spark, key, Seq(2L, 6L).toDF("vec_id"))
    val q = queriesOf(base.filter(col("vec_id") % 15 === 1))
    val beforeFold = hits(GraphIndex.queryGraph(spark, key, q, k = 2,
      beam = 8, rounds = 3))
    val h = GraphIndex.compactGraph(spark, key)
    assert(GraphIndex.graphMeta(spark, key)("tomb_rows") === 0L)
    assert(h.vecs.count() === 58L)
    // no physical row still touches a victim
    assert(h.edges.filter(col("src").isin(2L, 6L) ||
      col("dst").isin(2L, 6L)).count() === 0L)
    // the fold changes bytes, not the served view
    assert(hits(GraphIndex.queryGraph(spark, key, q, k = 2, beam = 8,
      rounds = 3)) === beforeFold)
    // a folded layout honestly re-admits the erased id
    GraphIndex.upsertGraph(spark, key, pts(2 until 3), batchId = Some(5L))
    assert(GraphIndex.openGraph(spark, key).vecs
      .filter(col("vec_id") === 2L).count() === 1L)
  }

  test("upsert re-add refusal holds when the tombs table is committed " +
      "but UNREGISTERED in this session (the cross-session window)") {
    val key = s"gspec-$runTag-x"
    GraphIndex.ensureGraph(spark, key, base, k = 4, rounds = 2,
      blockSize = 16, maxDegree = 12)
    GraphIndex.deleteGraph(spark, key, Seq(3L).toDF("vec_id"))
    // simulate another session having committed the delete: this
    // session's catalog has no tombs registration, but the store does
    spark.sql(s"DROP TABLE IF EXISTS graft_graph_tombs_" +
      IndexStore.pathTag(key))
    val e = intercept[IllegalArgumentException] {
      GraphIndex.upsertGraph(spark, key, pts(3 until 4), batchId = Some(2L))
    }
    assert(e.getMessage.contains("tombstoned"), e.getMessage)
  }

  test("crashed delete (tombs appended, meta never committed) is swept, " +
      "not served") {
    val key = s"gspec-$runTag-e"
    GraphIndex.ensureGraph(spark, key, base, k = 4, rounds = 2,
      blockSize = 16, maxDegree = 12)
    val baseDir = s"/tmp/graft_ann_graph_${IndexStore.pathTag(key)}"
    // simulate the crash window: orphan tombs rows on disk, meta silent
    Seq(5L).toDF("vec_id").write.mode("append").format("parquet")
      .save(s"$baseDir/tombs")
    assert(GraphIndex.graphMeta(spark, key).getOrElse("tomb_rows", 0L)
      === 0L)
    // open ignores the orphan (node 5 still serves)
    val got = GraphIndex.queryGraph(spark, key,
      queriesOf(base.filter(col("vec_id") === 5L)), k = 1, beam = 8,
      rounds = 3).select("vec_id").as[Long].collect()
    assert(got.toSeq === Seq(5L))
    // the next delete sweeps the orphan before committing its own batch
    GraphIndex.deleteGraph(spark, key, Seq(7L).toDF("vec_id"))
    assert(GraphIndex.graphMeta(spark, key)("tomb_rows") === 1L)
    val after = GraphIndex.queryGraph(spark, key,
      queriesOf(base.filter(col("vec_id") === 5L)), k = 1, beam = 8,
      rounds = 3).select("vec_id").as[Long].collect()
    assert(after.toSeq === Seq(5L)) // swept orphan never became a delete
  }
}
