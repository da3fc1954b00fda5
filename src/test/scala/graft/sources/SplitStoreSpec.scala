package graft.sources

import graft.TestSpark
import graft.operators.CorpusOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental split-store lifecycle: write-once stability, cluster
  * adoption, first-batch parity with the one-shot operator, loud
  * cross-split-conflict refusal, replay/crash-retry idempotence.
  */
class SplitStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val runTag = java.util.UUID.randomUUID.toString.take(8)

  private def pairsDf(ps: (Long, Long)*) =
    ps.toDF("doc_id_a", "doc_id_b")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap

  test("first batch equals the one-shot leakageFreeSplit; an increment " +
      "ADOPTS stored splits (never re-derives the rep bucket); stored " +
      "rows are write-once; replay and crash-retry are idempotent") {
    val key = s"split-$runTag-a"
    val evens = Seq(2L, 4L, 6L, 8L, 10L).toDF("doc_id")
    val p1 = pairsDf((2L, 4L), (6L, 8L)) // clusters {2,4}, {6,8}, {10}
    val snap1 = asMap(SplitStore.assign(spark, key, evens, p1,
      batchId = 1L))
    val oneShot = CorpusOps.leakageFreeSplit(evens, "doc_id", p1)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(snap1 === oneShot) // fresh store ≡ the batch operator
    // increment: doc 1 joins {2,4} — were the split re-derived from
    // the new min id 1, the WHOLE cluster's bucket would move; the
    // store instead adopts the committed assignment
    val fin = asMap(SplitStore.assign(spark, key, Seq(1L, 11L)
      .toDF("doc_id"), pairsDf((1L, 2L)), batchId = 2L))
    assert(fin(1L) === snap1(2L)) // adopted (rep 2, committed split)
    assert(fin(11L) === ((11L, fin(11L)._2))) // fresh singleton
    snap1.foreach { case (d, v) => assert(fin(d) === v) } // write-once
    // replayed id: nothing changes even with new content
    val replay = asMap(SplitStore.assign(spark, key,
      Seq(99L).toDF("doc_id"), pairsDf(), batchId = 2L))
    assert(replay === fin)
    // crash-retry: rows appended, meta never committed — the retry
    // assigns only the remainder and converges to the same state
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        s"/tmp/graft_splitstore_${IndexStore.pathTag(key)}",
        "_split_meta.json"),
      """{"last_batch_id": 1}""")
    val retried = asMap(SplitStore.assign(spark, key, Seq(1L, 11L)
      .toDF("doc_id"), pairsDf((1L, 2L)), batchId = 2L))
    assert(retried === fin)
  }

  test("new evidence linking stored clusters across the split boundary " +
      "is REFUSED loudly (no assignment can repair the leakage), and " +
      "nothing lands") {
    // engineer two singletons whose buckets land in different splits
    def bucket(rep: Long, sd: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hx = md.digest(s"$rep:$sd".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      java.lang.Long.parseLong(hx, 16) % 10
    }
    val sd = (0L to 5000L).find(s =>
      bucket(1L, s) < 8 && bucket(2L, s) == 9).get
    val key = s"split-$runTag-b"
    SplitStore.assign(spark, key, Seq(1L, 2L).toDF("doc_id"), pairsDf(),
      seed = sd, batchId = 1L)
    val before = asMap(SplitStore.read(spark, key))
    assert(before(1L)._2 === "train" && before(2L)._2 === "test")
    val ex = intercept[IllegalArgumentException] {
      SplitStore.assign(spark, key, Seq(3L).toDF("doc_id"),
        pairsDf((3L, 1L), (3L, 2L)), seed = sd, batchId = 2L)
    }
    assert(ex.getMessage.contains("leakage"))
    assert(asMap(SplitStore.read(spark, key)) === before)
    SplitStore.drop(spark, key)
    intercept[IllegalArgumentException] {
      SplitStore.read(spark, key)
    }
  }

  test("onConflict = 'quarantine' routes the conflicting component " +
      "aside (never dropped, never assigned), admits the rest, and a " +
      "resolved re-submission assigns normally") {
    def bucket(rep: Long, sd: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hx = md.digest(s"$rep:$sd".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      java.lang.Long.parseLong(hx, 16) % 10
    }
    val sd = (0L to 5000L).find(s =>
      bucket(1L, s) < 8 && bucket(2L, s) == 9).get
    val key = s"split-$runTag-q"
    SplitStore.assign(spark, key, Seq(1L, 2L).toDF("doc_id"), pairsDf(),
      seed = sd, batchId = 1L)
    val before = asMap(SplitStore.read(spark, key))
    // batch 2: doc 3 links train-1 and test-2 (the conflict); doc 4 is
    // clean — with quarantine routing the batch SUCCEEDS
    val after = asMap(SplitStore.assign(spark, key,
      Seq(3L, 4L).toDF("doc_id"), pairsDf((3L, 1L), (3L, 2L)),
      seed = sd, batchId = 2L, onConflict = "quarantine"))
    assert(!after.contains(3L)) // quarantined, not assigned
    assert(after.contains(4L)) // the rest of the batch admitted
    before.foreach { case (d, v) => assert(after(d) === v) }
    val cq = SplitStore.readConflicts(spark, key)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cq === Set((3L, 2L))) // component touched 2 splits
    // crash-retry of the same trigger appends no duplicate conflicts
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        s"/tmp/graft_splitstore_${IndexStore.pathTag(key)}",
        "_split_meta.json"),
      """{"last_batch_id": 1}""")
    SplitStore.assign(spark, key, Seq(3L, 4L).toDF("doc_id"),
      pairsDf((3L, 1L), (3L, 2L)), seed = sd, batchId = 2L,
      onConflict = "quarantine")
    assert(SplitStore.readConflicts(spark, key).count() === 1L)
    // resolved re-submission (the linking evidence gone): assigns
    val fin = asMap(SplitStore.assign(spark, key, Seq(3L).toDF("doc_id"),
      pairsDf((3L, 1L)), seed = sd, batchId = 3L,
      onConflict = "quarantine"))
    assert(fin(3L) === before(1L)) // adopts cluster 1's split
  }

  test("compact folds the per-batch file sets; read() is " +
      "byte-identical; the replay guard and a follow-on assign " +
      "survive") {
    val key = s"split-$runTag-c"
    (1 to 5).foreach { i =>
      SplitStore.assign(spark, key,
        Seq(i.toLong * 10, i.toLong * 10 + 1).toDF("doc_id"),
        pairsDf((i.toLong * 10, i.toLong * 10 + 1)), batchId = i.toLong)
    }
    val before = asMap(SplitStore.read(spark, key))
    val dir = java.nio.file.Paths.get(
      s"/tmp/graft_splitstore_${IndexStore.pathTag(key)}", "assign")
    def nFiles: Long = {
      val s = java.nio.file.Files.walk(dir)
      try s.filter(p => p.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    val filesBefore = nFiles
    SplitStore.compact(spark, key, numFiles = 2)
    assert(nFiles < filesBefore && nFiles <= 2)
    assert(asMap(SplitStore.read(spark, key)) === before)
    // replay guard intact: a replayed id still no-ops
    assert(asMap(SplitStore.assign(spark, key, Seq(999L).toDF("doc_id"),
      pairsDf(), batchId = 3L)) === before)
    // and the store keeps growing normally
    val grown = asMap(SplitStore.assign(spark, key,
      Seq(60L).toDF("doc_id"), pairsDf(), batchId = 6L))
    assert(grown.contains(60L) && grown.size === before.size + 1)
  }
}
