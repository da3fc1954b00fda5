package graft.sources

import graft.TestSpark
import graft.operators.Scd2
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted SCD2 dimension lifecycle: incremental CDC merges equal
  * the batch rebuild, replay/crash-retry are idempotent, history
  * rewrites are refused loudly, point-in-time lookup serves from the
  * store.
  */
class Scd2StoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private val runTag = java.util.UUID.randomUUID.toString.take(8)

  private val feed = Seq(
    (1L, ts("2024-01-01 00:00:00"), "bronze"),
    (1L, ts("2024-01-02 00:00:00"), "bronze"), // no-op
    (2L, ts("2024-01-02 00:00:00"), "gold"),
    (1L, ts("2024-01-03 00:00:00"), "gold"),
    (3L, ts("2024-01-04 00:00:00"), "silver"),
    (1L, ts("2024-01-05 00:00:00"), "silver"),
    (2L, ts("2024-01-06 00:00:00"), "bronze"))

  private def df(rows: Seq[(Long, java.sql.Timestamp, String)]) =
    rows.toDF("user_id", "ts", "tier")

  private def dimSet(d: org.apache.spark.sql.DataFrame) =
    d.select("user_id", "tier", "valid_from", "valid_to", "is_current")
      .collect().map(_.toSeq).toSet

  test("batch-merged store equals fromChanges over the concatenated " +
      "feed; replayed batch ids skip; lookup serves from the store") {
    val key = s"scd2-$runTag-a"
    Scd2Store.merge(spark, key, df(feed.take(3)), "user_id", "ts",
      Seq("tier"), batchId = 1L)
    Scd2Store.merge(spark, key, df(feed.slice(3, 5)), "user_id", "ts",
      Seq("tier"), batchId = 2L)
    val dim = Scd2Store.merge(spark, key, df(feed.drop(5)), "user_id",
      "ts", Seq("tier"), batchId = 3L)
    val expected = dimSet(Scd2.fromChanges(df(feed), "user_id", "ts",
      Seq("tier")))
    assert(dimSet(dim) === expected)
    // replayed ids (stream restart) change nothing — even with content
    // the store has already folded
    val replayed = Scd2Store.merge(spark, key, df(feed), "user_id",
      "ts", Seq("tier"), batchId = 2L)
    assert(dimSet(replayed) === expected)
    // point-in-time lookup from the store: user 1 at Jan 4 was gold
    val probe = Seq((1L, ts("2024-01-04 12:00:00"))).toDF("user_id", "ts")
    val hit = Scd2Store.lookup(spark, key, probe, "user_id", "ts")
      .select("tier").collect().map(_.getString(0)).toSeq
    assert(hit === Seq("gold"))
    // a probe before the key's first interval honestly reads null
    val early = Seq((3L, ts("2023-12-01 00:00:00"))).toDF("user_id", "ts")
    assert(Scd2Store.lookup(spark, key, early, "user_id", "ts")
      .select("tier").collect().map(_.isNullAt(0)).toSeq === Seq(true))
  }

  test("lookupPruned: output-identical to lookup, and the dimension " +
      "scan carries the probes' kb partition filter (reads only " +
      "touched buckets)") {
    val key = s"scd2-$runTag-pruned"
    Scd2Store.merge(spark, key, df(feed), "user_id", "ts", Seq("tier"),
      batchId = 1L)
    val probes = Seq((1L, ts("2024-01-04 12:00:00")),
      (2L, ts("2024-01-07 00:00:00"))).toDF("user_id", "ts")
    val full = Scd2Store.lookup(spark, key, probes, "user_id", "ts")
      .select("user_id", "tier").collect().map(_.toSeq).toSet
    val pruned = Scd2Store.lookupPruned(spark, key, probes, "user_id",
      "ts")
    assert(pruned.select("user_id", "tier").collect().map(_.toSeq).toSet
      === full)
    // hand check: user 1 at Jan 4 sits in [Jan 3, Jan 5) = gold;
    // user 2 at Jan 7 sits in the open [Jan 6, ∞) = bronze
    assert(full === Set(Seq(1L, "gold"), Seq(2L, "bronze")))
    // the pruned scan names kb in its PartitionFilters — partition
    // pruning, not a post-scan filter over the whole dimension
    val plan = pruned.queryExecution.executedPlan.toString
    val partLines = plan.linesIterator
      .filter(_.contains("PartitionFilters")).toSeq
    assert(partLines.exists(_.contains("kb")),
      s"kb never reached a PartitionFilter:\n$plan")
  }

  test("crash-retry (data written, meta never committed) re-derives " +
      "byte-identical buckets; duplicate redelivery folds") {
    val key = s"scd2-$runTag-b"
    Scd2Store.merge(spark, key, df(feed.take(5)), "user_id", "ts",
      Seq("tier"), batchId = 1L)
    val after2 = dimSet(Scd2Store.merge(spark, key, df(feed.drop(5)),
      "user_id", "ts", Seq("tier"), batchId = 2L))
    // simulate the crash window: batch 2's data is on disk but the
    // meta still reads batch 1 — the retry must re-derive identically
    val base = s"/tmp/graft_scd2store_${IndexStore.pathTag(key)}"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(base, "_scd2_meta.json"),
      """{"last_batch_id": 1}""")
    val retried = Scd2Store.merge(spark, key, df(feed.drop(5)),
      "user_id", "ts", Seq("tier"), batchId = 2L)
    assert(dimSet(retried) === after2)
    // at-least-once redelivery of already-folded changes is a no-op
    val redelivered = Scd2Store.merge(spark, key, df(feed), "user_id",
      "ts", Seq("tier"), batchId = 3L)
    assert(dimSet(redelivered) === after2)
  }

  test("a history REWRITE — a change at-or-before a key's latest " +
      "opening that contradicts recorded history — is refused loudly " +
      "and nothing lands") {
    val key = s"scd2-$runTag-c"
    Scd2Store.merge(spark, key, df(feed), "user_id", "ts", Seq("tier"),
      batchId = 1L)
    val before = dimSet(Scd2Store.readDim(spark, key))
    // same ts as user 1's Jan 3 opening, different value
    val rewrite = intercept[IllegalArgumentException] {
      Scd2Store.merge(spark, key,
        df(Seq((1L, ts("2024-01-03 00:00:00"), "platinum"))),
        "user_id", "ts", Seq("tier"), batchId = 2L)
    }
    assert(rewrite.getMessage.contains("REWRITE"))
    // strictly inside a closed interval, contradicting it
    val inside = intercept[IllegalArgumentException] {
      Scd2Store.merge(spark, key,
        df(Seq((1L, ts("2024-01-02 12:00:00"), "platinum"))),
        "user_id", "ts", Seq("tier"), batchId = 3L)
    }
    assert(inside.getMessage.contains("REWRITE"))
    // before the key's first recorded interval
    val early = intercept[IllegalArgumentException] {
      Scd2Store.merge(spark, key,
        df(Seq((1L, ts("2023-12-01 00:00:00"), "wood"))),
        "user_id", "ts", Seq("tier"), batchId = 4L)
    }
    assert(early.getMessage.contains("REWRITE"))
    assert(dimSet(Scd2Store.readDim(spark, key)) === before)
    Scd2Store.drop(spark, key)
    intercept[IllegalArgumentException] {
      Scd2Store.readDim(spark, key)
    }
  }

  test("the history guard costs exactly one extra job; " +
      "checkHistory = false skips it (the lazy-contract option)") {
    // count ACTIONS (driver-synchronized executions), not Spark jobs —
    // AQE fans one action into several jobs nondeterministically
    def countJobs(body: => Unit): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = n.incrementAndGet()
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
      spark.listenerManager.register(l)
      try { body; Thread.sleep(1000) } // listener events are async
      finally spark.listenerManager.unregister(l)
      n.get()
    }
    val (kGuard, kLazy) = (s"scd2-$runTag-jg", s"scd2-$runTag-jl")
    Scd2Store.merge(spark, kGuard, df(feed.take(3)), "user_id", "ts",
      Seq("tier"), batchId = 1L)
    Scd2Store.merge(spark, kLazy, df(feed.take(3)), "user_id", "ts",
      Seq("tier"), batchId = 1L)
    val withGuard = countJobs(
      Scd2Store.merge(spark, kGuard, df(feed.slice(3, 5)), "user_id",
        "ts", Seq("tier"), batchId = 2L))
    val without = countJobs(
      Scd2Store.merge(spark, kLazy, df(feed.slice(3, 5)), "user_id",
        "ts", Seq("tier"), batchId = 2L, checkHistory = false))
    assert(withGuard === without + 1,
      s"guard should cost exactly one job (got $withGuard vs $without)")
    // and the two stores hold identical content (the guard is a
    // check, never a transform)
    assert(dimSet(Scd2Store.readDim(spark, kGuard)) ===
      dimSet(Scd2Store.readDim(spark, kLazy)))
  }

  test("lookupPruned hashes probe keys at the STORED key type: an " +
      "int-typed probe against a long-keyed dimension still prunes " +
      "the right bucket (and stays lookup-identical)") {
    val key = s"scd2-$runTag-cast"
    Scd2Store.merge(spark, key, df(feed), "user_id", "ts",
      Seq("tier"), batchId = 1L)
    val intProbes = Seq((1, ts("2024-01-04 12:00:00")),
      (2, ts("2024-01-06 12:00:00")), (3, ts("2024-01-04 00:00:00")))
      .toDF("user_id", "ts") // user_id is INT; the dimension stores LONG
    val pruned = Scd2Store.lookupPruned(spark, key, intProbes,
      "user_id", "ts").select("user_id", "tier").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    val full = Scd2Store.lookup(spark, key, intProbes, "user_id", "ts")
      .select("user_id", "tier").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(pruned === full)
    assert(pruned === Set((1, "gold"), (2, "bronze"), (3, "silver")))
  }

  test("purgeKeys erases a key's ENTIRE history (the deliberate " +
      "right-to-be-forgotten exception), is idempotent and " +
      "replay-skipped, leaves other keys byte-stable") {
    val key = s"scd2-$runTag-purge"
    Scd2Store.merge(spark, key, df(feed), "user_id", "ts",
      Seq("tier"), batchId = 1L)
    val othersBefore = dimSet(Scd2Store.readDim(spark, key)
      .filter(col("user_id") =!= 1L))
    val after = Scd2Store.purgeKeys(spark, key,
      Seq(1L).toDF("user_id"), "user_id", batchId = Some(1L))
    assert(after.filter(col("user_id") === 1L).count() === 0L)
    assert(dimSet(after.filter(col("user_id") =!= 1L)) === othersBefore)
    // replayed purge id no-ops; re-purging an erased key no-ops
    Scd2Store.purgeKeys(spark, key, Seq(1L).toDF("user_id"),
      "user_id", batchId = Some(1L))
    Scd2Store.purgeKeys(spark, key, Seq(1L).toDF("user_id"),
      "user_id", batchId = Some(2L))
    assert(dimSet(Scd2Store.readDim(spark, key)) === othersBefore)
    // a purged key may be re-introduced by a later feed (admission is
    // the caller's) — and its fresh history is NOT a rewrite
    Scd2Store.merge(spark, key,
      df(Seq((1L, ts("2024-02-01 00:00:00"), "fresh"))),
      "user_id", "ts", Seq("tier"), batchId = 2L)
    assert(Scd2Store.readDim(spark, key)
      .filter(col("user_id") === 1L).count() === 1L)
  }
}
