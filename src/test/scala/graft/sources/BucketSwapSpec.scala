package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The journaled stage-then-swap commit primitive: happy path,
  * roll-forward from every crash point (journal written but no bucket
  * swapped; some swapped; a bucket's live deleted but side not yet
  * renamed in; staged-empty bucket), and orphan side-dir sweep — the
  * mechanism that closes dynamic-partition-overwrite's mid-commit
  * loss window for Scd2Store/purge rewrites.
  */
class BucketSwapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import scala.jdk.CollectionConverters._

  private def freshBase(): String = {
    val d = Files.createTempDirectory("bswap").toString
    d
  }

  private def writeLive(b: String): Unit =
    Seq((1L, 0), (2L, 1), (3L, 2)).toDF("v", "kb")
      .write.mode("overwrite").partitionBy("kb").parquet(s"$b/dim")

  private def readAll(b: String): Set[(Long, Int)] =
    spark.read.parquet(s"$b/dim").select("v", "kb").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet

  test("happy path: touched buckets replaced, untouched intact, " +
      "emptied bucket deleted, journal and side gone") {
    val b = freshBase()
    writeLive(b)
    // stage: bucket 0 -> new row 10, bucket 1 -> EMPTIED, bucket 2
    // untouched
    BucketSwap.stageAndSwap(spark, b, "dim", "kb",
      Seq((10L, 0)).toDF("v", "kb"), Seq(0, 1))
    assert(readAll(b) === Set((10L, 0), (3L, 2)))
    assert(!Files.exists(Paths.get(b, "_swap_journal_dim.json")))
    val s = Files.list(Paths.get(b))
    try assert(!s.iterator().asScala.exists(
      _.getFileName.toString.startsWith("dim__side_")))
    finally s.close()
  }

  /** Fabricate the exact on-disk state of a crash mid-swap and assert
    * recover() rolls it forward to the staged content.
    */
  private def crashScenario(mutate: String => Unit): Unit = {
    val b = freshBase()
    writeLive(b)
    val side = s"$b/dim__side_999"
    // staged content: bucket 0 -> 10, bucket 1 emptied
    Seq((10L, 0)).toDF("v", "kb")
      .write.mode("overwrite").partitionBy("kb").parquet(side)
    Files.writeString(Paths.get(b, "_swap_journal_dim.json"),
      """{"side": "dim__side_999", "part_col": "kb", """ +
        """"buckets": [0, 1], "emptied": [1]}""")
    mutate(b)
    BucketSwap.recover(b, "dim")
    assert(readAll(b) === Set((10L, 0), (3L, 2)))
    assert(!Files.exists(Paths.get(b, "_swap_journal_dim.json")))
  }

  test("roll-forward: journal written, no bucket swapped yet")(
    crashScenario(_ => ()))

  test("roll-forward: crash between delete-live and rename-side — " +
      "the window a bare partition overwrite loses data in")(
    crashScenario { b =>
      org.apache.commons.io.FileUtils.deleteDirectory(
        Paths.get(b, "dim", "kb=0").toFile) // live gone, side present
    })

  test("roll-forward: one bucket fully swapped, emptied bucket not " +
      "yet deleted — the swapped bucket must NOT be guessed empty")(
    crashScenario { b =>
      // complete bucket 0's swap by hand: delete live, move side in
      org.apache.commons.io.FileUtils.deleteDirectory(
        Paths.get(b, "dim", "kb=0").toFile)
      Files.move(Paths.get(b, "dim__side_999", "kb=0"),
        Paths.get(b, "dim", "kb=0"))
    })

  test("roll-forward: everything swapped, only journal cleanup left")(
    crashScenario { b =>
      org.apache.commons.io.FileUtils.deleteDirectory(
        Paths.get(b, "dim", "kb=0").toFile)
      Files.move(Paths.get(b, "dim__side_999", "kb=0"),
        Paths.get(b, "dim", "kb=0"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        Paths.get(b, "dim", "kb=1").toFile)
    })

  test("orphan side dir without a journal (crash before commit) is " +
      "swept; live content untouched") {
    val b = freshBase()
    writeLive(b)
    val side = s"$b/dim__side_777"
    Seq((99L, 0)).toDF("v", "kb")
      .write.mode("overwrite").partitionBy("kb").parquet(side)
    BucketSwap.recover(b, "dim")
    assert(readAll(b) === Set((1L, 0), (2L, 1), (3L, 2)))
    assert(!Files.exists(Paths.get(side)))
  }
}
