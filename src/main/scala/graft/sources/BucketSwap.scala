package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.file.{Files, Paths}

/** JOURNALED per-bucket stage-then-swap for hash-partitioned parquet
  * layouts (`<live>/<part>=N/...`) — the commit primitive behind
  * [[Scd2Store.merge]]/[[Scd2Store.purgeKeys]] and the purge verbs of
  * [[DedupStore]]/[[SplitStore]]. A bare dynamic-partition-overwrite
  * commits bucket-by-bucket via delete+rename with no recovery record:
  * a crash mid-commit loses a bucket's prior committed rows entirely,
  * and a retry that re-derives from the surviving rows cannot get them
  * back. This closes that window:
  *
  *  1. staged rows land in a SIDE directory (`<live>__side_<pid>`) —
  *     the live buckets are never a write target;
  *  2. a journal naming the side dir, every touched bucket, and the
  *     buckets the stage EMPTIED commits atomically (temp + rename);
  *  3. each touched bucket swaps in: delete live dir, atomic-rename
  *     side dir in (or, for an emptied bucket, delete live);
  *  4. the journal is removed, then the caller commits its meta.
  *
  * Crash anywhere: before the journal, the side dir is unreferenced
  * garbage ([[sweepOrphans]]); after it, [[recover]] ROLLS FORWARD —
  * side bucket present → finish its swap; absent and journaled emptied
  * → delete live (idempotent); absent otherwise → that bucket's swap
  * already completed. The emptied list is what makes the roll-forward
  * decidable: without it, "side absent" cannot distinguish a completed
  * swap from a staged-empty bucket, and guessing deletes live data.
  *
  * Single-writer discipline per layout (no lock on a parquet layout);
  * readers call [[recover]] first so a mid-swap crash never serves a
  * half-gutted view.
  */
private[sources] object BucketSwap {

  private def journalPath(b: String, liveName: String) =
    Paths.get(b, s"_swap_journal_$liveName.json")

  /** Stage `staged` (the touched buckets' FULL new content, partition
    * column included) and swap it into `<b>/<liveName>`. `touched`
    * must cover every `partCol` value present in `staged`; a touched
    * bucket with no staged rows is deleted from live.
    */
  def stageAndSwap(spark: SparkSession, b: String, liveName: String,
      partCol: String, staged: DataFrame, touched: Seq[Int]): Unit = {
    sweepOrphans(b, liveName)
    val sideName = s"${liveName}__side_${ProcessHandle.current.pid}"
    val sideDir = s"$b/$sideName"
    staged.write.mode(SaveMode.Overwrite).partitionBy(partCol)
      .parquet(sideDir)
    val emptied = touched.filterNot(v =>
      Files.exists(Paths.get(sideDir, s"$partCol=$v")))
    val tmp = Paths.get(b,
      s"_swap_journal_$liveName.json.tmp${ProcessHandle.current.pid}")
    Files.writeString(tmp,
      s"""{"side": "$sideName", "part_col": "$partCol", """ +
        s""""buckets": [${touched.mkString(", ")}], """ +
        s""""emptied": [${emptied.mkString(", ")}]}""")
    Files.move(tmp, journalPath(b, liveName),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    swapBuckets(b, liveName, sideName, partCol, touched, emptied.toSet)
  }

  private def swapBuckets(b: String, liveName: String, sideName: String,
      partCol: String, touched: Seq[Int], emptied: Set[Int]): Unit = {
    val liveDir = Paths.get(b, liveName)
    Files.createDirectories(liveDir)
    touched.foreach { v =>
      val side = Paths.get(b, sideName, s"$partCol=$v")
      val live = liveDir.resolve(s"$partCol=$v")
      if (Files.exists(side)) {
        if (Files.exists(live))
          org.apache.commons.io.FileUtils.deleteDirectory(live.toFile)
        Files.move(side, live,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      } else if (emptied.contains(v) && Files.exists(live)) {
        org.apache.commons.io.FileUtils.deleteDirectory(live.toFile)
      }
    }
    Files.deleteIfExists(journalPath(b, liveName))
    val sd = Paths.get(b, sideName)
    if (Files.exists(sd))
      org.apache.commons.io.FileUtils.deleteDirectory(sd.toFile)
  }

  /** Roll an interrupted swap forward and sweep orphan side dirs.
    * Called by every reader and writer entry point; no-op on a clean
    * layout.
    */
  def recover(b: String, liveName: String): Unit = {
    val jp = journalPath(b, liveName)
    if (Files.exists(jp)) {
      val txt = Files.readString(jp)
      def str(field: String): String =
        (s""""$field"""" + "\\s*:\\s*\"([^\"]+)\"").r
          .findFirstMatchIn(txt).map(_.group(1))
          .getOrElse(throw new IllegalStateException(
            s"corrupt swap journal at $jp (missing $field)"))
      def ints(field: String): Seq[Int] = "\\d+".r.findAllIn(
        (s""""$field"""" + "\\s*:\\s*\\[([^\\]]*)\\]").r
          .findFirstMatchIn(txt).map(_.group(1)).getOrElse(""))
        .map(_.toInt).toSeq
      swapBuckets(b, liveName, str("side"), str("part_col"),
        ints("buckets"), ints("emptied").toSet)
    }
    sweepOrphans(b, liveName)
  }

  private def sweepOrphans(b: String, liveName: String): Unit = {
    val root = Paths.get(b)
    if (Files.exists(root) && !Files.exists(journalPath(b, liveName))) {
      val s = Files.list(root)
      try s.filter(p =>
          p.getFileName.toString.startsWith(s"${liveName}__side_"))
        .forEach(p =>
          org.apache.commons.io.FileUtils.deleteDirectory(p.toFile))
      finally s.close()
    }
  }
}
