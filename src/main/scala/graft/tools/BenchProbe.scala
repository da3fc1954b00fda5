package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Diagnostic: time named SparkEntry queries run-by-run in one session,
  * so per-run build-vs-reuse costs (e.g. ANN index ensure* paths) are
  * visible separately instead of folded into a min-of-N.
  *
  * Usage: runMain graft.tools.BenchProbe <sfDir> <runs> <query...>
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).flatMap(_.toIntOption).getOrElse(3)
    val names = args.drop(2).toSeq match {
      case Seq() => Seq("q67_lsh_persisted", "q68_ivf_persisted")
      case xs => xs
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n =>
      Tables.load(spark, sfDir, n).queryExecution.toRdd.count())
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to runs).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tPlan = System.nanoTime()
        df.queryExecution.toRdd.foreach(_ => ())
        val tExec = System.nanoTime()
        println(f"[probe] $name run$i plan=${(tPlan - t0) / 1e9}%.2f exec=${(tExec - tPlan) / 1e9}%.2f total=${(tExec - t0) / 1e9}%.2f")
      }
    }
    spark.stop()
  }
}
