package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Diagnostic: BenchProbe with extra session confs from the command
  * line, so a §2.2/§9 configuration hypothesis (AQE coalescing,
  * advisory partition size, codegen knobs) is measured on real queries
  * before it is adopted in the entry points.
  *
  * Usage: runMain graft.tools.ConfProbe <sfDir> <runs> k=v[,k=v...] <query...>
  */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args(1).toInt
    val confs = args(2).split(',').filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }.toSeq
    val names = args.drop(3).toSeq
    var b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
    confs.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n =>
      Tables.load(spark, sfDir, n).queryExecution.toRdd.count())
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to runs).map { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.queryExecution.toRdd.foreach(_ => ())
        val sec = (System.nanoTime() - t0) / 1e9
        cleanup()
        println(f"[conf] $name run$i total=$sec%.2f")
        sec
      }
      println(f"[conf] $name min=${times.min}%.2f")
    }
    spark.stop()
  }
}
