package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Diagnostic: per-JOB time attribution for named SparkEntry queries.
  * Attaches a listener that records every Spark job's call site (the
  * default job description — "collect at Foo.scala:42") and duration,
  * so the eager verbs inside a query body (ensure / purge / maintain /
  * training loops) show up line-by-line instead of folding into one
  * opaque "plan" number. Applies the Bench harness's between-run
  * session cleanup so numbers are position-independent.
  *
  * Usage: runMain graft.tools.JobProfile <sfDir> <runs> <query...>
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).flatMap(_.toIntOption).getOrElse(2)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n =>
      Tables.load(spark, sfDir, n).queryExecution.toRdd.count())

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val acc = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val listener = new SparkListener {
      override def onOtherEvent(
          event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        event match {
          case e: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execDesc.put(e.executionId, e.description)
          case _ => ()
        }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val viaSql = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .flatMap(_.toLongOption).flatMap(id => Option(execDesc.get(id)))
        val site = viaSql.getOrElse(
          if (js.stageInfos.nonEmpty) js.stageInfos.maxBy(_.stageId).name
          else "?")
        starts.put(js.jobId, (site, System.nanoTime()))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) {
          val ms = (System.nanoTime() - s._2) / 1000000L
          acc.merge(s._1, (ms, 1L),
            (a, b) => (a._1 + b._1, a._2 + b._2))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      acc.clear()
      val times = (1 to runs).map { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tPlan = System.nanoTime()
        df.queryExecution.toRdd.foreach(_ => ())
        val tExec = System.nanoTime()
        cleanup()
        println(f"[jp] $name run$i plan=${(tPlan - t0) / 1e9}%.2f " +
          f"exec=${(tExec - tPlan) / 1e9}%.2f " +
          f"total=${(tExec - t0) / 1e9}%.2f")
        (tExec - t0) / 1e9
      }
      println(f"[jp] $name min=${times.min}%.2f over $runs runs; " +
        s"top job sites by total ms (all runs):")
      import scala.jdk.CollectionConverters._
      acc.asScala.toSeq.sortBy(-_._2._1).take(30).foreach {
        case (site, (ms, n)) =>
          println(f"[jp]   $ms%7d ms  n=$n%-4d $site")
      }
    }
    spark.stop()
  }
}
