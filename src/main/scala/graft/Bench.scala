package graft

import org.apache.spark.sql.SparkSession

/** Bench harness: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query wall times.
  * Each query is fully materialized (`toRdd.foreach`) — not just counted —
  * so projection-only stages can't be optimized away.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (parquet footers, codegen compiler, shuffle infra)
    // so the first measured query isn't charged session startup
    Tables.names.foreach(n =>
      Tables.load(spark, sfDir, n).queryExecution.toRdd.count())
    // three timed runs per query; the min is the headline (steady-state
    // cost — the first run pays one-time codegen/JIT), and max - min is
    // reported as the spread so a host-contention outlier is visible as
    // noise instead of masquerading as a plan regression.
    val runs = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_RUNS").flatMap(_.toIntOption).getOrElse(3))
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          df.queryExecution.toRdd.foreach(_ => ())
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            Double.MaxValue
        }
      }
      (name, times.min, times.max - times.min)
    }
    // The harness that records this line captures only the TAIL of the
    // process output (~2000 chars), so the parsed JSON line must stay
    // well under that: short query keys (the unique qNN prefix), 2-decimal
    // seconds, and no spread map. The full long-name per-query table
    // (min + spread) goes to stderr for humans.
    results.foreach { case (k, v, s) =>
      System.err.println(f"[bench] $k%-28s min=$v%8.3f s  spread=$s%7.3f s")
    }
    val qs = results.map { case (k, v, _) =>
      "\"" + k.takeWhile(_ != '_') + f"""\":$v%.2f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val totalSpread = results.map(_._3).sum
    val json = f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs_per_query":$runs,"spread_total":$totalSpread%.3f,"queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // Sidecar copy: the harness tail-scrapes stdout through sbt noise and has
    // failed to parse it (BENCH_r04 "parsed": null) — a structural file read
    // can't be defeated by interleaved log lines.
    try java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/bench.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: java.io.IOException => () }
    spark.stop()
    // The harness captures only the ~2000-char TAIL of combined output, and
    // in round 5 the stderr per-query table landed AFTER the stdout JSON
    // line, pushing it out of the window (BENCH_r05 "parsed": null again).
    // Repeat the JSON as the very last line on BOTH streams, after
    // spark.stop() so no shutdown logging can trail it.
    System.out.flush()
    System.err.println(json)
    System.err.flush()
  }
}
