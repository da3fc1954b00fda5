package graft.tools

import graft.Tables
import graft.rag.RagPipeline
import org.apache.spark.sql.SparkSession

/** Measures the per-call cost structure of the persisted-pair hybrid
  * serving path ([[RagPipeline.hybridRetrievePersisted]]) against the
  * direct form, isolating the freshness-probe trade its scaladoc
  * states:
  *
  *   - direct: `hybridRetrieve` — re-embeds the queries, full-scans the
  *     dense index, re-tokenizes the corpus into postings, every call;
  *   - persisted (fingerprint): `hybridRetrievePersisted` without a
  *     snapshotId — the answer plan probes the stored buckets/postings,
  *     but each call pays one id+hash fingerprint pass per layout;
  *   - persisted (snapshot): same with a `snapshotId` naming the
  *     immutable corpus snapshot — the serving configuration, O(1)
  *     freshness (meta read only, no scan).
  *
  * Usage: runMain graft.tools.HybridTune [sfDir] [runs]
  */
object HybridTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).flatMap(_.toIntOption).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    // the chunk index is the shared input of every variant: cache it so
    // per-call measurements see serving cost, not index construction
    val index = RagPipeline.buildIndex(spark, docs, chunkSize = 200).cache()
    index.count()
    val q = graft.queries.PipelineQueries.retrievalQueryDf(spark)
    val dir = sfDir + "!hybridtune"

    def time(label: String)(body: => Unit): Unit = {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[hybridtune] $label%-28s min=${times.min}%6.2f s " +
        f"(runs: ${times.map(t => f"$t%.2f").mkString(" ")})")
    }

    // one un-timed call builds both layouts so every timed variant
    // measures WARM serving, not the one-time build
    RagPipeline.hybridRetrievePersisted(spark, dir, q, index,
      snapshotId = Some("s1")).count()

    time("direct hybridRetrieve") {
      RagPipeline.hybridRetrieve(q, index).count(); ()
    }
    time("persisted, fingerprint") {
      RagPipeline.hybridRetrievePersisted(spark, dir, q, index).count(); ()
    }
    time("persisted, snapshot O(1)") {
      RagPipeline.hybridRetrievePersisted(spark, dir, q, index,
        snapshotId = Some("s1")).count(); ()
    }
    spark.stop()
  }
}
