package graft.tools

import graft.Tables
import graft.operators.{Frequency, Layout, QualityClassifier}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline measurement harness for the round-8 continuation operators —
  * produces the BASELINE.md numbers (measured, not asserted):
  * Misra–Gries sketch economics, z-order envelope tightness, and the
  * quality classifier's accuracy/loss trajectory per fixture scale.
  * Run: `sbt "runMain graft.tools.CurationTune"`.
  */
object CurationTune {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- Misra-Gries sketch economics per scale
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val docs = Tables.load(spark, s"/root/testdata/$sf", "documents")
      val grams = docs.select(explode(
        graft.functions.expressions.HashExpressions.shingles_k_positional(
          split(col("text"), " "), 2)).as("g"))
      val n = grams.count()
      val distinct = grams.distinct().count()
      val sk = grams.agg(graft.functions.expressions.FreqSketchAgg
        .freq_sketch(col("g"), 4096).as("sk"))
        .select(size(col("sk.items")).as("cands"), col("sk.delta"))
        .head()
      println(s"HH $sf: n_bigrams=$n distinct=$distinct " +
        s"sketch_cands=${sk.getInt(0)} delta=${sk.getLong(1)} " +
        s"(naive groupBy shuffles $n rows; sketch ships <=8192/task)")
    }

    // ---- z-order envelope tightness (the spec's measurement, exact)
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    def envHits(laid: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val env = laid.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg(min("y").as("mny"), max("y").as("mxy"),
          min("x").as("mnx"), max("x").as("mxx")).collect()
      val hits = env.count(_.getLong(1) <= 7L)
      val avgSpan = env.map(r =>
        (r.getLong(2) - r.getLong(1) + 1).toDouble *
          (r.getLong(4) - r.getLong(3) + 1)).sum / env.length
      (hits.toLong, avgSpan)
    }
    val (zh, zs) = envHits(Layout.zorderLayout(grid, Seq("x", "y"), 16))
    val (xh, xs) = envHits(grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions("x"))
    println(f"ZORD 64x64 grid, 16 partitions: y<=7 box intersects " +
      f"z=$zh vs xsort=$xh envelopes; avg envelope area z=$zs%.0f " +
      f"vs xsort=$xs%.0f")

    // ---- quality classifier trajectory per scale
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val docs = Tables.load(spark, s"/root/testdata/$sf", "documents")
      val lab = docs.withColumn("y",
        array_contains(split(col("text"), " "), "table").cast("double"))
      val t0 = System.nanoTime()
      val m = QualityClassifier.train(lab, "y", iters = 20, lr = 20.0)
      val secs = (System.nanoTime() - t0) / 1e9
      val acc = QualityClassifier.score(lab, m)
        .agg(avg(when(col("quality_pred") === col("y").cast("int"), 1.0)
          .otherwise(0.0))).head().getDouble(0)
      println(f"QCLS $sf: 20 iters in $secs%.1f s, acc=$acc%.4f, " +
        f"loss ${m.initLoss}%.4f -> ${m.finalLoss}%.4f")
    }

    // ---- heavy hitters end-to-end timing at sf0.1
    val docs01 = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val t0 = System.nanoTime()
    val top = Frequency.topNgramsExact(docs01, n = 2, k = 20,
      capacity = 4096).count()
    println(f"HH sf0.1 end-to-end (sketch+exact+certify): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s, $top rows")
    spark.stop()
  }
}
