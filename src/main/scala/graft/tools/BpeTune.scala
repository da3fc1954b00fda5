package graft.tools

import graft.Tables
import graft.operators.CorpusOps
import org.apache.spark.sql.SparkSession

/** BPE batched-merge measurement: wall-clock and sequence fidelity of
  * `bpeMerges(batchSize = B)` against the exact greedy B=1 reference on
  * a fixture corpus. Run:
  *
  *   sbt "runMain graft.tools.BpeTune /root/testdata/sf0.01 48"
  *
  * Reports, per B: wall seconds, merges learned, and the first step at
  * which the batched sequence diverges from B=1 (`-` = identical) —
  * the evidence BASELINE.md's batched-BPE table records. The residual
  * divergence mode is documented on [[CorpusOps.bpeMerges]]: a merge
  * can create a (neighbor, merged) pair that true greedy would take
  * before a later in-batch selection.
  */
object BpeTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val numMerges = if (args.length > 1) args(1).toInt else 48
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents").cache()
    docs.count()

    var refCounts: Seq[(Int, String, String, Long)] = Seq.empty
    def run(b: Int): (Double, Seq[(Int, String, String)], Double) = {
      val t0 = System.nanoTime()
      val rows = CorpusOps.bpeMerges(docs, numMerges, batchSize = b)
        .select("step", "lhs", "rhs", "pair_count", "avg_symbols_per_word")
        .collect()
      val m = rows.map(r => (r.getInt(0), r.getString(1), r.getString(2)))
        .toSeq.sortBy(_._1)
      if (b == 1) refCounts = rows.map(r => (r.getInt(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSeq.sortBy(_._1)
      val cov = if (rows.isEmpty) Double.NaN else rows.head.getDouble(4)
      ((System.nanoTime() - t0) / 1e9, m, cov)
    }

    val (secRef, ref, covRef) = run(1)
    println(f"bpe B=1  merges=${ref.size}%-4d sec=$secRef%.1f " +
      f"avg_sym_per_word=$covRef%.4f (exact greedy reference)")
    // the counts-formulation driver-side trainer: one distributed
    // wordcount, then zero further Spark jobs — must be row-identical
    // to B=1 at any merge depth
    locally {
      val t0 = System.nanoTime()
      val rows = CorpusOps.bpeMergesLocal(docs, numMerges)
        .select("step", "lhs", "rhs", "pair_count", "avg_symbols_per_word")
        .collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val m = rows.map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq.sortBy(_._1)
      val cov = if (rows.isEmpty) Double.NaN else rows.head.getDouble(4)
      val refC = refCounts
      val divC = refC.zip(m).indexWhere { case (a, g) => a != g }
      println(f"bpe LOCAL merges=${m.size}%-4d sec=$sec%.1f " +
        f"speedup=${secRef / sec}%.1fx identical_to_B1=${
          m == refC && m.size == refC.size} first_divergence=${
          if (divC < 0) "-" else (divC + 1).toString} " +
        f"avg_sym_per_word=$cov%.4f")
      // referee: replay the same merges through the sentinel-replace
      // encoder — realized tokens/word must equal the training coverage
      val enc = CorpusOps.bpeEncode(docs, m.map(t => (t._2, t._3)))
        .agg(org.apache.spark.sql.functions.sum("n_tokens").cast("double")
          / org.apache.spark.sql.functions.sum("n_words"))
        .head().getDouble(0)
      println(f"bpe ENC-REPLAY avg_sym_per_word=$enc%.4f")
    }
    for (b <- Seq(4, 8, 16)) {
      val (sec, got, cov) = run(b)
      val div = ref.zip(got).indexWhere { case (a, g) => a != g }
      val divStr =
        if (div < 0 && ref.size == got.size) "-"
        else (if (div < 0) math.min(ref.size, got.size) + 1 else div + 1).toString
      // sequence order is the strict metric; the SET of learned merges
      // and the realized compression are what a trained vocab buys
      val refSet = ref.map(t => (t._2, t._3)).toSet
      val gotSet = got.map(t => (t._2, t._3)).toSet
      val overlap = (refSet & gotSet).size.toDouble / refSet.size
      println(f"bpe B=$b%-3d merges=${got.size}%-4d sec=$sec%.1f " +
        f"speedup=${secRef / sec}%.1fx first_divergence=$divStr " +
        f"merge_set_overlap=$overlap%.3f avg_sym_per_word=$cov%.4f")
    }
    spark.stop()
  }
}
