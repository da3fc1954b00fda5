package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL surface of the native functions via GraftFunctions.registerAll
  * (the live-session twin of the GraftExtensions injection points).
  */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("registered SQL functions evaluate: cosine_f, dot_f, norm_f") {
    GraftFunctions.registerAll(spark)
    Seq((Array(1.0f, 0.0f), Array(1.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val row = spark.sql(
      "SELECT cosine_f(a, b) AS c, dot_f(a, b) AS d, norm_f(b) AS n FROM vecs")
      .as[(Double, Double, Double)].head()
    assert(math.abs(row._1 - 1.0 / math.sqrt(2)) < 1e-12)
    assert(row._2 === 1.0)
    assert(math.abs(row._3 - math.sqrt(2)) < 1e-12)
  }

  test("registered SQL functions evaluate: shingles_k, simhash64, rolling_min_hash, chunk_text") {
    GraftFunctions.registerAll(spark)
    Seq("the quick brown fox jumps").toDF("text")
      .createOrReplaceTempView("texts")
    val sh = spark.sql(
      "SELECT shingles_k(split(text, ' '), 3) AS s FROM texts")
      .as[Seq[String]].head()
    assert(sh === Seq("the quick brown", "quick brown fox", "brown fox jumps"))
    val (h1, r1) = spark.sql(
      """SELECT simhash64(split(text, ' ')) AS h,
        |rolling_min_hash(split(text, ' '), 2) AS r FROM texts""".stripMargin)
      .as[(Long, Long)].head()
    assert(h1 != 0L && r1 != 0L)
    val chunks = spark.sql(
      """SELECT c.chunk FROM texts
        |LATERAL VIEW chunk_text(text, 12) c AS chunk_index, chunk""".stripMargin)
      .as[String].collect().toSeq
    assert(chunks === graft.text.Chunker.split("the quick brown fox jumps", 12))
  }

  test("shingles strict mode: short input yields empty, not the " +
      "whole-text fallback; at-length input identical to default mode") {
    import org.apache.spark.sql.functions.{col, split}
    import graft.functions.expressions.HashExpressions
    val df = Seq("a b", "a b c d").toDF("text")
      .select(col("text"),
        HashExpressions.shingles_k(split(col("text"), " "), 3).as("dflt"),
        HashExpressions.shingles_k_strict(split(col("text"), " "), 3)
          .as("strict"))
      .as[(String, Seq[String], Seq[String])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(df("a b")._1 === Seq("a b")) // default: whole-text fallback
    assert(df("a b")._2 === Seq.empty) // strict: empty
    assert(df("a b c d")._1 === df("a b c d")._2) // n >= k: identical
    assert(df("a b c d")._2 === Seq("a b c", "b c d"))
  }

  test("repetition stats expression: struct fields, duplicate counting, " +
      "and the degenerate single-token row") {
    import org.apache.spark.sql.functions.{col, split}
    import graft.functions.expressions.TextExpressions
    val out = Seq("x y x y x", "solo").toDF("text")
      .select(col("text"),
        TextExpressions.repetition_stats(split(col("text"), " ")).as("s"))
      .selectExpr("text", "s.n_tok", "s.top_count", "s.n_bi",
        "s.n_bi_distinct")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // "x y x y x": 5 tokens, 'x'×3; bigrams: xy yx xy yx → 2 distinct of 4
    assert(out("x y x y x") === ((5L, 3L, 4L, 2L)))
    assert(out("solo") === ((1L, 1L, 0L, 0L)))
  }

  test("native embed expression equals the UDF twin") {
    import org.apache.spark.sql.functions.col
    val df = Seq("spark join shuffle", "", "one").toDF("text")
    val both = df
      .withColumn("e_native", graft.rag.Embedder.embedCol(col("text")))
      .withColumn("e_udf", graft.rag.Embedder.embedColUdf(col("text")))
      .as[(String, Array[Float], Array[Float])].collect()
    both.foreach { case (_, a, b) => assert(a.toSeq === b.toSeq) }
  }
}
