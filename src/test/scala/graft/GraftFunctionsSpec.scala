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
