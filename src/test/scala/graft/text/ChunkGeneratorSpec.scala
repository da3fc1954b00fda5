package graft.text

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** §2.10: the SQL Generator surface must agree with the pure chunker. */
class ChunkGeneratorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunk_text SQL generator matches Chunker.split") {
    ChunkTextGenerator.register(spark)
    val text = (1 to 80).map(i => s"word$i").mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text").createOrReplaceTempView("gen_docs")
    val got = spark.sql(
      """SELECT c.chunk_index, c.chunk FROM gen_docs
        |LATERAL VIEW chunk_text(text, 100) c AS chunk_index, chunk
        |""".stripMargin)
      .as[(Int, String)].collect().sortBy(_._1).map(_._2).toSeq
    assert(got === Chunker.split(text, 100))
  }

  test("generator yields no rows for null text") {
    ChunkTextGenerator.register(spark)
    Seq((1L, Option.empty[String]), (2L, Some("ab cd")))
      .toDF("doc_id", "text").createOrReplaceTempView("gen_docs2")
    val got = spark.sql(
      """SELECT doc_id FROM gen_docs2
        |LATERAL VIEW chunk_text(text, 10) c AS chunk_index, chunk
        |""".stripMargin).as[Long].collect().toSeq
    assert(got === Seq(2L))
  }
}
