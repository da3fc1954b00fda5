package graft.functions

import graft.TestSpark
import graft.rag.Embedder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** P6 vector kernels + the deterministic embedder. Column kernels are
  * checked against the pure-Scala twins on random vectors.
  */
class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def randVecs(n: Int, dim: Int, seed: Long): Seq[Array[Float]] = {
    val rnd = new Random(seed)
    Seq.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
  }

  test("column cosine matches scala reference on random vectors") {
    import spark.implicits._
    val pairs = randVecs(50, 16, 1L).zip(randVecs(50, 16, 2L))
    val df = pairs.toDF("a", "b")
      .withColumn("cos", VectorOps.cosine(col("a"), col("b")))
    val rows = df.select("cos").as[Double].collect()
    pairs.zip(rows).foreach { case ((a, b), got) =>
      assert(math.abs(got - VectorOps.cosineScala(a, b)) < 1e-12)
    }
  }

  test("cosine is symmetric, bounded, and 1 on self") {
    val vs = randVecs(20, 8, 3L)
    for (a <- vs; b <- vs) {
      val ab = VectorOps.cosineScala(a, b)
      assert(math.abs(ab - VectorOps.cosineScala(b, a)) < 1e-12)
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
    }
    vs.foreach(v => assert(math.abs(VectorOps.cosineScala(v, v) - 1.0) < 1e-9))
  }

  test("zero vector yields cosine 0, not NaN") {
    val z = Array.fill(8)(0.0f)
    val v = Array.fill(8)(1.0f)
    assert(VectorOps.cosineScala(z, v) === 0.0)
    import spark.implicits._
    val df = Seq((z, v)).toDF("a", "b")
      .withColumn("cos", VectorOps.cosine(col("a"), col("b")))
    assert(df.select("cos").as[Double].head() === 0.0)
  }

  test("normalize produces unit vectors (column form)") {
    import spark.implicits._
    val df = randVecs(20, 16, 4L).toDF("a")
      .withColumn("n", VectorOps.normSq(VectorOps.normalize(col("a"))))
    df.select("n").as[Double].collect()
      .foreach(n => assert(math.abs(n - 1.0) < 1e-9))
  }

  test("native codegen kernels equal the composed-builtin twins bit-for-bit") {
    import spark.implicits._
    val pairs = randVecs(100, 64, 7L).zip(randVecs(100, 64, 8L))
    val df = pairs.toDF("a", "b")
      .withColumn("cos_native", VectorOps.cosine(col("a"), col("b")))
      .withColumn("cos_hof", VectorOps.cosineHof(col("a"), col("b")))
      .withColumn("dot_native", VectorOps.dot(col("a"), col("b")))
      .withColumn("dot_hof", VectorOps.dotHof(col("a"), col("b")))
    df.select("cos_native", "cos_hof", "dot_native", "dot_hof")
      .as[(Double, Double, Double, Double)].collect().foreach {
        case (cn, ch, dn, dh) =>
          assert(cn === ch); assert(dn === dh)
      }
  }

  test("embedder is deterministic, unit-norm, 64-dim") {
    val e1 = Embedder.embed("spark join shuffle partition")
    val e2 = Embedder.embed("spark join shuffle partition")
    assert(e1.toSeq === e2.toSeq)
    assert(e1.length === 64)
    assert(math.abs(VectorOps.normScala(e1) - 1.0) < 1e-5)
    // distinct texts map to distinct vectors (not a constant embedder)
    val e3 = Embedder.embed("completely different words here")
    assert(e1.toSeq !== e3.toSeq)
    // empty text → zero vector
    assert(Embedder.embed("").forall(_ === 0.0f))
  }

  test("embedder column form equals scala form") {
    import spark.implicits._
    val texts = Seq("a b c", "hash join merge", "", "  spaced   out  ")
    val df = texts.toDF("text")
      .withColumn("emb", Embedder.embedCol(col("text")))
    val got = df.select("emb").as[Array[Float]].collect()
    texts.zip(got).foreach { case (t, v) =>
      assert(v.toSeq === Embedder.embed(t).toSeq)
    }
  }
}
