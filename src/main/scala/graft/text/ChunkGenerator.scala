package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL exposure of the C1 chunker as a Catalyst `Generator` (UDTF shape,
  * SURVEY.md §2.10): one document row → N chunk rows, usable from
  * `spark.sql` / `selectExpr` as `chunk_text(text, size)` the way
  * `explode` is. The typed-Dataset pipeline uses `flatMap` directly
  * (RagPipeline.chunkDocuments); this Generator exists so the SQL surface
  * has the same operator.
  */
case class ChunkTextGenerator(child: Expression, chunkSize: Int)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child)

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_index", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      Chunker.split(v.asInstanceOf[UTF8String].toString, chunkSize)
        .zipWithIndex.map { case (text, i) =>
          InternalRow(i, UTF8String.fromString(text))
        }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object ChunkTextGenerator {
  /** Registers `chunk_text(text, size)` in the session's function
    * registry for SQL use.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "chunk_text",
      exprs => {
        require(exprs.size == 2, "chunk_text(text, chunkSize)")
        val size = exprs(1).eval(null).asInstanceOf[Int]
        ChunkTextGenerator(exprs.head, size)
      },
      "scala_udf")
}
