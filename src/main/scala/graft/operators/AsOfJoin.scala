package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY.md §2.4 J6): each left row matches the single right
  * row with the greatest right-time <= left-time for the same key.
  *
  * Implementation is the SCALABLE union+window formulation, not a
  * nested-loop range join: tag both sides, union, sort within key by
  * (time, side), and carry the latest right-side row forward as ONE struct
  * with `last(..., ignoreNulls=true)`. Cost = ONE shuffle on the key + a
  * sort — survives 100 TB where a per-pair range join would be O(n·m).
  * Carrying a single struct (not per-column lasts) guarantees all right
  * values come from the SAME matched row.
  *
  * Ties: a right row at exactly left-time IS visible (<=); among right rows
  * sharing a timestamp the greatest `rightTiebreak` wins (deterministic).
  */
object AsOfJoin {

  def asOf(
      leftDf: DataFrame,
      rightDf: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String],
      rightTiebreak: String): DataFrame = {
    val leftCols = leftDf.columns.toSeq
    val rStruct = struct(rightVals.map(col): _*)
    val rSide = rightDf.select(
      col(rightKey).as("_k"), col(rightTime).as("_t"),
      lit(0).as("_side"), col(rightTiebreak).as("_tb"),
      rStruct.as("_r"))
    val nullR = lit(null).cast(rSide.schema("_r").dataType)
    val nullTb = lit(null).cast(rSide.schema("_tb").dataType)
    val lSide = leftDf.select(
      (col(leftKey).as("_k") +: col(leftTime).as("_t") +:
        lit(1).as("_side") +: nullTb.as("_tb") +: nullR.as("_r") +:
        leftCols.map(c => col(c): Column)): _*)
    val rPadded = leftCols.foldLeft(rSide)((d, c) =>
      d.withColumn(c, lit(null).cast(leftDf.schema(c).dataType)))
    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc, col("_side").asc, col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    lSide.unionByName(rPadded)
      .withColumn("_c", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(v => col("_c").getField(v).as(v)): _*)
  }
}
