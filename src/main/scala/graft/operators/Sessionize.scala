package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (SURVEY.md §2.9 ST2 batch analogue; the reference's
  * per-session chat state lives at `/root/reference/AI.py:155-161`).
  *
  * Gaps-and-islands: a new session starts when the gap to the previous
  * event for the same user is >= gapSeconds (matching Spark's
  * `session_window` semantics, where a session extends while the next
  * event arrives strictly within the gap). One shuffle on user_id.
  */
object Sessionize {

  def sessions(events: DataFrame, gapSeconds: Long = 1800L,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol))
    val flagged = events
      .withColumn("_prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("_new",
        when(col("_prev").isNull ||
          unix_micros(col(tsCol).cast("timestamp")) -
            unix_micros(col("_prev").cast("timestamp")) >= gapSeconds * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    flagged
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
  }
}
