package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics staples — the ordered-funnel and
  * cohort-retention reports every product-analytics stack computes over
  * an event log (public, textbook definitions; the reference's events
  * table is exactly this shape). Both are first-match / first-seen
  * semantics, fully SQL-expressible, and every exchange is keyed by
  * user — nothing global, linear in the event log.
  */
object Funnel {

  /** Ordered funnel with first-match semantics: step 1's time is the
    * user's EARLIEST `steps(0)` event; step i's time is the earliest
    * `steps(i-1)`-typed event STRICTLY AFTER step i-1's time (and, when
    * `within` is set, no later than step-1's time + that interval — the
    * conversion window anchored at funnel entry, the standard product
    * definition). Returns one row per step: (step, step_name, n_users)
    * with n_users = users who completed through that step — monotone
    * non-increasing by construction.
    *
    * Scale shape: one user-keyed min-aggregate per step, each join
    * carrying (user_id, timestamp) pairs only — |steps| bounded passes
    * over the (filtered) event log, no window over the whole log, no
    * per-user event collection.
    */
  def funnelCounts(events: DataFrame, steps: Seq[String],
      within: Option[String] = None,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnelCounts: need at least one step")
    require(steps.distinct.size == steps.size,
      s"funnelCounts: repeated step types not supported: $steps")
    val spark = events.sparkSession
    import spark.implicits._
    val s1 = events.filter(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(tsCol).as("t1"))
    val deadline: Column => Column = t1 =>
      within.map(d => t1 + expr(s"INTERVAL $d")).getOrElse(
        lit(null).cast("timestamp"))
    var cur = s1.withColumn("t_prev", col("t1"))
    val counts = scala.collection.mutable.ArrayBuffer(
      (1, steps.head, s1.count()))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val nxt = events.filter(col(typeCol) === step)
        .select(col(userCol), col(tsCol).as("t_step"))
        .join(cur.select(col(userCol), col("t1"), col("t_prev")),
          Seq(userCol))
        .filter(col("t_step") > col("t_prev") &&
          (if (within.isEmpty) lit(true)
           else col("t_step") <= deadline(col("t1"))))
        .groupBy(userCol)
        .agg(first("t1").as("t1"), min("t_step").as("t_prev"))
      cur = nxt.localCheckpoint(false)
      counts += ((i + 1, step, cur.count()))
    }
    counts.toSeq.toDF("step", "step_name", "n_users")
      .withColumn("step", col("step").cast("int"))
  }

  /** Weekly cohort retention: cohort = ISO week of each user's FIRST
    * event; retention cell (cohort_week, week_offset) counts the
    * cohort's distinct users active in that later week. Output:
    * (cohort_week DATE, week_offset INT, n_active, cohort_size) —
    * offset 0 equals the cohort size by definition.
    *
    * Scale shape: one user-keyed first-seen aggregate + one distinct
    * over (user, week) + one user-keyed join + one (cohort, offset)
    * aggregate — every exchange carries (user_id, date) pairs.
    */
  def retentionCohorts(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val first = events.groupBy(userCol)
      .agg(date_trunc("week", min(tsCol)).cast("date").as("cohort_week"))
    val sizes = first.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_size"))
    val active = events
      .select(col(userCol),
        date_trunc("week", col(tsCol)).cast("date").as("week"))
      .distinct()
    active.join(first, Seq(userCol))
      .withColumn("week_offset",
        (datediff(col("week"), col("cohort_week")) / 7).cast("int"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select("cohort_week", "week_offset", "n_active", "cohort_size")
  }
}
