package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Ordered-behavior analytics over an event stream: funnel progression
  * and cohort retention — the two classic per-entity sequence queries a
  * bus consumer derives from its event log (the reference's per-key
  * ordered lanes, typebus/.../BaseService.scala:61-77, are exactly the
  * per-user ordered substreams these operators fold over).
  *
  * Portability rules (shared with [[Sessionize]]): all time arithmetic is
  * integer epoch-microseconds (`unix_micros` / `epoch_us`), emitted as
  * epoch millis via integer division — no engine-specific timestamp
  * formatting or week-truncation semantics anywhere.
  */
object Events {

  private def lit1(s: String): String = s"'${s.replace("'", "''")}'"

  /** Funnel progression: for each user, the first time they completed
    * step i STRICTLY AFTER their first completion of step i-1 (the
    * "signup → view → click → purchase" shape). Emits one row per user
    * with each reached step's first-completion epoch millis (NULL once
    * the funnel is abandoned) and the number of steps completed.
    *
    * Plan shape: the step timestamps are a CHAIN of whole-partition
    * window minimums over the same user partitioning — ONE hash exchange
    * on the user key and ONE key-only sort (WindowExec's clustering
    * requirement; no timestamp ordering), shared by all k window passes.
    * The final per-user grain is a partial-aggregated groupBy on the
    * SAME key, which reuses the window's partitioning (no second
    * exchange; pinned by EventsEvalSpec's plan audit). Linear in events;
    * per-user buffering only (the window frame is the user's events).
    *
    * At 100 TB: k passes over co-located partitions beats the k
    * self-join formulation (k keyed shuffles) and the collect-sorted-
    * array fold (whose per-user array is the same buffer this window
    * already holds, minus the codegen'd aggregate path).
    */
  def funnel(df: DataFrame, userCol: String, tsCol: String, typeCol: String,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(userCol))
    var cur = df.select(col(userCol), col(typeCol),
      unix_micros(col(tsCol)).as("__us"))
    steps.indices.foreach { i =>
      val hit = col(typeCol) === lit(steps(i))
      val cond = if (i == 0) hit else hit && col("__us") > col(s"__s$i")
      cur = cur.withColumn(s"__s${i + 1}", min(when(cond, col("__us"))).over(w))
    }
    val stepCols = steps.indices.map(i =>
      expr(s"min(__s${i + 1}) div 1000").as(s"step${i + 1}_ms"))
    val completed = steps.indices
      .map(i => when(col(s"step${i + 1}_ms").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    cur.groupBy(col(userCol))
      .agg(stepCols.head, stepCols.tail: _*)
      .withColumn("steps_completed", completed.cast("long"))
  }

  /** DuckDB twin of [[funnel]] — the same chained window minimums
    * (one CTE per step, since step i's filter references step i-1's
    * window column) and the same µs-integer arithmetic.
    */
  def funnelSql(table: String, userCol: String, tsCol: String,
                typeCol: String, steps: Seq[String]): String = {
    val ctes = new StringBuilder(
      s"f0 AS (SELECT $userCol, $typeCol, epoch_us($tsCol) AS us FROM $table)")
    steps.indices.foreach { i =>
      val cond =
        if (i == 0) s"$typeCol = ${lit1(steps(i))}"
        else s"$typeCol = ${lit1(steps(i))} AND us > s$i"
      ctes.append(
        s""",
           |f${i + 1} AS (
           |  SELECT *, min(CASE WHEN $cond THEN us END)
           |    OVER (PARTITION BY $userCol) AS s${i + 1}
           |  FROM f$i)""".stripMargin)
    }
    val stepSel = steps.indices
      .map(i => s"min(s${i + 1}) // 1000 AS step${i + 1}_ms").mkString(", ")
    val completed = steps.indices
      .map(i => s"CASE WHEN min(s${i + 1}) IS NOT NULL THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $ctes
       |SELECT $userCol, $stepSel,
       |  CAST($completed AS BIGINT) AS steps_completed
       |FROM f${steps.size} GROUP BY $userCol""".stripMargin
  }

  /** Streaming twin of [[funnel]]: per-user funnel state maintained with
    * `mapGroupsWithState` — the real-time conversion tracker. Each
    * micro-batch advances the user's step chain with the SAME
    * strictly-after rule as the batch op (events replayed in event-time
    * order within the batch) and emits the user's refreshed funnel row
    * (`OutputMode.Update` sink semantics, like any streaming
    * aggregation). State per user = one `Array[Long]` of k first-times
    * (-1 = unreached) — bounded by users, not events.
    *
    * Ordering caveat (inherent to forward-only state): events arriving
    * across batches out of event-time order cannot retro-advance a step
    * whose predecessor completed in a later batch than the event's own
    * time — parity with the batch op holds when per-user arrival order
    * respects event time (the Kafka-keyed-partition delivery shape,
    * reference typebus/.../BaseService.scala:61-77). EventsEvalSpec
    * pins two-batch parity.
    *
    * Input columns: (user BIGINT, us BIGINT event-time micros, type
    * STRING). Output: (user, steps_completed, step_us array).
    */
  def funnelStreaming(events: Dataset[(Long, Long, String)],
                      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIx = steps.zipWithIndex.toMap
    val k = steps.size
    events.groupByKey(_._1)
      .mapGroupsWithState[Array[Long], (Long, Int, Seq[Long])](
        GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[(Long, Long, String)], state: GroupState[Array[Long]]) =>
          val st = state.getOption.getOrElse(Array.fill(k)(-1L))
          evs.toSeq.sortBy(e => (e._2, e._3)).foreach { case (_, us, typ) =>
            stepIx.get(typ).foreach { i =>
              if (st(i) == -1L &&
                (i == 0 || (st(i - 1) != -1L && us > st(i - 1))))
                st(i) = us
            }
          }
          state.update(st)
          (user, st.count(_ != -1L), st.toSeq)
      }
      .toDF("user_id", "steps_completed", "step_us")
  }

  /** Cohort retention: users grouped by the epoch-week of their first
    * event; one row per (cohort_week, week_offset) counting the cohort's
    * users active that many weeks later. Weeks are `floor(epoch_day / 7)`
    * — pure integer arithmetic, identical in both engines (no engine
    * week-truncation rules, which disagree on week start).
    *
    * Plan shape: distinct (user, week) — one partial-aggregated keyed
    * shuffle that drops the event mass to ≤ users × weeks rows; the
    * cohort min and the join back both reuse that user-keyed
    * partitioning (no extra exchange on the big side); the final count
    * is a partial agg on (cohort, offset). Because (user, week) is
    * distinct before the join, `count(*)` IS the distinct-user count —
    * no count-distinct state anywhere.
    */
  def retention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val usPerWeek = 86400L * 1000000L * 7L
    val weeks = df.select(col(userCol),
      expr(s"unix_micros($tsCol) div $usPerWeek").as("week")).distinct()
    val cohort = weeks.groupBy(col(userCol)).agg(min(col("week")).as("cohort_week"))
    weeks.join(cohort, Seq(userCol))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** DuckDB twin of [[retention]] — same integer week and distinct
    * pre-aggregation.
    */
  def retentionSql(table: String, userCol: String, tsCol: String): String = {
    val usPerWeek = 86400L * 1000000L * 7L
    s"""WITH weeks AS (
       |  SELECT DISTINCT $userCol, epoch_us($tsCol) // $usPerWeek AS week
       |  FROM $table),
       |cohort AS (SELECT $userCol, min(week) AS cohort_week
       |           FROM weeks GROUP BY $userCol)
       |SELECT cohort_week, week - cohort_week AS week_offset,
       |       count(*) AS n_users
       |FROM weeks JOIN cohort USING ($userCol)
       |GROUP BY cohort_week, week_offset""".stripMargin
  }
}
