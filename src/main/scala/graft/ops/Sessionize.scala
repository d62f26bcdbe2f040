package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: group each user's events into sessions that
  * break whenever consecutive events are more than `gap` apart — the
  * canonical keyed-state operator a bus consumer builds over per-entity
  * streams (the batch analog of the reference's per-key actor mailboxes,
  * typebus/.../BaseService.scala:61-77: one ordered lane per key).
  *
  * Two formulations with the SAME session semantics (a new session
  * starts when `ts - prev_ts > gap`, STRICTLY greater: Spark's
  * `session_window` [t, t+gap) windows merge on touching boundaries —
  * an event at exactly prev + gap extends the session — verified
  * empirically and pinned by SessionizeSpec):
  *
  *  - [[sessions]] (batch): gaps-and-islands over window functions.
  *    Both windows (the `lag` flag and the running session counter)
  *    share one partitioning and sort order, so the plan pays ONE
  *    exchange on the user key and ONE sort — the second Window reuses
  *    the first's output order. Scale: linear in events, keyed shuffle
  *    only; no per-user data needs to fit anywhere except its reducer's
  *    stream (window functions iterate, they don't buffer the frame for
  *    these aggregates).
  *  - [[sessionsStreaming]]: the built-in `session_window` aggregation —
  *    runs identically on batch and streaming frames; on a stream it
  *    keeps one merging window-state per (user, open session) and emits
  *    on watermark close. SessionizeSpec pins batch/streaming parity on
  *    boundary data (diff == gap ⇒ SAME session in both forms).
  *
  * Output grain: one row per (user, session) with event count, start/end
  * epoch millis, and an exact DECIMAL-summed value total (engine-portable
  * double aggregation).
  */
object Sessionize {

  /** Batch gaps-and-islands sessionization. `tieCol` makes the per-user
    * order total (equal timestamps would otherwise make the running
    * session number nondeterministic across engines).
    */
  def sessions(df: DataFrame, userCol: String, tsCol: String, tieCol: String,
               valueCol: String, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapMinutes * 60L * 1000000L
    df.withColumn("__prev_us", lag(unix_micros(col(tsCol)), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev_us").isNull ||
          unix_micros(col(tsCol)) - col("__prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_no", sum(col("__new_session")).over(running))
      .groupBy(col(userCol), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
        unix_millis(min(col(tsCol))).as("start_ms"),
        unix_millis(max(col(tsCol))).as("end_ms"),
        expr(s"cast(sum(cast($valueCol AS DECIMAL(18,2))) AS DOUBLE)").as("sum_value"))
  }

  /** DuckDB twin of [[sessions]] — identical flag/counter/aggregate
    * arithmetic (microsecond gap compare, DECIMAL-exact value sum).
    */
  def sessionsSql(table: String, userCol: String, tsCol: String, tieCol: String,
                  valueCol: String, gapMinutes: Int = 30): String = {
    val gapUs = gapMinutes * 60L * 1000000L
    s"""WITH flagged AS (
       |  SELECT $userCol, $tsCol, $tieCol, $valueCol,
       |    CASE WHEN lag($tsCol) OVER w IS NULL
       |         OR epoch_us($tsCol) - epoch_us(lag($tsCol) OVER w) > $gapUs
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM $table
       |  WINDOW w AS (PARTITION BY $userCol ORDER BY $tsCol, $tieCol)),
       |numbered AS (
       |  SELECT $userCol, $tsCol, $valueCol,
       |    sum(new_session) OVER (PARTITION BY $userCol ORDER BY $tsCol, $tieCol
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
       |  FROM flagged)
       |SELECT $userCol, CAST(session_no AS BIGINT) AS session_no, count(*) AS n_events,
       |  epoch_ms(min($tsCol)) AS start_ms, epoch_ms(max($tsCol)) AS end_ms,
       |  CAST(sum(CAST($valueCol AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM numbered GROUP BY $userCol, session_no""".stripMargin
  }

  /** `session_window` formulation — the one operator that runs unchanged
    * on a batch frame and a watermarked stream. Emits the same grain as
    * [[sessions]] minus the per-user ordinal (streams can't number
    * sessions globally without a second stateful pass); keyed on
    * (user, session start) instead.
    */
  def sessionsStreaming(df: DataFrame, userCol: String, tsCol: String,
                        valueCol: String, gap: String = "30 minutes"): DataFrame =
    df.groupBy(col(userCol), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        unix_millis(min(col(tsCol))).as("start_ms"),
        unix_millis(max(col(tsCol))).as("end_ms"),
        expr(s"cast(sum(cast($valueCol AS DECIMAL(18,2))) AS DOUBLE)").as("sum_value"))
      .select(col(userCol), col("start_ms"), col("end_ms"),
        col("n_events"), col("sum_value"))
}
