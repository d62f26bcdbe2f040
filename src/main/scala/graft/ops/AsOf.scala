package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: attach to each left row the LATEST right row with
  * `right.ts <= left.ts` for the same key (the point-in-time /
  * SCD-lookup operator: "state as of the event's moment"). Spark has no
  * native ASOF; the naive range join `l.key = r.key AND r.ts <= l.ts`
  * explodes to every (event, earlier-state) pair before a per-event
  * argmax prunes it — quadratic per key in the worst case.
  *
  * This is the MERGE formulation instead: tag and UNION both sides,
  * shuffle once on the key, sort once on (ts, right-first), and carry
  * right values forward with `last(..., ignoreNulls)` over the running
  * window — each left row reads the most recent right values at its
  * position in the merged timeline. Cost: ONE keyed exchange + ONE sort
  * over |L| + |R| rows, zero join blowup; this is the shape that
  * survives 100 TB (it is also how column-store ASOF implementations
  * merge sorted runs).
  *
  * Determinism: right rows are pre-reduced to one per (key, ts) by
  * `max_by(value, tie)` — equal-timestamp right duplicates would
  * otherwise make the match engine-dependent (DuckDB's native ASOF JOIN,
  * the oracle, picks an arbitrary one). At equal left/right timestamps
  * the right row sorts FIRST (`__is_r DESC`), so `ts_r <= ts_l` matches
  * inclusively, exactly DuckDB's `ON l.ts >= r.ts` semantics. Left rows
  * carry nulls in the right-value slots, so tied left rows cannot
  * perturb each other's fill.
  */
object AsOf {

  /** `rightVals` maps right column → output column name; each output is
    * the matched right row's value, NULL when no right row precedes.
    * The matched right timestamp itself is exposed as `matchedTsCol`.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightTie: String, rightVals: Seq[(String, String)],
               matchedTsCol: String = "asof_ts"): DataFrame = {
    val aggs = rightVals.map { case (c, o) =>
      expr(s"max_by($c, $rightTie)").as(o) }
    val r0 = right.groupBy(col(key), col(ts)).agg(aggs.head, aggs.tail: _*)
    val outCols = rightVals.map(_._2) :+ matchedTsCol
    val outTypes = r0.schema.filter(f => rightVals.exists(_._2 == f.name))
      .map(f => f.name -> f.dataType).toMap

    val lTagged = left.select(
      left.columns.map(col).toSeq ++ Seq(lit(0).as("__is_r")) ++
        rightVals.map { case (_, o) => lit(null).cast(outTypes(o)).as(o) } ++
        Seq(lit(null).cast(left.schema(ts).dataType).as(matchedTsCol)): _*)
    val rTagged = r0.select(
      Seq(col(key)) ++
        left.columns.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(ts), lit(1).as("__is_r")) ++
        rightVals.map { case (_, o) => col(o) } ++
        Seq(col(ts).as(matchedTsCol)): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__is_r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = outCols.foldLeft(rTagged.unionByName(lTagged)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.where(col("__is_r") === 0).drop("__is_r")
  }
}
