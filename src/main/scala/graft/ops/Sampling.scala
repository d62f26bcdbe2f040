package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import PortableHash._

/** Deterministic corpus mixing: per-stratum (domain/source) sampling at
  * configured rates — the data-mixing step of a pretraining pipeline
  * (upweight curated sources, downsample crawl).
  *
  * Membership is decided by the PORTABLE hash of the row id — not
  * `rand()` — so the sample is (a) reproducible across runs and engines
  * (the DuckDB twin computes the identical predicate), (b) stable under
  * repartitioning, and (c) a pure pushdown-friendly filter: one scan,
  * zero shuffle, trivially parallel at 100 TB. Rates are in basis
  * points of the hash space (`H(id) % 10000 < rate * 10000`), so a doc
  * keeps or drops identically whether sampled alone or with its table.
  */
object Sampling {

  /** Keep rows where H(id) mod 10000 falls under the stratum's rate.
    * `rates` maps stratum value → keep fraction; `default` applies to
    * unlisted strata.
    */
  def stratifiedSample(df: DataFrame, id: String, strata: String,
                       rates: Map[String, Double],
                       default: Double): DataFrame = {
    val h = s"(${sparkStringHash(s"cast($id AS STRING)")} % 10000)"
    val cases = rates.toSeq.sortBy(_._1).map { case (s, r) =>
      s"WHEN '$s' THEN $h < ${math.round(r * 10000)}"
    }.mkString(" ")
    df.where(expr(
      s"CASE $strata $cases ELSE $h < ${math.round(default * 10000)} END"))
  }

  def stratifiedSampleSql(table: String, id: String, strata: String,
                          rates: Map[String, Double],
                          default: Double): String = {
    val h = s"(${duckStringHash(s"($id)::VARCHAR")} % 10000)"
    val cases = rates.toSeq.sortBy(_._1).map { case (s, r) =>
      s"WHEN '$s' THEN $h < ${math.round(r * 10000)}"
    }.mkString(" ")
    s"""SELECT * FROM $table
       |WHERE CASE $strata $cases ELSE $h < ${math.round(default * 10000)} END""".stripMargin
  }
}
