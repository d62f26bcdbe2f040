package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Canary-string audit (round 18) — the memorization check of the
  * public extraction-attack literature (Carlini et al.'s canary
  * methodology, re-listed from the public definition): unique marker
  * strings are planted in controlled documents, and BEFORE training
  * the curation pipeline must answer "which canaries survive in the
  * corpus, and in how many documents?" — a canary appearing in more
  * documents than it was planted in means leakage through duplication
  * or scraping, and a canary in ZERO documents means the dedup/
  * decontamination stages ate the control. Exact SUBSTRING match by
  * definition (canaries are designed unique; the n-gram overlap
  * machinery in [[Decontaminate]] answers the different fuzzy-overlap
  * question).
  *
  * Plan shape: ONE corpus scan computes every canary's per-doc hit
  * flag as |canaries| conditional sums inside a single partial
  * aggregate (no per-canary scan, no explode of corpus rows — the
  * K-fold blowup stays on the one aggregated row), then the
  * metadata-sized result unpivots row-locally to (canary, n_docs)
  * grain. Canaries ride the plan as literals — the committed-constant
  * pattern; the scan is the whole cost at 100 TB.
  */
object Canary {

  private def esc(s: String): String = s.replace("\\", "\\\\").replace("'", "\\'")
  private def escDuck(s: String): String = s.replace("'", "''")

  /** One row per canary: documents containing it (exact substring). */
  def canaryScan(df: DataFrame, text: String,
                 canaries: Seq[String]): DataFrame = {
    require(canaries.nonEmpty, "canaryScan needs at least one canary")
    // coalesce: sum over an EMPTY corpus is NULL on both engines, and
    // the audit's contract is that an absent canary reports 0, not
    // NULL — the all-eaten corpus is exactly the disaster case the
    // scan exists to catch (round-18 self-review finding)
    val sums = canaries.zipWithIndex.map { case (c, i) =>
      coalesce(sum(when(col(text).contains(c), 1L).otherwise(0L)), lit(0L))
        .as(s"__c$i")
    }
    val unpivot = canaries.zipWithIndex.map { case (c, i) =>
      s"named_struct('canary', '${esc(c)}', 'n_docs', __c$i)"
    }.mkString("array(", ", ", ")")
    df.agg(sums.head, sums.tail: _*)
      .select(explode(expr(unpivot)).as("r"))
      .select(col("r.canary").as("canary"), col("r.n_docs").as("n_docs"))
  }

  /** DuckDB twin of [[canaryScan]]. */
  def canaryScanSql(table: String, text: String,
                    canaries: Seq[String]): String = {
    val branches = canaries.map { c =>
      s"""  SELECT '${escDuck(c)}' AS canary,
         |    coalesce(sum(CASE WHEN contains($text, '${escDuck(c)}') THEN 1 ELSE 0 END), 0)::BIGINT AS n_docs
         |  FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT canary, n_docs FROM (
       |$branches)""".stripMargin
  }
}
