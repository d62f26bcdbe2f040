package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import PortableHash._

/** Text analysis for training-data pipelines: language ID (marker-word
  * heuristic), quality scoring, token counting, and rolling-hash document
  * fingerprints. All linear scans — zero shuffle — built from codegen'd
  * string/array functions, each with a DuckDB-dialect oracle twin.
  */
object TextAnalysis {

  /** Marker stopwords per language for the n-gram/stopword heuristic.
    * Deterministic scoring: count marker hits per language, argmax with a
    * fixed language-order tie-break.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de", "shi", "bu", "le", "wo")
  )

  private def markerList(ws: Seq[String], dialect: String): String =
    ws.map(w => s"'$w'").mkString(if (dialect == "spark") "array(" else "[", ", ",
      if (dialect == "spark") ")" else "]")

  /** Language ID: argmax of marker-word hit counts; ties and zero scores
    * fall back to 'und' (undetermined).
    */
  def langId(df: DataFrame, id: String, text: String): DataFrame = {
    val scores = langMarkers.map { case (lang, ws) =>
      expr(s"size(array_intersect(array_distinct(split($text, ' ')), ${markerList(ws, "spark")}))")
        .as(s"s_$lang")
    }
    val best = langMarkers.map(_._1).foldRight(lit("und")) { (lang, acc) =>
      when(col(s"s_$lang") > lit(0) &&
        langMarkers.map(_._1).filter(_ < lang).map(l => col(s"s_$lang") > col(s"s_$l"))
          .foldLeft(lit(true))(_ && _) &&
        langMarkers.map(_._1).filter(_ > lang).map(l => col(s"s_$lang") >= col(s"s_$l"))
          .foldLeft(lit(true))(_ && _), lit(lang)).otherwise(acc)
    }
    df.select(col(id) +: scores: _*).withColumn("lang_pred", best)
      .select(col(id), col("lang_pred"))
  }

  def langIdSql(table: String, id: String, text: String): String = {
    val scoreDefs = langMarkers.map { case (lang, ws) =>
      s"len(list_intersect(list_distinct(string_split($text, ' ')), ${markerList(ws, "duck")})) AS s_$lang"
    }.mkString(", ")
    val langs = langMarkers.map(_._1)
    val best = langs.foldRight("'und'") { (lang, acc) =>
      val wins = (langs.filter(_ < lang).map(l => s"s_$lang > s_$l") ++
        langs.filter(_ > lang).map(l => s"s_$lang >= s_$l") :+ s"s_$lang > 0")
        .mkString(" AND ")
      s"CASE WHEN $wins THEN '$lang' ELSE $acc END"
    }
    s"SELECT $id, $best AS lang_pred FROM (SELECT $id, $scoreDefs FROM $table)"
  }

  /** Quality score: word count, mean word length, stopword ratio,
    * alphabetic-character ratio — the length/punct/stopword heuristics of
    * a pretraining quality filter, rounded for cross-engine stability.
    */
  def qualityScore(df: DataFrame, id: String, text: String): DataFrame = {
    val stop = markerList(langMarkers.flatMap(_._2).distinct.sorted, "spark")
    df.select(
      col(id),
      expr(s"size(split($text, ' '))").as("n_words"),
      round(expr(s"length(replace($text, ' ', ''))") /
        expr(s"size(split($text, ' '))"), 6).as("mean_word_len"),
      round(expr(s"size(filter(split($text, ' '), w -> array_contains($stop, w)))") /
        expr(s"cast(size(split($text, ' ')) AS DOUBLE)"), 6).as("stopword_ratio"),
      // empty text: ANSI Spark raises DIVIDE_BY_ZERO where DuckDB yields
      // NULL — emit NULL explicitly on both engines
      round(expr(s"IF(length($text) = 0, cast(NULL AS DOUBLE), " +
        s"length(regexp_replace($text, '[^a-zA-Z]', '')) / cast(length($text) AS DOUBLE))"), 6)
        .as("alpha_ratio"))
  }

  def qualityScoreSql(table: String, id: String, text: String): String = {
    val stop = markerList(langMarkers.flatMap(_._2).distinct.sorted, "duck")
    s"""SELECT $id,
       |  len(string_split($text, ' ')) AS n_words,
       |  round(length(replace($text, ' ', '')) * 1.0 / len(string_split($text, ' ')), 6) AS mean_word_len,
       |  round(len(list_filter(string_split($text, ' '), w -> list_contains($stop, w)))
       |        / (len(string_split($text, ' '))::DOUBLE), 6) AS stopword_ratio,
       |  round(CASE WHEN length($text) = 0 THEN NULL
       |        ELSE length(regexp_replace($text, '[^a-zA-Z]', '', 'g')) / (length($text)::DOUBLE) END, 6) AS alpha_ratio
       |FROM $table""".stripMargin
  }

  /** Token count under a BPE-ish regex (letter runs, digit runs, other
    * non-space symbols), plus a 4-char-chunk subword count — the standard
    * "tokens ≈ chars/4" estimator.
    */
  def tokenCount(df: DataFrame, id: String, text: String): DataFrame =
    df.select(
      col(id),
      expr(s"size(regexp_extract_all($text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0))").as("n_tokens"),
      expr(s"cast(ceil(length(replace($text, ' ', '')) / 4.0) AS BIGINT)").as("n_subwords_est"))

  def tokenCountSql(table: String, id: String, text: String): String =
    s"""SELECT $id,
       |  len(regexp_extract_all($text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_tokens,
       |  ceil(length(replace($text, ' ', '')) / 4.0)::BIGINT AS n_subwords_est
       |FROM $table""".stripMargin

  /** Document fingerprint: order-sensitive rolling hash over word hashes
    * (content-defined identity robust to id churn).
    */
  def fingerprint(df: DataFrame, id: String, text: String): DataFrame = {
    val wordHashes = sparkHashArrayOf(s"split($text, ' ')")
    df.select(col(id), expr(sparkFoldHashes(wordHashes)).as("fingerprint"))
  }

  def fingerprintSql(table: String, id: String, text: String): String = {
    val wordHashes = duckHashArrayOf(s"string_split($text, ' ')")
    s"SELECT $id, ${duckFoldHashes(wordHashes)} AS fingerprint FROM $table"
  }
}
