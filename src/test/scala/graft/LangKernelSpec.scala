package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bit-parity of the compiled `graft_lang_scores` path
  * ([[TextAnalysis.langPredExpr]] — one byte scan + let1-bound argmax)
  * against the declarative construction the oracle replays
  * ([[TextAnalysis.langScoreCols]] + [[TextAnalysis.langBestCol]]).
  */
class LangKernelSpec extends SparkSpec {
  import spark.implicits._

  private def both(df: DataFrame): Unit = {
    val k = TextAnalysis.langId(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val h = df.select(col("doc_id") +: TextAnalysis.langScoreCols("text"): _*)
      .withColumn("lang_pred", TextAnalysis.langBestCol)
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("lang_pred"))).toMap
    assert(k === h, "kernel and declarative language id must agree")
  }

  test("handpicked: per-language winners, ties, distinct-marker counting, und") {
    both(Seq(
      (1L, "the cat of a house and to go"),     // en
      (2L, "der hund und die katze ist da"),    // de
      (3L, "el perro de la casa que y"),        // es/zh tie shapes ('de' is a marker of es AND zh)
      (4L, "le chat et la maison est la"),      // fr
      (5L, "de shi bu le wo"),                  // zh markers (shared 'de'/'le' with es/fr)
      (6L, "nothing matches here xyz"),         // und
      (7L, ""),                                 // empty
      (8L, "the the the the the"),              // one DISTINCT marker, repeated
      (9L, "la la le le"),                      // fr/es/zh overlap soup
      (10L, "de de de")                         // 'de' alone: es vs zh tie
    ).toDF("doc_id", "text"))
  }

  test("deterministic fuzz: 300 marker-soup texts") {
    val words = Seq("the", "a", "of", "and", "to", "der", "die", "das", "und", "ist",
      "el", "la", "de", "que", "y", "le", "les", "et", "est", "shi", "bu", "wo",
      "xyz", "", "zz")
    def gen(seed: Long, n: Int): String = {
      var x = seed
      (0 until n).map { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        words(((x >>> 33) % words.length).toInt)
      }.mkString(" ")
    }
    both((1 to 300).map(i => (i.toLong, gen(i.toLong, 12))).toDF("doc_id", "text"))
  }

  test("one kernel call per row in the plan (no per-reference re-evaluation)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = TextAnalysis.langId(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert("graft_lang_scores".r.findAllMatchIn(plan).length === 1,
      s"the let1 binding must keep exactly one scores scan:\n$plan")
  }
}
