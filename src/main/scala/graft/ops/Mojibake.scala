package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MOJIBAKE repair — the encoding-artifact pass (ftfy's core case) a
  * web corpus runs between HTML extraction and any text op: UTF-8
  * bytes decoded once as cp1252 leave characteristic two/three-char
  * sequences ("Ã©" for é, "â€™" for ’) that poison tokenization,
  * language ID, and dedup keys (the same paragraph clean and mangled
  * hashes apart).
  *
  * The committed data is the REPAIRED-character list; each artifact is
  * DERIVED at init by running the actual corruption (UTF-8 encode →
  * cp1252 decode via the JDK charset — the exact read a mis-decoding
  * pipeline performs), so the table can't drift from the mechanism it
  * repairs. Characters whose UTF-8 bytes hit cp1252's five unmapped
  * positions (0x81/8D/8F/90/9D — e.g. the right double quote ”) are
  * excluded: their corrupted form is toolchain-dependent, so a fixed
  * replace pair would be guessing. Single-pass by design (ftfy iterates
  * for N-times-nested mojibake; one decode error is the overwhelming
  * crawl case) — documented, not detected.
  *
  * Scale shape: a zero-shuffle constant replace chain (one compiled
  * projection; artifact-free rows cost one short-circuiting scan per
  * absent pattern). Both dialects run the byte-identical chain.
  */
object Mojibake {

  /** Characters the pass restores: curly punctuation, dashes/ellipsis/
    * bullet, the Latin-1 accented letters a crawl actually carries,
    * guillemets/degree/middot/inverted marks, and NBSP.
    */
  val repaired: Seq[String] = Seq(
    "’", "‘", "“",           // ’ ‘ “  (” is unmapped-0x9D: excluded)
    "–", "—", "…", "•", // – — … •
    "é", "è", "ê", "ë", "á", "à", "â", "ä", "ã",
    "í", "ì", "î", "ï", "ó", "ò", "ô", "ö", "õ",
    "ú", "ù", "û", "ü", "ñ", "ç", "ß", "É", "Ç",
    "«", "»", "°", "·", "¿", "¡", " ")

  /** The corruption itself: UTF-8 bytes read as cp1252. */
  def mojibakeOf(good: String): String =
    new String(good.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.Charset.forName("windows-1252"))

  private val Unmapped: Set[Char] =
    Set(0x81, 0x8D, 0x8F, 0x90, 0x9D).map(_.toChar)

  /** (artifact, repaired), derived. */
  val table: Seq[(String, String)] = repaired.map(g => mojibakeOf(g) -> g)

  require(table.forall { case (bad, good) =>
    bad != good && !bad.exists(Unmapped) }, "artifact derivation hit an unmapped cp1252 byte")
  // prefix-shadowing guard: an artifact earlier in the chain consumes
  // any later artifact it prefixes — the derived set has none, and
  // extending `repaired` must keep it that way
  require(table.zipWithIndex.forall { case ((bad, _), i) =>
    table.take(i).forall { case (earlier, _) => !bad.startsWith(earlier) }
  }, "mojibake table order: no artifact may be prefixed by an earlier one")

  private def q(s: String): String = s.replace("'", "''")

  /** Repair expression — same text in BOTH dialects (replace is the
    * same builtin; literals are plain UTF-8).
    */
  def fixExpr(text: String): String =
    table.foldLeft(text) { case (acc, (bad, good)) =>
      s"replace($acc, '${q(bad)}', '${q(good)}')"
    }

  /** Per-row repair: (id, fixed_text, changed). `changed` witnesses
    * which rows carried artifacts (the report a curation run reads
    * before deciding whether a source needs byte-level re-decoding).
    */
  def fix(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), expr(fixExpr(text)).as("fixed_text"), col(text))
      .select(col(id), col("fixed_text"),
        (col("fixed_text") =!= col(text)).as("changed"))

  /** DuckDB twin of [[fix]]. */
  def fixSql(table_ : String, id: String, text: String): String =
    s"""SELECT $id, ${fixExpr(text)} AS fixed_text,
       |  (${fixExpr(text)} <> $text) AS changed
       |FROM $table_""".stripMargin
}
