package graft.ops

/** Shared machinery of the committed forward-maximum-match (FMM)
  * dictionary word grains (round 15 — extracted from the round-14
  * [[ZhLexicon]] so a second unsegmented script costs one word table,
  * not a second segmenter): a lexicon is a plain word SET with
  * per-length hash probes for the compiled kernel and a bounded CASE
  * ladder for the DuckDB oracle. Greedy longest-match is deterministic
  * — no frequencies are consulted at match time — so both dialects
  * replay the exact segmentation from the same committed constant
  * (the [[PublicSuffixes]] / [[Bpe]] committed-table pattern).
  *
  * INVARIANTS (object-init enforced, per lexicon): every word is
  * 2..[[maxLen]] codepoints, all characters inside
  * [[graft.functions.GopherOps.cjkRanges]] (a lexicon word may never
  * swallow a run-token boundary), no duplicates, no spaces.
  *
  * Concrete lexicons are Scala `object`s so the codegen'd kernels can
  * reference them as static fields ([[FmmLexicons.javaRef]]) — no
  * per-row registry lookup, and with two instances the
  * `longestMatch` call sites stay at worst bimorphic.
  */
trait FmmLexicon {

  /** Longest lexicon word length, in codepoints. The DuckDB CASE
    * ladder unrolls to exactly this depth (the PSL-resolver trick).
    */
  def maxLen: Int

  /** The committed lexicon, all lengths. */
  def words: Seq[String]

  /** Per-length word sets for the kernel's longest-first probes:
    * `byLen(L)` holds the length-L words (null where the lexicon has
    * none — the probe skips that rung, same as the SQL ladder omitting
    * the `IN` arm). Lazy: trait vals would initialize before the
    * concrete object's `words`.
    */
  lazy val byLen: Array[java.util.HashSet[String]] = {
    val inBlock = graft.functions.GopherOps.cjkRanges.grouped(2).toArray
    def blockOk(w: String): Boolean = w.forall { c =>
      inBlock.exists { case Array(a, b) => c >= a && c <= b }
    }
    val seen = new java.util.HashSet[String]()
    val arr = new Array[java.util.HashSet[String]](maxLen + 1)
    words.foreach { w =>
      require(w.length >= 2 && w.length <= maxLen,
        s"lexicon word '$w' must be 2..$maxLen codepoints")
      require(blockOk(w),
        s"lexicon word '$w' has a character outside the unsegmented-script " +
          "ranges — FMM may only compete with the codepoint branch, never " +
          "swallow a run-token boundary")
      require(seen.add(w), s"duplicate lexicon word '$w'")
      if (arr(w.length) == null) arr(w.length) = new java.util.HashSet[String]()
      arr(w.length).add(w)
    }
    arr
  }

  /** Longest lexicon word starting at char offset `i` of `s`, or null.
    * All lexicon words are BMP-only (in-block by the init invariant),
    * so a char window equals a word iff the same codepoint window
    * does — the Java-chars walk and the oracle's codepoint walk match
    * identically (a window containing a surrogate half can never equal
    * a lexicon word).
    */
  def longestMatch(s: String, i: Int): String = {
    val bl = byLen
    var len = math.min(maxLen, s.length - i)
    while (len >= 2) {
      val set = bl(len)
      if (set != null) {
        val cand = s.substring(i, i + len)
        if (set.contains(cand)) return cand
      }
      len -= 1
    }
    null
  }

  /** The DuckDB FMM step as a bounded CASE ladder (the PSL-resolver
    * trick): one arm per populated word length, longest first; `''`
    * for a space (advance 1, emit nothing); single in-block codepoint
    * else non-space non-block run as the fallbacks. `t`/`pos` are SQL
    * expressions for the text column and the 1-based codepoint cursor.
    */
  def duckFmmCase(t: String, pos: String, blockInterior: String): String = {
    val arms = (2 to maxLen).reverse.filter(byLen(_) != null).map { len =>
      val list = byLen(len).toArray(Array.empty[String]).sorted
        .map(w => s"'$w'").mkString(", ")
      s"WHEN substr($t, $pos, $len) IN ($list) THEN substr($t, $pos, $len)"
    }.mkString("\n       ")
    s"""CASE WHEN substr($t, $pos, 1) = ' ' THEN ''
       $arms
       WHEN regexp_matches(substr($t, $pos, 1), '[$blockInterior]') THEN substr($t, $pos, 1)
       ELSE regexp_extract(substr($t, $pos), '^[^ $blockInterior]+') END"""
  }
}

/** Registry of the committed FMM grains — the single source of truth
  * for which `wordGrain` strings are dictionary grains and which
  * lexicon each resolves to (kernels, SQL twins, and the grain
  * validators all route through here).
  */
object FmmLexicons {

  /** grain string → lexicon. */
  val byGrain: Map[String, FmmLexicon] =
    Map("cjk-dict" -> ZhLexicon, "thai-dict" -> ThLexicon)

  def isDict(grain: String): Boolean = byGrain.contains(grain)

  def apply(grain: String): FmmLexicon =
    byGrain.getOrElse(grain,
      throw new IllegalArgumentException(s"no FMM lexicon for grain '$grain'"))

  /** Static Java reference for the codegen'd kernels — resolved at
    * CODEGEN time, so the generated row loop carries a constant field
    * read, not a map lookup.
    */
  def javaRef(grain: String): String = grain match {
    case "cjk-dict"  => "graft.ops.ZhLexicon$.MODULE$"
    case "thai-dict" => "graft.ops.ThLexicon$.MODULE$"
    case g => throw new IllegalArgumentException(s"no FMM lexicon for grain '$g'")
  }
}
