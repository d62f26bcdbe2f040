package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import PortableHash._

/** Document deduplication operators for large-scale training-data
  * pipelines: exact, MinHash+LSH (pairs and linear keepers), SimHash,
  * and n-gram Jaccard.
  *
  * Every operator is a declarative DataFrame transform — no UDFs, no
  * collect — whose hot projections run on the native compiled
  * expressions in [[graft.functions]] (`graft_shingle_hashes`,
  * `graft_minhash_sig`, `graft_band_buckets`, `graft_intersect_count`,
  * `graft_simhash`); the plans are: scan → codegen'd projection →
  * (where needed) keyed shuffles of hash rows. Each op has a
  * DuckDB-dialect twin (the `*Sql` methods) used as its oracle, built
  * on the same [[PortableHash]] arithmetic.
  *
  * Scale notes (100 TB):
  *  - exact dedup: one shuffle on a 128-bit digest; partial-agg combines
  *    map-side, so the exchange carries one row per distinct digest per
  *    map partition, not the corpus.
  *  - minhash LSH: shingle→minhash→band→bucket-join. Text NEVER crosses a
  *    shuffle: docs are reduced to (id, shingle-hash array) in the first
  *    projection; candidate generation explodes (bands) small rows per
  *    doc and shuffles only (band, bucket, id); the exact-Jaccard verify
  *    joins candidate ID pairs back to the hash arrays — it touches
  *    candidates only, never all pairs.
  *  - simhash: linear scan, zero shuffle; near-dup lookup is a self-join
  *    on the (few-bit-prefix) bucket of the fingerprint.
  *  - n-gram Jaccard all-pairs is O(n²) by nature and exists as the
  *    small-side verifier / oracle; the LSH path is the scale path.
  */
object Dedup {

  /** Word k-shingles of a text column, distinct, as an array expression
    * (Spark dialect). Docs with fewer than k words yield an EMPTY array —
    * Spark's `sequence(1, 0)` is the descending [1, 0], so the short-doc
    * case must be guarded explicitly to match the DuckDB twin, whose
    * `generate_series(1, 0)` is empty (and to avoid
    * INVALID_ARRAY_INDEX_IN_ELEMENT_AT at i+j past the end).
    * Spark SQL lacks let-bindings, so the split is inlined — Catalyst's
    * common-subexpression elimination dedups it.
    */
  def sparkShingles(text: String, k: Int = 3): String = {
    // let-bind the split ONCE: referenced k+2 times below, and inside a
    // lambda each reference would otherwise re-split the text per shingle
    val parts = (0 until k).map(j => s"element_at(__w, i + $j)").mkString(", ' ', ")
    PortableHash.let1("__w", s"split($text, ' ')",
      s"array_distinct(IF(size(__w) < $k, cast(array() AS ARRAY<STRING>), " +
        s"transform(sequence(1, size(__w) - ${k - 1}), i -> concat($parts))))")
  }

  /** Fail-fast grain validation — every grain-threaded operator funnels
    * through the builders below (or through a kernel case class that
    * validates in its own require), so a typo like "cjk_auto" throws
    * here instead of silently running the ws grain it was meant to
    * replace.
    */
  /** Size-gated broadcast hint (round 15) for "small by construction"
    * side tables like the dedupLines/dedupSentences frequent sets: the
    * `total / maxFreq` cardinality BOUND is not a broadcast GUARANTEE —
    * at 100 TB with a low maxFreq the frequent set can blow past the
    * driver. The helper leases `df` (it is about to feed a join
    * anyway), pays ONE eager aggregate to estimate its broadcast
    * payload (`payloadBytes` summed + a flat per-row overhead), and
    * hints broadcast only when the estimate fits the session's
    * `spark.sql.autoBroadcastJoinThreshold`; past it — or with the
    * threshold set to -1 — the frame is returned unhinted and the join
    * degrades to a shuffled strategy instead of OOMing the driver.
    *
    * AQE gate (round 16): with `spark.sql.adaptive.enabled` (Spark's
    * default) the UNHINTED join is already sized at runtime from the
    * frequent set's exact shuffle stats — broadcast when it fits,
    * shuffled when it doesn't — so the eager estimate would pay an
    * extra job for strictly worse information (it cost `dedup_lines`
    * 2.09× on the r15 bench board). Under AQE the input is returned
    * untouched; the estimator (and with it the construction-time
    * lease, which lives until `Caches.releaseAll`/scope exit — callers
    * on the AQE-off path inherit that eager, caching behavior) runs
    * only when AQE is off and static planning needs the size up front.
    *
    * COST OF THE AQE PATH, stated precisely (round 17, ADVICE): at
    * scale the unhinted join's static stats exceed the broadcast
    * threshold, so it PLANS as a shuffle join, and when AQE converts
    * it to broadcast at runtime the probe side's shuffle MAP WRITE has
    * already executed — the local shuffle reader skips the fetch and
    * the sort, not the write. The probe side is therefore written once
    * to local disk (pipelined with the scan that produced it, no extra
    * pass over the data, no network). That map write is the price of
    * not knowing the build side's size up front; the alternatives are
    * strictly worse — an eager estimator job (a full extra aggregate
    * over the build side, the measured 2.09× above) or an unconditional
    * hint (driver OOM when the "small by construction" bound lies at
    * 100 TB). Callers' "no corpus shuffle" claims are scoped to
    * NETWORK movement: no corpus row crosses the wire for the lookup
    * on either AQE branch.
    */
  private[graft] def broadcastIfSmall(df: DataFrame, payloadBytes: Column): DataFrame = {
    if (df.sparkSession.conf.get("spark.sql.adaptive.enabled", "true")
          .equalsIgnoreCase("true")) return df
    val leased = Caches.lease(df)
    val r = leased.agg(
      coalesce(sum(payloadBytes.cast("long")), lit(0L)),
      count(lit(1))).head()
    // ~32 B/row of HashedRelation overhead on top of the payload
    val est = r.getLong(0) + 32L * r.getLong(1)
    val raw = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val threshold =
      try java.lang.Long.parseLong(raw.trim)
      catch { case _: NumberFormatException =>
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw.trim) }
    if (threshold > 0 && est <= threshold) broadcast(leased) else leased
  }

  private[ops] def requireGrain(g: String): String =
    TextAnalysis.requireWordGrain(g)

  def duckShingles(text: String, k: Int = 3, grain: String = "ws"): String = {
    // 'toklist' (round 15, internal): `text` is ALREADY a token-list
    // expression — the dict-grain twins precompute the FMM token list
    // as a recursive-CTE derived table ([[grainSource]]) because no
    // scalar SQL expression can run a sequential segmentation cursor.
    // Dict grain strings themselves are deliberately NOT accepted
    // here: a twin builder that has not been routed through
    // [[grainSource]] must fail loudly, not emit wrong-grain SQL.
    require(grain == "ws" || grain == "cjk-auto" || grain == "toklist",
      s"duckShingles grain must be 'ws', 'cjk-auto' or 'toklist' " +
        s"(dict grains go through grainSource), got $grain")
    // parenthesized: the routed form is a CASE expression and list
    // indexing binds tighter than CASE in the DuckDB grammar
    val w = if (grain == "cjk-auto")
              s"(${TextAnalysis.routedTokensDuck(text, keepEmpties = true)})"
            else if (grain == "toklist") s"($text)"
            else s"string_split($text, ' ')"
    val parts = (0 until k).map(j => s"$w[i + $j]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(generate_series(1, len($w) - ${k - 1}), i -> $parts))"
  }

  /** Distinct shingle-hash array (the whole-doc content set, hashed).
    * `array_distinct` runs AFTER hashing so both engines agree even in the
    * (improbable) event of a hash collision between distinct shingles.
    * This is the declarative HOF form — the parity baseline for the
    * compiled [[nativeShingleHashes]] the operators actually use.
    */
  def sparkShingleHashes(text: String, k: Int = 3): String =
    s"array_distinct(${sparkHashArrayOf(sparkShingles(text, k))})"

  /** Native one-pass shingle hashing ([[graft.functions.ShingleHashes]]):
    * same values as [[sparkShingleHashes]] (same shingling, H, distinct
    * order) in a compiled loop instead of interpreted HOF lambdas.
    * Requires [[graft.functions.VectorFunctions.attach]] on the session.
    */
  def nativeShingleHashes(text: String, k: Int = 3,
                          grain: String = "ws"): String = {
    requireGrain(grain)
    // 'cjk-auto': shingles over the ROUTED token sequence (codepoint
    // k-grams on script-dominated rows — without it an unsegmented doc
    // is ONE ws token, has no k-shingles, and the whole minhash family
    // is silently blind to it). Kernel child of a kernel — stays in
    // whole-stage codegen, unlike a HOF child.
    if (grain == "cjk-auto")
      s"graft_shingle_hashes(graft_routed_tokens($text, true), $k)"
    else if (FmmLexicons.isDict(grain))
      // dict grains (round 15): shingles over the FMM WORD sequence —
      // a zh near-dup pair differing by one character INSIDE a
      // dictionary word shingles apart at codepoint grain but stays a
      // near-dup at word grain; kernel child of a kernel, stays in
      // whole-stage codegen
      s"graft_shingle_hashes(graft_fmm_tokens($text, true, '$grain'), $k)"
    else s"graft_shingle_hashes(split($text, ' '), $k)"
  }

  def duckShingleHashes(text: String, k: Int = 3,
                        grain: String = "ws"): String =
    s"list_distinct(${duckHashArrayOf(duckShingles(text, k, grain))})"

  /** Dict-grain rewrite for the scalar SQL twins (round 15): FMM needs
    * a recursive CTE, so for a dict grain the (table, text, grain)
    * triple becomes (fmm-token-list derived table, `__toks`,
    * `'toklist'`) and the twin's shingling consumes the list directly;
    * ws/cjk-auto pass through untouched. The derived table exposes
    * exactly ($id, __toks) — usable by every twin that references only
    * the id and the text.
    */
  private[ops] def grainSource(table: String, id: String, text: String,
                               grain: String): (String, String, String) =
    if (FmmLexicons.isDict(grain))
      (s"(${TextAnalysis.fmmTokListRelDuck(table, text, id, FmmLexicons(grain))})",
        "__toks", "toklist")
    else (table, text, grain)

  /** Cheap `>= k`-token floor predicate matching the grain's shingle
    * token sequence exactly (hs is empty iff it fails): ws counts the
    * split WITH empties, cjk-auto the count-only routed kernel — the
    * filter never materializes a token array on either grain.
    */
  def shingleFloorPred(text: String, k: Int, grain: String = "ws"): String =
    if (requireGrain(grain) == "cjk-auto") s"graft_routed_token_count($text) >= $k"
    else if (FmmLexicons.isDict(grain))
      s"graft_fmm_token_count($text, '$grain') >= $k"
    else s"size(split($text, ' ')) >= $k"

  /** DuckDB twin of [[shingleFloorPred]]. */
  def duckShingleFloorPred(text: String, k: Int, grain: String = "ws"): String =
    if (grain == "toklist") s"len($text) >= $k"
    else if (requireGrain(grain) == "cjk-auto")
      s"len(${TextAnalysis.routedTokensDuck(text, keepEmpties = true)}) >= $k"
    else if (FmmLexicons.isDict(grain))
      throw new IllegalArgumentException(
        "dict-grain twins must rewrite through grainSource before the floor")
    else s"len(string_split($text, ' ')) >= $k"

  /** Exact dedup by content digest: (digest, keep_id = min id, dup count).
    * One partial-aggregated shuffle on md5(text).
    */
  def exactDedup(df: DataFrame, id: String, text: String): DataFrame =
    df.groupBy(md5(col(text)).as("h"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_dups"))

  def exactDedupSql(table: String, id: String, text: String): String =
    s"SELECT md5($text) AS h, min($id) AS keep_id, count(*) AS n_dups FROM $table GROUP BY 1"

  /** Streaming exact dedup: emit the FIRST document per content digest,
    * drop later copies arriving within the watermark. State is one row
    * per distinct digest, expired by the watermark — bounded, unlike an
    * unbounded `dropDuplicates` — so this runs forever on an ingest
    * stream. The batch [[exactDedup]] is the backfill analog (keep_id =
    * min id; streaming keeps first-seen, the arrival-order equivalent).
    */
  def exactDedupStreaming(df: DataFrame, text: String,
                          eventTime: String, delay: String): DataFrame =
    df.withColumn("h", md5(col(text)))
      .withWatermark(eventTime, delay)
      .dropDuplicatesWithinWatermark("h")

  /** Corpus-level duplicated-line removal — the CCNet/RefinedWeb
    * boilerplate pass: a line occurring more than `maxFreq` times
    * corpus-wide (nav bars, cookie banners, footers) is struck from
    * every document; output is the reassembled clean text per doc plus
    * removal counts.
    *
    * Plan shape (the 100 TB path): line frequency is a partial-aggregated
    * exchange carrying one (line, count) row per distinct line per map
    * partition; the frequent set (count > maxFreq) has at most
    * total_lines / maxFreq members BY CONSTRUCTION, so the lookup join
    * resolves to broadcast — statically via [[broadcastIfSmall]]'s
    * estimator when AQE is off, at runtime from exact shuffle stats
    * when AQE is on. On the AQE branch the line rows pay one LOCAL
    * shuffle map write before the runtime conversion (see
    * [[broadcastIfSmall]] — the fetch is skipped, not the write); no
    * corpus row crosses the network for the lookup on either branch.
    * Reassembly is the one keyed exchange on doc id. The per-doc
    * collect_list is bounded by the document's own line count — the
    * same bound as reading the doc.
    */
  def dedupLines(df: DataFrame, id: String, text: String, maxFreq: Int): DataFrame = {
    val lines = df.select(col(id),
      posexplode(split(col(text), "\n")).as(Seq("pos", "line")))
    // frequency keyed on the LINE STRING itself (round 16, was md5 —
    // the dedupSentences r15 move, closing the sibling asymmetry):
    // Spark's md5() yields a 32-char HEX STRING, so the "digest" key
    // was itself ~32 B and bought at most ~2× exchange width on
    // typical lines while carrying a (theoretical) collision that
    // merges two distinct lines' counts; string keys match the
    // string-keyed DuckDB twin EXACTLY and drop the per-probe md5
    // from the corpus-side join
    val frequent = lines
      .groupBy(col("line").as("fline")).agg(count(lit(1)).as("c"))
      .where(col("c") > maxFreq)
      .select(col("fline"))
    lines
      .join(broadcastIfSmall(frequent, octet_length(col("fline"))),
        col("line") === col("fline"), "left_outer")
      .groupBy(col(id))
      .agg(
        // collect_list skips the NULL CASE branches, so frequent lines
        // drop out while their rows still anchor the doc's group (a doc
        // of pure boilerplate survives as clean_text = '')
        expr("concat_ws(chr(10), transform(array_sort(" +
          "collect_list(CASE WHEN fline IS NULL THEN struct(pos, line) END)), s -> s.line))")
          .as("clean_text"),
        sum(when(col("fline").isNotNull, 1).otherwise(0)).cast("long").as("n_removed"),
        count(lit(1)).as("n_lines"))
  }

  def dedupLinesSql(table: String, id: String, text: String, maxFreq: Int): String =
    s"""WITH l AS (
       |  SELECT $id, unnest(generate_series(1, len(ls))) AS pos, unnest(ls) AS line
       |  FROM (SELECT $id, string_split($text, chr(10)) AS ls FROM $table)),
       |f AS (SELECT line FROM l GROUP BY line HAVING count(*) > $maxFreq)
       |SELECT l.$id,
       |  coalesce(string_agg(CASE WHEN f.line IS NULL THEN l.line END, chr(10) ORDER BY l.pos), '') AS clean_text,
       |  sum(CASE WHEN f.line IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_removed,
       |  count(*) AS n_lines
       |FROM l LEFT JOIN f ON l.line = f.line
       |GROUP BY l.$id""".stripMargin

  /** WITHIN-document duplicate-line removal (round 16) — the CCNet
    * intra-doc pre-step next to the corpus-level [[dedupLines]]: a
    * page that repeats its own boilerplate (menus rendered top AND
    * bottom, repeated share prompts) keeps only the FIRST occurrence
    * of each line; later copies are struck regardless of corpus-wide
    * frequency. Entirely ROW-LOCAL — zero exchanges, the
    * embarrassingly-parallel complement to the corpus pass (which
    * needs a frequency shuffle): run this first and the corpus pass
    * sees each doc's distinct lines once.
    *
    * The keep predicate is first-occurrence-index equality
    * (`array_position(lines, x) == i+1`) — O(lines²) per doc, bounded
    * by the doc's own line count (the same bound as reading it).
    */
  def dedupLinesWithinDoc(df: DataFrame, id: String, text: String): DataFrame =
    df.withColumn("__l", expr(s"split($text, '\\n')"))
      .withColumn("__k", expr(
        "filter(__l, (x, i) -> array_position(__l, x) = cast(i + 1 AS BIGINT))"))
      .select(col(id),
        expr("array_join(__k, chr(10))").as("clean_text"),
        expr("cast(size(__l) - size(__k) AS BIGINT)").as("n_removed"),
        expr("cast(size(__l) AS BIGINT)").as("n_lines"))

  /** DuckDB twin of [[dedupLinesWithinDoc]] (DuckDB lambda indexes are
    * 1-based where Spark's are 0-based — both sides compare against
    * the 1-based first-occurrence position).
    */
  def dedupLinesWithinDocSql(table: String, id: String, text: String): String =
    s"""WITH d AS (SELECT $id, string_split($text, chr(10)) AS l FROM $table),
       |k AS (SELECT $id, l,
       |        list_filter(l, (x, i) -> list_position(l, x) = i) AS kept
       |      FROM d)
       |SELECT $id,
       |  coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
       |  (len(l) - len(kept))::BIGINT AS n_removed,
       |  len(l)::BIGINT AS n_lines
       |FROM k""".stripMargin

  /** Corpus-level duplicated-SENTENCE removal — [[dedupLines]] at the
    * sentence grain (the CCNet-style pass for boilerplate that repeats
    * as sentences rather than lines: cookie notices, share prompts,
    * newsletter calls — and it requires real sentence boundaries,
    * which the r14 full-width terminator support extends to zh/ja: on
    * the old ASCII-only rule a zh doc was ONE sentence and this op
    * could only ever drop whole documents). A sentence occurring more
    * than `maxFreq` times corpus-wide is struck from every doc; output
    * rejoins the survivors with single spaces (the inter-sentence
    * whitespace is consumed by the boundary split — normalized-form
    * output, identical on both engines). Docs with no sentences (empty
    * /blank text) have no sentence rows and are absent from the output
    * on both engines — the sentence relation is the op's domain.
    *
    * Plan shape (the [[dedupLines]] shape): sentence frequency is a
    * partial-aggregated exchange of digests; the frequent set has at
    * most total_sentences / maxFreq members BY CONSTRUCTION, so it
    * broadcasts back and the corpus never shuffles for the lookup;
    * reassembly is the one doc-keyed exchange.
    */
  def dedupSentences(df: DataFrame, id: String, text: String,
                     maxFreq: Int): DataFrame = {
    val sents = TextAnalysis.sentences(df, id, text)
    // frequency keyed on the SENTENCE STRING itself (round 15, was
    // md5): sentences are boundary-segmented and hence length-bounded,
    // so the partial-agg exchange carries strings of the same order as
    // digest rows, the (theoretical) md5 collision merging two distinct
    // sentences' counts disappears, and the op matches the string-keyed
    // DuckDB twin EXACTLY instead of modulo-collision
    val frequent = sents
      .groupBy(col("sentence").as("fsent")).agg(count(lit(1)).as("c"))
      .where(col("c") > maxFreq)
      .select(col("fsent"))
    sents
      .join(broadcastIfSmall(frequent, octet_length(col("fsent"))),
        col("sentence") === col("fsent"), "left_outer")
      .groupBy(col(id))
      .agg(
        // collect_list skips the NULL CASE branches (the dedupLines
        // pattern): frequent sentences drop out while their rows still
        // anchor the group, so a doc of pure boilerplate survives with
        // clean_text = ''
        expr("concat_ws(' ', transform(array_sort(" +
          "collect_list(CASE WHEN fsent IS NULL THEN struct(sent_idx, sentence) END)), s -> s.sentence))")
          .as("clean_text"),
        sum(when(col("fsent").isNotNull, 1).otherwise(0)).cast("long").as("n_removed"),
        count(lit(1)).as("n_sentences"))
  }

  /** DuckDB twin of [[dedupSentences]] (string-keyed frequent join on
    * both engines since round 15 — exact, no collision caveat).
    */
  def dedupSentencesSql(table: String, id: String, text: String,
                        maxFreq: Int): String =
    s"""WITH s AS (${TextAnalysis.sentencesSql(table, id, text)}),
       |f AS (SELECT sentence FROM s GROUP BY sentence HAVING count(*) > $maxFreq)
       |SELECT s.$id,
       |  coalesce(string_agg(CASE WHEN f.sentence IS NULL THEN s.sentence END, ' ' ORDER BY s.sent_idx), '') AS clean_text,
       |  sum(CASE WHEN f.sentence IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_removed,
       |  count(*) AS n_sentences
       |FROM s LEFT JOIN f ON s.sentence = f.sentence
       |GROUP BY s.$id""".stripMargin

  /** Exact substring-span dedup — the batch ExactSubstr shape of the
    * public "Deduplicating Training Data Makes Language Models Better"
    * construction (Lee et al. 2021), at word-span grain: any fixed-length
    * word n-gram (span) that occurs more than `maxFreq` times CORPUS-WIDE
    * is boilerplate; every word position covered by a duplicated span is
    * struck from every document (overlapping spans union — stride-1
    * grams, so a shared passage is caught at ANY alignment, unlike
    * non-overlapping chunking). Generalizes [[dedupLines]] from
    * newline-delimited to arbitrary-span boilerplate.
    *
    * Plan shape (linear, the 100 TB shape):
    *  1. one scan explodes (doc, spos, gram) span rows; the duplicated-
    *     digest set comes from a partial-agg count over the 128-bit gram
    *     digest (the exchange carries one row per distinct digest per map
    *     partition — never the text);
    *  2. duplicated digests broadcast back (boilerplate is rare relative
    *     to the corpus — same smallness assumption as [[dedupLines]]);
    *  3. covered word positions = explode of each flagged span's range,
    *     distinct per doc, left-anti'd against the word rows;
    *  4. one keyed exchange on doc id reassembles clean_text in word
    *     order.
    */
  def dedupSpans(df: DataFrame, id: String, text: String,
                 spanLen: Int = 5, maxFreq: Int = 10,
                 wordGrain: String = "ws"): DataFrame = {
    requireGrain(wordGrain)
    val fdf = graft.functions.VectorFunctions.attach(df)
    // the span token sequence rides the word grain (round 16 — was
    // hard-wired split-on-space, so zh/thai spans shingled at whatever
    // whitespace existed, i.e. barely): cjk-auto = routed codepoint
    // tokens, dict = FMM words; keepEmpties=true mirrors the ws
    // split's contract. clean_text rejoins surviving tokens with
    // single spaces — normalized-form output on non-ws grains (the
    // dedupSentences convention).
    val tokArr =
      if (wordGrain == "cjk-auto") s"graft_routed_tokens($text, true)"
      else if (FmmLexicons.isDict(wordGrain))
        s"graft_fmm_tokens($text, true, '$wordGrain')"
      else s"split($text, ' ')"
    // gram DIGESTS, never gram text, cross the exchanges. md5 (128-bit)
    // deliberately: over ~10⁸ distinct grams a 64-bit hash carries real
    // collision odds, and a collision falsely strikes a clean span
    // r20 note: the span-digest frame feeds both the duplicated-digest
    // count and the coverage join, but leasing it measured MIXED at
    // sf0.1 (cjkdict leg regressed in the full-board run) — the
    // coverage join's probe side computes the explode in-stage anyway,
    // so the lease trades one duplicated row-local explode+md5 for
    // cache serialization of the postings. Left unleased on the
    // measurement (and the plan audit pins the lease-free AQE shape).
    val grams = fdf.select(col(id),
      posexplode(expr(s"graft_ngrams($tokArr, $spanLen)"))
        .as(Seq("spos", "gram")))
      .select(col(id), col("spos"), md5(col("gram")).as("gh"))
    val dup = grams
      .groupBy(col("gh")).agg(count(lit(1)).as("c"))
      .where(col("c") > maxFreq)
    // flagged SPAN STARTS collapse to one sorted array per doc
    // (collect_set dedups inside the partial agg) — starts, NOT expanded
    // positions: expanding to covered positions before the exchange
    // multiplies shuffle volume by spanLen. The original words-explode ⋈
    // covered-distinct formulation paid a corpus-wide DISTINCT plus a
    // words-grain join plus a words-grain reassembly agg — measured 246s
    // at the 1M probe's boilerplate-saturated worst case (200×
    // replication flags EVERY gram) vs ~45s for this shape. Coverage and
    // reassembly are then row-local over the doc's own split array —
    // O(len × flagged-starts) per doc, bounded by the doc's own size.
    // The duplicated-digest set rides [[broadcastIfSmall]] (round 17 —
    // was an unconditional broadcast hint): its total_grams/maxFreq
    // cardinality bound is fixed-width (md5 digests, 32 B/row, unlike
    // unbounded line text) but still not a broadcast GUARANTEE on a
    // pathological boilerplate corpus; only the digest column crosses
    // — the count is dropped before the gate so the payload is exact
    val cov = grams.join(
        broadcastIfSmall(dup.select(col("gh")), octet_length(col("gh"))),
        Seq("gh"))
      .groupBy(col(id))
      .agg(sort_array(collect_set(col("spos"))).as("__ss"))
    fdf.select(col(id), expr(tokArr).as("__w"))
      .join(cov, Seq(id), "left_outer")
      .select(col(id), col("__w"),
        expr(s"transform(sequence(0, size(__w) - 1), " +
          s"i -> NOT exists(coalesce(__ss, array()), s -> s <= i AND i < s + $spanLen))")
          .as("__keep"))
      .select(col(id),
        expr("concat_ws(' ', filter(zip_with(__w, __keep, (w, k) -> IF(k, w, NULL)), " +
          "x -> x IS NOT NULL))").as("clean_text"),
        expr("cast(size(__w) - size(filter(__keep, k -> k)) AS BIGINT)").as("n_removed"),
        expr("cast(size(__w) AS BIGINT)").as("n_words"))
  }

  /** DuckDB twin of [[dedupSpans]] (1-based positions; same stride-1
    * grams, same corpus-frequency threshold, same coverage union).
    */
  def dedupSpansSql(table: String, id: String, text: String,
                    spanLen: Int = 5, maxFreq: Int = 10,
                    wordGrain: String = "ws"): String = {
    val (tbl, txt, g) = grainSource(table, id, text, wordGrain)
    // toklist: the FMM token-list derived table already carries the
    // ordered per-doc word list; cjk-auto: routed codepoint tokens;
    // keepEmpties=true throughout, mirroring the Spark side
    val wSrc =
      if (g == "toklist") s"($txt)"
      else if (g == "cjk-auto")
        s"(${TextAnalysis.routedTokensDuck(txt, keepEmpties = true)})"
      else s"string_split($txt, ' ')"
    val w = "w"
    val gramExpr = (0 until spanLen).map(j => s"$w[i + $j]").mkString(" || ' ' || ")
    s"""WITH d AS (SELECT $id, $wSrc AS $w FROM $tbl),
       |l AS (SELECT $id, unnest(generate_series(1, len($w))) AS pos,
       |             unnest($w) AS word FROM d),
       |g AS (SELECT $id, unnest(generate_series(1, len($w) - ${spanLen - 1})) AS spos,
       |             unnest(list_transform(generate_series(1, len($w) - ${spanLen - 1}),
       |               i -> $gramExpr)) AS gram
       |      FROM d WHERE len($w) >= $spanLen),
       |f AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > $maxFreq),
       |cov AS (SELECT DISTINCT $id, cpos FROM (
       |  SELECT g.$id, unnest(generate_series(g.spos, g.spos + ${spanLen - 1})) AS cpos
       |  FROM g JOIN f USING (gram))),
       |j AS (SELECT l.$id, l.pos, l.word, cov.cpos
       |      FROM l LEFT JOIN cov ON l.$id = cov.$id AND l.pos = cov.cpos)
       |SELECT $id,
       |  coalesce(string_agg(CASE WHEN cpos IS NULL THEN word END, ' ' ORDER BY pos), '') AS clean_text,
       |  sum(CASE WHEN cpos IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_removed,
       |  count(*) AS n_words
       |FROM j GROUP BY $id""".stripMargin
  }

  /** MinHash signature: for each doc, `numHashes` minima of universal
    * hashes over its shingle hashes. Pure projection — no shuffle.
    */
  def minhashSignatures(df: DataFrame, id: String, text: String,
                        numHashes: Int = 16, k: Int = 3,
                        wordGrain: String = "ws"): DataFrame = {
    val fdf = graft.functions.VectorFunctions.attach(df)
    // filter BEFORE the projection on the equivalent cheap predicate:
    // hs is empty iff the doc has < k words, and filtering on size(hs)
    // after the select would be pushed below it by Catalyst WITH the
    // expensive expression substituted in — hashing every doc twice
    Par.floor(fdf.where(expr(shingleFloorPred(text, k, wordGrain))), col(id))
      .select(col(id), expr(nativeShingleHashes(text, k, wordGrain)).as("hs"))
      // one compiled pass computes all numHashes minima; the element_at
      // projection below is NOT collapsed into it (CollapseProject keeps
      // multiply-referenced non-cheap expressions materialized)
      .withColumn("__sig", expr(s"graft_minhash_sig(hs, $numHashes)"))
      .select(col(id) +: (0 until numHashes).map(i =>
        expr(s"element_at(__sig, ${i + 1})").as(s"mh$i")): _*)
  }

  def minhashSignaturesSql(table: String, id: String, text: String,
                           numHashes: Int = 16, k: Int = 3,
                           wordGrain: String = "ws"): String = {
    val (tbl, txt, g) = grainSource(table, id, text, wordGrain)
    val sigCols = (0 until numHashes).map { i =>
      s"list_min(list_transform(hs, h -> ${universal(i, "h")})) AS mh$i"
    }.mkString(", ")
    s"SELECT $id, $sigCols FROM (SELECT $id, ${duckShingleHashes(txt, k, g)} AS hs FROM $tbl) WHERE len(hs) > 0"
  }

  /** MinHash LSH candidate pairs, exact-Jaccard verified.
    *
    * bands × rowsPerBand = numHashes; docs sharing any band bucket are
    * candidates; candidates are verified with exact Jaccard over the
    * (distinct) shingle-hash sets and filtered at `threshold`.
    *
    * Plan shape (the 100 TB shape):
    *   1. ONE scan reduces each doc to (id, hs: array<long>) — text is
    *      dropped before anything shuffles.
    *   2. `posexplode` emits (bands) rows per doc: (band, bucket, id) —
    *      a single pass, not one union branch per band.
    *   3. Self-join on (band, bucket) + groupBy(a_id, b_id) dedups
    *      candidates; the exchange carries only ids and two longs.
    *   4. Verify joins the candidate ID pairs back to (id, hs) twice and
    *      computes Jaccard on the hash arrays — candidates only.
    */
  def minhashLshPairs(df: DataFrame, id: String, text: String,
                      bands: Int = 4, rowsPerBand: Int = 4, k: Int = 3,
                      threshold: Double = 0.5,
                      wordGrain: String = "ws"): DataFrame = {
    // The (id, hs) projection feeds FOUR plan branches (band rows twice
    // via the self-join, verify joins twice); without materialization
    // Spark re-scans the corpus and re-hashes per branch. The projection
    // is tiny relative to the corpus (~id + numShingles longs per doc),
    // so persist it — one corpus scan total, spilling to disk if needed.
    val fdf = graft.functions.VectorFunctions.attach(df)
    // sorted once per doc so the verify stage can use the two-pointer
    // graft_intersect_count (signature minima and band buckets are
    // order-independent, so sorting changes no values)
    val docs = Par.floor(fdf.where(expr(shingleFloorPred(text, k, wordGrain))), col(id))
      .select(col(id).as("_did"),
        expr(s"sort_array(${nativeShingleHashes(text, k, wordGrain)})").as("hs"))
      .transform(Caches.lease(_))
    val bandRows = docs
      .select(col("_did"),
        posexplode(expr(s"graft_band_buckets(hs, $bands, $rowsPerBand)")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cand = bandRows.alias("a")
      .join(bandRows.alias("b"), Seq("band", "bucket"))
      .where(col("a._did") < col("b._did"))
      .select(col("a._did").as("a_id"), col("b._did").as("b_id"))
      .distinct()
    cand
      .join(docs.select(col("_did").as("a_id"), col("hs").as("ha")), "a_id")
      .join(docs.select(col("_did").as("b_id"), col("hs").as("hb")), "b_id")
      .withColumn("c", expr("graft_intersect_count(ha, hb)"))
      .withColumn("jaccard",
        round(col("c") * 1.0 / (expr("size(ha)") + expr("size(hb)") - col("c")), 6))
      .where(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** LINEAR near-dup keeper assignment — the mass-dedup scale path.
    *
    * [[minhashLshPairs]] materializes the candidate PAIR list, which is
    * inherently Θ(Σ cluster²): a corpus where popular documents have
    * hundreds of near-copies (the common 100 TB reality) produces a
    * quadratic pair blow-up no plan shape can avoid. Mass dedup does not
    * need pairs: it needs one keeper per near-dup cluster. This operator
    * computes, in ONE linear pass, `keep_id = min(doc ids sharing ANY
    * LSH band bucket with this doc)` — a single label-propagation step:
    *   1. docs → (band, bucket, id) rows (bands rows per doc);
    *   2. per-bucket min id (partial-aggregated shuffle of key rows);
    *   3. per-doc min over its bands' bucket minima.
    * Docs with `keep_id < doc_id` are near-dup drops; iterating to a
    * fixed point yields full connected components (each step is this
    * same linear job). Deterministic; oracle-checked.
    */
  def minhashDedupKeepers(df: DataFrame, id: String, text: String,
                          bands: Int = 4, rowsPerBand: Int = 4,
                          k: Int = 3, wordGrain: String = "ws"): DataFrame = {
    val fdf = graft.functions.VectorFunctions.attach(df)
    // (band, bucket, id) feeds two branches (bucket minima + join back);
    // persist so the corpus is shingle-hashed once — the cached rows are
    // three longs per band per doc, tiny relative to the text. The
    // < k-token floor is [[shingleFloorPred]] — grain-validated, count-
    // only (never materializes a token array; the projection's shingle
    // kernel is the only tokenize).
    val bandRows = Par.floor(fdf.where(expr(shingleFloorPred(text, k, wordGrain))), col(id))
      .select(col(id).as("_did"),
        expr(nativeShingleHashes(text, k, wordGrain)).as("hs"))
      .select(col("_did"),
        posexplode(expr(s"graft_band_buckets(hs, $bands, $rowsPerBand)")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .transform(Caches.lease(_))
    val bucketMin = bandRows.groupBy(col("band"), col("bucket"))
      .agg(min(col("_did")).as("bmin"))
    bandRows.join(bucketMin, Seq("band", "bucket"))
      .groupBy(col("_did")).agg(min(col("bmin")).as("keep_id"))
      .select(col("_did").as("doc_id"), col("keep_id"))
  }

  def minhashDedupKeepersSql(table: String, id: String, text: String,
                             bands: Int = 4, rowsPerBand: Int = 4,
                             k: Int = 3, wordGrain: String = "ws"): String = {
    val (tbl, txt, g) = grainSource(table, id, text, wordGrain)
    val bandSelects = (0 until bands).map { b =>
      val sig = (0 until rowsPerBand).map { r =>
        val i = b * rowsPerBand + r
        s"list_min(list_transform(hs, h -> ${universal(i, "h")}))"
      }.mkString("[", ", ", "]::BIGINT[]")
      s"SELECT _did, $b AS band, ${duckFoldHashes(sig)} AS bucket FROM docs"
    }.mkString(" UNION ALL ")
    s"""WITH docs AS (
       |  SELECT _did, hs FROM
       |    (SELECT $id AS _did, ${duckShingleHashes(txt, k, g)} AS hs FROM $tbl)
       |  WHERE len(hs) > 0),
       |bandrows AS ($bandSelects),
       |bucketmin AS (
       |  SELECT band, bucket, min(_did) AS bmin FROM bandrows GROUP BY band, bucket)
       |SELECT r._did AS doc_id, min(m.bmin) AS keep_id
       |FROM bandrows r JOIN bucketmin m ON r.band = m.band AND r.bucket = m.bucket
       |GROUP BY r._did""".stripMargin
  }

  /** Near-dup cluster labels by ITERATED label propagation — each
    * iteration is the same linear job as [[minhashDedupKeepers]], with
    * labels in place of raw ids: a doc's label becomes the min label
    * seen in any of its buckets. `iters` fixed (not run-to-convergence)
    * so the DuckDB oracle can mirror the exact computation; at 100 TB
    * each extra iteration is one more pair of keyed partial-aggregated
    * shuffles of (bucket, label) rows, and chains of length ≤ 2^iters
    * collapse (iters=3 covers any realistically-transitive near-dup
    * chain; run more for adversarial topologies).
    */
  def minhashDedupComponents(df: DataFrame, id: String, text: String,
                             bands: Int = 4, rowsPerBand: Int = 4,
                             k: Int = 3, iters: Int = 3,
                             wordGrain: String = "ws"): DataFrame = {
    val fdf = graft.functions.VectorFunctions.attach(df)
    val bandRows = Par.floor(fdf.where(expr(shingleFloorPred(text, k, wordGrain))), col(id))
      .select(col(id).as("_did"),
        expr(nativeShingleHashes(text, k, wordGrain)).as("hs"))
      .select(col("_did"),
        posexplode(expr(s"graft_band_buckets(hs, $bands, $rowsPerBand)")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .transform(Caches.lease(_))
    // r20 note: unrolling the identity first iteration (bucket-min
    // directly off the band rows, skipping the distinct + first label
    // join) LOOKS like two saved stages but measured consistently
    // SLOWER at sf0.1 (ProbeR20Census, 7 interleaved reps: ~1.45s old
    // vs ~2.0s unrolled on the labels leg) — kept in the
    // theoretically-redundant shape the measurements prefer.
    var labels = bandRows.select(col("_did"), col("_did").as("label")).distinct()
    (1 to iters).foreach { _ =>
      val bucketMin = bandRows.join(labels, Seq("_did"))
        .groupBy(col("band"), col("bucket")).agg(min(col("label")).as("bmin"))
      labels = bandRows.join(bucketMin, Seq("band", "bucket"))
        .groupBy(col("_did")).agg(min(col("bmin")).as("label"))
    }
    labels.select(col("_did").as("doc_id"), col("label").as("component_id"))
  }

  def minhashDedupComponentsSql(table: String, id: String, text: String,
                                bands: Int = 4, rowsPerBand: Int = 4,
                                k: Int = 3, iters: Int = 3,
                                wordGrain: String = "ws"): String = {
    val (tbl, txt, g) = grainSource(table, id, text, wordGrain)
    val bandSelects = (0 until bands).map { b =>
      val sig = (0 until rowsPerBand).map { r =>
        val i = b * rowsPerBand + r
        s"list_min(list_transform(hs, h -> ${universal(i, "h")}))"
      }.mkString("[", ", ", "]::BIGINT[]")
      s"SELECT _did, $b AS band, ${duckFoldHashes(sig)} AS bucket FROM docs"
    }.mkString(" UNION ALL ")
    val iterCtes = (1 to iters).map { t =>
      val prev = if (t == 1) "l0" else s"l${t - 1}"
      s"""bm$t AS (
         |  SELECT r.band, r.bucket, min(l.label) AS bmin
         |  FROM bandrows r JOIN $prev l ON r._did = l._did
         |  GROUP BY r.band, r.bucket),
         |l$t AS (
         |  SELECT r._did, min(m.bmin) AS label
         |  FROM bandrows r JOIN bm$t m ON r.band = m.band AND r.bucket = m.bucket
         |  GROUP BY r._did)""".stripMargin
    }.mkString(",\n")
    s"""WITH docs AS (
       |  SELECT _did, hs FROM
       |    (SELECT $id AS _did, ${duckShingleHashes(txt, k, g)} AS hs FROM $tbl)
       |  WHERE len(hs) > 0),
       |bandrows AS ($bandSelects),
       |l0 AS (SELECT DISTINCT _did, _did AS label FROM bandrows),
       |$iterCtes
       |SELECT _did AS doc_id, label AS component_id FROM l$iters""".stripMargin
  }

  def minhashLshPairsSql(table: String, id: String, text: String,
                         bands: Int = 4, rowsPerBand: Int = 4, k: Int = 3,
                         threshold: Double = 0.5,
                         wordGrain: String = "ws"): String = {
    val (tbl, txt, g) = grainSource(table, id, text, wordGrain)
    val bandSelects = (0 until bands).map { b =>
      val sig = (0 until rowsPerBand).map { r =>
        val i = b * rowsPerBand + r
        s"list_min(list_transform(hs, h -> ${universal(i, "h")}))"
      }.mkString("[", ", ", "]::BIGINT[]")
      s"SELECT _did, $b AS band, ${duckFoldHashes(sig)} AS bucket FROM docs"
    }.mkString(" UNION ALL ")
    s"""WITH docs AS (
       |  SELECT _did, hs FROM
       |    (SELECT $id AS _did, ${duckShingleHashes(txt, k, g)} AS hs FROM $tbl)
       |  WHERE len(hs) > 0),
       |bandrows AS ($bandSelects),
       |cand AS (
       |  SELECT DISTINCT a._did AS a_id, b._did AS b_id
       |  FROM bandrows a JOIN bandrows b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a._did < b._did),
       |scored AS (
       |  SELECT a_id, b_id, len(list_intersect(da.hs, db.hs)) AS c,
       |         len(da.hs) AS na, len(db.hs) AS nb
       |  FROM cand JOIN docs da ON cand.a_id = da._did
       |            JOIN docs db ON cand.b_id = db._did)
       |SELECT a_id, b_id, round(c * 1.0 / (na + nb - c), 6) AS jaccard
       |FROM scored WHERE round(c * 1.0 / (na + nb - c), 6) >= $threshold""".stripMargin
  }

  /** 30-bit SimHash over word hashes (bit j set iff the +1/-1 vote of all
    * token hashes' j-th bits is positive). Linear scan, zero shuffle.
    */
  def simhash(df: DataFrame, id: String, text: String, bits: Int = 30,
              wordGrain: String = "ws"): DataFrame = {
    require(wordGrain == "ws" || wordGrain == "cjk-auto",
      s"wordGrain must be 'ws' or 'cjk-auto', got $wordGrain")
    // 'cjk-auto': votes come from ROUTED tokens — on the ws grain an
    // unsegmented doc is ONE token, so its simhash is the hash of that
    // whole-document word and a one-codepoint edit flips ~half the
    // bits: the hamming keeper can never see unsegmented near-dups
    val toks = if (wordGrain == "cjk-auto") s"graft_routed_tokens($text, true)"
               else s"split($text, ' ')"
    val fdf = graft.functions.VectorFunctions.attach(df)
    Par.floor(fdf, col(id))
      .select(col(id), expr(s"graft_simhash($toks, $bits)").as("simhash"))
  }

  /** Declarative HOF twin of `graft_simhash` (parity baseline): word-hash
    * array bound once via let1, one interpreted fold per bit.
    */
  def hofSimhashExpr(text: String, bits: Int = 30): String =
    PortableHash.let1("__hs", sparkHashArrayOf(s"split($text, ' ')"),
      s"aggregate(transform(sequence(0, ${bits - 1}), j -> IF(" +
        s"aggregate(__hs, cast(0 AS BIGINT), (acc, h) -> acc + ((h div shiftleft(cast(1 AS BIGINT), j)) % 2) * 2 - 1) > 0, " +
        s"shiftleft(cast(1 AS BIGINT), j), cast(0 AS BIGINT))), cast(0 AS BIGINT), (a, b) -> a + b)")

  def simhashSql(table: String, id: String, text: String, bits: Int = 30,
                 wordGrain: String = "ws"): String = {
    val toks = if (requireGrain(wordGrain) == "cjk-auto")
                 s"(${TextAnalysis.routedTokensDuck(text, keepEmpties = true)})"
               else s"string_split($text, ' ')"
    val hashes = s"list_transform($toks, s -> ${duckStringHash("s")})"
    s"""SELECT $id, list_reduce(list_prepend(0::BIGINT,
       |  list_transform(generate_series(0, ${bits - 1}), j -> CASE WHEN
       |    list_reduce(list_prepend(0::BIGINT, $hashes), (acc, h) -> acc + ((h // (1::BIGINT << j)) % 2) * 2 - 1) > 0
       |    THEN (1::BIGINT << j) ELSE 0::BIGINT END)), (a, b) -> a + b) AS simhash
       |FROM $table""".stripMargin
  }

  /** Duplication census — the REPORT a curation run publishes before
    * acting on dedup (what fraction of the crawl is duplicated, at what
    * clique sizes, and how many docs dedup would remove): near-dup
    * components ([[minhashDedupComponents]]) roll up to per-component
    * sizes, sizes roll up to a histogram row per cluster size with the
    * doc mass and the redundant mass (`n_docs − n_clusters` = docs a
    * keeper pass would drop). Scale shape: the component labeling is
    * the whole cost (probed ~14s / 1M docs); the census itself is two
    * keyed partial aggs whose second input is component-count-sized.
    * Docs below the k-word shingle floor have no shingles and are
    * outside the census, identically on both engines (the components
    * convention).
    */
  def dedupCensus(df: DataFrame, id: String, text: String,
                  bands: Int = 4, rowsPerBand: Int = 4,
                  k: Int = 3, iters: Int = 3,
                  wordGrain: String = "ws"): DataFrame =
    minhashDedupComponents(df, id, text, bands, rowsPerBand, k, iters, wordGrain)
      .groupBy(col("component_id")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"))
      .withColumn("n_redundant", col("n_docs") - col("n_clusters"))

  /** DuckDB twin of [[dedupCensus]]. */
  def dedupCensusSql(table: String, id: String, text: String,
                     bands: Int = 4, rowsPerBand: Int = 4,
                     k: Int = 3, iters: Int = 3,
                     wordGrain: String = "ws"): String =
    s"""WITH comp AS (
       |${minhashDedupComponentsSql(table, id, text, bands, rowsPerBand, k, iters, wordGrain)}),
       |sizes AS (
       |  SELECT component_id, count(*)::BIGINT AS cluster_size
       |  FROM comp GROUP BY 1)
       |SELECT cluster_size, count(*)::BIGINT AS n_clusters,
       |  sum(cluster_size)::BIGINT AS n_docs,
       |  (sum(cluster_size) - count(*))::BIGINT AS n_redundant
       |FROM sizes GROUP BY 1""".stripMargin

  /** Generic hamming-radius keeper over any ≤ 64-bit sketch column —
    * the shared engine behind SimHash text dedup and perceptual-hash
    * image dedup ([[graft.ops.Multimodal.dedupPhashKeepers]] delegates
    * here): exact-equal sketches collapse to their min-id REPRESENTATIVE
    * first (one linear groupBy — the boilerplate/blank-content mass, and
    * the reason the raw-row banding form dies at scale: k copies of one
    * sketch put k rows in every band bucket → Θ(k²) candidates), then
    * LSH banding over DISTINCT sketch values (`bands` equal slices of
    * `bits`; ≥ 1 shared band w.h.p. at the radius — guaranteed for
    * hamming < bands by pigeonhole) proposes representative pairs,
    * `bit_count(xor)` verifies, and any row whose sketch is dominated by
    * (or non-minimal within) its neighborhood drops. Rep collapse
    * preserves pairwise keeper semantics exactly (spec-pinned against
    * brute force). Exchanges carry (sketch64, id) pairs only.
    *
    * `groupCols` scopes the whole neighborhood structure: rows are
    * candidates ONLY within equal group values (e.g. audio fingerprints
    * of different frame counts live in disjoint bit spaces — comparing
    * them bitwise would be meaningless), threaded through rep collapse,
    * banding, and the verify join alike.
    */
  def hammingKeepers(hashed: DataFrame, id: String, hash: String,
                     bits: Int, bands: Int, maxHamming: Int,
                     groupCols: Seq[String] = Nil): DataFrame = {
    require(bands > 0 && bits % bands == 0 && bits <= 64,
      s"bits=$bits must split evenly into bands=$bands (<= 64)")
    val bb = bits / bands
    val gc = groupCols.map(col)
    val keyCols = groupCols :+ hash
    val p = Caches.lease(hashed.select((col(id) +: gc :+ col(hash)): _*))
    val reps = Caches.lease(
      p.groupBy(keyCols.map(col): _*).agg(min(col(id)).as("__rep")))
    val bandRows = reps.select((col("__rep") +: gc :+ col(hash) :+
        explode(expr(s"sequence(0, ${bands - 1})")).as("__b")): _*)
      .withColumn("__v",
        expr(s"($hash div shiftleft(cast(1 AS BIGINT), __b * $bb)) % ${1L << bb}"))
    val a = bandRows.select((col("__rep").as("__aid") +:
      col(hash).as("__ah") +: col("__b") +: col("__v") +: gc): _*)
    val b = bandRows.select((col("__rep").as("__bid") +:
      col(hash).as("__bh") +: col("__b") +: col("__v") +: gc): _*)
    val dominated = a.join(b, Seq("__b", "__v") ++ groupCols)
      .where(col("__aid") < col("__bid") &&
        expr(s"bit_count(__ah ^ __bh) <= $maxHamming"))
      .select((col("__bh").as(hash) +: gc): _*).distinct()
    p.join(reps, keyCols)
      .where(col(id) === col("__rep"))
      .join(dominated, keyCols, "left_anti")
      .select((col(id) +: gc :+ col(hash)): _*)
  }

  /** DuckDB twin of [[hammingKeepers]]: `hashedSql` is a derived table
    * emitting ($id, $hash).
    */
  def hammingKeepersSql(hashedSql: String, id: String, hash: String,
                        bits: Int, bands: Int, maxHamming: Int,
                        groupCols: Seq[String] = Nil): String = {
    val bb = bits / bands
    val gsel = groupCols.map(g => s"$g, ").mkString
    val gkey = groupCols.map(g => s"$g, ").mkString
    val gjoin = groupCols.map(g => s" AND lo.$g = hi.$g").mkString
    val gusing = (groupCols :+ hash).mkString(", ")
    val gdom = groupCols.map(g => s"hi.$g, ").mkString
    s"""WITH p AS (SELECT * FROM ($hashedSql)),
       |reps AS (SELECT $gkey$hash, min($id) AS rep_id FROM p GROUP BY ${(1 to groupCols.size + 1).mkString(", ")}),
       |bands AS (
       |  SELECT rep_id, $gsel$hash, b, ($hash // (1::BIGINT << (b * $bb))) % ${1L << bb} AS v
       |  FROM reps, (SELECT unnest(generate_series(0, ${bands - 1})) AS b)),
       |dominated AS (
       |  SELECT DISTINCT $gdom hi.$hash
       |  FROM bands lo JOIN bands hi ON lo.b = hi.b AND lo.v = hi.v$gjoin
       |    AND lo.rep_id < hi.rep_id
       |    AND bit_count(xor(lo.$hash, hi.$hash)) <= $maxHamming)
       |SELECT p.$id, $gsel p.$hash
       |FROM p JOIN reps USING ($gusing)
       |WHERE p.$id = reps.rep_id
       |  AND NOT EXISTS (SELECT 1 FROM dominated d
       |    WHERE d.$hash = p.$hash${groupCols.map(g => s" AND d.$g = p.$g").mkString})""".stripMargin
  }

  /** SimHash near-dup KEEPER — the acting twin of [[simhash]]: band the
    * 30-bit sketches (3 × 10-bit bands) through [[hammingKeepers]] and
    * keep the lowest id of every hamming ≤ `maxHamming` neighborhood.
    * The text-side sibling of the image pipeline's
    * [[graft.ops.Multimodal.dedupPhashKeepers]].
    */
  def simhashKeepers(df: DataFrame, id: String, text: String,
                     bits: Int = 30, maxHamming: Int = 2,
                     wordGrain: String = "ws"): DataFrame =
    hammingKeepers(simhash(df, id, text, bits, wordGrain), id, "simhash",
      bits = bits, bands = 3, maxHamming = maxHamming)

  /** DuckDB twin of [[simhashKeepers]]. */
  def simhashKeepersSql(table: String, id: String, text: String,
                        bits: Int = 30, maxHamming: Int = 2,
                        wordGrain: String = "ws"): String =
    hammingKeepersSql(simhashSql(table, id, text, bits, wordGrain), id, "simhash",
      bits = bits, bands = 3, maxHamming = maxHamming)

  /** All-pairs word-k-gram Jaccard above a threshold — the exact near-dup
    * ground truth (O(n²); the verifier/oracle path, not the scale path).
    * Shingle-hash arrays are computed ONCE per doc before the pair join,
    * so the quadratic stage does array intersects only.
    */
  def ngramJaccardPairs(df: DataFrame, id: String, text: String,
                        k: Int = 3, threshold: Double = 0.5,
                        wordGrain: String = "ws"): DataFrame = {
    // docs below k words are excluded on BOTH engines: an empty-vs-empty
    // pair would divide 0/0 — NaN, which Spark excludes at >= t but
    // DuckDB sorts above every number and would include
    val g = Par.floor(graft.functions.VectorFunctions.attach(df)
        .where(expr(shingleFloorPred(text, k, wordGrain))), col(id))
      .select(col(id).as("gid"),
        expr(s"sort_array(${nativeShingleHashes(text, k, wordGrain)})").as("g"))
    val a = g.select(col("gid").as("a_id"), col("g").as("ga"))
    val b = g.select(col("gid").as("b_id"), col("g").as("gb"))
    a.crossJoin(b).where(col("a_id") < col("b_id") &&
      // lossless length prefilter: |A∩B| ≤ min(|A|,|B|), so J ≥ t forces
      // max(|A|,|B|) ≤ min(|A|,|B|)/t — two integer compares prune the
      // pair before the set intersect ever runs, results unchanged
      expr(s"size(ga) * $threshold <= size(gb)") &&
      expr(s"size(gb) * $threshold <= size(ga)"))
      .withColumn("c", expr("graft_intersect_count(ga, gb)"))
      .withColumn("jaccard",
        round(col("c") * 1.0 / (expr("size(ga)") + expr("size(gb)") - col("c")), 6))
      .where(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  def ngramJaccardPairsSql(table: String, id: String, text: String,
                           k: Int = 3, threshold: Double = 0.5,
                           wordGrain: String = "ws"): String = {
    val (tbl, txt, g) = grainSource(table, id, text, wordGrain)
    s"""WITH d AS (SELECT $id, ${duckShingleHashes(txt, k, g)} AS g FROM $tbl
       |            WHERE ${duckShingleFloorPred(txt, k, g)}),
       |p AS (SELECT a.$id AS a_id, b.$id AS b_id,
       |        len(list_intersect(a.g, b.g)) AS c, len(a.g) AS na, len(b.g) AS nb
       |      FROM d a JOIN d b ON a.$id < b.$id)
       |SELECT a_id, b_id, round(c * 1.0 / (na + nb - c), 6) AS jaccard
       |FROM p WHERE round(c * 1.0 / (na + nb - c), 6) >= $threshold""".stripMargin
  }

  /** Incremental snapshot dedup: the new-crawl documents whose content
    * digest does NOT appear in the accumulated prior corpus — the
    * ingest-time form of [[exactDedup]] (each snapshot dedups against
    * everything already kept, instead of re-deduping the union).
    *
    * Scale shape: the prior corpus is the HUGE side, but it participates
    * only as a digest set — and through [[BloomJoin.antiJoin]] even that
    * set crosses the cluster as a sketch: new-snapshot rows that the
    * sketch clears (the vast majority — re-crawl rates are low) exit in
    * their scan with no join; only maybe-duplicates take the exact
    * residual anti-join. The sketch stays broadcastable to ~1B prior
    * digests (~1.2 GB at 1% fpp); past that, production keeps a compact
    * digest TABLE as the accumulated state (8-byte digests, no text) and
    * this op's residual join runs against it partitioned — the operator
    * takes the digest frame, so that is the caller's storage choice.
    */
  def incrementalNew(newSnap: DataFrame, prior: DataFrame,
                     id: String, text: String,
                     expectedPrior: Long = 1 << 20,
                     fpp: Double = 0.01): DataFrame = {
    // both digest frames are consumed twice downstream (the bloom-join
    // reads `big` on its clean and maybe branches, `small` for the
    // sketch and the exact join) — lease them so the upstream text
    // hashing runs once per side (r20; narrow id+digest rows, the
    // hammingKeepers class; antiJoin documents "an already-materialized
    // big pays nothing extra" as the caller's job).
    // Cached-bytes bound at the 100 TB reference point: one (id, md5)
    // row ≈ 48 B per DOCUMENT (not per token) — ~5 TB cluster-wide for
    // a 100B-doc corpus, MEMORY_AND_DISK, vs re-hashing 100 TB of text
    // per consumer; the corpus-grain stretch of the metadata-lease rule
    // is deliberate and bounded by the doc count, never the text.
    val newH = Caches.lease(newSnap.select(col(id), md5(col(text)).as("h")))
    val priorH = Caches.lease(prior.select(md5(col(text)).as("prior_h")))
    BloomJoin.antiJoin(newH, priorH, "h", "prior_h", expectedPrior, fpp)
  }

  /** Streaming twin of [[incrementalNew]] — the live ingest guard: each
    * arriving document is (1) probed against the prior corpus's digest
    * sketch (stateless map — definite non-duplicates bypass the static
    * join entirely), (2) maybe-duplicates take the stream-static LEFT
    * ANTI join that clears sketch false positives exactly, and (3) the
    * union dedups against OTHER IN-FLIGHT arrivals with watermark-bounded
    * state. Together: nothing already in the corpus and nothing arriving
    * twice gets through, with state = one digest row per in-window doc
    * and per-batch join work = only the maybe-duplicate sliver.
    */
  def incrementalNewStreaming(newStream: DataFrame, prior: DataFrame,
                              id: String, text: String,
                              eventTime: String, delay: String,
                              expectedPrior: Long = 1 << 20,
                              fpp: Double = 0.01): DataFrame = {
    val priorH = prior.select(md5(col(text)).as("prior_h"))
    val probe = BloomJoin.containsSql(
      BloomJoin.sketchOf(priorH, "prior_h", expectedPrior, fpp), "h")
    val withH = graft.functions.VectorFunctions.attach(newStream)
      .select(col(id), col(eventTime), md5(col(text)).as("h"))
    val clean = withH.where(!coalesce(expr(probe), lit(false)))
    val maybe = withH.where(coalesce(expr(probe), lit(false)))
      .join(priorH, col("h") === col("prior_h"), "left_anti")
    clean.unionAll(maybe)
      .withWatermark(eventTime, delay)
      .dropDuplicatesWithinWatermark("h")
      .select(col(id), col("h"))
  }

  def incrementalNewSql(newRel: String, priorRel: String,
                        id: String, text: String): String =
    s"""SELECT n.$id, md5(n.$text) AS h FROM $newRel n
       |WHERE NOT EXISTS (SELECT 1 FROM $priorRel o
       |                  WHERE md5(o.$text) = md5(n.$text))""".stripMargin

  /** LSH band-bucket table of a corpus — the PERSISTABLE near-dup index
    * state: (band, bucket, _did) rows, three longs per band per doc, no
    * text. This is what an accumulating pipeline keeps between crawls
    * (the near-dup analog of [[incrementalNew]]'s digest set): writing
    * it bucketed/partitioned by (band, bucket) makes the daily
    * incremental join shuffle only the new crawl's rows.
    */
  /** CONTRACT (ENFORCED): a persisted band table is grain-specific — the
    * incremental join only matches when prior and new sides were built
    * with the SAME `wordGrain` (dominated docs' shingle hashes differ
    * entirely between grains, so a mismatch silently reports every
    * re-crawl as new). The grain therefore travels WITH the artifact: a
    * constant `grain` column (one dictionary-encoded value — free in
    * parquet), and every [[incrementalNearDup]] /
    * [[incrementalNearDupStreaming]] probe asserts it matches before
    * joining ([[requireBandGrain]] — a one-row peek, not a scan).
    */
  def bandTable(df: DataFrame, id: String, text: String,
                bands: Int = 4, rowsPerBand: Int = 4, k: Int = 3,
                wordGrain: String = "ws"): DataFrame = {
    val fdf = graft.functions.VectorFunctions.attach(df)
    Par.floor(fdf.where(expr(shingleFloorPred(text, k, wordGrain))), col(id))
      .select(col(id).as("_did"),
        expr(nativeShingleHashes(text, k, wordGrain)).as("hs"))
      .select(col("_did"),
        posexplode(expr(s"graft_band_buckets(hs, $bands, $rowsPerBand)")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .withColumn("grain", lit(requireGrain(wordGrain)))
  }

  /** Fail-fast check that a persisted band table was built under
    * `wordGrain` — a missing or mismatched `grain` marker throws with
    * the remedy instead of silently reporting every re-crawl as new.
    * Cost: a schema check + `head(1)` (one row off the first file;
    * band tables are constant-grain by construction).
    */
  private def requireBandGrain(priorBands: DataFrame, wordGrain: String,
                               strict: Boolean = false): Unit = {
    require(priorBands.columns.contains("grain"),
      "band table has no 'grain' marker column — rebuild it with " +
        "Dedup.bandTable (grain-stamped) before probing incrementally")
    // The head(1) peek assumes a CONSTANT-grain table (true of any
    // single bandTable output by construction). A priorBands formed by
    // UNIONING band tables built under different grains passes the
    // one-row peek while its mismatched rows silently report every
    // re-crawl as new — for multi-file prior tables pass
    // `strictGrain = true`, which pays one full scan of the (id-and-
    // longs-only) band table to assert the grain is single-valued.
    if (strict) {
      val r = priorBands
        .agg(min(col("grain")).as("lo"), max(col("grain")).as("hi")).head()
      require(r.getString(0) == r.getString(1),
        s"band table mixes grains '${r.getString(0)}'..'${r.getString(1)}' " +
          "— it was formed by unioning band tables built under different " +
          "grains; rebuild the halves under one grain before probing")
    }
    priorBands.select(col("grain")).head(1).foreach { r =>
      val g = r.getString(0)
      require(g == wordGrain,
        s"band table was built under wordGrain='$g' but the probe uses " +
          s"'$wordGrain' — shingle hashes differ entirely between grains " +
          "(every re-crawl row would silently report as new); rebuild the " +
          "band table or probe with the matching grain")
    }
  }

  /** Incremental NEAR-dup — the daily-crawl form of
    * [[minhashDedupKeepers]]: each new-snapshot doc is checked against
    * the PRIOR corpus's band-bucket table ([[bandTable]], typically
    * persisted once and appended per crawl) instead of re-banding the
    * union. A new doc sharing ANY band bucket with a prior doc is a
    * near-dup of that corpus (the banding's own threshold semantics —
    * the same rule the keeper uses); `matched_prior` reports the lowest
    * colliding prior id, NULL ⇒ keep. Docs too short to shingle carry
    * no bands and keep (the LEFT join preserves them).
    *
    * Scale shape: the new crawl pays one scan to band rows; the join is
    * keyed on (band, bucket) against the prior table — with the prior
    * side stored bucketed on that key, only the (small) new side
    * shuffles; the per-doc min is one keyed partial agg.
    */
  def incrementalNearDup(newSnap: DataFrame, priorBands: DataFrame,
                         id: String, text: String,
                         bands: Int = 4, rowsPerBand: Int = 4,
                         k: Int = 3, wordGrain: String = "ws",
                         strictGrain: Boolean = false): DataFrame = {
    requireBandGrain(priorBands, wordGrain, strictGrain)
    val newBands = bandTable(newSnap, id, text, bands, rowsPerBand, k, wordGrain)
    val matches = newBands
      .join(priorBands.select(col("band"), col("bucket"),
        col("_did").as("prior_id")), Seq("band", "bucket"))
      .groupBy(col("_did")).agg(min(col("prior_id")).as("matched_prior"))
    newSnap.select(col(id))
      .join(matches, col(id) === col("_did"), "left_outer")
      .select(col(id), col("matched_prior"),
        col("matched_prior").isNull.as("keep"))
  }

  /** Streaming twin of [[incrementalNearDup]] — the live-crawl NEAR-dup
    * guard (the [[incrementalNewStreaming]] / cleanDocsStreaming
    * pattern one level up): the prior corpus's (band, bucket) pairs
    * fold to single longs — `(bucket << ceil(log2 bands)) | band`,
    * identical arithmetic on the probe side; the dropped top bucket
    * bits can only create a conservative extra match, never a miss —
    * collected once into a sorted literal array, and each arriving doc
    * is one stateless projection: band its shingles, fold, two-pointer
    * probe. No state store, no stream-static join; checkpoint-free.
    * Sub-k-word docs carry no bands and pass. Literal-array reach is
    * the same broadcast bound as the decontamination guard — beyond it,
    * fold the keys into a bloom sketch exactly as
    * [[incrementalNewStreaming]] does for digests.
    */
  def incrementalNearDupStreaming(newStream: DataFrame, priorBands: DataFrame,
                                  id: String, text: String,
                                  bands: Int = 4, rowsPerBand: Int = 4,
                                  k: Int = 3,
                                  wordGrain: String = "ws",
                                  strictGrain: Boolean = false): DataFrame = {
    requireBandGrain(priorBands, wordGrain, strictGrain)
    val shift = 32 - Integer.numberOfLeadingZeros(math.max(bands - 1, 1))
    val priorKeys: Array[Long] = priorBands
      .select(expr(s"shiftleft(bucket, $shift) | band").as("bk"))
      .distinct().orderBy(col("bk")).collect().map(_.getLong(0))
    graft.functions.VectorFunctions.attach(newStream)
      .withColumn("__bks", expr(
        s"IF(${shingleFloorPred(text, k, wordGrain)}, " +
          s"sort_array(transform(graft_band_buckets(${nativeShingleHashes(text, k, wordGrain)}, $bands, $rowsPerBand), " +
          s"(x, i) -> shiftleft(x, $shift) | i)), CAST(array() AS ARRAY<BIGINT>))"))
      .withColumn("__prior", typedLit(priorKeys))
      .select(col(id),
        expr("graft_intersect_count(__bks, __prior) = 0").as("keep"))
  }

  /** DuckDB twin of [[incrementalNearDup]] — prior and new band tables
    * rebuilt inline from their predicates over the same relation.
    */
  def incrementalNearDupSql(table: String, newPred: String,
                            priorPred: String, id: String, text: String,
                            bands: Int = 4, rowsPerBand: Int = 4,
                            k: Int = 3, wordGrain: String = "ws"): String = {
    def bandSelects(src: String) = (0 until bands).map { b =>
      val sig = (0 until rowsPerBand).map { r =>
        val i = b * rowsPerBand + r
        s"list_min(list_transform(hs, h -> ${universal(i, "h")}))"
      }.mkString("[", ", ", "]::BIGINT[]")
      s"SELECT _did, $b AS band, ${duckFoldHashes(sig)} AS bucket FROM $src"
    }.mkString(" UNION ALL ")
    s"""WITH docs_new AS (
       |  SELECT _did, hs FROM
       |    (SELECT $id AS _did, ${duckShingleHashes(text, k, wordGrain)} AS hs
       |     FROM $table WHERE $newPred)
       |  WHERE len(hs) > 0),
       |docs_prior AS (
       |  SELECT _did, hs FROM
       |    (SELECT $id AS _did, ${duckShingleHashes(text, k, wordGrain)} AS hs
       |     FROM $table WHERE $priorPred)
       |  WHERE len(hs) > 0),
       |nb AS (${bandSelects("docs_new")}),
       |pb AS (${bandSelects("docs_prior")}),
       |m AS (
       |  SELECT nb._did, min(pb._did) AS matched_prior
       |  FROM nb JOIN pb ON nb.band = pb.band AND nb.bucket = pb.bucket
       |  GROUP BY nb._did)
       |SELECT n.$id, m.matched_prior, m.matched_prior IS NULL AS keep
       |FROM (SELECT $id FROM $table WHERE $newPred) n
       |LEFT JOIN m ON n.$id = m._did""".stripMargin
  }

  /** SOFT dedup — down-WEIGHT duplicates instead of dropping them (the
    * published alternative to hard keeper dedup: duplicate-aware
    * training reweighting, e.g. SoftDeDup — keeps the information while
    * removing the over-representation). Every doc gets
    * `weight = 1 / |its near-dup component|`, so each duplicate CLUSTER
    * contributes exactly one document's worth of sampling mass no
    * matter how many copies the crawl found. Docs too short to shingle
    * (< k words — outside the component labeling by construction) are
    * their own singleton: weight 1.
    *
    * Scale shape: the component labeling ([[minhashDedupComponents]])
    * dominates and is the linear bucketed mass path; sizes are one
    * keyed partial-agg over (component_id) rows; the join back to the
    * corpus is keyed on the doc id — weights attach without the text
    * column ever shuffling.
    */
  def softDedupWeights(df: DataFrame, id: String, text: String,
                       bands: Int = 4, rowsPerBand: Int = 4,
                       k: Int = 3, iters: Int = 3,
                       wordGrain: String = "ws"): DataFrame = {
    // comp is consumed twice (sizes + the corpus join); without the
    // lease the whole iterated label propagation re-runs per reference
    // (r20 optimization — the frame is doc-grain, two longs per row)
    val comp = Caches.lease(
      minhashDedupComponents(df, id, text, bands, rowsPerBand, k, iters,
        wordGrain)
      .select(col("doc_id").as("__cid"), col("component_id")))
    val sizes = comp.groupBy(col("component_id"))
      .agg(count(lit(1)).as("dup_count"))
    df.select(col(id))
      .join(comp, col(id) === col("__cid"), "left")
      .join(sizes, Seq("component_id"), "left")
      .select(col(id),
        coalesce(col("component_id"), col(id)).as("component_id"),
        coalesce(col("dup_count"), lit(1L)).as("dup_count"),
        round(lit(1.0) / coalesce(col("dup_count"), lit(1L)).cast("double"), 6)
          .as("weight"))
  }

  /** DuckDB twin of [[softDedupWeights]]. */
  def softDedupWeightsSql(table: String, id: String, text: String,
                          bands: Int = 4, rowsPerBand: Int = 4,
                          k: Int = 3, iters: Int = 3,
                          wordGrain: String = "ws"): String =
    s"""WITH comp AS (
       |${minhashDedupComponentsSql(table, id, text, bands, rowsPerBand, k, iters, wordGrain)}),
       |sizes AS (
       |  SELECT component_id, count(*)::BIGINT AS dup_count
       |  FROM comp GROUP BY 1)
       |SELECT t.$id,
       |  coalesce(c.component_id, t.$id) AS component_id,
       |  coalesce(s.dup_count, 1)::BIGINT AS dup_count,
       |  round(1.0 / coalesce(s.dup_count, 1), 6) AS weight
       |FROM $table t
       |LEFT JOIN comp c ON t.$id = c.doc_id
       |LEFT JOIN sizes s ON c.component_id = s.component_id""".stripMargin

  /** PASSAGE-grain dedup report — exact dedup one level below the
    * document: over [[TextAnalysis.chunkDocuments]]' fixed token
    * windows, a chunk is a DUPLICATE iff its content hash already
    * occurs at a lexicographically smaller (doc_id, chunk_idx) — the
    * engine-wide lowest-key keeper rule at chunk grain. Per doc:
    * chunks, duplicate chunks, integer-milli redundancy. This is the
    * boilerplate census document-level exact dedup cannot see (two
    * distinct pages sharing a 32-token header are document-unique but
    * passage-redundant); the window alignment caveat is inherent to
    * fixed-window chunking (a shared passage at different token
    * offsets does not collide — dedupSpans is the alignment-free
    * heavy twin).
    *
    * Scale shape: the chunk explode (bounded fan-out) runs ONCE — the
    * hash-grain projection (doc_id, chunk_idx, chunk_hash; n_tokens
    * dropped, text never materialized past the hash) is leased, since
    * both the keeper agg and the flag join consume it; then one
    * chunk_hash-keyed partial agg for (keeper, occurrences), one keyed
    * join back (hash-keyed, never broadcast — the hash table is
    * corpus-sized), one doc-keyed agg. The oracle replays the same
    * rule with a row_number window — free on its side, the keyed
    * shapes bind this side.
    */
  def passageDedupReport(df: DataFrame, id: String, text: String,
                         size: Int = 32, stride: Int = 32): DataFrame = {
    val ch = Caches.lease(
      TextAnalysis.chunkDocuments(df, id, text, size, stride)
        .select(col("doc_id"), col("chunk_idx"), col("chunk_hash")))
    val groups = ch.groupBy(col("chunk_hash"))
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("keeper"),
        count(lit(1)).as("n_occ"))
    ch.join(groups, Seq("chunk_hash"))
      .select(col("doc_id"),
        (col("n_occ") > 1 &&
          struct(col("doc_id"), col("chunk_idx")) =!= col("keeper")).as("is_dup"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_milli",
        expr("CAST(1000 * n_dup_chunks div n_chunks AS BIGINT)"))
  }

  /** DuckDB twin of [[passageDedupReport]]. */
  def passageDedupReportSql(table: String, id: String, text: String,
                            size: Int = 32, stride: Int = 32): String =
    s"""WITH ch AS (${TextAnalysis.chunkDocumentsSql(table, id, text, size, stride)}),
       |r AS (SELECT doc_id, chunk_idx,
       |        row_number() OVER (PARTITION BY chunk_hash
       |                           ORDER BY doc_id, chunk_idx) AS rn
       |      FROM ch)
       |SELECT doc_id, count(*)::BIGINT AS n_chunks,
       |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       |  ((1000 * sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)) // count(*))::BIGINT AS dup_milli
       |FROM r GROUP BY doc_id""".stripMargin
}
