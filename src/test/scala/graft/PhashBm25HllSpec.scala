package graft

import graft.ops.{Multimodal, Stats, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-9 additions: perceptual-hash image dedup, BM25 keyword
  * retrieval, and the HyperLogLog register sketch.
  */
class PhashBm25HllSpec extends SparkSpec {
  import spark.implicits._

  // ---------------- perceptual hash (dHash) ----------------

  test("dhash: brightness-shifted group members stay within the hamming radius") {
    // ids 0..3 share base image 0 at deltas 0,3,6,9; id 4 starts base 1
    def h(id: Long): Long =
      Multimodal.ImageCodec.dhash(
        Multimodal.ImageCodec.decode(Multimodal.ImageCodec.renderGroupPng(id)))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val inGroup = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield ham(h(a), h(b))
    assert(inGroup.forall(_ <= 8),
      s"group members within 8 hamming bits (clamp-only flips): $inGroup")
    // different bases are different pseudo-random images: far apart
    val cross = for (a <- 0L to 3L) yield ham(h(a), h(4L))
    assert(cross.forall(_ > 8), s"cross-base images outside the radius: $cross")
  }

  test("dhash is invariant to a global non-clamping brightness shift") {
    // A +delta shift that never clamps preserves every gradient comparison.
    val w = 9; val h = 8
    def img(delta: Int) = {
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = (x * 17 + y * 29) % 200 + delta // <= 229: never clamps
        im.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      im
    }
    assert(Multimodal.ImageCodec.dhash(img(0)) === Multimodal.ImageCodec.dhash(img(30)))
  }

  test("dedupPhashKeepers: one survivor per planted group, lowest id") {
    val docs = spark.range(20).select($"id".as("doc_id"))
    val phashed = Multimodal.perceptualHash(
      Multimodal.attachGroupedPngPayload(docs, "doc_id")).toDF()
    val kept = Multimodal.dedupPhashKeepers(phashed)
      .select($"media_id").as[Long].collect().sorted.toSeq
    // 20 ids = 5 groups of 4; keeper rule keeps the lowest id of each
    assert(kept === Seq(0L, 4L, 8L, 12L, 16L),
      s"one lowest-id survivor per brightness group: $kept")
    graft.ops.Caches.releaseAll()
  }

  test("dedupPhashKeepers: representative collapse = brute-force pairwise keeper rule") {
    // Crafted hashes: an exact-dup cluster (boilerplate mass), a near
    // pair at hamming 3 (guaranteed banded: 3 bits < 4 bands), chained
    // near-dups, and isolated hashes differing in every band.
    val h0 = 0x1111222233334444L
    val rows = Seq(
      10L -> h0, 11L -> h0, 12L -> h0,          // exact cluster: keep 10
      20L -> (h0 ^ 7L),                          // ham 3 from h0: dominated by 10
      5L  -> (h0 ^ 0x0070L),                     // ham 3 from h0, LOWER id: 10 dominated!
      30L -> 0x7777000012345678L,                // isolated
      31L -> (0x0123456789abcdeFL & Long.MaxValue) // isolated
    )
    val df = rows.toDF("media_id", "phash")
    val got = Multimodal.dedupPhashKeepers(df)
      .select($"media_id").as[Long].collect().sorted.toSeq
    // brute force over all pairs (every near pair here is within 3 bits,
    // so banding finds exactly what brute force does)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val ids = rows.map(_._1)
    val brute = ids.filter(i => !ids.exists(j =>
      j < i && ham(rows.toMap.apply(i), rows.toMap.apply(j)) <= 8)).sorted
    assert(got === brute, s"got $got, brute-force keeper set $brute")
    assert(got === Seq(5L, 30L, 31L),
      "id 5 dominates the whole h0 neighborhood; isolated hashes survive")
    graft.ops.Caches.releaseAll()
  }

  test("simhashKeepers: exact and near word-bags collapse to the lowest id; distinct docs survive") {
    import graft.ops.Dedup
    val docs = Seq(
      (3L, "the quick brown fox jumps over the lazy dog"),
      (7L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 3
      (9L, "the quick brown fox jumps over the lazy cat"),   // near dup (1 word)
      (20L, "completely different content about spark sql engines entirely")
    ).toDF("doc_id", "text")
    val kept = Dedup.simhashKeepers(docs, "doc_id", "text")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept.contains(3L) && !kept.contains(7L),
      s"exact dup collapses to the lowest id: $kept")
    assert(kept.contains(20L), s"distinct doc survives: $kept")
    // at maxHamming=2 with 3 bands, pigeonhole GUARANTEES a shared band,
    // so the banded keeper must equal brute force over the sketches
    val hs = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val brute = hs.keys.toSeq.filter(i => !hs.keys.exists(j =>
      j < i && java.lang.Long.bitCount(hs(i) ^ hs(j)) <= 2)).sorted
    assert(kept === brute, s"banded = brute force at radius < bands: $kept vs $brute")
    graft.ops.Caches.releaseAll()
  }

  // ---------------- BM25 ----------------

  test("bm25TopK: rare-term density beats common-term padding; ordering sane") {
    val docs = Seq(
      (1L, "rare rare rare x"),                       // short, dense in rare term
      (2L, "common common common common common common common common pad"),
      (3L, "common common x y z"),                    // common only
      (4L, "x y z"),                                  // no query terms
      (5L, "common common x y z")                     // tie with 3 -> id order
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      terms = Seq("rare", "common"), k = 10)
      .select($"doc_id", $"score_milli", $"n_matched")
      .as[(Long, Long, Int)].collect().toSeq
    assert(got.map(_._1) === Seq(1L, 2L, 3L, 5L),
      s"rare-dense first (idf: df=1 vs df=3), zero-score doc 4 dropped, tie by id: $got")
    assert(got.map(_._2) === got.map(_._2).sorted(Ordering[Long].reverse),
      "scores non-increasing")
    assert(got.filter(_._1 >= 3L).forall(_._3 === 1), "common-only docs match one term")
    graft.ops.Caches.releaseAll()
  }

  test("bm25TopK: a term present in every doc gets zero idf weight") {
    // df = N => idf_milli = (1000*(2*0+1)) div (2*N+1) = 0 for N >= 500
    val docs = (1L to 600L).map(i => (i, s"everywhere filler$i"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
      terms = Seq("everywhere"), k = 5).count()
    assert(got === 0L, "all-docs term scores 0 everywhere -> no rows survive")
    graft.ops.Caches.releaseAll()
  }

  test("bm25TopK plan: one documents scan feeds both the meta agg and scoring") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("b"), k = 3)
      .queryExecution.executedPlan.toString
    assert("TakeOrdered".r.findAllMatchIn(plan).nonEmpty,
      s"top-k is TakeOrdered, not a global sort:\n$plan")
    graft.ops.Caches.releaseAll()
  }

  test("hybridTopK: RRF arithmetic exact, ordering total, both legs contribute") {
    val docs = Seq(
      (1L, "dup vector spark"),            // the query itself: strong in both legs
      (2L, "dup dup dup dup"),             // lexical-dense
      (3L, "filler words only here none"), // matches nothing
      (4L, "vector spark vector spark")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.hybridTopK(docs, "doc_id", "text",
      terms = Seq("dup", "vector", "spark"), k = 10, poolK = 10)
      .select($"doc_id", $"r_lex", $"r_vec", $"rrf_milli")
      .as[(Long, Int, Int, Long)].collect().toSeq
    def f(r: Int) = if (r > 0) 1000000L / (60 + r) else 0L
    got.foreach { case (id, rl, rv, rrf) =>
      assert(rrf === f(rl) + f(rv), s"doc $id: RRF must be the exact integer sum")
    }
    assert(got.map(_._4) === got.map(_._4).sorted(Ordering[Long].reverse),
      "fused scores non-increasing")
    val byId = got.map(r => r._1 -> r).toMap
    assert(Set(1L, 2L, 4L).subsetOf(byId.keySet), "term-bearing docs all surface")
    assert(byId(1L)._2 > 0 && byId(1L)._3 > 0,
      "the query-identical doc ranks in BOTH legs")
    assert(!byId.contains(3L) || byId(3L)._2 === 0,
      "no lexical rank for a doc with no query terms")
    graft.ops.Caches.releaseAll()
  }

  test("normalize: NFC composes, ascii lowers, whitespace collapses; variants collapse for dedup") {
    val decomposed = "Café"   // Cafe + combining acute
    val composed = "café"           // café, already NFC + lower
    val docs = Seq(
      (1L, s"  THE  Quick\tBrown\n$decomposed  "),
      (2L, s"the quick brown $composed"),  // same content, different form
      (3L, "unrelated text")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.normalize(docs, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got(1L) === s"the quick brown $composed",
      "NFC + ascii-lower + collapse + trim")
    assert(got(1L) === got(2L),
      "encoding/case/spacing variants collapse to one form -> exact dedup catches them")
    assert(got(3L) === "unrelated text")
    // non-ASCII case deliberately untouched (documented contract)
    val up = TextAnalysis.normalize(
      Seq((1L, "ÉCOLE Straße")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String)].collect().head._2
    assert(up === "École straße",
      s"only ASCII A-Z lowers (S does, É and ß do not); got $up")
  }

  test("sentences: terminal punctuation splits, punctuation stays, no empty sentences") {
    val docs = Seq(
      (1L, "One. Two!  Three? Four"),          // trailing unterminated sentence kept
      (2L, "No terminal punctuation at all"),
      (3L, "Dots... everywhere! Done.")        // run of dots = one boundary
    ).toDF("doc_id", "text")
    val got = TextAnalysis.sentences(docs, "doc_id", "text")
      .as[(Long, Int, String)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(got(1L) === Seq("One.", "Two!", "Three?", "Four"))
    assert(got(2L) === Seq("No terminal punctuation at all"))
    assert(got(3L) === Seq("Dots...", "everywhere!", "Done."))
  }

  // ---------------- HyperLogLog ----------------

  test("hllRegisters: 64 rows, deterministic, merge = sketch of union") {
    val a = (1L to 500L).map(i => s"u$i").toDF("v")
    val b = (400L to 900L).map(i => s"u$i").toDF("v")
    val skA = Stats.hllRegisters(a, "v").as[(Long, Int)].collect().toMap
    val skB = Stats.hllRegisters(b, "v").as[(Long, Int)].collect().toMap
    assert(skA.size === 64 && skB.size === 64)
    val merged = (0L until 64L).map(r => r -> math.max(skA(r), skB(r))).toMap
    val skU = Stats.hllRegisters(a.union(b), "v").as[(Long, Int)].collect().toMap
    assert(merged === skU, "element-wise max of two sketches = sketch of the union")
  }

  test("hllEstimate: within 3 standard errors of the true cardinality") {
    for (n <- Seq(100, 1000, 10000)) {
      val df = (1 to n).map(i => s"item-$i").toDF("v")
      val regs = Stats.hllRegisters(df, "v")
        .orderBy("register").as[(Long, Int)].collect().map(_._2).toSeq
      val est = Stats.hllEstimate(regs)
      val se = 1.04 / math.sqrt(64) // ~13%
      assert(math.abs(est - n) <= 3 * se * n,
        s"n=$n est=$est outside 3 standard errors")
    }
  }

  test("hllRegisters: duplicates do not move the sketch") {
    val once = (1 to 200).map(i => s"k$i").toDF("v")
    val dup = (once.collect().map(_.getString(0)) ++
      (1 to 200).map(i => s"k$i")).toSeq.toDF("v")
    assert(Stats.hllRegisters(once, "v").collect().toSet ===
      Stats.hllRegisters(dup, "v").collect().toSet)
  }

  test("hllRegisters plan: partial aggregation before the exchange") {
    val df = (1 to 100).map(i => s"v$i").toDF("v")
    val plan = Stats.hllRegisters(df, "v").queryExecution.executedPlan.toString
    assert("partial_max|HashAggregate".r.findAllMatchIn(plan).nonEmpty,
      s"map-side combine collapses partitions to <= 64 rows:\n$plan")
  }

  test("hllRegistersByKey: per-key sketch equals the global sketch of that key's rows") {
    val df = Seq.tabulate(300)(i => (s"t${i % 3}", s"u${i % 50}"))
      .toDF("k", "u")
    val byKey = Stats.hllRegistersByKey(df, "k", "u")
      .as[(String, Long, Int)].collect()
      .groupBy(_._1).map { case (k, rs) => k -> rs.map(r => r._2 -> r._3).toMap }
    val solo = Stats.hllRegisters(df.where($"k" === "t1"), "u")
      .as[(Long, Int)].collect().toMap
    assert(byKey("t1") === solo, "keyed sketch = global sketch of the slice")
    assert(byKey.keySet === Set("t0", "t1", "t2"))
    assert(byKey.values.forall(_.size === 64), "zero-filled 64-register spine per key")
    graft.ops.Caches.releaseAll()
  }

  // ---------------- count-min sketch ----------------

  test("cmsCounters: exact shape, estimates over-count but bound heavy hitters") {
    // 500 of 'hot', 5 each of 40 cold keys
    val rows = Seq.fill(500)("hot") ++ (1 to 40).flatMap(i => Seq.fill(5)(s"cold$i"))
    val df = rows.toDF("v")
    val counters = Stats.cmsCounters(df, "v")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(counters.size === Stats.CmsD * Stats.CmsW, "d*w zero-filled counters")
    (0L until Stats.CmsD).foreach { r =>
      assert(counters.collect { case ((`r`, _), n) => n }.sum === rows.size.toLong,
        s"every row of the sketch sums to N (row $r)")
    }
    val hot = Stats.cmsEstimate(counters, "hot")
    assert(hot >= 500L && hot <= 500L + rows.size / 50,
      s"min-over-rows estimate >= true, within N*e/w slack: $hot")
    assert(Stats.cmsEstimate(counters, "cold7") >= 5L)
    assert(Stats.cmsEstimate(counters, "absent") <= rows.size / 50,
      "absent key estimates only collision mass")
  }

  test("cmsCounters: element-wise sum of two sketches = sketch of the union") {
    val a = (1 to 300).map(i => s"x${i % 17}").toDF("v")
    val b = (1 to 200).map(i => s"y${i % 11}").toDF("v")
    def m(df: org.apache.spark.sql.DataFrame) =
      Stats.cmsCounters(df, "v").as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    val (ma, mb, mu) = (m(a), m(b), m(a.union(b)))
    assert(ma.map { case (k, n) => k -> (n + mb(k)) } === mu)
  }

  test("cmsProbe: serving estimates >= true corpus counts, broadcast plan, exact for skew-free sketch") {
    val corpus = (Seq.fill(300)("hot") ++ (1 to 20).flatMap(i => Seq.fill(3)(s"c$i")))
      .toDF("v")
    val batch = Seq("hot", "c7", "absent").toDF("v")
    val probe = Stats.cmsProbe(Stats.cmsCounters(corpus, "v"), batch, "v")
    val got = probe.as[(String, Long)].collect().toMap
    assert(got.keySet === Set("hot", "c7", "absent"))
    assert(got("hot") >= 300L && got("c7") >= 3L,
      s"estimates never undercount: $got")
    assert(got("absent") <= 360L / 50,
      s"absent value sees only collision mass: $got")
    val plan = probe.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllMatchIn(plan).nonEmpty,
      s"counters must broadcast — the batch never shuffles the corpus:\n$plan")
  }

  test("hllAccuracy: integer dyadic sum matches the registers; raw estimate inside the error band") {
    val df = (1 to 5000).map(i => s"val$i").toDF("v")
    // p is a live precision knob: gate the band at the default 64
    // registers AND at 1024 (sigma 13% vs 3.25%)
    for (p <- Seq(6, 10)) {
      val regs = Stats.hllRegisters(df, "v", p)
        .as[(Long, Int)].collect().map(_._2)
      assert(regs.length === (1 << p))
      val row = Stats.hllAccuracy(df, "v", p)
        .as[(Long, Long, Long, Long, Double)].collect().head
      val (pOut, nExact, sumScaled, nZero, estRaw) = row
      assert(pOut === p.toLong && nExact === 5000L)
      assert(sumScaled === regs.map(r => 1L << ((62 - p) - r)).sum,
        "gate's integer sum must equal the register sketch's")
      assert(nZero === regs.count(_ == 0).toLong)
      val sigma = 1.04 / math.sqrt((1 << p).toDouble)
      assert(math.abs(estRaw - 5000) <= 3 * sigma * 5000,
        s"p=$p raw estimate $estRaw outside 3-sigma of 5000")
    }
  }

  test("hll precision p: merge law and estimator hold at p=10; invalid p fails fast") {
    val a = (1L to 500L).map(i => s"u$i").toDF("v")
    val b = (400L to 900L).map(i => s"u$i").toDF("v")
    val skA = Stats.hllRegisters(a, "v", p = 10).as[(Long, Int)].collect().toMap
    val skB = Stats.hllRegisters(b, "v", p = 10).as[(Long, Int)].collect().toMap
    assert(skA.size === 1024 && skB.size === 1024)
    val merged = (0L until 1024L).map(r => r -> math.max(skA(r), skB(r))).toMap
    val skU = Stats.hllRegisters(a.union(b), "v", p = 10).as[(Long, Int)].collect().toMap
    assert(merged === skU, "element-wise max merge must hold at every precision")
    val est = Stats.hllEstimate(
      skU.toSeq.sortBy(_._1).map(_._2), p = 10)
    assert(math.abs(est - 900) <= 3 * (1.04 / 32.0) * 900,
      s"p=10 estimate $est outside 3-sigma of 900")
    intercept[IllegalArgumentException](Stats.hllRegisters(a, "v", p = 3))
    intercept[IllegalArgumentException](Stats.hllRegisters(a, "v", p = 17))
  }

  test("heavyHitters: exact top-k found, estimates bound them from above within the CMS band") {
    // zipf-ish: value v_i appears ~ 600/i times
    val rows = (1 to 30).flatMap(i => Seq.fill(600 / i)(s"v$i"))
    val df = rows.toDF("v")
    val got = Stats.heavyHitters(df, "v", k = 5)
      .as[(String, Long, Long, Long)].collect().sortBy(-_._2).toSeq
    assert(got.map(_._1) === Seq("v1", "v2", "v3", "v4", "v5"),
      s"exact top-5 of the planted zipf: $got")
    assert(got.map(_._2) === Seq(600L, 300L, 200L, 150L, 120L))
    got.foreach { case (v, t, e, over) =>
      assert(e >= t, s"CMS never undercounts: $v")
      assert(over === e - t)
      assert(over <= rows.size.toLong * 3 / Stats.CmsW * 3 + rows.size / 50,
        s"overcount within the e*N/w band with slack: $v over=$over")
    }
  }

  test("maxSimTopK: equals the brute-force late-interaction score; coverage beats concentration") {
    import graft.ops.PortableHash
    val (size, stride, dim) = (4, 4, 16)
    val terms = Seq("alpha", "beta", "gamma")
    val fill = "pad"
    val docs = Seq(
      (1L, s"alpha $fill $fill $fill beta $fill $fill $fill gamma $fill $fill $fill"),
      (2L, s"alpha beta $fill $fill $fill $fill $fill $fill"), // gamma missing
      (3L, s"$fill $fill $fill $fill")                          // nothing
    ).toDF("doc_id", "text")
    def embed(tok: String): Array[Long] = {
      val h = PortableHash.jvmStringHash(tok)
      val v = new Array[Long](dim)
      v((h % dim).toInt) += (if ((h / dim) % 2 == 0) -1L else 1L)
      v
    }
    def brute(text: String): Long = {
      val toks = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]".r.findAllIn(text).toArray
      val nCh = math.max(math.ceil((toks.length - size) / stride.toDouble), 0).toInt + 1
      val chunks = (0 until nCh).map(i => toks.slice(i * stride, i * stride + size))
      val cvs = chunks.map(c => c.map(embed).foldLeft(new Array[Long](dim)) {
        (acc, v) => acc.indices.foreach(j => acc(j) += v(j)); acc })
      terms.map { t =>
        val qv = embed(t)
        cvs.map(cv => cv.indices.map(j => cv(j) * qv(j)).sum).max
      }.sum
    }
    val got = TextAnalysis.maxSimTopK(docs, "doc_id", "text", terms,
        k = 3, size = size, stride = stride, dim = dim)
      .as[(Long, Long)].collect().toMap
    val texts = docs.as[(Long, String)].collect().toMap
    texts.foreach { case (d, t) =>
      assert(got(d) === brute(t), s"doc $d maxsim must equal brute force")
    }
    assert(got(1L) > got(2L),
      "covering every term across chunks beats a doc missing a term")
  }

  test("normalize plan: one projection over the scan, zero exchange") {
    val docs = Seq((1L, "Some TEXT")).toDF("doc_id", "text")
    val plan = TextAnalysis.normalize(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"normalize must not shuffle:\n$plan")
  }

  test("splitAssignGrouped: group members share a split; singletons match splitAssign exactly") {
    import graft.ops.Sampling
    val docs = (1L to 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // every pair (2k, 2k+1) is one near-dup group labeled by its even id
    val groups = (1L to 400L).map(i => (i, (i / 2) * 2)).toDF("did", "grp")
    val got = Sampling.splitAssignGrouped(docs, "doc_id", groups,
      "did", "grp", valPct = 10, testPct = 10)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    (1L to 199L).foreach { k =>
      assert(got(2 * k) === got(2 * k + 1),
        s"pair (${2 * k}, ${2 * k + 1}) must share a split")
    }
    assert(got.values.toSet === Set("train", "val", "test"),
      "all three splits populated at 10/10 pct over 200 groups")
    // ungrouped docs coalesce to their own id = plain splitAssign
    val solo = Sampling.splitAssignGrouped(docs, "doc_id",
      groups.where(lit(false)), "did", "grp", valPct = 10, testPct = 10)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val plain = Sampling.splitAssign(docs, "doc_id", valPct = 10, testPct = 10)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(solo === plain, "guard never reshuffles singleton docs")
  }

  // ---------------- log-bucketed quantile sketch ----------------

  test("logQuantileSketch: estimates stay within the bucket's 2x band; merge = per-bucket sum") {
    val vals = (1 to 1000).map(i => i * 0.37)
    val df = vals.map(v => Tuple1(v)).toDF("value")
    val sk = Stats.logQuantileSketch(df, "value")
      .as[(Int, Long, Long)].collect().toSeq
    assert(sk.map(_._2).sum === 1000L, "every row lands in a bucket")
    for (p <- Seq(0.25, 0.5, 0.9, 0.99)) {
      val est = Stats.logQuantileEstimate(sk, p)
      val exact = vals.sorted.apply(math.ceil(p * vals.size).toInt - 1)
      assert(est >= exact / 2.0 && est <= exact * 2.0,
        s"p=$p est=$est exact=$exact outside the 2x band")
    }
    // merge: per-bucket element-wise sum of halves = sketch of the whole
    val (h1, h2) = vals.splitAt(500)
    def m(xs: Seq[Double]) = Stats.logQuantileSketch(
      xs.map(Tuple1(_)).toDF("value"), "value")
      .as[(Int, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val (m1, m2, mw) = (m(h1), m(h2), m(vals))
    val merged = (m1.keySet ++ m2.keySet).map { b =>
      val (n1, s1) = m1.getOrElse(b, (0L, 0L))
      val (n2, s2) = m2.getOrElse(b, (0L, 0L))
      b -> (n1 + n2, s1 + s2)
    }.toMap
    assert(merged === mw)
  }

  test("quantileAccuracy: exact side is true PERCENTILE_DISC; estimates inside the 2x band") {
    val vals = (1 to 2000).map(i => i * 0.73)
    val df = vals.map(Tuple1(_)).toDF("value")
    val row = Stats.quantileAccuracy(df, "value").collect().head
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    ps.foreach { p =>
      val exact = row.getAs[Long](s"exact_p${math.round(p * 100)}")
      val est = row.getAs[Long](s"est_p${math.round(p * 100)}")
      val trueV100 = math.round(
        vals.sorted.apply(math.ceil(p * vals.size).toInt - 1) * 100)
      assert(exact === trueV100, s"exact side must be PERCENTILE_DISC at p=$p")
      assert(est >= exact / 2 && est <= exact * 2,
        s"p=$p est=$est exact=$exact outside the 2x band")
    }
  }

  test("logQuantileSketch: negative magnitudes mirror to negative buckets, ascending id = ascending value") {
    val df = Seq(-120.0, -3.5, -0.01, 0.0, 0.02, 5.0, 90.0).map(Tuple1(_)).toDF("value")
    val sk = Stats.logQuantileSketch(df, "value")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toSeq
    assert(sk.map(_._2).sum === 7L)
    assert(sk.head._1 < 0 && sk.last._1 > 0)
    // bucket means must be non-decreasing when buckets are id-sorted
    val means = sk.map(r => r._3.toDouble / r._2)
    assert(means === means.sorted, s"bucket order = value order: $sk")
  }
}
