package graft

import graft.ops.{Dedup, Dsir, Eval, Similarity}
import org.apache.spark.sql.functions._

/** Contracts for the round-9 additions the oracle can't pin alone:
  * binary sign-sketch bit layout + exhaustive-rerank equivalence,
  * matryoshka prefix truncation, DSIR weight-sign semantics, and
  * soft-dedup mass conservation.
  */
class BinaryDsirSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, -1.0f, 1.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.8f, -0.2f)),
    (2L, Array(-0.5f, 1.0f, -0.25f, 0.5f)),
    (3L, Array(1.0f, 1.0f, 1.0f, 1.0f)),
    (4L, Array(-1.0f, -1.0f, -1.0f, -1.0f))
  ).toDF("vec_id", "embedding")

  test("binary sketch sets exactly the strictly-positive dims' bits") {
    val sk = graft.functions.VectorFunctions.attach(vecs)
      .select($"vec_id", expr(Similarity.binarySketchExpr("embedding", bits = 4)).as("sk"))
      .as[(Long, Long)].collect().toMap
    // bit i <-> dim i+1 > 0 (strict: 0.0 does NOT vote)
    assert(sk(0L) === (1L | 4L), "dims 1,3 positive -> bits 0,2")
    assert(sk(1L) === (1L | 2L | 4L))
    assert(sk(2L) === (2L | 8L))
    assert(sk(3L) === 15L)
    assert(sk(4L) === 0L)
  }

  test("binaryTopK with exhaustive rerank equals exact brute force") {
    val q = vecs.where($"vec_id" === 0L)
    val exact = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", k = 4)
      .orderBy($"rank").select($"c_id", $"sim").as[(Long, Double)].collect().toSeq
    val bin = Similarity.binaryTopK(vecs, q, "vec_id", "embedding", k = 4,
        rerank = 10, bits = 4)
      .orderBy($"rank").select($"c_id", $"sim").as[(Long, Double)].collect().toSeq
    assert(bin === exact,
      "rerank >= corpus => prefilter admits everything; exact rerank must reproduce brute force")
  }

  test("hamming prefilter at rerank=1 returns the nearest-sketch candidate") {
    // query 3 (sketch 1111): vec 1 (0111) is hamming 1; vec 4 (0000) is 4
    val out = Similarity.binaryTopK(vecs, vecs.where($"vec_id" === 3L),
        "vec_id", "embedding", k = 1, rerank = 1, bits = 4)
      .select($"c_id").as[Long].collect().toSeq
    assert(out === Seq(1L), "shortlist of 1 must be the min-hamming (tie: min id) sketch")
  }

  test("binary recall gate is 1.0 when the prefilter admits the whole corpus") {
    val rec = Eval.binaryRecallAtK(vecs, vecs.where($"vec_id" < 2),
        "vec_id", "embedding", k = 3, rerank = 10, bits = 4)
      .select($"recall").as[Double].collect()
    assert(rec.forall(_ === 1.0))
  }

  test("matryoshka prefix ranking uses only the first dims") {
    // same 2-dim prefix, different tails: prefix search can't tell them apart
    val m = Seq(
      (0L, Array(1.0f, 0.0f, 0.9f, 0.9f)),
      (1L, Array(1.0f, 0.0f, -0.9f, -0.9f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val trunc = m.select($"vec_id", expr("slice(embedding, 1, 2)").as("embedding"))
    val sims = Similarity.bruteForceTopK(trunc, trunc.where($"vec_id" === 0L),
        "vec_id", "embedding", k = 2)
      .select($"c_id", $"sim").as[(Long, Double)].collect().toMap
    assert(sims(1L) === 1.0, "identical prefix -> cosine 1 despite opposite tail")
    assert(sims(2L) === 0.0)
  }

  private lazy val dsirDocs = Seq(
    (0L, "alpha beta alpha beta alpha", "tgt"),
    (1L, "alpha beta gamma alpha beta", "tgt"),
    (2L, "alpha beta alpha beta gamma", "raw"),   // target-like raw doc
    (3L, "zeta eta theta zeta eta", "raw"),       // off-target raw doc
    (4L, "zeta eta zeta eta theta", "raw")
  ).toDF("doc_id", "text", "grp")

  test("DSIR weights rank target-like docs above off-target docs") {
    val w = Dsir.weights(dsirDocs, "doc_id", "text", col("grp") === "tgt")
      .select($"doc_id", $"w_sum").as[(Long, Long)].collect().toMap
    assert(w(2L) > w(3L) && w(2L) > w(4L),
      "doc sharing the target's grams must outscore the off-target cluster")
    assert(w(3L) < 0 && w(4L) < 0,
      "grams absent from the target distribution score negative")
    val sel = Dsir.select(dsirDocs, "doc_id", "text", col("grp") === "tgt", n = 3)
      .select($"doc_id").as[Long].collect().toSet
    assert(sel === Set(0L, 1L, 2L), "top-3 = the two target docs + the target-like raw doc")
  }

  test("compiled binary sketch kernel is bit-equal to the declarative fold") {
    val both = graft.functions.VectorFunctions.attach(vecs)
      .select($"vec_id",
        expr("graft_binary_sketch(embedding, 4)").as("k"),
        expr(Similarity.binarySketchExpr("embedding", bits = 4)).as("d"))
      .as[(Long, Long, Long)].collect()
    both.foreach { case (id, k, d) =>
      assert(k === d, s"kernel/declarative sketch diverge for vec $id") }
  }

  test("compiled DSIR bucket kernel matches the declarative gram hashing (incl. multi-space gaps)") {
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha  beta"),            // double space: empty word filtered
      (2L, " leading trailing "),
      (3L, ""),
      (4L, "solo")
    ).toDF("doc_id", "text")
    val w = "filter(split(text, ' '), w -> w <> '')"
    val decl = s"transform(concat($w, graft_ngrams($w, 2)), " +
      s"g -> ${graft.ops.PortableHash.sparkStringHash("g")} % 256)"
    val both = graft.functions.VectorFunctions.attach(docs)
      .select($"doc_id",
        expr("graft_dsir_buckets(text, 256)").as("k"),
        expr(decl).as("d"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    both.foreach { case (id, k, d) =>
      assert(k === d, s"kernel/declarative buckets diverge for doc $id") }
  }

  test("DSIR fast path (kernel + literal weight table) equals the declarative selection") {
    val slow = Dsir.select(dsirDocs, "doc_id", "text", col("grp") === "tgt", n = 5)
      .orderBy($"rank").as[(Long, Long, Long, Int)].collect().toSeq
    val fast = Dsir.selectFast(dsirDocs, "doc_id", "text", col("grp") === "tgt", n = 5)
      .orderBy($"rank").as[(Long, Long, Long, Int)].collect().toSeq
    assert(fast === slow)
  }

  test("persisted binary index search equals the in-memory operator") {
    val path = java.nio.file.Files.createTempDirectory("graft_binsk_spec").toString
    graft.ops.PqIndex.writeBinary(vecs, "vec_id", "embedding", path, bits = 4)
    val q = vecs.where($"vec_id" < 2).select($"vec_id", $"embedding")
    val persisted = graft.ops.PqIndex.searchBinaryTopK(spark, path, q,
        k = 3, rerank = 10, bits = 4)
      .orderBy($"q_id", $"rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val inMem = Similarity.binaryTopK(vecs, q, "vec_id", "embedding",
        k = 3, rerank = 10, bits = 4)
      .orderBy($"q_id", $"rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(persisted === inMem,
      "at-rest sketches must reproduce the in-memory two-phase search exactly")
  }

  test("hard negatives: same-label vectors never appear; nearest wrong-label ranks first") {
    val lv = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.99f, 0.1f, 0.0f), 0),   // same label as 0: nearest overall but excluded
      (2L, Array(0.9f, 0.2f, 0.0f), 1),    // nearest wrong-label
      (3L, Array(0.0f, 1.0f, 0.0f), 1),
      (4L, Array(0.0f, 0.0f, 1.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val negs = Similarity.hardNegatives(lv, lv.where($"vec_id" === 0L),
        "vec_id", "embedding", "label", k = 3)
      .orderBy($"rank").select($"c_id").as[Long].collect().toSeq
    assert(!negs.contains(1L), "same-label vector must be excluded however similar")
    assert(negs.head === 2L, "the most similar WRONG-label vector is the top negative")
    assert(negs === Seq(2L, 3L, 4L))
  }

  test("vocabulary coverage is monotone and reaches 1.0 when topV spans the vocab") {
    val docs = Seq((0L, "a a a b b c"), (1L, "a b d")).toDF("doc_id", "text")
    val v = graft.ops.TextAnalysis.vocabulary(docs, "text", topV = 10)
      .orderBy($"rank").select($"token", $"cnt", $"coverage")
      .as[(String, Long, Double)].collect().toSeq
    assert(v.map(_._1) === Seq("a", "b", "c", "d"), "order: cnt DESC, token ASC")
    assert(v.map(_._2) === Seq(4L, 3L, 1L, 1L))
    assert(v.map(_._3) === Seq(0.444444, 0.777778, 0.888889, 1.0),
      "cumulative shares over 9 tokens")
  }

  test("bitext mining: planted parallel pair mines with margin > 1; flat neighborhoods stay near 1") {
    val emb = Seq(
      // source partition (label 0)
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),    // planted translation of y=10
      (1L, Array(0.5f, 0.5f, 0.5f, 0.5f), 0),    // equidistant to everything
      // target partition (label 1)
      (10L, Array(0.99f, 0.05f, 0.0f, 0.0f), 1), // the planted pair
      (11L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (12L, Array(0.0f, 0.0f, 1.0f, 0.0f), 1),
      (13L, Array(0.0f, 0.0f, 0.0f, 1.0f), 1),
      (14L, Array(0.1f, 0.9f, 0.1f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val mined = Similarity.bitextMine(emb, "vec_id", "embedding", "label",
        srcLabel = 0, tgtLabel = 1, kNN = 3, minMargin = 0.0)
      .select($"src_id", $"tgt_id", $"margin")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(mined(0L)._1 === 10L, "the planted parallel doc must be the mined match")
    assert(mined(0L)._2 > 1.2,
      s"a sharp match over a flat neighborhood scores margin well above 1, got ${mined(0L)._2}")
    assert(mined(1L)._2 < mined(0L)._2,
      "the equidistant source doc's best margin must be smaller than the planted pair's")
  }

  test("shortlisted bitext mining equals the brute form at exhaustive rerank") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.5f, 0.5f, 0.5f, 0.5f), 0),
      (10L, Array(0.99f, 0.05f, 0.0f, 0.0f), 1),
      (11L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (12L, Array(0.0f, 0.0f, 1.0f, 0.0f), 1),
      (13L, Array(0.0f, 0.0f, 0.0f, 1.0f), 1),
      (14L, Array(0.1f, 0.9f, 0.1f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val brute = Similarity.bitextMine(emb, "vec_id", "embedding", "label",
        srcLabel = 0, tgtLabel = 1, kNN = 3, minMargin = 0.0)
      .orderBy($"src_id").as[(Long, Long, Double)].collect().toSeq
    val short = Similarity.bitextMineShortlist(emb, "vec_id", "embedding",
        "label", srcLabel = 0, tgtLabel = 1, kNN = 3, minMargin = 0.0,
        rerank = 10, bits = 4)
      .orderBy($"src_id").as[(Long, Long, Double)].collect().toSeq
    assert(short === brute,
      "rerank >= |tgt| => candidate set is the full cross product; results must match exactly")
  }

  test("soft dedup conserves unit mass per near-dup cluster") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different text about graph partitioning algorithms ok"),
      (4L, "hi")                                   // < k words: singleton by construction
    ).toDF("doc_id", "text")
    val w = Dedup.softDedupWeights(docs, "doc_id", "text")
      .select($"doc_id", $"component_id", $"dup_count", $"weight")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    Seq(0L, 1L, 2L).foreach { i =>
      assert(w(i)._2 === 0L && w(i)._3 === 3L && w(i)._4 === 0.333333,
        s"cluster member $i must carry component 0, size 3, weight 1/3") }
    assert(w(3L)._3 === 1L && w(3L)._4 === 1.0)
    assert(w(4L)._2 === 4L && w(4L)._4 === 1.0,
      "un-shingleable doc is its own singleton at weight 1")
    assert(w.size === 5, "soft dedup KEEPS every row — it only reweights")
  }
}
