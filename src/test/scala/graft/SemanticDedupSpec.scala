package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Keeper semantics of [[Similarity.semanticDedupKeepers]] (the SemDeDup
  * shape) on the planted-dup fixture the registered query uses. The
  * cross-engine value check is the driver's `embed_dedup_semantic` oracle
  * row; this spec pins the DECISIONS that row's hash cannot explain:
  * exactly one survivor per planted ε-ball, the survivor is the
  * lowest-(csim, id) member, and clean vectors are untouched.
  */
class SemanticDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select("vec_id", "embedding")

  private lazy val planted = {
    val exact = emb.where(col("vec_id") < 3)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val near = emb.where(col("vec_id") >= 3 && col("vec_id") < 5)
      .select((col("vec_id") + 2000).as("vec_id"),
        expr("transform(embedding, (x, i) -> " +
          "IF(i = 0, cast(cast(x AS DOUBLE) * 1.25D AS FLOAT), x))")
          .as("embedding"))
    emb.unionByName(exact).unionByName(near)
  }

  private lazy val rows: Map[Long, (Long, Double, Boolean)] =
    Similarity.semanticDedupKeepers(planted, "vec_id", "embedding",
        nClusters = 8, iters = 2, eps = 0.95)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap

  test("every planted exact-copy pair keeps exactly its lower id") {
    for (id <- 0L to 2L) {
      val (c1, s1, k1) = rows(id)
      val (c2, s2, k2) = rows(id + 1000)
      assert(c1 == c2 && s1 == s2,
        s"identical vectors $id/${id + 1000} must co-cluster with equal csim")
      assert(k1 && !k2,
        s"tie on csim must keep the lower id: $id keep=$k1, ${id + 1000} keep=$k2")
    }
  }

  test("perturbed near-dups above eps drop exactly one of the pair") {
    for (id <- 3L to 4L) {
      graft.functions.VectorFunctions.ensureRegistered(spark)
      val sim = planted.where(col("vec_id") === id)
        .crossJoin(planted.where(col("vec_id") === id + 2000)
          .select(col("embedding").as("e2")))
        .select(round(expr(Similarity.nativeCosine("embedding", "e2")), 6))
        .head().getDouble(0)
      val (c1, _, k1) = rows(id)
      val (c2, _, k2) = rows(id + 2000)
      if (sim >= 0.95 && c1 == c2) {
        assert(k1 ^ k2, s"ε-ball pair $id/${id + 2000} (sim=$sim) must keep exactly one")
      } else {
        assert(k1 && k2,
          s"pair $id/${id + 2000} outside the ball (sim=$sim, clusters $c1/$c2) must both survive")
      }
    }
  }

  test("vectors with no ε-ball witness all survive") {
    val clean = rows.filter { case (id, _) => id >= 5 && id < 1000 }
    assert(clean.nonEmpty)
    assert(clean.forall(_._2._3),
      s"unplanted vectors must keep=true; dropped: ${clean.filterNot(_._2._3).keys.toSeq.sorted}")
  }

  test("within each ε-ball the survivor is the lowest-(csim, id) member") {
    // exact copies tie on csim -> id decides (pinned above); the perturbed
    // pair orders by csim: whichever member sits FARTHER from the centroid
    // (lower csim) must be the keeper when the ball collapses to one
    for (id <- 3L to 4L) {
      val (c1, s1, k1) = rows(id)
      val (c2, s2, k2) = rows(id + 2000)
      if (c1 == c2 && (k1 ^ k2)) {
        val keeper = if (k1) s1 else s2
        val dropped = if (k1) s2 else s1
        assert(keeper < dropped || (keeper == dropped && (if (k1) id else id + 2000) < (if (k1) id + 2000 else id)),
          s"keeper must be the lowest-(csim, id): keeper csim=$keeper dropped csim=$dropped")
      }
    }
  }
}
