package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Threshold-boundary behavior of [[Similarity.embeddingNearDupPairs]]:
  * the `>=` comparison is inclusive at the exact threshold and exclusive
  * one rounding step above it. The cross-engine value check is the
  * driver's `embed_near_dup` oracle row (now non-vacuous via planted
  * dups); this spec pins the boundary semantics that row cannot see —
  * a pair sitting EXACTLY at the threshold.
  */
class NearDupBoundarySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select("vec_id", "embedding")

  // the planted-dup fixture the registered query uses: exact copies
  // (sim = 1.0) + dim-0-scaled copies (high but < 1)
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

  private def pairs(threshold: Double): Map[(Long, Long), Double] =
    Similarity.embeddingNearDupPairs(planted, "vec_id", "embedding",
        threshold = threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("planted fixture emits both the exact (sim = 1.0) and the perturbed (< 1) pairs") {
    val p = pairs(0.95)
    assert(p.nonEmpty, "planted near-dups must produce pairs")
    assert(p.values.exists(_ == 1.0), "exact copies must score 1.0")
    assert(p.values.exists(s => s < 1.0 && s >= 0.95),
      s"perturbed copies must score in [0.95, 1): ${p.values.toSeq.sorted}")
  }

  test("a pair exactly AT the threshold is included (>= is inclusive)") {
    val all = pairs(0.0).filter { case (_, s) => s < 1.0 }
    assert(all.nonEmpty, "need a sub-1.0 pair to probe the boundary")
    val (key, sim) = all.minBy(_._2)
    val at = pairs(sim)
    assert(at.contains(key), s"pair $key at sim=$sim must survive threshold=$sim")
  }

  test("a pair one rounding step BELOW the threshold is excluded") {
    val all = pairs(0.0).filter { case (_, s) => s < 1.0 }
    val (key, sim) = all.minBy(_._2)
    // sims are rounded to 6 decimals, so +1e-6 steps strictly above the pair
    val above = pairs(sim + 0.000001)
    assert(!above.contains(key),
      s"pair $key at sim=$sim must be dropped at threshold=${sim + 0.000001}")
  }
}
