package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Multi-probe LSH ANN ([[Similarity.lshTopK]] with nprobe > 1): probe
  * parity with the native bucket expression, Hamming-distance-1 probe
  * geometry, and recall monotonicity. The cross-engine value check is the
  * driver's `embed_ann_topk` oracle row (registered at nprobe=2); these
  * specs pin the Spark-side invariants that row depends on.
  */
class LshMultiProbeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private lazy val nativeBuckets: Map[Long, Long] =
    Similarity.lshBuckets(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def resultPairs(nprobe: Int): Set[(Long, Long)] =
    Similarity.lshTopK(emb, emb.where(col("vec_id") < 10),
      "vec_id", "embedding", k = 5, nprobe = nprobe)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("nprobe=1: every candidate shares the query's NATIVE bucket (HOF/native base parity)") {
    // the probe expansion derives the query's base bucket from the
    // declarative HOF dots; the corpus side uses the compiled
    // graft_hyperplane_bucket — a mismatch would silently empty or
    // misdirect the join, so pin base == native bucket via the results
    val rs = resultPairs(1)
    assert(rs.nonEmpty, "single-probe search must return candidates")
    rs.foreach { case (q, c) =>
      assert(nativeBuckets(c) == nativeBuckets(q),
        s"nprobe=1 candidate $c of query $q must share its bucket")
    }
  }

  test("nprobe=2 extra candidates come from buckets at Hamming distance exactly 1") {
    val extra = resultPairs(2) -- resultPairs(1)
    extra.foreach { case (q, c) =>
      assert(java.lang.Long.bitCount(nativeBuckets(q) ^ nativeBuckets(c)) == 1,
        s"extra candidate $c of query $q must sit one hyperplane flip away")
    }
  }

  test("multi-probe (nprobe=2) recall ≥ single-probe against the exact top-k") {
    val exact = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 10),
      "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall1 = (resultPairs(1) & exact).size
    val recall2 = (resultPairs(2) & exact).size
    assert(recall2 >= recall1,
      s"nprobe=2 recall ($recall2) must not be below nprobe=1 ($recall1)")
  }

  test("nprobe outside [1, bits] is rejected at construction") {
    val q = emb.where(col("vec_id") < 10)
    intercept[IllegalArgumentException] {
      Similarity.lshTopK(emb, q, "vec_id", "embedding", k = 5, nprobe = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.lshTopK(emb, q, "vec_id", "embedding", k = 5, bits = 8, nprobe = 9)
    }
  }
}
