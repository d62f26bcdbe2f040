package graft

import graft.functions.VectorFunctions
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** k-means IVF ANN ([[Similarity.ivfTopKKmeans]]): probe-selection
  * tie-break parity, centroid determinism, and result-shape checks. The
  * cross-engine value check is the driver's `embed_ivf_kmeans` oracle
  * row; these specs pin the Spark-side invariants that row depends on.
  */
class IvfKmeansSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("graft_topk tie-break matches row_number ORDER BY sim DESC, id ASC") {
    VectorFunctions.ensureRegistered(spark)
    import spark.implicits._
    // deliberate ties: four ids share sim 0.5, two share 0.9 — the kept
    // set and its order must match the window formulation the DuckDB
    // twin uses (sim DESC, id ASC)
    val rows = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.9), (1L, 20L, 0.5), (1L, 21L, 0.5),
      (1L, 22L, 0.5), (1L, 23L, 0.5), (1L, 30L, 0.1),
      (2L, 5L, 0.7), (2L, 4L, 0.7), (2L, 3L, 0.7), (2L, 2L, 0.7))
      .toDF("q_id", "c_id", "sim")
      // many partitions → exercises partial-heap merge, not just update
      .repartition(8)
    val agg = rows.groupBy(col("q_id"))
      .agg(expr("graft_topk(sim, c_id, 3)").as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).as("rank"),
        col("col.c_id").as("c_id"), col("col.sim").as("sim"))
    val win = rows.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id").asc)))
      .where(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("c_id"), col("sim"))
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty,
      "bounded-heap top-k must equal the window formulation incl. tie order")
  }

  test("graft_topk rejects non-positive k at construction") {
    VectorFunctions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq((1L, 2L, 0.5)).toDF("q_id", "c_id", "sim")
    val e = intercept[Exception] {
      df.groupBy(col("q_id")).agg(expr("graft_topk(sim, c_id, 0)")).collect()
    }
    assert(e.getMessage.contains("positive k"))
  }

  test("kmeansCentroids is deterministic and lineage-bounded across iterations") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val c1 = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      nCentroids = 8, iters = 2).collect().sortBy(_.getLong(0))
    val c2 = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      nCentroids = 8, iters = 2).collect().sortBy(_.getLong(0))
    assert(c1.length == 8 && c1.map(_.toString).sameElements(c2.map(_.toString)),
      "fixed-iteration Lloyd's must reproduce bit-identical centroids")
  }

  test("hash-seeded init: id-sorted adversarial corpus keeps non-degenerate clusters") {
    import spark.implicits._
    // the first-k-ids init trap: ids 0..7 are near-identical clones along
    // axis 0, so `v_id < nCentroids` would place EVERY initial centroid
    // on one point and the recall of everything downstream (IVF, IVF-PQ,
    // the persisted index) silently collapses. Hash-seeded init samples
    // ids independently of their assignment order.
    val dim = 9
    def vec(axis: Int, eps: Float): Seq[Float] =
      (0 until dim).map(d => if (d == axis) 1.0f else eps)
    val clones = (0L until 8L).map(i => (i, vec(0, 0.0001f * i)))
    val spread = (8L until 108L).map(i => (i, vec((i % 7).toInt + 1, 0.001f)))
    val emb = (clones ++ spread).toDF("vec_id", "embedding")
    val cent = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      nCentroids = 4, iters = 2).collect()
    // no initial centroid may come from the clone block, and the finals
    // must be genuinely distinct vectors
    val distinctVecs = cent.map(_.getSeq[Double](1).toList).distinct
    assert(distinctVecs.length >= 3,
      s"centroids collapsed: ${distinctVecs.length} distinct of ${cent.length}")
    // local argmax-cosine assignment over the 108 rows: the corpus must
    // spread over >= 3 clusters with no near-total winner
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val cents = cent.map(r => r.getLong(0) -> r.getSeq[Double](1).toList)
    val vecs = (clones ++ spread).map { case (_, v) => v.map(_.toDouble).toList }
    val sizes = vecs.map(v => cents.minBy { case (cid, c) => (-cos(v, c), cid) }._1)
      .groupBy(identity).map(_._2.size)
    assert(sizes.size >= 3, s"assignment must spread over >=3 clusters, got $sizes")
    assert(sizes.max <= 97, s"one cluster holds ${sizes.max} of 108 rows")
  }

  test("ivfTopKKmeans returns k ranked neighbors per query, sims descending") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val res = Similarity.ivfTopKKmeans(emb, "vec_id", "embedding", k = 5,
      nCentroids = 8, iters = 2, nprobe = 2, queryPred = col("v_id") < 10)
      .collect()
    graft.ops.Caches.releaseAll()
    assert(res.length == 50, s"10 queries x k=5, got ${res.length}")
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getInt(3)) // rank
      assert(sorted.map(_.getInt(3)).sameElements(1 to 5), s"ranks 1..5 for q=$q")
      val sims = sorted.map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"sims must be non-increasing for q=$q")
      assert(rows.forall(_.getLong(1) != q), "query must not match itself")
    }
  }

  test("multi-probe (nprobe=2) recall ≥ single-probe against the exact top-k") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def resultSet(nprobe: Int): Set[(Long, Long)] = {
      val r = Similarity.ivfTopKKmeans(emb, "vec_id", "embedding", k = 5,
        nCentroids = 8, iters = 2, nprobe = nprobe, queryPred = col("v_id") < 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.ops.Caches.releaseAll()
      r
    }
    val exact = Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 10),
      "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall1 = (resultSet(1) & exact).size
    val recall2 = (resultSet(2) & exact).size
    assert(recall2 >= recall1,
      s"nprobe=2 recall ($recall2) must not be below nprobe=1 ($recall1)")
  }
}
