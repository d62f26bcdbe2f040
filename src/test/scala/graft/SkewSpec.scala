package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows of one hot key + a long tail — the shape that makes an
  // unsalted shuffle join a single-reducer straggler
  private lazy val skewed = spark.range(10000).select(lit("hot").as("k"), $"id".as("v"))
    .unionAll(spark.range(100).select(concat(lit("t"), $"id").as("k"), $"id".as("v")))
  private lazy val dim = Seq(("hot", 1L), ("t1", 2L), ("t2", 3L), ("absent", 9L))
    .toDF("k", "attr")

  test("salted inner join returns exactly the unsalted result") {
    val plain = skewed.join(dim, Seq("k")).select($"k", $"v", $"attr")
    val salted = Skew.saltedJoin(skewed, dim, "k", salt = 16).select($"k", $"v", $"attr")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted left join preserves unmatched left rows exactly once") {
    val plain = skewed.join(dim, Seq("k"), "left").select($"k", $"v", $"attr")
    val salted = Skew.saltedJoin(skewed, dim, "k", salt = 4, joinType = "left")
      .select($"k", $"v", $"attr")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("the hot key's rows actually spread across salt values") {
    val nSalts = skewed.where($"k" === "hot")
      .withColumn("__salt", pmod(hash($"k", monotonically_increasing_id()), lit(16)))
      .select(countDistinct($"__salt")).as[Long].head()
    assert(nSalts >= 12, s"10k hot rows should draw nearly all 16 salts, got $nSalts")
  }
}
