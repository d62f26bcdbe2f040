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

  test("AQE skew-join split fires on a hot key (the runtime complement to salting)") {
    // one key holds ~90% of the left side; with the skew thresholds
    // lowered to test scale, AQE must mark the sort-merge join skewed and
    // split the hot partition at runtime — no code change on the query
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val old = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val left = ((1L to 20000L).map(_ => ("hot", "x" * 64)) ++
        (1L to 2000L).map(i => (s"k$i", "y"))).toDF("key", "payload")
      val right = (Seq("hot") ++ (1L to 2000L).map(i => s"k$i")).map((_, 1))
        .toDF("key", "val")
      val joined = left.join(right, "key")
      // execute THIS plan (not a derived count() QueryExecution) so the
      // AdaptiveSparkPlan finalizes and exposes its runtime decision
      assert(joined.collect().length == 22000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE must split the hot partition (skew=true marker missing):\n$p")
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("the hot key's rows actually spread across salt values") {
    val nSalts = skewed.where($"k" === "hot")
      .withColumn("__salt", pmod(hash($"k", monotonically_increasing_id()), lit(16)))
      .select(countDistinct($"__salt")).as[Long].head()
    assert(nSalts >= 12, s"10k hot rows should draw nearly all 16 salts, got $nSalts")
  }
}
