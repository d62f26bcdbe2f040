package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-20 optimization A/B probe: containmentDedup plan variants over
  * the real `dedup_containment_cjkdict` fixture shape. Variants compute
  * the SAME result (row counts printed as the cheap equivalence check;
  * the oracle compare is the real gate) with different plan shapes:
  *
  *  A  shipped shape: bounded self-join on fp + left_anti survivors —
  *     the formatted plan shows the victims subtree duplicated below
  *     the fixture union (PushLeftSemiLeftAntiThroughJoin/union) AND
  *     the self-join recomputing both sides: 4 fingerprint passes.
  *  B  A with the survivor join as left_outer + IS NULL (not pushable
  *     below the union): victims computed once → 2 fingerprint passes.
  *  C  B with the pair join replaced by groupBy(fp).collect_list +
  *     row-local pair explode: 1 fingerprint pass.
  *
  * Run: `runMain graft.tools.ProbeR20Opt <sfDir>` — read rep 2 of each
  * pair (cold-JVM rep 1 swings severalfold).
  */
object ProbeR20Opt {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.ensureRegistered(spark)
    def time(label: String)(f: => Long): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    val han26 = "的一是不了人我在有他这为之大来以个中上们到说国和地也"
    val zhPlant = "我们一起学习中文的时候觉得很有意思"
    val zhDictFixture =
      s"IF(doc_id % 3 = 0, concat(replace(translate(translate(substring(text, 1, 120), " +
        s"'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), " +
        s"'abcdefghijklmnopqrstuvwxyz', '$han26'), ' ', ''), '$zhPlant'), text)"
    val base = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val planted = base.where(col("doc_id") < 3)
      .select((col("doc_id") + 99999).as("doc_id"),
        concat(col("text"), lit(" extra tail words appended here")).as("text"))
    val df = base.unionByName(planted).withColumn("text", expr(zhDictFixture))

    val (id, text, k, w, minShared, maxPostings, threshold, grain) =
      ("doc_id", "text", 3, 4, 2, 1000, 0.8, "cjk-dict")

    def bounded: DataFrame = {
      val sets = graft.ops.TextAnalysis.winnowSets(df, id, text, k, w, grain)
        .select(col(id).as("d"), col("fingerprints"))
      val posts = sets.select(col("d"), explode(col("fingerprints")).as("fp"))
      posts.withColumn("cnt",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
        .where(col("cnt") <= maxPostings).drop("cnt")
        .withColumn("n_fp",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("d"))))
    }

    def pairsJoin(b: DataFrame): DataFrame =
      b.select(col("d").as("a_id"), col("n_fp").as("n_a"), col("fp"))
        .join(b.select(col("d").as("b_id"), col("n_fp").as("n_b"), col("fp")), Seq("fp"))
        .where(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("n_shared"),
          max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
        .where(col("n_shared") >= minShared)
        .select(col("a_id"), col("b_id"), col("n_shared"), col("n_a"), col("n_b"),
          round(col("n_shared").cast("double") /
            least(col("n_a"), col("n_b")).cast("double"), 6).as("containment"))

    def pairsLocal(b: DataFrame): DataFrame =
      b.groupBy(col("fp"))
        .agg(collect_list(struct(col("d"), col("n_fp"))).as("ms"))
        .where(size(col("ms")) >= 2)
        .select(explode(expr(
          "flatten(transform(ms, a -> transform(filter(ms, b -> b.d > a.d), " +
            "b -> named_struct('a_id', a.d, 'n_a', a.n_fp, " +
            "'b_id', b.d, 'n_b', b.n_fp))))")).as("p"))
        .select(col("p.a_id"), col("p.n_a"), col("p.b_id"), col("p.n_b"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("n_shared"),
          max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
        .where(col("n_shared") >= minShared)
        .select(col("a_id"), col("b_id"), col("n_shared"), col("n_a"), col("n_b"),
          round(col("n_shared").cast("double") /
            least(col("n_a"), col("n_b")).cast("double"), 6).as("containment"))

    def victims(pairs: DataFrame): DataFrame =
      pairs.where(col("containment") >= threshold)
        .select(col("b_id").as("victim")).distinct()

    def antiJoin(v: DataFrame): DataFrame =
      df.select(col(id)).join(v, col(id) === col("victim"), "left_anti").select(col(id))

    def outerJoin(v: DataFrame): DataFrame =
      df.select(col(id)).join(v, col(id) === col("victim"), "left_outer")
        .where(col("victim").isNull).select(col(id))

    def pairsJoinShuffle(b: DataFrame): DataFrame =
      b.select(col("d").as("a_id"), col("n_fp").as("n_a"), col("fp")).hint("shuffle_merge")
        .join(b.select(col("d").as("b_id"), col("n_fp").as("n_b"), col("fp"))
          .hint("shuffle_merge"), Seq("fp"))
        .where(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("n_shared"),
          max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
        .where(col("n_shared") >= minShared)
        .select(col("a_id"), col("b_id"), col("n_shared"), col("n_a"), col("n_b"),
          round(col("n_shared").cast("double") /
            least(col("n_a"), col("n_b")).cast("double"), 6).as("containment"))

    def pairsJoinHint(b: DataFrame, h: String): DataFrame =
      b.select(col("d").as("a_id"), col("n_fp").as("n_a"), col("fp")).hint(h)
        .join(b.select(col("d").as("b_id"), col("n_fp").as("n_b"), col("fp"))
          .hint(h), Seq("fp"))
        .where(col("a_id") < col("b_id"))
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("n_shared"),
          max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
        .where(col("n_shared") >= minShared)
        .select(col("a_id"), col("b_id"), col("n_shared"), col("n_a"), col("n_b"),
          round(col("n_shared").cast("double") /
            least(col("n_a"), col("n_b")).cast("double"), 6).as("containment"))

    for (r <- 1 to 5) {
      time(s"A shipped (self-join + anti) rep$r")(
        antiJoin(victims(pairsJoin(bounded))).queryExecution.toRdd.count())
      time(s"E shuffle-merge self-join rep$r")(
        antiJoin(victims(pairsJoinShuffle(bounded))).queryExecution.toRdd.count())
      time(s"G shuffle-hash self-join rep$r")(
        antiJoin(victims(pairsJoinHint(bounded, "shuffle_hash"))).queryExecution.toRdd.count())
      time(s"D persist bounded rep$r") {
        val b = bounded.persist()
        try antiJoin(victims(pairsJoin(b))).queryExecution.toRdd.count()
        finally b.unpersist(blocking = false)
      }
    }
    spark.stop()
  }
}
