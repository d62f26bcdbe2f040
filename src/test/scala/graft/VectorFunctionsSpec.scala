package graft

import graft.functions.VectorFunctions
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Parity and behavior of the native fused-codegen cosine expression
  * against the declarative HOF formulation it replaces on the hot path.
  */
class VectorFunctionsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("native cosine is bit-identical to the HOF fold on real embeddings") {
    VectorFunctions.ensureRegistered(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .where(col("a_id") < col("b_id")).limit(500)
    val diff = pairs
      .withColumn("native", expr(Similarity.nativeCosine("a", "b")))
      .withColumn("hof", expr(Similarity.sparkCosine("a", "b")))
      // bit-for-bit: compare raw doubles, no tolerance
      .where(col("native") =!= col("hof"))
      .count()
    assert(diff == 0, "native and HOF cosine must agree exactly")
  }

  test("native cosine handles double arrays, nulls, and self-similarity") {
    VectorFunctions.ensureRegistered(spark)
    val df = spark.sql(
      """SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS selfsim,
        |       graft_cosine(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS ortho,
        |       graft_cosine(cast(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS nullsim
        |""".stripMargin).collect()(0)
    assert(df.getDouble(0) == 1.0)
    assert(df.getDouble(1) == 0.0)
    assert(df.isNullAt(2))
  }

  test("native cosine participates in whole-stage codegen (HOF form cannot)") {
    VectorFunctions.ensureRegistered(spark)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = e.select(expr(Similarity.nativeCosine("embedding", "embedding")).as("s"))
      .queryExecution.executedPlan.toString
    // `*(n)` marks operators fused into WholeStageCodegen stage n
    assert(p.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_cosine.*"),
      s"graft_cosine projection must stay inside whole-stage codegen:\n$p")
  }
}
