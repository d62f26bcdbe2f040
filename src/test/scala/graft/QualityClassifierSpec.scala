package graft

import org.apache.spark.sql.functions._

import graft.ops.{QualityClassifier, TextAnalysis}

/** The trained quality classifier: committed-table reproducibility,
  * planted-fixture separation through the ENGINE scoring path, and
  * compiled-kernel/declarative parity.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("committed weight table is exactly what the deterministic trainer produces") {
    val retrained = QualityClassifier.quantize(QualityClassifier.trainWeights())
    assert(retrained.sameElements(QualityClassifier.Weights),
      "QualityClassifierWeights.table must equal quantize(trainWeights()) — " +
        "regenerate with tools/ProbeClassifier after fixture/trainer changes")
  }

  test("planted fixture separates through the engine scoring path (all labels recovered)") {
    val docs = QualityClassifier.labeledFixture.zipWithIndex
      .map { case ((text, y), i) => (i.toLong, text, y) }
      .toDF("doc_id", "text", "label")
    val scored = TextAnalysis.trainedClassifierScore(docs, "doc_id", "text")
      .join(docs.select($"doc_id", $"label"), "doc_id")
      .select($"label", $"keep", $"score").collect()
    assert(scored.length === QualityClassifier.labeledFixture.size)
    scored.foreach { r =>
      assert(r.getInt(1) === r.getInt(0),
        s"keep must equal the planted label, got $r")
    }
    // margins are comfortable, not knife-edge (quantization-safe)
    val pos = scored.filter(_.getInt(0) == 1).map(_.getDouble(2))
    val neg = scored.filter(_.getInt(0) == 0).map(_.getDouble(2))
    assert(pos.min > 1.0 && neg.max < -1.0,
      s"margins too thin: pos.min=${pos.min}, neg.max=${neg.max}")
  }

  test("compiled trained logit equals the declarative array-literal twin") {
    val docs = (QualityClassifier.labeledFixture.map(_._1) ++
      Seq("", "solo", "repeated repeated repeated", "中文 测试"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val diff = graft.functions.VectorFunctions.attach(docs)
      .select(
        expr("graft_classifier_logit_t(split(text, ' '))").as("kernel"),
        expr(TextAnalysis.trainedClassifierLogitHof("text")).as("hof"))
      .where($"kernel" =!= $"hof").count()
    assert(diff === 0L, "compiled kernel must equal the declarative twin exactly")
  }
}
