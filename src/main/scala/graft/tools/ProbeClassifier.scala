package graft.tools

import graft.ops.QualityClassifier

/** Regenerates the committed [[graft.ops.QualityClassifierWeights]]
  * table from the planted fixture and reports the training-set margins —
  * run after any fixture/trainer change and paste the printed literal.
  */
object ProbeClassifier {
  def main(args: Array[String]): Unit = {
    val w = QualityClassifier.trainWeights()
    val q = QualityClassifier.quantize(w)
    // training-set separation through the QUANTIZED integer scoring path
    // (exactly what the engines compute: sum of milli-unit weights / n)
    val margins = QualityClassifier.labeledFixture.map { case (text, y) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val logit = toks.map(t =>
        q((graft.ops.PortableHash.jvmStringHash(t) % QualityClassifier.Dim).toInt)).sum
      (y, logit.toDouble / (toks.length * 1000.0))
    }
    val pos = margins.filter(_._1 == 1).map(_._2)
    val neg = margins.filter(_._1 == 0).map(_._2)
    println(s"[probe] pos: n=${pos.size} min=${pos.min}%.4f  neg: n=${neg.size} max=${neg.max}")
    println(s"[probe] separated=${pos.min >= 0.0 && neg.max < 0.0}")
    println(q.grouped(16).map(_.mkString(", ")).mkString(
      "  val table: Array[Long] = Array(\n    ", ",\n    ", ")"))
  }
}
