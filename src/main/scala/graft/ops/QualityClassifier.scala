package graft.ops

/** TRAINED model-based quality filtering — the learning half of the
  * fastText-classifier stage ([[TextAnalysis.hashClassifierScore]] is
  * the structural twin with documented placeholder weights): logistic
  * regression over the bounded hashed bag-of-words feature space,
  * trained on a PLANTED labeled fixture (this container can neither
  * download a labeled corpus nor ship an external model, so the fixture
  * is the committed stand-in for one — the algorithm, feature space,
  * and scoring path are exactly what a real deployment uses; swapping
  * the fixture for real labels changes nothing structural).
  *
  * The learned weight table is COMMITTED like the BPE merge table
  * ([[Bpe.merges]]): [[Weights]] is a source literal, and
  * [[trainWeights]] re-derives it deterministically — QualityClassifierSpec
  * pins `quantize(trainWeights()) == Weights` (reproducibility) and
  * planted-fixture separation through the ENGINE scoring path.
  *
  * Exact cross-engine arithmetic: training happens in doubles, but the
  * committed table is QUANTIZED to integer milli-units
  * (`round(w · 1000)`), so the per-doc logit stays an exact integer sum
  * (the [[TextAnalysis.hashClassifierScore]] contract) and the oracle
  * hashes bit-identically. The decision rule `score >= 0` is the LR
  * decision boundary (sigmoid is monotone; the fixture is balanced and
  * trained without bias).
  *
  * Training is full-batch gradient descent in a FIXED iteration order —
  * deterministic IEEE double arithmetic, no RNG anywhere (init = zeros,
  * the fixture is a source constant), so every rebuild reproduces the
  * committed table bit-for-bit.
  */
object QualityClassifier {

  /** Hashed feature space size. Small enough that the oracle's literal
    * weight list stays a readable SQL fragment; the real knob at scale
    * is the same code with a bigger table.
    */
  val Dim = 256

  /** The planted labeled fixture: label 1 = the prose register a
    * pretraining filter keeps (varied vocabulary, function words,
    * sentence shape), label 0 = the boilerplate/spam/gibberish register
    * it drops (imperative spam n-grams, keyword stuffing, repetition,
    * entropy-less token salad). Balanced 40/40; every doc is a source
    * constant so training is reproducible.
    */
  lazy val labeledFixture: Seq[(String, Int)] = {
    val subjects = Seq("the scientist", "a historian", "the committee",
      "our neighbor", "the engineer", "a musician", "the teacher",
      "the author")
    val verbs = Seq("described", "examined", "measured", "explained",
      "recorded")
    val objects = Seq("the ancient manuscript in careful detail",
      "how rivers shape the surrounding valleys over time",
      "the slow recovery of the coastal ecosystem",
      "a practical method for storing seasonal rainwater",
      "the origins of the regional trading routes")
    val positives = for {
      (s, i) <- subjects.zipWithIndex
      (v, j) <- verbs.zipWithIndex
    } yield s"$s $v ${objects((i + j) % objects.size)}"
    val spamLead = Seq("click here", "buy now", "free offer", "act fast",
      "limited deal", "winner winner", "cash prize", "hot singles")
    val spamTail = Seq("subscribe subscribe subscribe to win big money",
      "best cheap pills online no prescription needed today",
      "xxqzj vvkpw zzrtl qqmnf hjkdd llorw random token salad",
      "click click click the link the link the link now",
      "100 percent guaranteed instant results doctors hate this")
    val negatives = for {
      (l, i) <- spamLead.zipWithIndex
      (t, j) <- spamTail.zipWithIndex
    } yield s"$l $t ${spamLead((i + j) % spamLead.size)}"
    positives.take(40).map(_ -> 1) ++ negatives.take(40).map(_ -> 0)
  }

  private def featureIndex(token: String): Int =
    (PortableHash.jvmStringHash(token) % Dim).toInt

  /** Mean-of-token-features vector of one doc (the scoring side divides
    * the integer logit by n_tokens, so the trained weights must be
    * learned over the SAME normalization).
    */
  private def featuresOf(text: String): Array[Double] = {
    val x = new Array[Double](Dim)
    val toks = text.split(" ").filter(_.nonEmpty)
    toks.foreach(t => x(featureIndex(t)) += 1.0)
    if (toks.nonEmpty) { var i = 0; while (i < Dim) { x(i) /= toks.length; i += 1 } }
    x
  }

  /** Deterministic full-batch logistic regression (no bias, init zeros,
    * fixed epoch/row order). Returns the raw double weights.
    */
  def trainWeights(fixture: Seq[(String, Int)] = labeledFixture,
                   epochs: Int = 400, lr: Double = 8.0): Array[Double] = {
    val rows = fixture.map { case (text, y) => (featuresOf(text), y.toDouble) }
    val w = new Array[Double](Dim)
    for (_ <- 1 to epochs) {
      val grad = new Array[Double](Dim)
      rows.foreach { case (x, y) =>
        var dot = 0.0
        var i = 0
        while (i < Dim) { dot += w(i) * x(i); i += 1 }
        val p = 1.0 / (1.0 + math.exp(-dot))
        val g = p - y
        i = 0
        while (i < Dim) { grad(i) += g * x(i); i += 1 }
      }
      var i = 0
      while (i < Dim) { w(i) -= lr * grad(i) / rows.size; i += 1 }
    }
    w
  }

  /** Milli-unit quantization: the committed integer table the engines
    * score with (exact integer logits on both sides).
    */
  def quantize(w: Array[Double]): Array[Long] = w.map(x => math.round(x * 1000.0))

  /** The committed trained weight table (milli-units) —
    * `quantize(trainWeights())`, frozen as a literal so the artifact is
    * auditable in-source; QualityClassifierSpec re-derives and compares.
    */
  val Weights: Array[Long] = QualityClassifierWeights.table

  require(Weights.length == Dim, "committed weight table must cover Dim buckets")
}
