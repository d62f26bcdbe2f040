package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** int8 scalar quantization contracts the oracle can't pin alone:
  * code-domain bounds, the zero-vector guard, and that searching ON the
  * codes preserves the exact search's ranking within quantization error.
  */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f)),       // all-zero: scale guard
    (4L, Array(-0.5f, 0.25f, 0.125f)),
    (5L, Array(0.6f, 0.59f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("codes are bounded int8, max|x| maps to ±127, zero vector stays defined") {
    val byId = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .select($"vec_id", $"scale", $"qvec")
      .as[(Long, Double, Seq[Int])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    byId.values.foreach { case (_, codes) =>
      assert(codes.forall(c => c >= -127 && c <= 127)) }
    assert(byId(0L)._2 === Seq(127, 0, 0))
    assert(byId(4L)._2 === Seq(-127, 64, 32), "negative max-abs quantizes symmetrically")
    assert(byId(3L) === ((1.0, Seq(0, 0, 0))), "zero vector: scale 1, zero codes, no NaN")
  }

  test("quantized cosine tracks exact cosine within quantization error") {
    val exact = Similarity.bruteForceTopK(vecs.where($"vec_id" =!= 3L),
        vecs.where($"vec_id" === 0L), "vec_id", "embedding", k = 4)
      .select($"c_id", $"sim").as[(Long, Double)].collect().toMap
    val quant = Similarity.quantizedTopK(vecs.where($"vec_id" =!= 3L),
        vecs.where($"vec_id" === 0L), "vec_id", "embedding", k = 4)
      .select($"c_id", $"sim").as[(Long, Double)].collect().toMap
    assert(quant.keySet === exact.keySet)
    exact.foreach { case (id, s) =>
      assert(math.abs(quant(id) - s) < 0.01,
        s"code-domain cosine for $id drifted: exact $s vs quantized ${quant(id)}") }
  }

  test("packed bytes round-trip the codes and pay 1 byte per dimension") {
    val q = Similarity.quantizeInt8(vecs, "vec_id", "embedding")
      .select($"vec_id", $"qvec").as[(Long, Seq[Int])].collect().toMap
    val p = Similarity.quantizePacked(vecs, "vec_id", "embedding")
      .select($"vec_id", $"qcodes").as[(Long, Array[Byte])].collect().toMap
    q.foreach { case (id, codes) =>
      assert(p(id).length === codes.length, "binary must hold exactly d bytes")
      assert(p(id).toSeq.map(_.toInt) === codes,
        s"signed-byte layout must round-trip the codes for $id") }
  }

  test("packed-code search returns exactly the unpacked quantized ranking") {
    val unpacked = Similarity.quantizedTopK(vecs.where($"vec_id" =!= 3L),
        vecs.where($"vec_id" === 0L), "vec_id", "embedding", k = 4)
      .orderBy($"rank").select($"c_id", $"sim").as[(Long, Double)].collect().toSeq
    val packed = Similarity.quantizedTopKPacked(vecs.where($"vec_id" =!= 3L),
        vecs.where($"vec_id" === 0L), "vec_id", "embedding", k = 4)
      .orderBy($"rank").select($"c_id", $"sim").as[(Long, Double)].collect().toSeq
    assert(packed === unpacked,
      "graft_cosine_i8 over packed bytes must be bit-equal to the int-array fold")
  }

  test("quantized ranking equals exact ranking on well-separated vectors") {
    val exact = Similarity.bruteForceTopK(vecs.where($"vec_id" =!= 3L),
        vecs.where($"vec_id" === 0L), "vec_id", "embedding", k = 4)
      .orderBy($"rank").select($"c_id").as[Long].collect().toSeq
    val quant = Similarity.quantizedTopK(vecs.where($"vec_id" =!= 3L),
        vecs.where($"vec_id" === 0L), "vec_id", "embedding", k = 4)
      .orderBy($"rank").select($"c_id").as[Long].collect().toSeq
    assert(quant === exact)
  }
}
