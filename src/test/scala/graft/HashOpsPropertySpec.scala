package graft

import graft.functions.HashOps
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the native hash kernels against independent JVM
  * reference implementations — no Spark session needed, so these cover
  * the kernels over seeded-random (including non-ASCII) inputs far
  * beyond what the fixture corpora exercise.
  */
class HashOpsPropertySpec extends AnyFunSuite {

  private def randString(r: scala.util.Random): String = {
    val n = r.nextInt(12)
    (0 until n).map { _ =>
      r.nextInt(4) match {
        case 0 => ('a' + r.nextInt(26)).toChar.toString
        case 1 => ('0' + r.nextInt(10)).toChar.toString
        case 2 => val pool = "中文测试繁體字Ωßü€"; pool(r.nextInt(pool.length)).toString
        case _ => val e = r.nextInt(2); "😀🚀".substring(2 * e, 2 * e + 2)
      }
    }.mkString
  }

  test("hashUtf8 equals the hex-string reference for random unicode strings") {
    val r = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val s = randString(r)
      assert(HashOps.hashUtf8(UTF8String.fromString(s)) ===
        graft.ops.PortableHash.jvmStringHash(s), s"for string '$s'")
    }
  }

  test("classifierLogit equals the per-token hash-and-weight reference") {
    val r = new scala.util.Random(47)
    val dim = 4096
    def refWeight(s: String): Long = {
      val idx = graft.ops.PortableHash.jvmStringHash(s) % dim
      ((idx * 37 + 11) % 2001) - 1000
    }
    (1 to 200).foreach { _ =>
      val words = Seq.fill(r.nextInt(30))(randString(r))
      val arr = new GenericArrayData(words.map(UTF8String.fromString).toArray[Any])
      val want = words.filter(_.nonEmpty).map(refWeight).sum
      assert(HashOps.classifierLogit(arr, dim) === want, s"for $words")
    }
  }

  test("sortedIntersectCount equals set intersection size for random long sets") {
    val r = new scala.util.Random(43)
    (1 to 500).foreach { _ =>
      val a = Set.fill(r.nextInt(40))(r.nextInt(50).toLong)
      val b = Set.fill(r.nextInt(40))(r.nextInt(50).toLong)
      val got = HashOps.sortedIntersectCount(
        new GenericArrayData(a.toArray.sorted), new GenericArrayData(b.toArray.sorted))
      assert(got === (a intersect b).size)
    }
  }

  test("shingleHashes equals shingle-then-hash-then-distinct reference") {
    val r = new scala.util.Random(44)
    (1 to 300).foreach { _ =>
      val ws = List.fill(r.nextInt(10))(randString(r).replace(" ", "x"))
      val arr = new GenericArrayData(ws.map(UTF8String.fromString).toArray[Any])
      val got = HashOps.shingleHashes(arr, 3).toLongArray().toSeq
      val want =
        if (ws.size < 3) Seq.empty
        else ws.sliding(3).map(_.mkString(" "))
          .map(graft.ops.PortableHash.jvmStringHash).toSeq.distinct
      assert(got === want, s"for words $ws")
    }
  }

  test("minhashSig minima match a brute-force reference") {
    val r = new scala.util.Random(45)
    (1 to 300).foreach { _ =>
      val hs = List.fill(1 + r.nextInt(30))(math.floorMod(r.nextLong(), HashOps.P))
      val got = HashOps.minhashSig(new GenericArrayData(hs.toArray), 8)
        .toLongArray().toSeq
      val want = (0 until 8).map { i =>
        hs.map(h => ((37L + 61L * i) * h + (101L + 97L * i)) % HashOps.P).min
      }
      assert(got === want)
    }
  }

  test("tokenCount equals the Java-regex reference incl. CJK and astral chars") {
    val pat = java.util.regex.Pattern.compile("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]")
    val r = new scala.util.Random(47)
    (1 to 500).foreach { _ =>
      val s = (0 until r.nextInt(6)).map(_ => randString(r)).mkString(" ")
      val m = pat.matcher(s)
      var want = 0
      while (m.find()) want += 1
      assert(HashOps.tokenCount(UTF8String.fromString(s)) === want, s"for '$s'")
    }
  }

  test("alphaCount equals the regex-replace reference") {
    val r = new scala.util.Random(48)
    (1 to 500).foreach { _ =>
      val s = (0 until r.nextInt(6)).map(_ => randString(r)).mkString(" ")
      val want = s.replaceAll("[^a-zA-Z]", "").length
      assert(HashOps.alphaCount(UTF8String.fromString(s)) === want, s"for '$s'")
    }
  }

  test("topk heap keeps exactly the (sim DESC, id ASC) winners") {
    val cmp = graft.functions.TopKAgg.WorstOnTop
    val r = new scala.util.Random(46)
    (1 to 300).foreach { _ =>
      // duplicate sims likely (coarse rounding) to exercise the tie-break
      val items = List.fill(1 + r.nextInt(30))(
        (math.floor(r.nextDouble() * 10) / 10.0, r.nextInt(20).toLong)).distinct
      val k = 1 + r.nextInt(5)
      val pq = new java.util.PriorityQueue[(Double, Long)](k + 1, cmp)
      items.foreach { it =>
        if (pq.size < k) pq.add(it)
        else if (cmp.compare(it, pq.peek()) > 0) { pq.poll(); pq.add(it) }
      }
      val kept = Iterator.continually(pq.poll()).takeWhile(_ != null).toSet
      val want = items.sortBy { case (s, id) => (-s, id) }.take(k).toSet
      assert(kept === want, s"items=$items k=$k")
    }
  }
}
