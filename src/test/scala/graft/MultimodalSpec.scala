package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal
import graft.ops.Multimodal.ImageCodec

/** The REAL image path: planted pixels -> PNG encode (javax.imageio) ->
  * decode -> exact pixel recovery. PNG is lossless, so every decoded
  * value must equal the planted formula bit-for-bit — the property the
  * DuckDB oracle relies on to verify a binary codec it cannot run.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("PNG encode/decode round-trips planted pixels exactly") {
    for (id <- Seq(0L, 1L, 7L, 255L, 499L)) {
      val img = ImageCodec.decode(ImageCodec.renderPng(id))
      assert(img.getWidth === ImageCodec.plantedWidth(id))
      assert(img.getHeight === ImageCodec.plantedHeight(id))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) === ImageCodec.pixelValue(id, x, y, 0))
        assert(((rgb >> 8) & 0xff) === ImageCodec.pixelValue(id, x, y, 1))
        assert((rgb & 0xff) === ImageCodec.pixelValue(id, x, y, 2))
      }
    }
  }

  test("decodeMeta recovers dims and pixel checksum from real PNG bytes") {
    val docs = (0L to 9L).toDF("doc_id")
    val out = Multimodal.decodeMeta(Multimodal.attachPngPayload(docs, "doc_id"))
      .collect().map(m => m.media_id -> m).toMap
    for (id <- 0L to 9L) {
      val (w, h) = (ImageCodec.plantedWidth(id), ImageCodec.plantedHeight(id))
      val expected = (for {
        y <- 0 until h; x <- 0 until w; c <- 0 until 3
      } yield ImageCodec.pixelValue(id, x, y, c).toLong).sum
      assert(out(id).width === w && out(id).height === h)
      assert(out(id).n_pixels === w.toLong * h)
      assert(out(id).pixel_sum === expected, s"id=$id")
    }
  }

  test("columnar IHDR parse reads width/height from real PNG header bytes in codegen") {
    val docs = (0L to 19L).toDF("doc_id")
    val q = Multimodal.metaColumnarPng(Multimodal.attachPngPayload(docs, "doc_id"))
    // no UDF in the plan: the parse must stay inside Catalyst
    assert(!q.queryExecution.executedPlan.toString.toLowerCase.contains("udf"))
    q.collect().foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === ImageCodec.plantedWidth(id))
      assert(r.getInt(2) === ImageCodec.plantedHeight(id))
    }
  }

  test("resize halves dims via nearest-neighbor and survives a second PNG round-trip") {
    val docs = (0L to 9L).toDF("doc_id")
    val out = Multimodal.resizeDecoded(Multimodal.attachPngPayload(docs, "doc_id"))
      .collect().map(m => m.media_id -> m).toMap
    for (id <- 0L to 9L) {
      val (w, h) = (ImageCodec.plantedWidth(id), ImageCodec.plantedHeight(id))
      val (rw, rh) = ((w + 1) / 2, (h + 1) / 2)
      val expected = (for {
        y <- 0 until rh; x <- 0 until rw; c <- 0 until 3
      } yield ImageCodec.pixelValue(id, 2 * x, 2 * y, c).toLong).sum
      assert(out(id).r_width === rw && out(id).r_height === rh)
      assert(out(id).r_pixel_sum === expected, s"id=$id")
    }
  }

  test("feature bins over decoded pixels match the linear-index formula") {
    val docs = (0L to 9L).toDF("doc_id")
    val feats = Multimodal.featureExtract(
      Multimodal.toMediaRecords(Multimodal.attachPngPayload(docs, "doc_id")))
      .collect().map(m => m.media_id -> m.bins).toMap
    for (id <- 0L to 9L) {
      val (w, h) = (ImageCodec.plantedWidth(id), ImageCodec.plantedHeight(id))
      val expected = new Array[Long](8)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        expected((3 * (y * w + x) + c) % 8) += ImageCodec.pixelValue(id, x, y, c)
      assert(feats(id).toSeq === expected.toSeq, s"id=$id")
    }
  }

  test("WAV encode/decode round-trips planted samples exactly") {
    import graft.ops.Multimodal.AudioCodec
    for (id <- Seq(0L, 1L, 49L, 255L)) {
      val (rate, samples) = AudioCodec.decode(AudioCodec.renderWav(id))
      assert(rate === AudioCodec.SampleRate)
      assert(samples.length === AudioCodec.plantedN(id))
      samples.zipWithIndex.foreach { case (s, t) =>
        assert(s === AudioCodec.sampleValue(id, t), s"id=$id t=$t")
      }
    }
  }

  test("audio decode + columnar RIFF parse recover format from real WAV bytes") {
    val docs = (0L to 9L).toDF("doc_id")
    val media = Multimodal.attachWavPayload(docs, "doc_id")
    val dec = Multimodal.decodeAudio(media).collect().map(a => a.media_id -> a).toMap
    for (id <- 0L to 9L) {
      val n = Multimodal.AudioCodec.plantedN(id)
      val vals = (0 until n).map(Multimodal.AudioCodec.sampleValue(id, _).toLong)
      assert(dec(id).sample_rate === Multimodal.AudioCodec.SampleRate)
      assert(dec(id).n_samples === n.toLong)
      assert(dec(id).sample_sum === vals.sum)
      assert(dec(id).energy_sum === vals.map(v => v * v).sum)
    }
    val hdr = Multimodal.audioMetaColumnar(media)
    assert(!hdr.queryExecution.executedPlan.toString.toLowerCase.contains("udf"))
    hdr.collect().foreach { r =>
      assert(r.getInt(1) === 1, "channels")
      assert(r.getInt(2) === Multimodal.AudioCodec.SampleRate, "sample_rate")
    }
  }

  test("audio downsample: low-pass + decimation by 2 survives the second WAV round-trip") {
    import graft.ops.Multimodal.AudioCodec
    val docs = (0L to 5L).toDF("doc_id")
    val out = Multimodal.downsampleAudio(Multimodal.attachWavPayload(docs, "doc_id"))
      .collect().map(a => a.media_id -> a).toMap
    for (id <- 0L to 5L) {
      val n = AudioCodec.plantedN(id)
      val rn = (n + 1) / 2
      // 2-tap integer moving average (last window clamped), then keep
      // every 2nd position — truncating division like the op and oracle
      val expected = (0 until rn).map { t =>
        val a = AudioCodec.sampleValue(id, 2 * t)
        val b = AudioCodec.sampleValue(id, math.min(2 * t + 1, n - 1))
        ((a + b) / 2).toLong
      }.sum
      assert(out(id).r_sample_rate === AudioCodec.SampleRate / 2)
      assert(out(id).r_n_samples === rn.toLong)
      assert(out(id).r_sample_sum === expected, s"id=$id")
    }
  }

  test("animated GIF round-trips planted frames exactly; stride sampling keeps every 2nd") {
    import graft.ops.Multimodal.GifCodec
    // direct codec round-trip: every frame, every pixel — 0..35 covers
    // every (width, height, frame-count) residue combination
    for (id <- 0L to 35L) {
      val frames = GifCodec.decodeFrames(GifCodec.renderGif(id))
      assert(frames.size === GifCodec.plantedFrames(id), s"id=$id frame count")
      frames.zipWithIndex.foreach { case (img, f) =>
        for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
          assert((img.getRGB(x, y) & 0xff) === GifCodec.pixelValue(id, f, x, y),
            s"id=$id f=$f ($x,$y)")
      }
    }
    // the distributed op: sampled frames carry the right src_frame + sum
    val docs = (0L to 9L).toDF("doc_id")
    val out = Multimodal.frameSampleDecoded(
      Multimodal.attachGifPayload(docs, "doc_id"), stride = 2)
      .collect().map(s => (s.media_id, s.frame_idx) -> s).toMap
    for (id <- 0L to 9L) {
      val nf = GifCodec.plantedFrames(id)
      val sampled = (0 until nf).filter(_ % 2 == 0)
      assert(out.count(_._1._1 == id) === sampled.size)
      sampled.zipWithIndex.foreach { case (f, i) =>
        val s = out((id, i))
        val w = GifCodec.plantedWidth(id)
        val h = GifCodec.plantedHeight(id)
        val expected = (for (y <- 0 until h; x <- 0 until w)
          yield GifCodec.pixelValue(id, f, x, y).toLong).sum
        assert(s.src_frame === f && s.f_width === w && s.f_height === h)
        assert(s.f_pixel_sum === expected, s"id=$id f=$f")
      }
    }
  }

  test("undecodable payload fails loudly, not silently") {
    val e = intercept[Exception] {
      ImageCodec.decode(Array[Byte](1, 2, 3, 4))
    }
    assert(e.getMessage.contains("undecodable"))
  }

  test("audio fingerprint: gain-invariant within a planted group, groups decorrelated") {
    val docs = (0L until 160L).toDF("doc_id")
    val fps = Multimodal.audioFingerprint(
      Multimodal.attachGroupedWavPayload(docs, "doc_id"))
      .collect().map(f => f.media_id -> (f.n_frames, f.afp)).toMap
    // members of a group: same frame count, fingerprint within hamming 1
    for (g <- 0L until 40L; m <- 1 to 3) {
      val (nf0, fp0) = fps(4 * g)
      val (nfM, fpM) = fps(4 * g + m)
      assert(nf0 === nfM)
      assert(java.lang.Long.bitCount(fp0 ^ fpM) <= 1,
        s"group $g member $m drifted: ${fp0.toBinaryString} vs ${fpM.toBinaryString}")
    }
    // distinct groups of the SAME length class stay far apart
    val byNf = fps.toSeq.collect { case (id, (nf, fp)) if id % 4 == 0 => (nf, fp) }
      .groupBy(_._1).values.filter(_.size > 1)
    assert(byNf.nonEmpty, "fixture must exercise shared length classes")
    byNf.foreach { cls =>
      val reps = cls.map(_._2).toSeq
      for (i <- reps.indices; j <- i + 1 until reps.size)
        assert(java.lang.Long.bitCount(reps(i) ^ reps(j)) > 1,
          s"distinct groups must not sit within the dedup radius: $cls")
    }
  }

  test("audio fingerprint caps at 63 comparison bits: long clips get a non-negative prefix sketch") {
    import graft.ops.Multimodal.AudioCodec
    // 1000 samples -> 125 frames: without the cap, bit 64 would wrap
    // onto bit 0 and bit 63 would flip the sign
    val samples = Array.tabulate(1000)(t => ((t * 7919) % 65536) - 32768)
    val (nf, fp) = AudioCodec.fingerprint(samples)
    assert(nf === 125)
    assert(fp >= 0L, "sketch must stay a non-negative 63-bit word")
    // the prefix property: the first 64 frames alone give the same bits
    val (_, fpPrefix) = AudioCodec.fingerprint(samples.take(64 * 8))
    assert(fp === fpPrefix, "bits beyond frame 63 never reach the sketch")
  }

  test("dedupAudioKeepers: one lowest-id survivor per planted group; lengths never cross") {
    val docs = (0L until 160L).toDF("doc_id")
    val fps = Multimodal.audioFingerprint(
      Multimodal.attachGroupedWavPayload(docs, "doc_id")).toDF()
    val keepers = Multimodal.dedupAudioKeepers(fps)
      .select($"media_id").as[Long].collect().toSet
    assert(keepers === (0L until 40L).map(_ * 4).toSet,
      "exactly the lowest id of each group of 4 survives")
    // same fingerprint bits at DIFFERENT lengths must both survive:
    // the group column scopes the neighborhood structurally
    val synth = Seq((1L, 10, 5L), (2L, 12, 5L)).toDF("media_id", "n_frames", "afp")
    val survivors = Multimodal.dedupAudioKeepers(synth)
      .select($"media_id").as[Long].collect().toSet
    assert(survivors === Set(1L, 2L),
      "equal bit patterns at different n_frames are not duplicates")
  }
}
