package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * Image decode is REAL: payloads are PNG bytes and the decode path runs
  * `javax.imageio` (ships in the JDK — no new dependency). The oracle
  * cannot decode PNG, so fixtures plant images whose pixels are a pure
  * function of `(media_id, x, y, channel)`; the oracle recomputes the
  * same pixel arithmetic in SQL and the compare closes the loop: if the
  * decoder misreads dims or pixels, the checksum row fails. Video decode
  * would need an external library (ffmpeg-class, not in the JDK) and
  * stays out of scope — frame SAMPLING ([[frameSample]]) operates on raw
  * container bytes and needs no codec.
  *
  * Scale notes: payloads stay in executor memory one batch at a time
  * (mapPartitions is iterator-streaming — no per-partition
  * materialization); the IHDR header parse ([[metaColumnarPng]]) is a
  * codegen'd columnar projection that reads 8 bytes per row and never
  * touches a decoder. Measured at 100k images, local[32]
  * (tools/ProbeMultimodal): full decode+checksum 13k imgs/s, columnar
  * header parse 244k imgs/s (~19× — why the metadata pass must not
  * decode), resize with a second encode/decode round-trip 4.9k imgs/s.
  * Audio at the same scale: full WAV decode+checksum 27k clips/s,
  * columnar RIFF header parse 312k clips/s. All stages are
  * shuffle-free, so cluster throughput is executors × per-core
  * constant. For very large blobs, store payloads out-of-line (object
  * store keys in the column) — the schema below carries `uri` for
  * exactly that.
  */
object Multimodal {

  /** Typed metadata per media object. */
  final case class MediaMeta(width: Int, height: Int, format: String, nBytes: Long)

  /** A multimodal record: opaque payload + typed metadata + optional
    * out-of-line storage key.
    */
  final case class MediaRecord(media_id: Long, kind: String,
                               payload: Array[Byte], uri: String,
                               meta: MediaMeta)

  /** Real-decode outputs (exact integer pixel arithmetic — no float
    * drift between engines).
    */
  final case class DecodedMeta(media_id: Long, width: Int, height: Int,
                               n_pixels: Long, pixel_sum: Long)
  final case class ResizedMeta(media_id: Long, r_width: Int, r_height: Int,
                               r_pixel_sum: Long)
  final case class MediaBins(media_id: Long, bins: Array[Long])

  /** REAL image codec on the JDK's built-in `javax.imageio` (PNG/JPEG —
    * PNG here, because it is lossless: decoded pixels equal planted
    * pixels exactly, which is what lets a SQL oracle verify a binary
    * codec).
    *
    * The planted-pixel convention: an image for id has
    * `width = 3 + id % 14`, `height = 2 + id % 11`, and channel `c` of
    * pixel `(x, y)` holds `(id*31 + x*7 + y*13 + c) % 256`. Linear pixel
    * index `i` (row-major, channel-minor: `c = i%3`,
    * `x = (i/3) % width`, `y = i / (3*width)`) is the shared frame for
    * the feature binning below and its SQL twin.
    */
  object ImageCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    def plantedWidth(id: Long): Int  = (3 + id % 14).toInt
    def plantedHeight(id: Long): Int = (2 + id % 11).toInt

    def pixelValue(id: Long, x: Int, y: Int, c: Int): Int =
      ((id * 31 + x * 7 + y * 13 + c) % 256).toInt

    /** Render the planted image for `id` and encode it as real PNG bytes. */
    def renderPng(id: Long): Array[Byte] = {
      val (w, h) = (plantedWidth(id), plantedHeight(id))
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (pixelValue(id, x, y, 0) << 16) |
            (pixelValue(id, x, y, 1) << 8) | pixelValue(id, x, y, 2))
          x += 1
        }
        y += 1
      }
      encodePng(img)
    }

    def encodePng(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    def decode(payload: Array[Byte]): BufferedImage = {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      require(img != null, "undecodable image payload")
      img
    }

    private def channel(img: BufferedImage, x: Int, y: Int, c: Int): Int =
      (img.getRGB(x, y) >> (16 - 8 * c)) & 0xff

    /** Sum of all channel values of all pixels — the exact-integer
      * checksum the oracle recomputes from the planted formula.
      */
    def pixelSum(img: BufferedImage): Long = {
      var s = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          var c = 0
          while (c < 3) { s += channel(img, x, y, c); c += 1 }
          x += 1
        }
        y += 1
      }
      s
    }

    /** Channel values binned by linear index mod `nBins` (a tiny but
      * real decoded-pixel feature — the plumbing a model embedding would
      * use, with arithmetic a SQL twin can replay exactly).
      */
    def binSums(img: BufferedImage, nBins: Int): Array[Long] = {
      val bins = new Array[Long](nBins)
      val w = img.getWidth
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < 3) {
            bins((3 * (y * w + x) + c) % nBins) += channel(img, x, y, c)
            c += 1
          }
          x += 1
        }
        y += 1
      }
      bins
    }

    /** Planted NEAR-DUPLICATE image groups: ids in a group of 4 share
      * one base image (`base = id div 4`) at a per-member brightness
      * offset (`delta = (id % 4) * 3`, channels clamped at 255). A
      * brightness shift preserves almost every luminance GRADIENT — the
      * signal [[dhash]] fingerprints — flipping only comparisons whose
      * pixels clamp, so group members land within a few hamming bits of
      * each other: the deterministic stand-in for the re-encoded /
      * re-exposed copies of one photo a crawl actually contains.
      */
    def groupBase(id: Long): Long  = id / 4
    def groupDelta(id: Long): Int  = ((id % 4) * 3).toInt

    def groupPixelValue(id: Long, x: Int, y: Int, c: Int): Int =
      math.min(255, pixelValue(groupBase(id), x, y, c) + groupDelta(id))

    /** Render the near-dup-group image for `id` as real PNG bytes. */
    def renderGroupPng(id: Long): Array[Byte] = {
      val base = groupBase(id)
      val (w, h) = (plantedWidth(base), plantedHeight(base))
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (groupPixelValue(id, x, y, 0) << 16) |
            (groupPixelValue(id, x, y, 1) << 8) | groupPixelValue(id, x, y, 2))
          x += 1
        }
        y += 1
      }
      encodePng(img)
    }

    /** 63-bit difference hash (dHash) over the decoded pixels: sample a
      * 9×8 luminance grid with floor/nearest positions
      * (`sx = gx·W div 9`, `sy = gy·H div 8`, gray = (r+g+b) div 3 —
      * all integer, so a SQL oracle replays it exactly), set bit
      * `gy·8+gx` iff the right neighbor is brighter. The final bit
      * (index 63) is dropped to keep the hash a non-negative BIGINT:
      * band extraction below then needs only `div`/`%`, which Spark and
      * DuckDB agree on for non-negative operands (`>>` on a negative
      * would hit arithmetic-vs-logical shift divergence).
      */
    def dhash(img: BufferedImage): Long = {
      val (w, h) = (img.getWidth, img.getHeight)
      val grid = Array.ofDim[Int](9, 8)
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 9) {
          val sx = gx * w / 9
          val sy = gy * h / 8
          grid(gx)(gy) = (channel(img, sx, sy, 0) + channel(img, sx, sy, 1) +
            channel(img, sx, sy, 2)) / 3
          gx += 1
        }
        gy += 1
      }
      var hash = 0L
      var i = 0
      while (i < 63) {
        val (gx, y) = (i % 8, i / 8)
        if (grid(gx + 1)(y) > grid(gx)(y)) hash |= 1L << i
        i += 1
      }
      hash
    }

    /** Nearest-neighbor downscale by 2 (dst(x,y) = src(2x,2y)),
      * ceil-sized so a 1-pixel axis survives.
      */
    def resizeHalf(img: BufferedImage): BufferedImage = {
      val rw = (img.getWidth + 1) / 2
      val rh = (img.getHeight + 1) / 2
      val out = new BufferedImage(rw, rh, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < rh) {
        var x = 0
        while (x < rw) { out.setRGB(x, y, img.getRGB(2 * x, 2 * y)); x += 1 }
        y += 1
      }
      out
    }
  }

  /** REAL multi-frame codec on the JDK's built-in animated-GIF
    * reader/writer (`javax.imageio` ships both; GIF is the one
    * multi-frame format the JDK can decode, so frame sampling gets real
    * codec frames — a true video codec would need an ffmpeg-class
    * external library). Frames are 256-gray INDEXED images: GIF's
    * palette model represents them losslessly, which is what lets the
    * SQL oracle verify per-frame pixel checksums exactly (the planted-
    * pixel convention, per frame).
    *
    * Planted-frame convention: the clip for id has
    * `nf = 2 + id % 4` frames of `(5 + id % 12) × (5 + id % 9)` gray
    * pixels, and pixel `(x, y)` of frame `f` holds
    * `(id*31 + f*17 + x*7 + y*13) % 256`. The dims floor at 5 ON PURPOSE:
    * the JDK's GIF writer/reader pair corrupts rows 2+ of any frame with
    * height ≤ 4 (verified empirically across a 3..20 × 2..14 grid — every
    * height ≤ 4 round-trips wrong, every height ≥ 5 exact), so planted
    * clips stay above the defect and [[renderGif]] enforces it.
    */
  object GifCodec {
    import java.awt.image.{BufferedImage, IndexColorModel}
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.{IIOImage, ImageIO}

    def plantedFrames(id: Long): Int = (2 + id % 4).toInt
    def plantedWidth(id: Long): Int  = (5 + id % 12).toInt
    def plantedHeight(id: Long): Int = (5 + id % 9).toInt

    def pixelValue(id: Long, f: Int, x: Int, y: Int): Int =
      ((id * 31 + f * 17 + x * 7 + y * 13) % 256).toInt

    // identity gray ramp: palette index i = color (i,i,i), so indexed
    // storage round-trips gray values exactly
    private val grayPalette: IndexColorModel = {
      val ramp = Array.tabulate(256)(_.toByte)
      new IndexColorModel(8, 256, ramp, ramp, ramp)
    }

    /** Render the planted frames for `id` as a real animated GIF. */
    def renderGif(id: Long): Array[Byte] = {
      val (w, h) = (plantedWidth(id), plantedHeight(id))
      require(h >= 5, s"JDK GIF codec corrupts frames with height <= 4 (got $h)")
      val bos = new ByteArrayOutputStream()
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val ios = ImageIO.createImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        val nf = plantedFrames(id)
        while (f < nf) {
          val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = pixelValue(id, f, x, y)
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(new IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }

    /** Decode ALL frames back via the real GIF reader. */
    def decodeFrames(payload: Array[Byte]): IndexedSeq[BufferedImage] = {
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        require(n > 0, "undecodable gif payload")
        (0 until n).map(reader.read)
      } finally { reader.dispose(); iis.close() }
    }

    /** Exact-integer gray checksum of one decoded frame. */
    def graySum(img: BufferedImage): Long = {
      var s = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) { s += img.getRGB(x, y) & 0xff; x += 1 }
        y += 1
      }
      s
    }
  }

  /** Plant real animated-GIF payloads, one clip per row of `id`. */
  def attachGifPayload(df: DataFrame, id: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast("long")).as[Long].mapPartitions { it =>
      it.map(i => (i, "video", GifCodec.renderGif(i), s"mem://$i"))
    }.toDF("media_id", "kind", "payload", "uri")
  }

  /** One REALLY-decoded sampled frame: `frame_idx` is the sampled order,
    * `src_frame` the original frame number, checksum over decoded grays.
    */
  final case class SampledFrame(media_id: Long, frame_idx: Int, src_frame: Int,
                                f_width: Int, f_height: Int, f_pixel_sum: Long)

  /** REAL frame sampling: decode every frame of the multi-frame payload
    * with the JDK GIF reader, keep every `stride`-th frame. Iterator-to-
    * iterator mapPartitions like the other codec paths — decode cost is
    * per kept CLIP (the codec must parse preceding frames to compose a
    * frame, so sampling saves checksum work, not parse work; a seekable
    * container format would prune at the byte level — that is what
    * [[frameSample]]'s codec-free chunking models).
    */
  def frameSampleDecoded(df: DataFrame, stride: Int): Dataset[SampledFrame] = {
    require(stride >= 1, "stride must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          GifCodec.decodeFrames(payload).zipWithIndex
            .filter(_._2 % stride == 0)
            .zipWithIndex
            .map { case ((img, f), i) =>
              SampledFrame(id, i, f, img.getWidth, img.getHeight,
                GifCodec.graySum(img))
            }
        }
      }
  }

  /** Twin of [[frameSampleDecoded]]: replay the per-frame planted-pixel
    * formula for the sampled frame numbers.
    */
  def frameSampleDecodedSql(table: String, id: String, stride: Int): String =
    s"""WITH g AS (SELECT $id AS media_id, (5 + $id % 12)::BIGINT AS w,
       |  (5 + $id % 9)::BIGINT AS h, (2 + $id % 4)::BIGINT AS nf FROM $table),
       |fr AS (SELECT media_id, w, h, unnest(generate_series(0, nf - 1)) AS f FROM g),
       |sf AS (SELECT media_id, w, h, f, (f // $stride) AS fi FROM fr WHERE f % $stride = 0),
       |px AS (SELECT media_id, w, h, f, fi,
       |  unnest(generate_series(0, w * h - 1)) AS i FROM sf)
       |SELECT media_id, fi::INT AS frame_idx, f::INT AS src_frame,
       |  w::INT AS f_width, h::INT AS f_height,
       |  CAST(sum((media_id * 31 + f * 17 + (i % w) * 7 + (i // w) * 13) % 256) AS BIGINT)
       |    AS f_pixel_sum
       |FROM px GROUP BY media_id, fi, f, w, h""".stripMargin

  /** Real-decode audio outputs (exact integer arithmetic). */
  final case class DecodedAudio(media_id: Long, sample_rate: Int, n_samples: Long,
                                sample_sum: Long, energy_sum: Long)

  /** REAL audio codec on the JDK's built-in `javax.sound.sampled`
    * (WAV/RIFF PCM — lossless like PNG, so decoded samples equal planted
    * samples exactly and a SQL oracle can verify the codec).
    *
    * Planted-sample convention: audio for id is 16-bit signed mono PCM
    * at 8 kHz with `n = 50 + id % 50` samples,
    * `s(id, t) = ((id*31 + t*7) % 65536) - 32768`.
    */
  object AudioCodec {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    val SampleRate = 8000

    def plantedN(id: Long): Int = (50 + id % 50).toInt

    def sampleValue(id: Long, t: Int): Int =
      (((id * 31 + t * 7) % 65536) - 32768).toInt

    /** Encode 16-bit signed mono samples as real WAV bytes (canonical
      * 44-byte RIFF header + little-endian PCM frames).
      */
    def encodeWav(samples: Array[Int]): Array[Byte] = {
      val pcm = new Array[Byte](samples.length * 2)
      var t = 0
      while (t < samples.length) {
        pcm(2 * t) = (samples(t) & 0xff).toByte // little-endian
        pcm(2 * t + 1) = ((samples(t) >> 8) & 0xff).toByte
        t += 1
      }
      val fmt = new AudioFormat(SampleRate.toFloat, 16, 1, true, false)
      val in = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
        samples.length.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Render the planted samples for `id` as real WAV bytes. */
    def renderWav(id: Long): Array[Byte] =
      encodeWav(Array.tabulate(plantedN(id))(t => sampleValue(id, t)))

    /** GROUPED planted audio — the WAV analog of
      * [[ImageCodec.renderGroupPng]]'s near-dup image groups: four
      * consecutive ids share one base waveform, each member ATTENUATED
      * by gain (16 − m)/16 in truncating integer arithmetic (the
      * re-encoded-at-lower-volume copy shape). Attenuation scales every
      * frame's energy by (almost exactly) the same factor, so the
      * energy-delta fingerprint below is invariant across members while
      * distinct groups stay apart.
      *
      * Group clips are LONGER than the ungrouped fixture's (256–504
      * samples vs 50–99): the fingerprint carries n/8 − 1 comparison
      * bits, and a 5–11-bit sketch space collapses DISTINCT content
      * under a hamming-1 radius (probed: 125 planted groups → 7
      * survivors). 31–62 bits puts random collisions at ~nf²·ham/2^bits
      * — negligible, which is also why real acoustic fingerprints are
      * hundreds of bits.
      */
    def groupN(g: Long): Int = (256 + (g % 32) * 8).toInt

    def groupSample(id: Long, t: Int): Int = {
      val g = id / 4
      val m = (id % 4).toInt
      // the g·t CROSS term is load-bearing: without it, same-length
      // groups are one sawtooth at shifted phase — near-identical energy
      // envelopes, and the fingerprint merges DISTINCT groups (probed:
      // one survivor per length class). The cross term gives each group
      // its own frequency, decorrelating envelopes.
      val base =
        (((g * 2654435761L + t * 2246822519L + g * t * 31L) % 65536) - 32768).toInt
      base * (16 - m) / 16 // truncating division — matches DuckDB `//`
    }

    def renderGroupWav(id: Long): Array[Byte] =
      encodeWav(Array.tabulate(groupN(id / 4))(t => groupSample(id, t)))

    /** Acoustic fingerprint over decoded samples (the chromaprint
      * family's core move, reduced to its deterministic skeleton): cut
      * into `frame`-sample windows (remainder dropped), integer energy
      * per window, bit i = [energy(i+1) > energy(i)] — the SIGN of the
      * energy envelope's change, which gain scaling preserves and
      * different content almost surely flips. Returns
      * (n_frames, fingerprint); fingerprints of different n_frames live
      * in disjoint bit spaces and must never be compared bitwise.
      *
      * Clips longer than 64 frames carry a PREFIX fingerprint: bits cap
      * at 63 comparisons (the chromaprint move — subfingerprints over a
      * window, not one unbounded word). Without the cap `1L << i` wraps
      * mod 64 on the JVM: bit 64 aliases onto bit 0 and unrelated long
      * clips collide, and bit 63 makes the sketch negative — breaking
      * the keeper's div/mod banding and diverging from the oracle's
      * unwrapped `<<`.
      */
    def fingerprint(samples: Array[Int], frame: Int = 8): (Int, Long) = {
      val nf = samples.length / frame
      val e = Array.tabulate(nf) { i =>
        var s = 0L
        var t = i * frame
        while (t < (i + 1) * frame) {
          s += samples(t).toLong * samples(t); t += 1
        }
        s
      }
      var fp = 0L
      var i = 0
      val bits = math.min(nf - 1, 63)
      while (i < bits) {
        if (e(i + 1) > e(i)) fp |= 1L << i
        i += 1
      }
      (nf, fp)
    }

    /** Decode WAV bytes back to (sampleRate, samples) via the real
      * javax.sound parser.
      */
    def decode(payload: Array[Byte]): (Int, Array[Int]) = {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"unexpected audio format: $fmt")
      val bytes = in.readAllBytes()
      val n = bytes.length / 2
      val out = new Array[Int](n)
      var t = 0
      while (t < n) {
        out(t) = ((bytes(2 * t) & 0xff) | (bytes(2 * t + 1) << 8)).toShort.toInt
        t += 1
      }
      (math.round(fmt.getSampleRate), out)
    }
  }

  /** Plant real WAV payloads, one per row of `id` (the audio analog of
    * [[attachPngPayload]]).
    */
  def attachWavPayload(df: DataFrame, id: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast("long")).as[Long].mapPartitions { it =>
      it.map(i => (i, "audio", AudioCodec.renderWav(i), s"mem://$i"))
    }.toDF("media_id", "kind", "payload", "uri")
  }

  /** REAL audio decode: javax.sound parses each WAV payload; emits the
    * format's sample rate + exact integer sample checksum and energy
    * (sum of squares) — the inputs a loudness/VAD filter would gate on.
    */
  def decodeAudio(df: DataFrame): Dataset[DecodedAudio] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val (rate, samples) = AudioCodec.decode(payload)
          var sum = 0L
          var energy = 0L
          var t = 0
          while (t < samples.length) {
            sum += samples(t); energy += samples(t).toLong * samples(t); t += 1
          }
          DecodedAudio(id, rate, samples.length.toLong, sum, energy)
        }
      }
  }

  /** Real-downsample output (exact integer checksum over the kept
    * samples).
    */
  final case class DownsampledAudio(media_id: Long, r_sample_rate: Int,
                                    r_n_samples: Long, r_sample_sum: Long)

  /** REAL audio downsample: decode WAV -> LOW-PASS (2-tap moving
    * average in exact integer arithmetic: out(t) = (s(2t) + s(2t+1)) / 2
    * truncating division, the last window clamped to the final sample)
    * -> keep every 2nd position -> re-encode at half the rate ->
    * re-decode -> checksum. The anti-aliasing filter runs BEFORE
    * decimation, as a production resampler requires; truncating integer
    * division is what both engines' `/` / `//` compute, so the oracle
    * replays the identical filter bit-for-bit. The double round-trip
    * witnesses the filter+decimation and a second full WAV encode/decode
    * cycle, mirroring [[resizeDecoded]] for images.
    */
  def downsampleAudio(df: DataFrame): Dataset[DownsampledAudio] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream}
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val (rate, samples) = AudioCodec.decode(payload)
          val kept = Array.range(0, (samples.length + 1) / 2).map { t =>
            val a = samples(2 * t)
            val b = samples(math.min(2 * t + 1, samples.length - 1))
            (a + b) / 2 // truncating division — matches DuckDB `//`
          }
          val pcm = new Array[Byte](kept.length * 2)
          var t = 0
          while (t < kept.length) {
            pcm(2 * t) = (kept(t) & 0xff).toByte
            pcm(2 * t + 1) = ((kept(t) >> 8) & 0xff).toByte
            t += 1
          }
          val fmt = new AudioFormat(rate / 2f, 16, 1, true, false)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, kept.length.toLong),
            AudioFileFormat.Type.WAVE, bos)
          val (rRate, rSamples) = AudioCodec.decode(bos.toByteArray)
          var sum = 0L
          rSamples.foreach(sum += _)
          DownsampledAudio(id, rRate, rSamples.length.toLong, sum)
        }
      }
  }

  /** Twin of [[downsampleAudio]]: kept sample t = truncating mean of the
    * planted values at 2t and min(2t+1, n−1) — the identical integer
    * low-pass (DuckDB `//` truncates toward zero exactly like Scala `/`).
    */
  def downsampleAudioSql(table: String, id: String): String =
    s"""WITH g AS (SELECT $id AS media_id, (50 + $id % 50)::BIGINT AS n,
       |  (((50 + $id % 50) + 1) // 2)::BIGINT AS rn FROM $table),
       |smp AS (
       |  SELECT media_id, n, rn, unnest(generate_series(0, rn - 1)) AS t FROM g)
       |SELECT media_id, ${AudioCodec.SampleRate / 2} AS r_sample_rate,
       |  rn AS r_n_samples,
       |  CAST(sum(((((media_id * 31 + (t * 2) * 7) % 65536) - 32768)
       |          + (((media_id * 31 + least(t * 2 + 1, n - 1) * 7) % 65536) - 32768)) // 2)
       |    AS BIGINT) AS r_sample_sum
       |FROM smp GROUP BY media_id, rn""".stripMargin

  /** Columnar metadata extraction from the REAL WAV format: channels
    * (uint16 LE at offset 22) and sample rate (uint32 LE at offset 24)
    * of the canonical 44-byte RIFF header, parsed inside Catalyst —
    * little-endian, so bytes are extracted individually and recombined.
    */
  def audioMetaColumnar(df: DataFrame): DataFrame = {
    def leByte(off: Int): String =
      s"cast(conv(hex(substring(payload, ${off + 1}, 1)), 16, 10) AS INT)"
    // the fixed offsets assume the canonical header: 'RIFF' at 0, 'WAVE'
    // at 8, 'fmt ' at 12. A WAV with an extended fmt or LIST chunk before
    // fmt would be silently MISPARSED by the raw offsets — gate the
    // projection on the magic bytes so non-canonical headers yield NULLs
    // (fail loudly downstream) exactly like undecodable PNGs do
    val canonical = "substring(payload, 1, 4) = X'52494646' AND " + // 'RIFF'
      "substring(payload, 9, 4) = X'57415645' AND " +               // 'WAVE'
      "substring(payload, 13, 4) = X'666D7420'"                     // 'fmt '
    df.select(col("media_id"),
      expr(s"IF($canonical, ${leByte(22)} + 256 * ${leByte(23)}, " +
        "cast(NULL AS INT))").as("channels"),
      expr(s"IF($canonical, ${leByte(24)} + 256 * ${leByte(25)} + " +
        s"65536 * ${leByte(26)} + 16777216 * ${leByte(27)}, cast(NULL AS INT))")
        .as("sample_rate"))
  }

  /** Twin of [[decodeAudio]]: replay the planted-sample formula. */
  def decodeAudioSql(table: String, id: String): String =
    s"""WITH g AS (SELECT $id AS media_id, (50 + $id % 50)::BIGINT AS n FROM $table),
       |smp AS (
       |  SELECT media_id, n, unnest(generate_series(0, n - 1)) AS t FROM g),
       |v AS (
       |  SELECT media_id, n, ((media_id * 31 + t * 7) % 65536) - 32768 AS s FROM smp)
       |SELECT media_id, ${AudioCodec.SampleRate} AS sample_rate, n AS n_samples,
       |  CAST(sum(s) AS BIGINT) AS sample_sum,
       |  CAST(sum(s * s) AS BIGINT) AS energy_sum
       |FROM v GROUP BY media_id, n""".stripMargin

  /** Twin of [[audioMetaColumnar]] (the oracle knows the planted format;
    * Spark must recover it from real RIFF header bytes).
    */
  def audioMetaSql(table: String, id: String): String =
    s"""SELECT $id AS media_id, 1 AS channels,
       |  ${AudioCodec.SampleRate} AS sample_rate FROM $table""".stripMargin

  /** Plant real PNG payloads, one per row of `id` — executor-side
    * rendering via mapPartitions (no driver round-trip; the codec
    * allocation cost amortizes per partition exactly like a real
    * decoder's would).
    */
  def attachPngPayload(df: DataFrame, id: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast("long")).as[Long].mapPartitions { it =>
      it.map(i => (i, "image", ImageCodec.renderPng(i), s"mem://$i"))
    }.toDF("media_id", "kind", "payload", "uri")
  }

  /** Synthesize a deterministic binary payload column from a text column
    * (md5 bytes) — the stand-in for VIDEO container bytes, which only
    * [[frameSample]] (byte-level chunking, no codec) consumes.
    */
  def attachFakePayload(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id).cast("long").as("media_id"), lit("video").as("kind"),
      unhex(md5(col(text))).as("payload"),
      concat(lit("mem://"), col(id)).as("uri"))

  /** REAL decode: `javax.imageio` reads each PNG payload; emits dims +
    * the exact-integer pixel checksum. Iterator-to-iterator
    * mapPartitions — the Scala analog of a batched Pandas UDF.
    */
  def decodeMeta(df: DataFrame): Dataset[DecodedMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val img = ImageCodec.decode(payload)
          DecodedMeta(id, img.getWidth, img.getHeight,
            img.getWidth.toLong * img.getHeight,
            ImageCodec.pixelSum(img))
        }
      }
  }

  /** Columnar metadata extraction from the REAL format: PNG's IHDR chunk
    * is spec-pinned to start at byte 8, so width/height are the
    * big-endian uint32s at offsets 16 and 20 — parsed entirely inside
    * Catalyst (substring on binary + hex + conv), no decoder, no UDF,
    * whole-stage codegen. This is the 100 TB metadata pass: 8 bytes
    * examined per blob.
    */
  def metaColumnarPng(df: DataFrame): DataFrame =
    df.select(col("media_id"),
      expr("cast(conv(hex(substring(payload, 17, 4)), 16, 10) AS INT)").as("width"),
      expr("cast(conv(hex(substring(payload, 21, 4)), 16, 10) AS INT)").as("height"))

  /** REAL resize: decode PNG -> nearest-neighbor half-scale -> re-encode
    * PNG -> re-decode -> checksum. The double round-trip makes the
    * emitted checksum witness both the resample and a full
    * encode+decode cycle of the resized image.
    */
  def resizeDecoded(df: DataFrame): Dataset[ResizedMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val resized = ImageCodec.resizeHalf(ImageCodec.decode(payload))
          val roundTripped = ImageCodec.decode(ImageCodec.encodePng(resized))
          ResizedMeta(id, roundTripped.getWidth, roundTripped.getHeight,
            ImageCodec.pixelSum(roundTripped))
        }
      }
  }

  /** Typed view over [[attachPngPayload]] output: metadata REALLY
    * decoded from the payload so the record carries it alongside.
    */
  def toMediaRecords(df: DataFrame): Dataset[MediaRecord] = {
    implicit val enc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    import org.apache.spark.sql.Row
    df.select(col("media_id"), col("kind"), col("payload"), col("uri"))
      .map { (r: Row) =>
        val payload = r.getAs[Array[Byte]]("payload")
        val img = ImageCodec.decode(payload)
        MediaRecord(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
          payload, r.getAs[String]("uri"),
          MediaMeta(img.getWidth, img.getHeight, "png", payload.length.toLong))
      }
  }

  /** Feature extraction over typed records: iterator-to-iterator
    * mapPartitions (one decoder init per partition, streaming batches,
    * bounded memory). Features are 8 binned channel sums over the REAL
    * decoded pixels.
    */
  def featureExtract(ds: Dataset[MediaRecord]): Dataset[MediaBins] = {
    implicit val enc: Encoder[MediaBins] = Encoders.product[MediaBins]
    ds.mapPartitions { it =>
      // per-partition decoder init happens here (once, not per row)
      it.map(r => MediaBins(r.media_id,
        ImageCodec.binSums(ImageCodec.decode(r.payload), 8)))
    }
  }

  /** [[featureExtract]] straight off the payload column — ONE decode per
    * image. The [[toMediaRecords]]∘[[featureExtract]] chain decodes
    * twice (once for the record's metadata, once for the features);
    * when the caller doesn't need the typed record, this is the path.
    */
  def featureExtractFromPayload(df: DataFrame): Dataset[MediaBins] = {
    val spark = df.sparkSession
    import spark.implicits._
    implicit val enc: Encoder[MediaBins] = Encoders.product[MediaBins]
    df.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          MediaBins(id, ImageCodec.binSums(ImageCodec.decode(payload), 8))
        }
      }
  }

  // ---------------------------------------------------------------------
  // DuckDB twins: replay the planted-pixel formula in SQL. `i` is the
  // linear channel index of ImageCodec's scaladoc; every value is exact
  // integer arithmetic so the hash compare is drift-free.
  // ---------------------------------------------------------------------

  private def plantedGrid(table: String, id: String): String =
    s"""SELECT $id AS media_id,
       |  (3 + $id % 14)::BIGINT AS w, (2 + $id % 11)::BIGINT AS h
       |FROM $table""".stripMargin

  /** Twin of [[decodeMeta]]. */
  def decodeMetaSql(table: String, id: String): String =
    s"""WITH g AS (${plantedGrid(table, id)}),
       |px AS (
       |  SELECT media_id, w, h,
       |    unnest(generate_series(0, w * h * 3 - 1)) AS i
       |  FROM g)
       |SELECT media_id, w::INT AS width, h::INT AS height,
       |  (w * h)::BIGINT AS n_pixels,
       |  CAST(sum((media_id * 31 + ((i // 3) % w) * 7 + (i // (3 * w)) * 13
       |            + (i % 3)) % 256) AS BIGINT) AS pixel_sum
       |FROM px GROUP BY media_id, w, h""".stripMargin

  /** Twin of [[metaColumnarPng]] (the oracle knows the planted dims; the
    * Spark side must recover them from real PNG header bytes).
    */
  def metaColumnarSql(table: String, id: String): String =
    s"""SELECT $id AS media_id, (3 + $id % 14)::INT AS width,
       |  (2 + $id % 11)::INT AS height FROM $table""".stripMargin

  /** Twin of [[resizeDecoded]]: resized pixel (x,y,c) = planted value at
    * (2x, 2y, c).
    */
  def resizeSql(table: String, id: String): String =
    s"""WITH g AS (${plantedGrid(table, id)}),
       |r AS (SELECT media_id, ((w + 1) // 2) AS rw, ((h + 1) // 2) AS rh FROM g),
       |px AS (
       |  SELECT media_id, rw, rh,
       |    unnest(generate_series(0, rw * rh * 3 - 1)) AS i
       |  FROM r)
       |SELECT media_id, rw::INT AS r_width, rh::INT AS r_height,
       |  CAST(sum((media_id * 31 + (((i // 3) % rw) * 2) * 7
       |            + ((i // (3 * rw)) * 2) * 13 + (i % 3)) % 256) AS BIGINT)
       |    AS r_pixel_sum
       |FROM px GROUP BY media_id, rw, rh""".stripMargin

  /** Twin of [[featureExtract]]'s 8 bins. */
  def featuresSql(table: String, id: String): String = {
    val bins = (0 until 8).map(j =>
      s"CAST(sum(CASE WHEN i % 8 = $j THEN v END) AS BIGINT) AS f$j").mkString(",\n  ")
    s"""WITH g AS (${plantedGrid(table, id)}),
       |px AS (
       |  SELECT media_id, w, h,
       |    unnest(generate_series(0, w * h * 3 - 1)) AS i
       |  FROM g),
       |v AS (
       |  SELECT media_id, i,
       |    (media_id * 31 + ((i // 3) % w) * 7 + (i // (3 * w)) * 13
       |     + (i % 3)) % 256 AS v
       |  FROM px)
       |SELECT media_id,
       |  $bins
       |FROM v GROUP BY media_id""".stripMargin
  }

  /** Frame sampling for video-kind payloads: every `stride`-th fixed-size
    * chunk becomes a frame row (posexplode keeps frame index). Columnar —
    * the explode multiplies rows, so partition sizing must account for
    * frames-per-video; repartition afterwards if frame fan-out is large.
    * No codec involved: container bytes are chunked as-is (real video
    * decode needs an ffmpeg-class library, out of scope in the JDK).
    */
  def frameSample(df: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    df.select(col("media_id"),
      posexplode(expr(
        s"filter(transform(sequence(0, cast(length(payload) / $frameBytes AS INT) - 1), " +
          s"i -> IF(i % $stride = 0, substring(payload, i * $frameBytes + 1, $frameBytes), " +
          s"cast(null AS BINARY))), x -> x IS NOT NULL)")))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_payload")

  /** DuckDB twin of [[frameSample]] over [[attachFakePayload]]'s
    * synthesized 16-byte payload (byte p of the payload = hex digits
    * 2p+1..2p+2 of md5(text)); frames emitted as hex strings for the
    * engine-portable compare.
    */
  def frameSampleSql(table: String, id: String, text: String,
                     frameBytes: Int, stride: Int): String = {
    val nChunks = 16 / frameBytes
    s"""SELECT media_id, frame_idx, frame_hex FROM (
       |  SELECT $id AS media_id,
       |    unnest(list_transform(list_filter(generate_series(0, ${nChunks - 1}), x -> x % $stride = 0),
       |      x -> struct_pack(frame_idx := x // $stride,
       |                       frame_hex := substr(md5($text), x * ${frameBytes * 2} + 1, ${frameBytes * 2}))),
       |      recursive := true)
       |  FROM $table)""".stripMargin
  }

  // ==================== perceptual-hash image dedup ====================

  final case class Phashed(media_id: Long, phash: Long)

  /** Plant the near-dup-group PNG payloads ([[ImageCodec.renderGroupPng]]:
    * groups of 4 ids share a base image at stepped brightness) — the
    * fixture for [[perceptualHash]]/[[dedupPhashKeepers]], rendered
    * executor-side like [[attachPngPayload]].
    */
  def attachGroupedPngPayload(df: DataFrame, id: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast("long")).as[Long].mapPartitions { it =>
      it.map(i => (i, "image", ImageCodec.renderGroupPng(i), s"mem://$i"))
    }.toDF("media_id", "kind", "payload", "uri")
  }

  /** REAL-decode perceptual hashing: `javax.imageio` reads each PNG, the
    * 63-bit dHash ([[ImageCodec.dhash]]) fingerprints its luminance
    * gradients. One scan, zero shuffle, iterator-to-iterator
    * mapPartitions (decoder amortized per partition) — the image-side
    * analog of [[graft.ops.Dedup.simhash]]: a 63-bit sketch per item
    * that near-duplicate detection then bands.
    */
  def perceptualHash(df: DataFrame): Dataset[Phashed] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          Phashed(id, ImageCodec.dhash(ImageCodec.decode(payload)))
        }
      }
  }

  /** Shared gray-grid SQL fragment: luminance at dHash grid cell
    * (`gx`, `gy`) replayed from the planted GROUP formula (base/delta
    * from media_id, channels clamped at 255, integer floor sampling) —
    * exactly what [[ImageCodec.dhash]] reads off the decoded pixels.
    */
  private def duckGroupGray(gx: String, gy: String): String = {
    val chans = (0 to 2).map(c =>
      s"least(255, ((base * 31 + ((($gx) * w) // 9) * 7 + ((($gy) * h) // 8) * 13 + $c) % 256) + delta)")
    s"((${chans.mkString(" + ")}) // 3)"
  }

  /** Twin of [[perceptualHash]] over [[attachGroupedPngPayload]]'s
    * planted groups: the oracle never decodes a PNG — it replays the
    * planted-pixel formula at the 72 grid positions and rebuilds the
    * same 63 comparison bits.
    */
  def perceptualHashSql(table: String, id: String): String =
    s"""WITH g AS (
       |  SELECT $id AS media_id, $id // 4 AS base, ($id % 4) * 3 AS delta,
       |    (3 + ($id // 4) % 14)::BIGINT AS w, (2 + ($id // 4) % 11)::BIGINT AS h
       |  FROM $table)
       |SELECT media_id,
       |  list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(0, 62), i ->
       |    CASE WHEN ${duckGroupGray("i % 8 + 1", "i // 8")} > ${duckGroupGray("i % 8", "i // 8")}
       |         THEN (1::BIGINT << i) ELSE 0::BIGINT END)),
       |    (a, b) -> a + b) AS phash
       |FROM g""".stripMargin

  /** Near-duplicate image dedup over dHash: exact-equal hashes collapse
    * to their min-id REPRESENTATIVE first (one linear groupBy — this is
    * where the boilerplate mass goes: a crawl's millions of blank /
    * placeholder / identical-ramp images are hash-EQUAL, and banding
    * them raw puts k copies in every band bucket → Θ(k²) candidates;
    * probed at 100k planted images, the raw-row form never finished
    * while this form runs in seconds), then LSH banding over DISTINCT
    * hashes only (four 16-bit bands — near-dup hashes agree on ≥ 1
    * whole band at hamming ≤ `maxHamming` of 63) proposes candidate
    * representative pairs, `bit_count(xor)` verifies, and the keeper
    * rule drops any image with a qualifying lower-id neighbor.
    *
    * The representative collapse preserves the pairwise semantics
    * EXACTLY: image i has a neighbor j < i with ham ≤ t  ⇔  i is not
    * its hash's min-id (j = rep, ham 0), or its hash's rep is dominated
    * by a rep of another in-radius hash with smaller id (minId(H') < i
    * ⇔ some member of H' < i, since minId is the member minimum) —
    * spec-pinned against the brute-force all-pairs form. Exchanges
    * carry (hash64, id) pairs only; the candidate join is over distinct
    * hashes, Θ(Σ per-bucket distinct²) — content diversity, not copy
    * count, bounds the buckets (residual skew: a near-identical
    * distinct-hash clique is the same documented trade as
    * [[graft.ops.Dedup.minhashLshPairs]]).
    */
  def dedupPhashKeepers(phashed: DataFrame, maxHamming: Int = 8): DataFrame =
    Dedup.hammingKeepers(phashed, "media_id", "phash",
      bits = 64, bands = 4, maxHamming = maxHamming)

  /** DuckDB twin of [[dedupPhashKeepers]] over the planted groups. */
  def dedupPhashKeepersSql(table: String, id: String,
                           maxHamming: Int = 8): String =
    Dedup.hammingKeepersSql(perceptualHashSql(table, id), "media_id", "phash",
      bits = 64, bands = 4, maxHamming = maxHamming)

  /** Plant GROUPED real WAV payloads (four consecutive ids share one
    * base waveform at stepped attenuation) — the audio analog of
    * [[attachGroupedPngPayload]].
    */
  def attachGroupedWavPayload(df: DataFrame, id: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id).cast("long")).as[Long].mapPartitions { it =>
      it.map(i => (i, "audio", AudioCodec.renderGroupWav(i), s"mem://$i"))
    }.toDF("media_id", "kind", "payload", "uri")
  }

  final case class AudioFp(media_id: Long, n_frames: Int, afp: Long)

  /** REAL-decode acoustic fingerprinting: javax.sound parses each WAV,
    * [[AudioCodec.fingerprint]] sketches the sign of its frame-energy
    * envelope — the audio-side analog of [[perceptualHash]]: a compact
    * per-item sketch that near-duplicate detection then bands. One
    * scan, zero shuffle, iterator-to-iterator mapPartitions.
    */
  def audioFingerprint(df: DataFrame): Dataset[AudioFp] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val (_, samples) = AudioCodec.decode(payload)
          val (nf, fp) = AudioCodec.fingerprint(samples)
          AudioFp(id, nf, fp)
        }
      }
  }

  /** Twin of [[audioFingerprint]] over [[attachGroupedWavPayload]]'s
    * planted groups: the oracle never parses a WAV — it replays the
    * attenuated planted-sample formula, the 8-sample frame energies,
    * and the same comparison bits.
    */
  def audioFingerprintSql(table: String, id: String): String =
    s"""WITH g AS (
       |  SELECT $id AS media_id, $id // 4 AS grp, $id % 4 AS m,
       |    (256 + (($id // 4) % 32) * 8)::BIGINT AS n
       |  FROM $table),
       |smp AS (
       |  SELECT media_id, (n // 8)::INT AS n_frames, grp, m,
       |    unnest(generate_series(0, (n // 8) * 8 - 1)) AS t
       |  FROM g),
       |fr AS (
       |  SELECT media_id, n_frames, t // 8 AS f, sum(s * s) AS e
       |  FROM (SELECT media_id, n_frames, t,
       |          ((((grp * 2654435761 + t * 2246822519 + grp * t * 31) % 65536)
       |            - 32768) * (16 - m)) // 16 AS s
       |        FROM smp)
       |  GROUP BY 1, 2, 3),
       |bits AS (
       |  SELECT media_id, n_frames, f, e,
       |    lead(e) OVER (PARTITION BY media_id ORDER BY f) AS e_next
       |  FROM fr)
       |SELECT media_id, n_frames,
       |  CAST(coalesce(sum(CASE WHEN f < 63 AND e_next > e
       |                         THEN (1::BIGINT << f)
       |                         ELSE 0 END), 0) AS BIGINT) AS afp
       |FROM bits GROUP BY 1, 2""".stripMargin

  /** Near-duplicate audio dedup over the energy-envelope fingerprint:
    * the shared ≤ 64-bit hamming keeper engine
    * ([[graft.ops.Dedup.hammingKeepers]]) with `n_frames` as the GROUP
    * key — fingerprints of different frame counts occupy disjoint bit
    * spaces (bit i exists only below n_frames − 1), so cross-length
    * comparisons are structurally excluded rather than probabilistically
    * unlikely. Within a length class: exact-equal collapse to min-id
    * reps, 3 × 21-bit band LSH over distinct sketches, `bit_count(xor)`
    * verify at hamming ≤ `maxHamming`.
    */
  def dedupAudioKeepers(fps: DataFrame, maxHamming: Int = 1): DataFrame =
    Dedup.hammingKeepers(fps, "media_id", "afp",
      bits = 63, bands = 3, maxHamming = maxHamming,
      groupCols = Seq("n_frames"))

  /** DuckDB twin of [[dedupAudioKeepers]] over the planted groups. */
  def dedupAudioKeepersSql(table: String, id: String,
                           maxHamming: Int = 1): String =
    Dedup.hammingKeepersSql(audioFingerprintSql(table, id), "media_id", "afp",
      bits = 63, bands = 3, maxHamming = maxHamming,
      groupCols = Seq("n_frames"))
}
