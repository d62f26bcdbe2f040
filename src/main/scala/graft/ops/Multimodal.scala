package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * The container ships no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub ([[FakeCodec]]) — the Spark-side
  * plumbing (schema, batch shape, partitioning, iterator-to-iterator
  * mapPartitions) is real and tested. In production, swap `FakeCodec`
  * for a JNI/library decoder; nothing else changes.
  *
  * Scale notes: payloads stay in executor memory one batch at a time
  * (mapPartitions is iterator-streaming — no per-partition
  * materialization); metadata extraction is a columnar projection that
  * never deserializes the payload on the driver. For very large blobs,
  * store payloads out-of-line (object store keys in the column) — the
  * schema below carries `uri` for exactly that.
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

  /** A decoded feature row (what a real image/audio model would emit).
    * Double (not float) so the fake codec's arithmetic is bit-identical
    * to the DuckDB oracle's — a real model stub would emit float32.
    */
  final case class MediaFeature(media_id: Long, feature: Array[Double])

  /** STUB CODEC — deterministic fake standing in for a real image/audio
    * decoder (none is installable in this container). Derives all
    * "decoded" values from payload bytes so tests are reproducible.
    */
  object FakeCodec {
    /** ??? in production: BufferedImage/ffmpeg decode. Fake: first two
      * bytes become dimensions.
      */
    def decodeDims(payload: Array[Byte]): (Int, Int) =
      ((payload(0) & 0xff) + 1, (payload(1) & 0xff) + 1)

    /** ??? in production: model forward pass. Fake: 8-dim feature from
      * byte histogram moments (double math, ascending byte order — the
      * exact fold the SQL oracle twin reproduces).
      */
    def extractFeature(payload: Array[Byte]): Array[Double] = {
      val f = new Array[Double](8)
      var i = 0
      while (i < payload.length) { f(i % 8) += (payload(i) & 0xff) / 255.0; i += 1 }
      f
    }
  }

  /** Synthesize a deterministic binary payload column from a text column
    * (md5 bytes) — the test stand-in for real image bytes.
    */
  def attachFakePayload(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id).cast("long").as("media_id"), lit("image").as("kind"),
      unhex(md5(col(text))).as("payload"),
      concat(lit("mem://"), col(id)).as("uri"))

  /** Columnar metadata extraction — byte-level parse of the payload
    * header without leaving Catalyst (hex-digit arithmetic is portable to
    * the DuckDB oracle; a real format parser would be a custom Expression
    * with the same shape).
    */
  def decodeMetaColumnar(df: DataFrame): DataFrame = {
    // locate(needle, haystack) is Spark's strpos analog (DuckDB's
    // strpos(haystack, needle) is NOT a Spark function)
    def hexByte(pos: Int): String = {
      def d(i: Int) = s"(locate(substr(hex_lc, $i, 1), '0123456789abcdef') - 1)"
      s"(16 * ${d(2 * pos + 1)} + ${d(2 * pos + 2)})"
    }
    df.withColumn("hex_lc", lower(hex(col("payload"))))
      .select(col("media_id"), col("kind"),
        expr(s"${hexByte(0)} + 1").as("width"),
        expr(s"${hexByte(1)} + 1").as("height"),
        expr("cast(length(hex_lc) / 2 AS BIGINT)").as("n_bytes"))
  }

  /** Stubbed columnar RESIZE: halve the decoded dimensions (ceil) and
    * truncate the payload to its first half — the deterministic stand-in
    * for a real downscale (??? in production: an image library resample;
    * the Spark-side shape — byte-level payload rewrite + metadata update
    * in one codegen'd projection, no driver round-trip — is the real
    * contract). Emits the resized payload as hex so the DuckDB oracle
    * can compare bytes.
    */
  def resizeColumnar(df: DataFrame): DataFrame = {
    def hexByte(pos: Int): String = {
      def d(i: Int) = s"(locate(substr(hex_lc, $i, 1), '0123456789abcdef') - 1)"
      s"(16 * ${d(2 * pos + 1)} + ${d(2 * pos + 2)})"
    }
    df.withColumn("hex_lc", lower(hex(col("payload"))))
      .select(col("media_id"),
        expr(s"cast(ceil((${hexByte(0)} + 1) / 2.0) AS INT)").as("r_width"),
        expr(s"cast(ceil((${hexByte(1)} + 1) / 2.0) AS INT)").as("r_height"),
        // first half of the payload bytes = first length/2*2 hex digits
        expr("substr(hex_lc, 1, cast(length(hex_lc) / 2 AS INT))").as("r_payload_hex"))
  }

  /** DuckDB twin of [[resizeColumnar]] over the same synthesized payload. */
  def resizeSql(table: String, id: String, text: String): String = {
    def d(i: Int) = s"(strpos('0123456789abcdef', substr(md5($text), $i, 1)) - 1)"
    s"""SELECT $id AS media_id,
       |  ceil(((16 * ${d(1)} + ${d(2)}) + 1) / 2.0)::INT AS r_width,
       |  ceil(((16 * ${d(3)} + ${d(4)}) + 1) / 2.0)::INT AS r_height,
       |  substr(md5($text), 1, (length(md5($text)) / 2)::INT) AS r_payload_hex
       |FROM $table""".stripMargin
  }

  /** DuckDB twin of [[decodeMetaColumnar]] over the same synthesized
    * payload (md5 of text).
    */
  def decodeMetaSql(table: String, id: String, text: String): String = {
    def d(i: Int) = s"(strpos('0123456789abcdef', substr(md5($text), $i, 1)) - 1)"
    s"""SELECT $id AS media_id, 'image' AS kind,
       |  (16 * ${d(1)} + ${d(2)}) + 1 AS width,
       |  (16 * ${d(3)} + ${d(4)}) + 1 AS height,
       |  (length(md5($text)) / 2)::BIGINT AS n_bytes
       |FROM $table""".stripMargin
  }

  /** Feature extraction over typed records: iterator-to-iterator
    * mapPartitions (the Scala analog of a batched Pandas UDF — one
    * decoder init per partition, streaming batches, bounded memory).
    */
  def featureExtract(ds: Dataset[MediaRecord]): Dataset[MediaFeature] = {
    implicit val enc: Encoder[MediaFeature] = Encoders.product[MediaFeature]
    ds.mapPartitions { it =>
      // per-partition decoder init would happen here (once, not per row)
      it.map(r => MediaFeature(r.media_id, FakeCodec.extractFeature(r.payload)))
    }
  }

  /** Typed view of [[attachFakePayload]]'s output — metadata decoded from
    * the (fake) header so the record carries it alongside the payload.
    */
  def toMediaRecords(df: DataFrame): Dataset[MediaRecord] = {
    implicit val enc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
    import org.apache.spark.sql.Row
    df.select(col("media_id"), col("kind"), col("payload"), col("uri"))
      .map { (r: Row) =>
        val payload = r.getAs[Array[Byte]]("payload")
        val (w, h) = FakeCodec.decodeDims(payload)
        MediaRecord(r.getAs[Long]("media_id"), r.getAs[String]("kind"),
          payload, r.getAs[String]("uri"), MediaMeta(w, h, "fake", payload.length.toLong))
      }
  }

  /** DuckDB twin of [[featureExtract]] over [[attachFakePayload]]'s
    * synthesized payload: the fake codec's byte-histogram arithmetic in
    * SQL (byte p of md5 = 16*hex(2p+1)+hex(2p+2); f_j = byte_j/255 +
    * byte_{j+8}/255, same IEEE double addition order).
    */
  def featuresSql(table: String, id: String, text: String): String = {
    def d(i: Int) = s"(strpos('0123456789abcdef', substr(md5($text), $i, 1)) - 1)"
    def b(p: Int) = s"(16 * ${d(2 * p + 1)} + ${d(2 * p + 2)})"
    val cols = (0 until 8)
      .map(j => s"round(${b(j)}/255.0 + ${b(j + 8)}/255.0, 6) AS f$j").mkString(", ")
    s"SELECT $id AS media_id, $cols FROM $table"
  }

  /** Frame sampling for video-kind payloads: every `stride`-th fixed-size
    * chunk becomes a frame row (posexplode keeps frame index). Columnar —
    * the explode multiplies rows, so partition sizing must account for
    * frames-per-video; repartition afterwards if frame fan-out is large.
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
}
