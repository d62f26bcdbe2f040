package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Image-path throughput probe: render planted PNGs (real ImageIO
  * encode) and run the real decode stages over N docs, reporting
  * images/sec per stage. The decode cost is embarrassingly parallel
  * (iterator-streaming mapPartitions, no shuffle), so at cluster scale
  * the number multiplies by executor count — this probe pins the
  * per-core constant.
  *
  * Usage: runMain graft.tools.ProbeMultimodal <documentsDir> [nDocs]
  */
object ProbeMultimodal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nDocs = args.lift(1).map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).limit(nDocs)
    val media = graft.ops.Multimodal.attachPngPayload(docs, "doc_id")
      .localCheckpoint(true) // materialize payloads so stages time DECODE, not render

    def time(body: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = body
      (n, (System.nanoTime() - t0) / 1e9)
    }
    def report(stage: String, n: Long, sec: Double): Unit =
      println(s"""{"metric":"mm_$stage","n":$n,"sec":$sec,"imgs_per_sec":${(n / sec).toInt},"dir":"$dir"}""")

    val (n0, tRender) = time {
      graft.ops.Multimodal.attachPngPayload(docs, "doc_id")
        .queryExecution.toRdd.count()
    }
    report("render_encode", n0, tRender)
    val (n1, tMeta) = time {
      graft.ops.Multimodal.decodeMeta(media).queryExecution.toRdd.count()
    }
    report("decode_meta", n1, tMeta)
    val (n2, tHdr) = time {
      graft.ops.Multimodal.metaColumnarPng(media).queryExecution.toRdd.count()
    }
    report("header_columnar", n2, tHdr)
    val (n3, tResize) = time {
      graft.ops.Multimodal.resizeDecoded(media).queryExecution.toRdd.count()
    }
    report("resize_roundtrip", n3, tResize)

    val audio = graft.ops.Multimodal.attachWavPayload(docs, "doc_id")
      .localCheckpoint(true)
    val (n4, tAudio) = time {
      graft.ops.Multimodal.decodeAudio(audio).queryExecution.toRdd.count()
    }
    report("audio_decode", n4, tAudio)
    val (n5, tAHdr) = time {
      graft.ops.Multimodal.audioMetaColumnar(audio).queryExecution.toRdd.count()
    }
    report("audio_header_columnar", n5, tAHdr)
    spark.stop()
  }
}
