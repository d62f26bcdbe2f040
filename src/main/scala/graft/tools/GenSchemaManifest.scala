package graft.tools

import graft.queries.Queries
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Regenerates the committed per-query result-schema manifest that
  * `QuerySchemaGuardSpec` locks against: one line per registered query,
  * `name\tcol:type,col:type,...` in field order, types as Catalyst
  * `simpleString`.
  *
  * Why this exists: a query can return byte-identical VALUES with a
  * drifted column TYPE (round 9's `pipeline_cluster_budget`: cluster as
  * string where the oracle emits BIGINT). Rows/schema-name checks and
  * `sbt test` are blind to that; only the driver's hash catches it. The
  * manifest makes such drift a local `sbt test` failure.
  *
  * Run ONLY when a schema change is intentional (new query, or a
  * deliberate type change that the paired oracle SQL also reflects):
  *   sbt "runMain graft.tools.GenSchemaManifest"
  * then review the diff like any other source change.
  */
object GenSchemaManifest {
  val ManifestPath = "src/test/resources/query_schema_manifest.tsv"

  def line(name: String, schema: org.apache.spark.sql.types.StructType): String =
    name + "\t" + schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val lines = Queries.all.map(q => line(q.name, q.spark(spark, sf).schema)).sorted
    val p = Paths.get(ManifestPath)
    Files.createDirectories(p.getParent)
    Files.write(p, (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    println(s"wrote ${lines.size} query schemas to $ManifestPath")
    spark.stop()
  }
}
