package graft

import graft.queries.Queries
import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Output-shape guard over EVERY registered query: no top-level ARRAY or
  * MAP column may reach the driver's comparator.
  *
  * Why this exists: the driver sorts result columns raw (pandas
  * `sort_values`), and a top-level array column is unhashable there —
  * round 5 shipped two locally-green queries (`embed_quantize`,
  * `embed_label_centroids`) that the driver marked red for exactly this.
  * The local gate (`tools/compare_oracle.py`) stringifies before sorting,
  * so this spec — which checks the ANALYZED schema, no execution beyond
  * what query construction itself does — is the only reliable guard
  * against the local/driver divergence. No whitelist: collection-valued
  * results must be serialized (hex / CSV / JSON) in the registration.
  */
class QuerySchemaGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("no registered query emits a top-level ArrayType or MapType column") {
    val offenders = Queries.all.flatMap { q =>
      val schema: StructType = q.spark(spark, sf).schema
      val bad = schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] => s"${f.name}: ${f.dataType.simpleString}"
        case f if f.dataType.isInstanceOf[MapType]   => s"${f.name}: ${f.dataType.simpleString}"
      }
      if (bad.isEmpty) Nil else Seq(s"${q.name} -> ${bad.mkString(", ")}")
    }
    assert(offenders.isEmpty,
      "registered queries must serialize collection columns (driver comparator " +
        s"cannot sort raw arrays):\n  ${offenders.mkString("\n  ")}")
  }

  /** Result-TYPE lock (round-9 ask #2). A query can return byte-identical
    * VALUES with a drifted column type — round 9's sole red was
    * `pipeline_cluster_budget` emitting `cluster` as string (a helper's
    * internal `cast("string")` leaking into the result) where the oracle
    * emits BIGINT. Rows/names checks and every op spec were green; only
    * the driver's hash caught it. This test pins every registered query's
    * ANALYZED schema (names + Catalyst types, in order) to the committed
    * manifest, so `cast`-style drift fails `sbt test` locally first.
    *
    * On an INTENTIONAL schema change (new query / deliberate retype with
    * the paired oracle updated): `sbt "runMain graft.tools.GenSchemaManifest"`
    * and review the manifest diff like source.
    */
  test("every registered query's result schema matches the committed type manifest") {
    val path = java.nio.file.Paths.get(graft.tools.GenSchemaManifest.ManifestPath)
    assert(java.nio.file.Files.exists(path),
      s"missing $path — generate with: sbt \"runMain graft.tools.GenSchemaManifest\"")
    val expected: Map[String, String] =
      scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(path)).asScala
        .filter(_.nonEmpty)
        .map { l => val Array(n, s) = l.split("\t", 2); n -> s }.toMap
    val actual: Map[String, String] = Queries.all.map { q =>
      val line = graft.tools.GenSchemaManifest.line(q.name, q.spark(spark, sf).schema)
      val Array(n, s) = line.split("\t", 2); n -> s
    }.toMap
    val missing = expected.keySet -- actual.keySet
    val unpinned = actual.keySet -- expected.keySet
    val drifted = actual.collect {
      case (n, s) if expected.contains(n) && expected(n) != s =>
        s"$n\n    expected ${expected(n)}\n    actual   $s"
    }
    assert(missing.isEmpty && unpinned.isEmpty && drifted.isEmpty,
      s"""schema manifest divergence (regenerate ONLY if the change is intentional
         |and the oracle SQL agrees):
         |  removed queries still pinned: ${missing.mkString(", ")}
         |  new queries not yet pinned:   ${unpinned.mkString(", ")}
         |  type drift:\n  ${drifted.mkString("\n  ")}""".stripMargin)
  }
}
