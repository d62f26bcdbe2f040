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
}
