package graft

import graft.schema._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The three evolution rules of the reference's compile-time gate
  * (reference: Typebus.scala:423-449), enforced at registration time.
  */
class SchemaRegistrySpec extends AnyFunSuite {

  private def ts(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  private val base = TypeSchema("t.Ev", ts("a" -> IntegerType, "b" -> StringType))

  test("identical schema is compatible") {
    val r = new SchemaRegistry()
    assert(r.checkCompatible(base, base).isEmpty)
  }

  test("rule 1: type change is rejected") {
    val r = new SchemaRegistry()
    val next = base.copy(schema = ts("a" -> LongType, "b" -> StringType))
    val errs = r.checkCompatible(base, next)
    assert(errs.exists { case EvolutionError.TypeChanged("a", IntegerType, LongType) => true; case _ => false })
  }

  test("rule 2: field added without default is rejected; with default is allowed") {
    val r = new SchemaRegistry()
    val next = base.copy(schema = ts("a" -> IntegerType, "b" -> StringType, "c" -> DoubleType))
    assert(r.checkCompatible(base, next) ===
      Seq(EvolutionError.AddedWithoutDefault("c")))
    val withDefault = next.copy(defaults = Map("c" -> "0.0"))
    assert(r.checkCompatible(base, withDefault).isEmpty)
  }

  test("rule 3: field removed without default is rejected; defaulted removal is allowed") {
    val r = new SchemaRegistry()
    val next = base.copy(schema = ts("a" -> IntegerType))
    assert(r.checkCompatible(base, next) ===
      Seq(EvolutionError.RemovedWithoutDefault("b")))
    val oldWithDefault = base.copy(defaults = Map("b" -> "\"\""))
    assert(r.checkCompatible(oldWithDefault, next).isEmpty)
  }

  test("defaults shadow their whole nested subtree (collapseTree semantics)") {
    val nestedOld = TypeSchema("t.N",
      ts("x" -> IntegerType, "sub" -> ts("p" -> IntegerType, "q" -> StringType)),
      defaults = Map("sub" -> "{}"))
    val nestedNew = nestedOld.copy(
      schema = ts("x" -> IntegerType, "sub" -> ts("p" -> LongType)))
    val r = new SchemaRegistry()
    assert(r.checkCompatible(nestedOld, nestedNew).isEmpty)
  }

  test("register throws on incompatible evolution, like the macro aborting the build") {
    val r = new SchemaRegistry()
    r.register(base)
    val bad = base.copy(schema = ts("a" -> StringType, "b" -> StringType))
    val e = intercept[IllegalArgumentException](r.register(bad))
    assert(e.getMessage.contains("incompatible schema evolution"))
  }

  test("registry persists and reloads schemas") {
    val dir = java.nio.file.Files.createTempDirectory("schemareg")
    val r1 = new SchemaRegistry(Some(dir))
    r1.register(base)
    val r2 = new SchemaRegistry(Some(dir))
    assert(r2.get("t.Ev").map(_.schema) === Some(base.schema))
  }

  test("merge retains a removed-with-default field in the stored tree (reference Node merge)") {
    val r = new SchemaRegistry()
    r.register(base.copy(defaults = Map("b" -> "\"\"")))
    val merged = r.register(base.copy(schema = ts("a" -> IntegerType)))
    // b was removed (legally: it has a default) but the stored union keeps it
    assert(merged.schema.fieldNames.toSet === Set("a", "b"))
    assert(merged.schema("b").dataType === StringType)
    assert(merged.defaults.contains("b"))
  }

  test("a reflected default containing a newline survives persist + reload") {
    val dir = java.nio.file.Files.createTempDirectory("schemareg-nl")
    val r1 = new SchemaRegistry(Some(dir))
    val enc = org.apache.spark.sql.Encoders.product[NewlineDefault]
    val v1 = TypeSchema(classOf[NewlineDefault].getName,
      StructType(Seq(StructField("a", IntegerType, nullable = false))))
    r1.register(v1)
    r1.register[NewlineDefault]()(enc)
    val r2 = new SchemaRegistry(Some(dir))
    val reloaded = r2.get(classOf[NewlineDefault].getName)
    assert(reloaded.nonEmpty, "type silently dropped on reload — sidecar corrupted")
    assert(reloaded.get.defaults("note") === "\"line1\\nline2\"")
    // a later register() must still hit the evolution gate, not a blank slate
    val bad = reloaded.get.copy(schema = StructType(Seq(
      StructField("a", StringType, nullable = false))))
    intercept[IllegalArgumentException](r2.register(bad))
  }

  test("Scala default values are recovered via apply$default$N reflection") {
    val d = SchemaRegistry.reflectedDefaults[Evolved](
      org.apache.spark.sql.Encoders.product[Evolved])
    assert(d === Map("b" -> "\"dflt\"", "c" -> "7"))
  }

  test("add-field-with-Scala-default evolves with NO explicit declaration") {
    val r = new SchemaRegistry()
    // v1 of the type: just field a (same fqn as the evolved case class)
    val enc = org.apache.spark.sql.Encoders.product[Evolved]
    val v1 = TypeSchema(classOf[Evolved].getName,
      StructType(Seq(StructField("a", IntegerType, nullable = false))))
    r.register(v1)
    // v2 = the real case class: adds b (default "dflt") and c (default 7)
    // — rule 2 passes purely on reflected defaults, like the reference's
    // source-recovered defaults (Typebus.scala:227-257)
    val merged = r.register[Evolved]()(enc)
    assert(merged.defaults.keySet === Set("b", "c"))
    // the no-default twin still fails rule 2
    val v1n = TypeSchema(classOf[EvolvedNoDefault].getName,
      StructType(Seq(StructField("a", IntegerType, nullable = false))))
    r.register(v1n)
    val e = intercept[IllegalArgumentException] {
      r.register[EvolvedNoDefault]()(org.apache.spark.sql.Encoders.product[EvolvedNoDefault])
    }
    assert(e.getMessage.contains("added without a default"))
  }
}

/** Evolution fixtures: v2 shapes of a type whose v1 had only `a`. */
final case class Evolved(a: Int, b: String = "dflt", c: Long = 7L)
final case class EvolvedNoDefault(a: Int, b: String)
final case class NewlineDefault(a: Int, note: String = "line1\nline2")
