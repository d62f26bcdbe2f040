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
}
