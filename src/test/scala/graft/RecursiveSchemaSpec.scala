package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.{RecursiveSchema, SchemaRegistry, TypeSchema}

/** Recursive case classes through the evolution gate (VERDICT r5 item 7).
  * Reference capability: Mapper.scala:70-96 ships recursive-schema
  * reader/writer variants; Spark Encoders cannot express cycles, so graft
  * unrolls to a fixed depth and gates evolution on the unrolled schema.
  */
object RecursiveSchemaSpec {
  case class Tree(value: Int, child: Option[Tree])
  case class Node(id: Long, label: String, children: Seq[Node])
  case class Forest(name: String, roots: Map[String, Node])
  case class Bad(next: Bad) // recursion in a bare required field: no finite instance
  case class Plain(a: Int, b: String)
  case class TreeV2(value: Int, child: Option[TreeV2], weight: Double)
}

class RecursiveSchemaSpec extends AnyFunSuite {
  import RecursiveSchemaSpec._

  test("Option-recursive type unrolls to maxDepth and cuts at the Option") {
    val s = RecursiveSchema.unrolledSchema[Tree](maxDepth = 3)
    // depth 1: value + child; depth 3's child is cut (dropped field)
    def childOf(st: StructType): StructType =
      st("child").dataType.asInstanceOf[StructType]
    assert(s.fieldNames.toSeq == Seq("value", "child"))
    val d2 = childOf(s)
    val d3 = childOf(d2)
    assert(d3.fieldNames.toSeq == Seq("value"), "deepest level drops the cut field")
    assert(s("child").nullable && d2("child").nullable)
  }

  test("Seq-recursive type cuts at the collection") {
    val s = RecursiveSchema.unrolledSchema[Node](maxDepth = 2)
    val d2 = s("children").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(d2.fieldNames.toSeq == Seq("id", "label"), "cut drops the children field")
  }

  test("Map-value recursion cuts; unroll is deterministic across calls") {
    val a = RecursiveSchema.unrolledSchema[Forest](maxDepth = 2)
    val b = RecursiveSchema.unrolledSchema[Forest](maxDepth = 2)
    assert(a == b, "two builds unrolling at the same depth must agree")
    val inner = a("roots").dataType.asInstanceOf[MapType]
      .valueType.asInstanceOf[StructType]
    assert(inner.fieldNames.contains("children"))
  }

  test("bare required recursion fails with an actionable message") {
    val e = intercept[IllegalArgumentException] {
      RecursiveSchema.unrolledSchema[Bad](maxDepth = 2)
    }
    assert(e.getMessage.contains("no finite instance"))
    assert(e.getMessage.contains("Option"))
  }

  test("isRecursive routes plain types to the Encoder path") {
    assert(RecursiveSchema.isRecursive[Tree])
    assert(RecursiveSchema.isRecursive[Node])
    assert(!RecursiveSchema.isRecursive[Plain])
  }

  test("evolution rules apply to unrolled schemas at every depth") {
    val reg = new SchemaRegistry()
    val v1 = reg.registerUnrolled[Tree](maxDepth = 3)
    // TreeV2 adds `weight` at EVERY unrolled level without a default ->
    // one violation per level the diff can see.
    val v2 = TypeSchema(v1.fqn, RecursiveSchema.unrolledSchema[TreeV2](maxDepth = 3))
    val errs = reg.checkCompatible(v1, v2)
    val added = errs.collect { case e: graft.schema.EvolutionError.AddedWithoutDefault => e.field }
    assert(added.toSet == Set("weight", "child.weight", "child.child.weight"))
    // with a default on the top-level field, its subtree is shadowed at
    // that path only; deeper copies need their own defaults (or a
    // defaulted ancestor) -- give child a default to shadow the rest.
    val ok = v2.copy(defaults = Map("weight" -> "0.0", "child" -> "null"))
    assert(reg.checkCompatible(v1, ok).isEmpty)
  }
}
