package graft.schema

import org.apache.spark.sql.types._

import scala.reflect.runtime.universe._

/** Depth-bounded schemas for RECURSIVE case classes.
  *
  * The reference ships dedicated recursive-schema reader/writer variants
  * (typebus/src/main/scala/io/surfkit/typebus/Mapper.scala:70-96) because
  * its Avro layer can express cycles via named-type references. Spark
  * cannot: `Encoder` derivation rejects circular product types
  * ("cannot have circular references in class"), and a `StructType` is a
  * finite tree by construction. So a faithful port CANNOT move
  * `Dataset[Tree]` through the engine — that is a public Spark
  * limitation, not a porting shortcut.
  *
  * What the bus actually needs from recursive types is the EVOLUTION GATE
  * (C1): two service builds must agree whether `Tree` changed
  * compatibly. That check only needs a canonical finite schema, so this
  * object UNROLLS the recursion to a fixed depth: each cycle through a
  * recursive type is expanded at most `maxDepth` times along any path,
  * and the reference below the cut is dropped. Two builds unrolling the
  * same type at the same depth produce identical `StructType`s, so the
  * three evolution rules in [[SchemaRegistry]] apply unchanged — a field
  * change at depth 2 of `Tree.child.child` diffs exactly like any other
  * nested path.
  *
  * Cut rule: the recursion must pass through a field that can be ABSENT —
  * `Option[...]`, a collection (`Seq`/`List`/`Set`/`Vector`/`Array`), or
  * a `Map` value — because dropping such a field leaves every shallower
  * level representable (`None` / empty). A recursive reference held in a
  * bare required field (`case class Bad(next: Bad)`) has no finite
  * instance at all; registration fails with a message saying exactly
  * that.
  *
  * Scale note: this is driver-side metadata reflection (runs once per
  * registered type); nothing here touches executors or query plans.
  */
object RecursiveSchema {

  /** Unrolled schema of `T`: recursive cycles expanded at most `maxDepth`
    * times along any path, cut (field dropped) at the first optional /
    * collection crossing past the limit.
    */
  def unrolledSchema[T: TypeTag](maxDepth: Int = 2): StructType = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    toStruct(typeOf[T].dealias, Nil, maxDepth)
  }

  /** True when deriving `T`'s schema requires unrolling (any case-class
    * cycle reachable from `T`). Lets callers route plain types through
    * the ordinary Encoder path and recursive ones through
    * [[SchemaRegistry.registerUnrolled]].
    */
  def isRecursive[T: TypeTag]: Boolean = {
    def walk(t: Type, path: List[Symbol]): Boolean = {
      val dt = t.dealias
      dt match {
        case Optional(inner)        => walk(inner, path)
        case Collection(elem)       => walk(elem, path)
        case Mapped(k, v)           => walk(k, path) || walk(v, path)
        case _ if isCaseClass(dt)   =>
          val sym = dt.typeSymbol
          path.contains(sym) ||
            caseFields(dt).exists { case (_, ft) => walk(ft, sym :: path) }
        case _                      => false
      }
    }
    walk(typeOf[T], Nil)
  }

  // ---- internals -------------------------------------------------------

  private def isCaseClass(t: Type): Boolean = {
    val s = t.typeSymbol
    s.isClass && s.asClass.isCaseClass
  }

  /** Constructor fields of a case class, types as seen from `t` (so type
    * parameters are substituted).
    */
  private def caseFields(t: Type): List[(String, Type)] = {
    val ctor = t.member(termNames.CONSTRUCTOR).alternatives
      .collectFirst { case m: MethodSymbol if m.isPrimaryConstructor => m }
      .getOrElse(throw new IllegalArgumentException(
        s"${t.typeSymbol.fullName} has no primary constructor"))
    ctor.paramLists.flatten.map { p =>
      p.name.decodedName.toString -> p.typeSignatureIn(t).finalResultType.dealias
    }
  }

  private object Optional {
    def unapply(t: Type): Option[Type] =
      if (t.typeSymbol == typeOf[Option[_]].typeSymbol ||
          t.typeSymbol == typeOf[Some[_]].typeSymbol)
        Some(t.typeArgs.head.dealias)
      else None
  }

  private object Collection {
    private val collSyms = Set[Symbol](
      typeOf[Seq[_]].typeSymbol, typeOf[List[_]].typeSymbol,
      typeOf[Vector[_]].typeSymbol, typeOf[Set[_]].typeSymbol,
      typeOf[IndexedSeq[_]].typeSymbol, typeOf[Iterable[_]].typeSymbol)
    def unapply(t: Type): Option[Type] =
      if (t.typeSymbol == typeOf[Array[_]].typeSymbol && t.typeArgs.head =:= typeOf[Byte])
        None // Array[Byte] is BinaryType, handled atomically
      else if (t.typeSymbol == typeOf[Array[_]].typeSymbol || collSyms.contains(t.typeSymbol))
        Some(t.typeArgs.head.dealias)
      else None
  }

  private object Mapped {
    def unapply(t: Type): Option[(Type, Type)] =
      if (t.typeSymbol == typeOf[Map[_, _]].typeSymbol)
        Some((t.typeArgs(0).dealias, t.typeArgs(1).dealias))
      else None
  }

  private val atomic: Map[Type, DataType] = Map(
    typeOf[Int] -> IntegerType, typeOf[Long] -> LongType,
    typeOf[Double] -> DoubleType, typeOf[Float] -> FloatType,
    typeOf[Short] -> ShortType, typeOf[Byte] -> ByteType,
    typeOf[Boolean] -> BooleanType, typeOf[String] -> StringType,
    typeOf[java.math.BigDecimal] -> DecimalType.SYSTEM_DEFAULT,
    typeOf[scala.math.BigDecimal] -> DecimalType.SYSTEM_DEFAULT,
    typeOf[java.sql.Timestamp] -> TimestampType,
    typeOf[java.time.Instant] -> TimestampType,
    typeOf[java.sql.Date] -> DateType,
    typeOf[java.time.LocalDate] -> DateType)

  private def toStruct(t: Type, path: List[Symbol], maxDepth: Int): StructType = {
    val sym = t.typeSymbol
    val here = sym :: path
    val fields = caseFields(t).flatMap { case (name, ft) =>
      fieldType(ft, here, maxDepth, cuttable = false) match {
        case Cut          => None // recursion limit reached behind an absent-able field
        case Leaf(dt, nl) => Some(StructField(name, dt, nullable = nl))
      }
    }
    StructType(fields)
  }

  private sealed trait Res
  private case object Cut extends Res
  private final case class Leaf(dt: DataType, nullable: Boolean) extends Res

  /** Map one field type. `cuttable` is true once the descent has crossed
    * an Option/collection/map boundary — the positions where dropping the
    * subtree still leaves every instance representable.
    */
  private def fieldType(t: Type, path: List[Symbol], maxDepth: Int,
                        cuttable: Boolean): Res = t match {
    case Optional(inner) =>
      fieldType(inner, path, maxDepth, cuttable = true) match {
        case Cut         => Cut
        case Leaf(dt, _) => Leaf(dt, nullable = true)
      }
    case Collection(elem) =>
      fieldType(elem, path, maxDepth, cuttable = true) match {
        case Cut         => Cut
        case Leaf(dt, n) => Leaf(ArrayType(dt, containsNull = n), nullable = true)
      }
    case Mapped(k, v) =>
      (fieldType(k, path, maxDepth, cuttable = false),
       fieldType(v, path, maxDepth, cuttable = true)) match {
        case (Leaf(kd, _), Leaf(vd, vn)) =>
          Leaf(MapType(kd, vd, valueContainsNull = vn), nullable = true)
        case (Cut, _) =>
          throw new IllegalArgumentException(
            "recursive reference in a Map KEY cannot be cut (a key is never absent)")
        case (_, Cut) => Cut
      }
    case _ if atomic.exists(_._1 =:= t) =>
      val dt = atomic.collectFirst { case (k, v) if k =:= t => v }.get
      Leaf(dt, nullable = !t.typeSymbol.asClass.isPrimitive)
    case _ if t.typeSymbol == typeOf[Array[_]].typeSymbol && t.typeArgs.head =:= typeOf[Byte] =>
      Leaf(BinaryType, nullable = true)
    case _ if isCaseClass(t) =>
      val sym = t.typeSymbol
      if (path.count(_ == sym) >= maxDepth) {
        if (cuttable) Cut
        else throw new IllegalArgumentException(
          s"recursive type ${sym.fullName}: the recursion is held in a bare required " +
            "field, so no finite instance exists and the schema cannot be cut. Wrap the " +
            "recursive reference in Option[...] or a collection (reference capability: " +
            "Mapper.scala:70-96 recursive reader/writer; Spark Encoders cannot express " +
            "cycles, so graft unrolls to a fixed depth instead)")
      } else Leaf(toStruct(t, path, maxDepth), nullable = true)
    case _ =>
      throw new IllegalArgumentException(
        s"unsupported type in recursive schema derivation: $t (supported: primitives, " +
          "String, BigDecimal, Timestamp/Instant, Date/LocalDate, Array[Byte], Option, " +
          "Seq/List/Vector/Set/Array, Map, case classes)")
  }
}
