package graft.schema

import org.apache.spark.sql.types._
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.util.{Failure, Success, Try, Using}

/** Schema-evolution errors, one per rule the reference's compile-time gate
  * enforces (reference: typebus/macros/src/main/scala/io/surfkit/typebus/
  * Typebus.scala:423-449).
  */
sealed trait EvolutionError { def field: String; def message: String }
object EvolutionError {
  final case class TypeChanged(field: String, from: DataType, to: DataType)
      extends EvolutionError {
    def message = s"field '$field' changed type ${from.simpleString} -> ${to.simpleString}"
  }
  final case class AddedWithoutDefault(field: String) extends EvolutionError {
    def message = s"field '$field' added without a default value"
  }
  final case class RemovedWithoutDefault(field: String) extends EvolutionError {
    def message = s"field '$field' (no default) removed"
  }
}

/** A schema version: the `StructType` plus a per-field default sidecar.
  *
  * The reference recovers default values by re-parsing case-class source
  * text at compile time (Typebus.scala:227-257); here defaults are
  * declared explicitly at registration (runtime reflection has no reliable
  * source access). `defaults` maps a flattened field path
  * (`a.b.c`) to its default literal (as JSON text).
  */
final case class TypeSchema(fqn: String, schema: StructType,
                            defaults: Map[String, String] = Map.empty)

/** Runtime schema registry with the reference's three evolution rules.
  *
  * The reference enforces these at COMPILE time via macro and aborts the
  * build (Typebus.scala:399-453); this port enforces them at registration
  * time and throws — same guarantee, different failure point (documented
  * semantic shift, SURVEY.md §7.4). Schemas persist as `StructType.json`
  * files, replacing the AST files the macro writes under
  * `src/main/resources/typebus/<fqn>` (Typebus.scala:390-393,
  * ResourceDb.scala:7-14).
  *
  * Scale note: the registry is driver-side metadata (a few KB per type);
  * nothing here touches executors.
  */
final class SchemaRegistry(persistDir: Option[Path] = None) {
  private val byFqn = scala.collection.concurrent.TrieMap.empty[String, TypeSchema]

  persistDir.foreach { dir =>
    if (Files.isDirectory(dir)) {
      Using.resource(Files.list(dir)) { stream =>
        stream.forEach { p =>
          Try {
            val lines = new String(Files.readAllBytes(p), "UTF-8").split(SchemaRegistry.RecordSep)
            val schema = DataType.fromJson(lines(0)).asInstanceOf[StructType]
            val defaults = if (lines.length > 1 && lines(1).nonEmpty)
              lines(1).split("\n").iterator.map { l =>
                val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
              }.toMap else Map.empty[String, String]
            byFqn.put(p.getFileName.toString, TypeSchema(p.getFileName.toString, schema, defaults))
          } match {
            case Success(_) => ()
            case Failure(e) =>
              // A silently dropped type would let a later incompatible
              // register() see a blank slate and bypass the evolution
              // gate — a corrupted sidecar must STOP the load, not warn.
              throw new IllegalStateException(
                s"unparseable persisted schema '$p' — repair or remove it " +
                  "before reloading the registry", e)
          }
        }
      }
    }
  }

  /** Flatten a StructType into `path -> DataType` leaves, descending into
    * nested structs — the analog of the reference's flattened `PropScope`
    * diff paths (Typebus.scala:531-542).
    */
  private def flatten(prefix: String, st: StructType): Map[String, DataType] =
    st.fields.flatMap { f =>
      val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case s: StructType => flatten(path, s)
        case dt            => Map(path -> dt)
      }
    }.toMap

  /** Fields with defaults "shadow" their whole subtree during the diff
    * (reference: `collapseTree`, Typebus.scala:549-556): any change at or
    * below a defaulted path is permitted.
    */
  private def shadowed(path: String, defaults: Map[String, String]): Boolean =
    defaults.contains(path) ||
      defaults.keys.exists(d => path.startsWith(d + "."))

  /** The three rules of Typebus.scala:423-449. Returns all violations. */
  def checkCompatible(old: TypeSchema, next: TypeSchema): Seq[EvolutionError] = {
    val allDefaults = old.defaults ++ next.defaults
    val o = flatten("", old.schema)
    val n = flatten("", next.schema)
    val typeChanged = (o.keySet intersect n.keySet).toSeq.sorted.collect {
      case k if o(k) != n(k) && !shadowed(k, allDefaults) =>
        EvolutionError.TypeChanged(k, o(k), n(k))
    }
    val added = (n.keySet diff o.keySet).toSeq.sorted.collect {
      case k if !shadowed(k, next.defaults) => EvolutionError.AddedWithoutDefault(k)
    }
    val removed = (o.keySet diff n.keySet).toSeq.sorted.collect {
      case k if !shadowed(k, old.defaults) => EvolutionError.RemovedWithoutDefault(k)
    }
    typeChanged ++ added ++ removed
  }

  /** Register (or evolve) a type. Throws on incompatible evolution — the
    * runtime analog of the macro aborting compilation.
    */
  def register(ts: TypeSchema): TypeSchema = {
    byFqn.get(ts.fqn).foreach { old =>
      val errs = checkCompatible(old, ts)
      if (errs.nonEmpty)
        throw new IllegalArgumentException(
          s"incompatible schema evolution for ${ts.fqn}:\n  " +
            errs.map(_.message).mkString("\n  "))
    }
    // merge: union of old + new fields, new wins on shared names, removed-
    // with-default fields RETAINED in the stored tree — the reference's
    // recursive Node merge (Typebus.scala:507-519), so a reader built
    // against the old shape still finds its defaulted fields.
    val merged = byFqn.get(ts.fqn).fold(ts) { old =>
      ts.copy(schema = SchemaRegistry.mergeStructs(old.schema, ts.schema),
        defaults = old.defaults ++ ts.defaults)
    }
    byFqn.put(ts.fqn, merged)
    persistDir.foreach { dir =>
      Files.createDirectories(dir)
      val body = merged.schema.json + SchemaRegistry.RecordSep +
        merged.defaults.map { case (k, v) => s"$k=$v" }.mkString("\n")
      Files.write(dir.resolve(merged.fqn), body.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    }
    merged
  }

  /** Register a case class via its Spark Encoder-derived schema.
    * Scala-declared default values are recovered automatically via
    * [[SchemaRegistry.reflectedDefaults]]; explicitly passed `defaults`
    * win on conflict (they also cover nested paths reflection cannot
    * see).
    */
  def register[T](defaults: Map[String, String] = Map.empty)
                 (implicit enc: org.apache.spark.sql.Encoder[T]): TypeSchema =
    register(TypeSchema(enc.clsTag.runtimeClass.getName, enc.schema,
      SchemaRegistry.reflectedDefaults[T] ++ defaults))

  /** Register a RECURSIVE case class via a depth-bounded unrolled schema
    * (see [[RecursiveSchema]]). Spark Encoders reject circular product
    * types, so recursive payloads cannot take the ordinary
    * `register[T](implicit Encoder)` path — but the evolution gate (C1)
    * only needs a canonical finite schema, which the unroll provides:
    * both service builds unroll at the same `maxDepth` and diff the same
    * paths. Reference capability: Mapper.scala:70-96 (recursive Avro
    * reader/writer); the `Dataset`-transport side remains unsupported on
    * Spark by documented limitation.
    */
  def registerUnrolled[T](maxDepth: Int = 2,
                          defaults: Map[String, String] = Map.empty)
                         (implicit tt: scala.reflect.runtime.universe.TypeTag[T]): TypeSchema = {
    val fqn = tt.mirror.runtimeClass(tt.tpe.typeSymbol.asClass).getName
    register(TypeSchema(fqn, RecursiveSchema.unrolledSchema[T](maxDepth), defaults))
  }

  def get(fqn: String): Option[TypeSchema] = byFqn.get(fqn)

  /** FQN -> schema-JSON map, the analog of `Service.registry`
    * (reference: module/Service.scala:20-27) exported in
    * `ServiceDescriptor.types` (Service.scala:105-120).
    */
  def all: Map[String, String] = byFqn.map { case (k, v) => k -> v.schema.json }.toMap
}

object SchemaRegistry {

  /** Separator between the schema-JSON block and the defaults sidecar in a
    * persisted file. NUL never occurs in schema JSON or default literals
    * (jsonLiteral escapes control chars), so the split is unambiguous.
    * Written with a \u0000 escape so this source file stays valid text.
    */
  private[schema] val RecordSep: String = "\n\u0000\n"

  /** Union of old + new fields: new wins on shared names (recursing into
    * shared struct fields), old-only fields (removals, necessarily
    * defaulted to have passed the gate) are appended — the reference's
    * recursive member-map merge (Typebus.scala:507-519).
    */
  private[schema] def mergeStructs(old: StructType, next: StructType): StructType = {
    val oldByName = old.fields.iterator.map(f => f.name -> f).toMap
    val kept = next.fields.map { f =>
      (oldByName.get(f.name).map(_.dataType), f.dataType) match {
        case (Some(o: StructType), n: StructType) => f.copy(dataType = mergeStructs(o, n))
        case _                                    => f
      }
    }
    val removedOldOnly = old.fields.filterNot(f => next.fieldNames.contains(f.name))
    StructType(kept ++ removedOldOnly)
  }

  /** Recover Scala-declared default values of `T`'s constructor params
    * from the compiler-emitted companion methods `apply$default$N`
    * (1-based param position) — the runtime analog of the reference's
    * source-text default parser (Typebus.scala:227-257, which re-parses
    * the case-class source at compile time; on the JVM the compiled
    * default accessors are the faithful source of the same values).
    * Top-level fields only: a default on a field shadows its whole
    * subtree in the evolution diff anyway (`collapseTree` semantics), so
    * nested paths never need their own entries for rules to pass.
    */
  def reflectedDefaults[T](implicit enc: org.apache.spark.sql.Encoder[T]): Map[String, String] = {
    val cls = enc.clsTag.runtimeClass
    val companion =
      try Class.forName(cls.getName + "$", true, cls.getClassLoader)
        .getField("MODULE$").get(null)
      catch { case _: Throwable => return Map.empty }
    enc.schema.fieldNames.zipWithIndex.flatMap { case (name, i) =>
      try {
        val m = companion.getClass.getMethod(s"apply$$default$$${i + 1}")
        Some(name -> jsonLiteral(m.invoke(companion)))
      } catch { case _: Throwable => None }
    }.toMap
  }

  /** Default value -> the JSON-literal text stored in the defaults
    * sidecar (the same representation explicit declarations use).
    * Control characters are escaped: the sidecar is line-oriented
    * (`key=value\n`), so a raw newline in a default would corrupt the
    * persisted file and silently drop the type on reload.
    */
  private def jsonLiteral(v: Any): String = v match {
    case null | None => "null"
    case Some(x)     => jsonLiteral(x)
    case s: String   => quoted(s)
    case b: Boolean  => b.toString
    case n: Byte     => n.toString
    case n: Short    => n.toString
    case n: Int      => n.toString
    case n: Long     => n.toString
    case n: Float    => n.toString
    case n: Double   => n.toString
    case other       => quoted(String.valueOf(other))
  }

  private def quoted(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r")
      .replace("\t", "\\t").replace("\u0000", "\\u0000") + "\""
}
