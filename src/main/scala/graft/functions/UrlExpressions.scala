package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** STRING → STRING url kernels (see [[UrlOps]] for the bit-parity
  * contract with the declarative [[graft.ops.Url]] dialect).
  */
trait UrlStringExpression extends UnaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${dt.catalogString}")
  }
}

/** `graft_url_canon(url)`: compiled canonical URL ([[UrlOps.canon]]). */
case class UrlCanon(child: Expression) extends UrlStringExpression {
  override def prettyName: String = "graft_url_canon"
  override def nullSafeEval(s: Any): Any =
    UrlOps.canon(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.UrlOps.canon($s);")
  override protected def withNewChildInternal(c: Expression): UrlCanon = copy(child = c)
}

/** `graft_url_domain(url)`: compiled registrable domain
  * ([[UrlOps.domain]] — public-suffix longest match, last-two fallback).
  */
case class UrlDomain(child: Expression) extends UrlStringExpression {
  override def prettyName: String = "graft_url_domain"
  override def nullSafeEval(s: Any): Any =
    UrlOps.domain(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.UrlOps.domain($s);")
  override protected def withNewChildInternal(c: Expression): UrlDomain = copy(child = c)
}
