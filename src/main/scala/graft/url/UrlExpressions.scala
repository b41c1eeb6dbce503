package graft.url

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the URL hot path — these stay inside
 * whole-stage codegen (no UDF serialization / row boxing), which matters when
 * canonicalizing 10^10 frontier rows.
 *
 * Catalyst tier per SURVEY.md §2.11: custom `UnaryExpression` with
 * `doGenCode` calling the static Scala implementation. Registered SQL-side by
 * [[graft.GraftExtensions]]; Column-side via `functions.call_function`.
 */
case class CanonicalizeUrl(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    UrlCanon.canonUTF8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.url.UrlCanon.canonUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
    copy(child = newChild)
  override def prettyName: String = "canonicalize_url"
}

/** Host (netloc) of a URL — codegen'd, for partitioning / same-domain filters. */
case class UrlHost(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    UrlCanon.hostUTF8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.url.UrlCanon.hostUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): UrlHost =
    copy(child = newChild)
  override def prettyName: String = "url_host"
}
