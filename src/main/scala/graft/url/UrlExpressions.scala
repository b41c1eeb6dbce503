package graft.url

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
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

/** Fused crawl-identity keys: `url_keys(raw)` = struct(url_hash, host_hash)
  * where url_hash = xxhash64(canonicalize_url(raw)) and host_hash =
  * xxhash64(url_host(canonicalize_url(raw))) — bit-identical to composing
  * the built-ins (asserted in UrlCanonSpec), but computed in ONE pass over
  * the bytes with the canonical form hashed in per-thread scratch, never
  * materialized as a row value. On the 10^10-row frontier map stage this
  * removes ~4 intermediate allocations per row (canonical UTF8String, host
  * substring copies); at 32 threads that map stage is memory-bandwidth-bound
  * (BENCH.md round-4 stage tables: 1.2-2.7x per-row CPU inflation at 4x
  * threads), so the allocation diet is what the N->4N scaling efficiency
  * buys with. */
case class UrlKeys(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("url_hash", LongType, nullable = false),
    StructField("host_hash", LongType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any =
    UrlCanon.urlKeysRow(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.url.UrlCanon.urlKeysRow($c)")
  override protected def withNewChildInternal(newChild: Expression): UrlKeys =
    copy(child = newChild)
  override def prettyName: String = "url_keys"
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
