package graft.text

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `extract_follows_rows(html, base_url)` — the P1/P2/P4/P6 extraction stage
 * as a native Catalyst Generator (SURVEY §2.11 tier b): one input page row
 * fans out to one output row per follow candidate (links, forms,
 * commented links), WITHOUT first materializing an Array[Struct] the way
 * the `extract_follows` UDF + explode pair does. Planned through
 * GenerateExec, SQL-callable:
 *
 *   SELECT f.* FROM pages LATERAL VIEW extract_follows_rows(text, url) f
 *
 * Output schema matches the UDF's element struct: (url, method, data, text)
 * — url already absolutized against base_url (X5), not yet canonicalized
 * (identity/F7 happen relationally downstream).
 */
case class FollowsGenerator(html: Expression, base: Expression)
  extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(html, base)
  override def prettyName: String = "extract_follows_rows"

  override def elementSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("method", StringType, nullable = false),
    StructField("data", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val h = html.eval(input)
    val b = base.eval(input)
    if (h == null || b == null) return Iterator.empty
    val ex = HtmlScanner.extract(h.toString, b.toString)
    val links = ex.links.iterator.map(l =>
      InternalRow(UTF8String.fromString(l.url), UTF8String.fromString("link"),
        UTF8String.EMPTY_UTF8, UTF8String.fromString(l.text)))
    val forms = ex.forms.iterator.map(f =>
      InternalRow(UTF8String.fromString(f.url), UTF8String.fromString(f.method),
        UTF8String.fromString(f.data), UTF8String.EMPTY_UTF8))
    links ++ forms
  }

  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FollowsGenerator =
    copy(html = c(0), base = c(1))
}
