package graft.sched

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.DataType

/**
 * A constant that rides in the codegen `references` array instead of being
 * inlined into the generated Java source.
 *
 * Why this exists: every superstep of the crawl evaluates the same plan
 * shapes with a different virtual clock `now`. A plain `lit(now)` embeds the
 * double into the generated source, so each step's whole-stage-codegen
 * source is unique and Janino compiles it from scratch — the compile (plus
 * classloading) is a fixed per-step executor cost that dwarfs the actual
 * work at small step sizes and adds up over a long crawl (dozens of
 * supersteps x several stages each). Wrapping the literal keeps the
 * generated source IDENTICAL across steps — the value is fetched from
 * `references` at runtime — so `CodeGenerator.compile`'s source-keyed cache
 * hits from step 2 on.
 *
 * Semantics are exactly `Literal`: deterministic, evaluated once, same value
 * for every row of the query. `foldable = false` is the whole point — it
 * keeps ConstantFolding from collapsing it back into an inline literal.
 * The trade: predicates on it can't be pushed into file-source scans
 * (translateFilter only handles Literal). The in-memory/no-store crawl path
 * never file-scans the frontier, so nothing is lost there. The STORE-backed
 * path does read the frontier via spark.read.parquet every superstep, so the
 * W2 `exetime <= stepConst(now)` predicate stops translating to a parquet
 * row-group filter — accepted deliberately: frontier buckets are laid out by
 * salted host-hash (FrontierStore.frontierBucket), so exetime values (mostly
 * 0.0 seeds mixed with future backoff times) are uncorrelated with file
 * order and virtually every row group's [min,max] straddles `now` — stats
 * skipping would prune ~nothing, while the codegen-cache win applies to
 * EVERY stage of EVERY step. Use for step-varying values, not for genuinely
 * static configuration.
 */
case class RuntimeConst(child: Expression) extends UnaryExpression {
  require(child.foldable, "RuntimeConst child must be foldable")

  override def foldable: Boolean = false
  override def dataType: DataType = child.dataType

  @transient private lazy val value: Any = child.eval(InternalRow.empty)

  override def nullable: Boolean = value == null

  override def eval(input: InternalRow): Any = value

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (value == null) {
      Literal.create(null, dataType).doGenCode(ctx, ev)
    } else {
      val javaType = CodeGenerator.javaType(dataType)
      val ref = ctx.addReferenceObj("perStepConst", value, CodeGenerator.boxedType(dataType))
      ev.copy(code = code"final $javaType ${ev.value} = ($javaType) $ref;",
        isNull = FalseLiteral)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): RuntimeConst =
    copy(child = newChild)
  override def prettyName: String = "runtime_const"
}

object RuntimeConst {
  /** Column wrapper: `stepConst(now)` ≡ `lit(now)` with cache-stable codegen. */
  def stepConst(d: Double): Column =
    org.apache.spark.sql.GraftColumnShim.column(RuntimeConst(Literal(d)))

  /** Int variant for step counters riding query output (e.g. a per-step
    * label column): same cache-stable codegen rationale. */
  def stepConstInt(i: Int): Column =
    org.apache.spark.sql.GraftColumnShim.column(RuntimeConst(Literal(i)))
}
