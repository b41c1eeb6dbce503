package graft

import org.apache.spark.sql.execution.debug.codegenStringSeq
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sched.RuntimeConst

/**
 * RuntimeConst is the reason a 30-superstep crawl compiles its plan ONCE:
 * per-step scalars (the virtual clock) enter generated code through the
 * codegen `references` array, so the generated Java source — the key of
 * CodeGenerator.compile's cache — is identical from step to step. These
 * tests pin both halves of the contract: literal-equivalent semantics, and
 * source-identical codegen across values.
 */
class RuntimeConstSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("stepConst(v) is semantically lit(v) through a real plan") {
    val df = spark.range(100).toDF("id")
    val a = df
      .withColumn("now", RuntimeConst.stepConst(42.5))
      .where($"id" + RuntimeConst.stepConst(3.0) < RuntimeConst.stepConst(50.0))
      .select($"id", $"now", ($"id" * RuntimeConst.stepConst(2.0)).as("x"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val b = df
      .withColumn("now", lit(42.5))
      .where($"id" + lit(3.0) < lit(50.0))
      .select($"id", $"now", ($"id" * lit(2.0)).as("x"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(a.sorted.toSeq == b.sorted.toSeq)
  }

  test("interpreted eval returns the wrapped value and is not foldable") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val rc = RuntimeConst(Literal(7.25))
    assert(rc.eval(null) == 7.25)
    assert(!rc.foldable, "foldable=false is the point — ConstantFolding must not inline it")
    assert(!rc.nullable)
  }

  test("generated source is IDENTICAL across step values (compile-cache key property)") {
    // CodeGenerator.compile's cache keys on CodeAndComment, whose equality is
    // the code BODY alone (comments — which embed the plan tree, including
    // expression ids and runtime_const toStrings — are excluded). Compare the
    // same thing the cache compares: the comment-stripped generated Java.
    def stripComments(s: String): String =
      s.replaceAll("(?s)/\\*.*?\\*/", "").replaceAll("(?m)^\\s*//.*$", "").trim
    def gen(mk: Double => org.apache.spark.sql.Column, now: Double): Seq[String] = {
      val df = spark.range(1000).toDF("id")
        .where($"id" + mk(now) < mk(now + 500))
        .select(($"id" * mk(now)).as("x"))
      df.collect() // finalize any adaptive planning before reading the plan
      codegenStringSeq(df.queryExecution.executedPlan).map(t => stripComments(t._2))
    }
    val s1 = gen(RuntimeConst.stepConst, 1.0)
    val s2 = gen(RuntimeConst.stepConst, 999999.0)
    assert(s1.nonEmpty && s1.forall(_.contains("class GeneratedIterator")),
      s"expected whole-stage-codegen'd subtrees, got: ${s1.map(_.take(80))}")
    assert(s1 == s2,
      "two plans differing only in stepConst values must emit byte-identical " +
        "generated Java — otherwise Janino recompiles every superstep")
    // and the control: plain literals DO change the source (so the assertion
    // above is actually discriminating, not vacuously comparing empty output)
    assert(gen(lit(_), 1.0) != gen(lit(_), 999999.0),
      "control failed: inline literals should produce differing generated source")
  }
}
