package graft.expressions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule: plan-level rewrites fire and values are
  * bit-identical to the unrewritten spelling. Inputs derive from
  * spark.range (not literal Seqs — ConvertToLocalRelation would
  * eagerly evaluate a LocalRelation projection and leave no expression
  * in the optimized plan to inspect).
  */
class GraftOptimizationsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def optimized(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def strings = spark.range(2)
    .selectExpr("CASE WHEN id = 0 THEN 'café TSCHÜSS' ELSE 'plain' END AS s")

  private def vectors = spark.range(2)
    .selectExpr("array(CAST(id AS DOUBLE) + 1.5, -2.25, 3.75) AS v")

  test("double nfc_normalize collapses to a single application") {
    val df = strings.selectExpr("nfc_normalize(nfc_normalize(s)) AS t")
    val plan = optimized(df)
    assert("nfc_normalize".r.findAllIn(plan).size === 1,
      s"idempotence rewrite missing:\n$plan")
    val single = strings.selectExpr("nfc_normalize(s) AS t")
      .collect().map(_.getString(0))
    assert(df.collect().map(_.getString(0)).toSeq === single.toSeq)
  }

  test("sqrt(vec_dot(x, x)) rewrites to the fused vec_norm, same bits") {
    val df = vectors.selectExpr("sqrt(vec_dot(v, v)) AS n")
    val plan = optimized(df)
    assert(plan.contains("vec_norm"), s"strength reduction missing:\n$plan")
    assert(!plan.toUpperCase.contains("SQRT"), s"sqrt should be gone:\n$plan")
    val direct = vectors.selectExpr("vec_norm(v) AS n")
      .collect().map(_.getDouble(0))
    // identical fold order in vec_dot and vec_norm → bit-identical
    assert(df.collect().map(_.getDouble(0)).toSeq === direct.toSeq)
  }

  test("sqrt(vec_dot(x, y)) with distinct children is left untouched") {
    val df = spark.range(1)
      .selectExpr("array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)) AS a",
        "array(CAST(3.0 AS DOUBLE), CAST(id AS DOUBLE) + 4.0) AS b")
      .selectExpr("sqrt(vec_dot(a, b)) AS s")
    val plan = optimized(df)
    assert(plan.contains("vec_dot") && !plan.contains("vec_norm"), plan)
    assert(math.abs(df.collect().head.getDouble(0) - math.sqrt(11.0)) < 1e-12)
  }
}
