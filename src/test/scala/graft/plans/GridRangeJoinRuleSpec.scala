package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SharedSpark is built with spark.sql.extensions=graft.plans.GraftExtensions,
  * so the rule is active for every DataFrame here. */
class GridRangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private val points: Seq[(Long, Double, Double)] = {
    val rnd = new scala.util.Random(11)
    (0 until 400).map(i => (i.toLong, rnd.nextDouble() * 40, rnd.nextDouble() * 40))
  }

  private def pts(prefix: String): DataFrame =
    points.toDF(s"${prefix}id", s"${prefix}x", s"${prefix}y")

  private def naiveJoin: DataFrame = {
    val d2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
      (col("ay") - col("by")) * (col("ay") - col("by"))
    pts("a").join(pts("b"), d2 <= lit(9.0) && col("aid") =!= col("bid"))
  }

  test("naive distance join is rewritten to a grid equi-join (no BNL)") {
    val plan = naiveJoin.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"expected grid rewrite, got:\n$plan")
    assert(plan.contains("Generate explode"), s"expected neighbor-cell explode:\n$plan")
  }

  test("rewritten join returns exactly the brute-force result set") {
    val got = naiveJoin.select("aid", "bid").as[(Long, Long)].collect().toSet
    val brute = (for {
      (i, xi, yi) <- points; (j, xj, yj) <- points
      if i != j && (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj) <= 9.0
    } yield (i, j)).toSet
    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("joins that already have equi keys are left untouched") {
    val d2 = (col("ax") - col("bx")) * (col("ax") - col("bx")) +
      (col("ay") - col("by")) * (col("ay") - col("by"))
    val withKey = pts("a").join(pts("b"), col("aid") === col("bid") && d2 <= lit(9.0))
    val plan = withKey.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate explode"), s"should not rewrite:\n$plan")
  }
}
