package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codegen'd dot-product expression: value semantics, null
  * propagation, and agreement with the unrolled-arithmetic ANN query. */
class DotProductSpec extends SparkSpec {

  test("graft_dot computes the ascending-order dot and propagates nulls") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Option(Array(1.0, 2.0, 3.0)), Option(Array(4.0, 5.0, 6.0))),
      (2L, None: Option[Array[Double]], Option(Array(1.0))),
      (3L, Option(Array(2.0)), None: Option[Array[Double]]))
      .toDF("id", "a", "b")
      .select(col("id"), GraftFunctions.dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(df(0).getDouble(1) == 32.0)
    assert(df(1).isNullAt(1) && df(2).isNullAt(1))
    // usable from SQL text too (extension-injected path)
    assert(spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .head().getDouble(0) == 11.0)
  }

  test("the graft_dot ANN query equals the unrolled form row for row") {
    val unrolled = graft.scale.Similarity.annBruteForce(spark, sfDir).collect().toSet
    val viaExpr = graft.scale.Similarity.annDotExpr(spark, sfDir).collect().toSet
    assert(unrolled.nonEmpty && unrolled == viaExpr,
      s"expression form diverged: ${viaExpr.diff(unrolled).take(3)}")
  }

  test("graft_dot participates in whole-stage codegen") {
    // literal inputs constant-fold to a LocalTableScan — use a real scan
    GraftFunctions.register(spark)
    val v = expr("transform(embedding, x -> cast(x as double))")
    val df = graft.Tables.embeddings(spark, sfDir)
      .select(GraftFunctions.dot(v, v).as("d"))
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("graft_dot"), executed)
    assert(executed.contains("*("), "expected a whole-stage codegen span:\n" + executed)
  }
}
