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

  test("graft_dot is bit-identical to the unrolled 64-term arithmetic on real vectors") {
    GraftFunctions.register(spark)
    val v = expr("transform(embedding, x -> cast(x as double))")
    // the A/B: the expression vs the flat element_at arithmetic it replaced
    val unrolled = (0 until 64)
      .map(i => element_at(v, i + 1) * element_at(v, i + 1)).reduce(_ + _)
    val diverged = graft.Tables.embeddings(spark, sfDir)
      .select(GraftFunctions.dot(v, v).as("e"), unrolled.as("u"))
      .filter(col("e") =!= col("u"))
    assert(diverged.isEmpty, "summation order must match the unrolled left fold")
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
