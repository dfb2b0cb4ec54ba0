package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Bucketed layout: the write pays the shuffle once, co-bucketed joins
  * and key-aligned aggregations then plan with zero exchanges. */
class BucketingSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("co-bucketed fact join runs with zero exchanges and matches the shuffled join") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(Tables.lineitem(spark, sfDir), "li_bucketed", "l_orderkey")
      Bucketing.writeBucketed(Tables.orders(spark, sfDir), "o_bucketed", "o_orderkey")
      val j = Bucketing.coLocatedJoin(spark, "li_bucketed", "o_bucketed", "l_orderkey", "o_orderkey")
      val pj = plan(j)
      assert(pj.contains("SortMergeJoin"), pj)
      assert(!pj.contains("Exchange"), "co-bucketed join should not shuffle:\n" + pj)
      assert(pj.contains("Bucketed: true"), pj)
      // an aggregation on the bucket key reuses the layout too
      val agg = spark.table("li_bucketed")
        .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
      val pa = plan(agg)
      assert(!pa.contains("Exchange"), "bucket-key agg should not shuffle:\n" + pa)
      // same result as the plain shuffled join
      val expected = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(j.count() == expected && expected > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
