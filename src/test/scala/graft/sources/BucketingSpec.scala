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
    // isolated session: suites share the JVM-wide SparkSession and run in
    // parallel — mutating the shared autoBroadcastJoinThreshold would race
    // other suites' plan assertions. newSession() = own SQLConf + catalog.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(Tables.lineitem(s, sfDir), "li_bucketed", "l_orderkey")
      Bucketing.writeBucketed(Tables.orders(s, sfDir), "o_bucketed", "o_orderkey")
      val j = Bucketing.coLocatedJoin(s, "li_bucketed", "o_bucketed", "l_orderkey", "o_orderkey")
      val pj = plan(j)
      assert(pj.contains("SortMergeJoin"), pj)
      assert(!pj.contains("Exchange"), "co-bucketed join should not shuffle:\n" + pj)
      assert(pj.contains("Bucketed: true"), pj)
      // an aggregation on the bucket key reuses the layout too
      val agg = s.table("li_bucketed")
        .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
      val pa = plan(agg)
      assert(!pa.contains("Exchange"), "bucket-key agg should not shuffle:\n" + pa)
      // same result as the plain shuffled join
      val expected = Tables.lineitem(s, sfDir)
        .join(Tables.orders(s, sfDir), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(j.count() == expected && expected > 0)
    } finally {
      s.sql("DROP TABLE IF EXISTS li_bucketed")
      s.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
