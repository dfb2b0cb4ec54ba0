package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The custom Generator (UDTF tier): plans as a Generate node with zero
  * exchanges, emits exactly the composed sequence+explode+slice rows,
  * and handles the degenerate inputs inside the expression. */
class ChunkTokensSpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  test("generator chunking equals the composed explode+slice form row-for-row") {
    val gen = graft.scale.FeatureOps.chunkDocumentsGen(spark, sfDir)
    val composed = graft.scale.FeatureOps.chunkDocuments(spark, sfDir)
      .select(gen.columns.map(col): _*)
    assert(gen.exceptAll(composed).isEmpty && composed.exceptAll(gen).isEmpty)
  }

  test("generator plans as Generate with zero exchanges") {
    val df = graft.scale.FeatureOps.chunkDocumentsGen(spark, sfDir)
    val p = executed(df).toString
    assert(p.contains("Generate") && p.contains("graft_chunk_tokens"), p.take(800))
    assert(!p.contains("Exchange"), "chunking must not shuffle:\n" + p.take(800))
  }

  test("empty and sub-window arrays emit the right row counts") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Seq[String]()),            // empty -> no rows
      (2L, Seq("a")),                 // one token -> one chunk
      (3L, (1 to 40).map(_.toString)),  // exactly one window -> one chunk
      (4L, (1 to 41).map(_.toString))   // one over -> two chunks
    ).toDF("id", "toks")
      .select(col("id"),
        call_function("graft_chunk_tokens", col("toks"), lit(40), lit(30))
          .as(Seq("chunk_idx", "start_tok", "chunk_toks")))
    val counts = df.groupBy(col("id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!counts.contains(1L))
    assert(counts(2L) == 1 && counts(3L) == 1 && counts(4L) == 2)
    // the second chunk of id=4 starts at token 30 and holds 11 tokens
    val tail = df.filter(col("id") === 4 && col("chunk_idx") === 1).head()
    assert(tail.getLong(2) == 30L, s"start_tok ${tail.getLong(2)}")
    assert(tail.getSeq[String](3).size == 11)
  }
}
