package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Curation operators: the decontamination plan must broadcast the
  * benchmark side (the property that makes it 100 TB-safe), and the
  * repetition metrics must agree with a hand-computed document. */
class CurationSpec extends SparkSpec {

  test("decontamination broadcasts the benchmark shingle set and excludes benchmark docs") {
    val df = Curation.decontamOverlap(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side must broadcast, got:\n$plan")
    assert(df.filter(col("doc_id") % 97 === 0).isEmpty,
      "benchmark docs must not appear in the scored corpus")
    val bad = df.filter(col("contaminated_frac") < 0 || col("contaminated_frac") > 1 ||
      col("n_hits") > col("n_shingles"))
    assert(bad.isEmpty, "contamination fraction out of range")
  }

  test("bloom decontam: probe below the exact join, output identical to exact form") {
    val df = Curation.decontamBloom(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the bloom probe must sit in a Filter UNDER the broadcast join —
    // map-side pruning before any shuffle is the whole point
    assert(plan.contains("might_contain"), s"bloom probe missing from plan:\n$plan")
    val probeBelowJoin = plan.linesIterator
      .dropWhile(l => !l.contains("BroadcastHashJoin"))
      .exists(_.contains("might_contain"))
    assert(probeBelowJoin, s"probe not below the join:\n$plan")
    // no false negatives + exact verify == bit-identical to the exact form
    val exact = Curation.decontamOverlap(spark, sfDir)
    assert(df.exceptAll(exact).isEmpty && exact.exceptAll(df).isEmpty,
      "bloom-prefiltered result diverged from the exact result")
  }

  test("fused corpus pipeline: one plan, broadcast decontam, meaningful survival") {
    val df = Curation.corpusPipeline(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "benchmark shingles must broadcast:\n" + plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val n = df.count()
    val total = graft.Tables.documents(spark, sfDir).count()
    assert(n > 0 && n < total, s"pipeline kept $n of $total")
    assert(df.filter(col("doc_id") % 97 === 0).isEmpty, "benchmark docs must not survive")
    assert(df.filter(col("quality_score") < 0.4).isEmpty)
    assert(df.filter(col("contaminated_frac") >= 0.2).isEmpty)
  }

  test("repetition metrics match a hand computation on one doc") {
    val row = Curation.textRepetition(spark, sfDir)
      .filter(col("doc_id") === 0).collect().head
    val text = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 0).select(col("text")).collect().head.getString(0)
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val bis = toks.sliding(2).map(_.mkString(" ")).toSeq
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Long]("n_tokens") == toks.size)
    assert(row.getAs[Double]("type_token_ratio") ==
      r6(toks.distinct.size.toDouble / toks.size))
    assert(row.getAs[Double]("max_token_frac") ==
      r6(toks.groupBy(identity).values.map(_.size).max.toDouble / toks.size))
    assert(row.getAs[Double]("dup_bigram_frac") ==
      r6(1.0 - bis.distinct.size.toDouble / bis.size))
    assert(row.getAs[Double]("top_bigram_frac") ==
      r6(bis.groupBy(identity).values.map(_.size).max.toDouble / bis.size))
  }
}
