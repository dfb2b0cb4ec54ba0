package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the ranking + new analytics operators that the DuckDB
  * hash-compare can't express: credit conservation in attribution,
  * eigenvector geometry in the PCA fit, score bounds in BM25/TF-IDF. */
class RankingSpec extends SparkSpec {

  test("tfidf emits at most 3 ranked terms per doc, rank dense from 1") {
    val df = Ranking.tfidfTopTerms(spark, sfDir).cache()
    val perDoc = df.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
    assert(perDoc.filter(col("n") > 3 || col("lo") =!= 1 || col("hi") =!= col("n")).count() == 0)
    assert(df.filter(col("tfidf") <= 0).count() == 0) // smoothed idf ≥ 1 ⇒ positive scores
  }

  test("bm25 returns 20 docs, scores non-increasing and non-negative") {
    val rows = Ranking.bm25Search(spark, sfDir).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.forall(_ >= 0))
    // collect() preserves the query's ORDER BY
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("attribution conserves credit: each model sums to the credited conversions") {
    import graft.operators.Sessions
    val credits = Sessions.attrTouch(spark, sfDir)
      .agg(sum("first_touch").as("f"), sum("last_touch").as("l"),
        sum("linear").as("lin"), sum("position_based").as("p"))
      .head()
    val f = credits.getDouble(0); val l = credits.getDouble(1)
    val lin = credits.getDouble(2); val p = credits.getDouble(3)
    // all four models distribute exactly 1.0 per conversion-with-touches
    assert(math.abs(f - l) < 1e-6 && math.abs(f - lin) < 1e-4 && math.abs(f - p) < 1e-4,
      s"credit totals diverge: first=$f last=$l linear=$lin position=$p")
  }

  test("pca power iteration yields a unit eigenvector with positive variance") {
    val rows = Similarity.pcaPower(spark, sfDir).collect()
    assert(rows.length == 64)
    val loadings = rows.map(_.getAs[Double]("loading"))
    val norm = math.sqrt(loadings.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-3, s"‖v‖=$norm") // quantized to 6dp per dim
    val ev = rows.head.getAs[Double]("explained_var")
    assert(ev > 0)
    // sign convention: the largest-|loading| dim is positive
    val maxAbs = loadings.maxBy(math.abs)
    assert(maxAbs > 0)
  }

  test("substring runs: dup fraction in [0,1], max run never exceeds dup count") {
    val df = Curation.substringRuns(spark, sfDir)
    assert(df.filter(col("dup_frac") < 0 || col("dup_frac") > 1).count() == 0)
    assert(df.filter(col("max_dup_run") > col("n_dup")).count() == 0)
    assert(df.filter(col("n_dup") > 0 && col("max_dup_run") === 0).count() == 0)
  }
}
