package graft.analysis

import graft.Tables
import graft.features.Indicators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{LinearRegression, RandomForestRegressor}

/** Feature-importance ranking — SURVEY §2.12 / `feature_importance.py`:
  * correlation, binned mutual information (plain DataFrame contingency
  * aggs — no Expression needed), MLlib RandomForest importances and
  * Lasso coefficients, and a consensus rank merge (O4 top-k).
  *
  * Correlation/MI are oracle-checked; the MLlib fits are rows-only
  * (seeded, but their internals aren't SQL-reproducible). The feature
  * frame derives from candles: one window pass, then the fits see a
  * small projected table — at 100 TB you sample here, the shape holds.
  */
object Importance {

  private val featureNames = Seq("ret_1", "vol_5", "mom_5", "rng_ratio", "body_ratio")

  /** Candle-derived feature frame + next-period-return target. */
  def featureFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = W()
    Tables.candles(spark, dir)
      .withColumn("ret_1", pctChange(col("close"), w))
      .withColumn("vol_5", rollStd(col("ret_1"), 5, w))
      .withColumn("mom_5", momentum(col("close"), 5, w))
      .withColumn("rng_ratio", safeDiv(col("high") - col("low"), col("close")))
      .withColumn("body_ratio", safeDiv(abs(col("close") - col("open")),
        col("high") - col("low")))
      .withColumn("target", lead(col("ret_1"), 1).over(w))
      .na.drop(featureNames :+ "target")
      .select(col("user_id") +: col("bucket") +: (featureNames :+ "target").map(col): _*)
  }

  /** Shared SQL mirror of [[featureFrame]]. */
  val featureFrameSql: String = Tables.candlesSql +
    """, f0 AS (
      |  SELECT user_id, bucket, open, high, low, close,
      |    (close - lag(close) OVER w) / nullif(lag(close) OVER w, 0) AS ret_1,
      |    lag(close, 5) OVER w AS c5
      |  FROM candles WINDOW w AS (PARTITION BY user_id ORDER BY bucket)),
      |f1 AS (
      |  SELECT user_id, bucket, open, high, low, close, ret_1,
      |    CASE WHEN count(ret_1) OVER w5 = 5 THEN stddev_samp(ret_1) OVER w5 END AS vol_5,
      |    close / nullif(c5, 0) - 1 AS mom_5,
      |    (high - low) / nullif(close, 0) AS rng_ratio,
      |    abs(close - open) / nullif(high - low, 0) AS body_ratio,
      |    lead(ret_1) OVER w AS target
      |  FROM f0
      |  WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
      |         w5 AS (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
      |feat AS (
      |  SELECT user_id, bucket, ret_1, vol_5, mom_5, rng_ratio, body_ratio, target
      |  FROM f1
      |  WHERE ret_1 IS NOT NULL AND vol_5 IS NOT NULL AND mom_5 IS NOT NULL
      |    AND rng_ratio IS NOT NULL AND body_ratio IS NOT NULL AND target IS NOT NULL)""".stripMargin

  // ---------------------------------------------------------------- corr
  /** |Pearson corr| ranking (`feature_importance.py:254-257` family). */
  def corrImportance(spark: SparkSession, dir: String): DataFrame = {
    val f = featureFrame(spark, dir)
    val rows = featureNames.map(n =>
      f.agg(lit(n).as("feature"), round(abs(corr(col(n), col("target"))), 6).as("abs_corr")))
    rows.reduce(_ unionByName _)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("abs_corr").desc, col("feature"))))
  }

  val corrImportanceSql: String = featureFrameSql +
    """,
      |scores AS (
      |  SELECT 'ret_1' AS feature, round(abs(corr(ret_1, target)), 6) AS abs_corr FROM feat
      |  UNION ALL SELECT 'vol_5', round(abs(corr(vol_5, target)), 6) FROM feat
      |  UNION ALL SELECT 'mom_5', round(abs(corr(mom_5, target)), 6) FROM feat
      |  UNION ALL SELECT 'rng_ratio', round(abs(corr(rng_ratio, target)), 6) FROM feat
      |  UNION ALL SELECT 'body_ratio', round(abs(corr(body_ratio, target)), 6) FROM feat)
      |SELECT feature, abs_corr,
      |       CAST(row_number() OVER (ORDER BY abs_corr DESC, feature) AS INT) AS rank
      |FROM scores""".stripMargin

  // ---------------------------------------------------------------- MI
  /** Binned mutual information (`feature_importance.py:117-179`): 4
    * equal-width bins per variable, MI from contingency counts — pure
    * groupBy aggregation, nats. */
  def miImportance(spark: SparkSession, dir: String): DataFrame = {
    val f = featureFrame(spark, dir)
    val stacked = f.select(
      expr(s"stack(${featureNames.size}, " +
        featureNames.map(n => s"'$n', $n").mkString(", ") + ") AS (feature, x)"),
      col("target").as("y"))
    val fit = stacked.groupBy(col("feature"))
      .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
           min(col("y")).as("y0"), max(col("y")).as("y1"))
    val binned = stacked.join(broadcast(fit), "feature")
      .withColumn("bx", least(floor((col("x") - col("x0")) / (col("x1") - col("x0")) * 4), lit(3)))
      .withColumn("by", least(floor((col("y") - col("y0")) / (col("y1") - col("y0")) * 4), lit(3)))
    val joint = binned.groupBy(col("feature"), col("bx"), col("by")).agg(count(lit(1)).as("nxy"))
    val wf = org.apache.spark.sql.expressions.Window.partitionBy(col("feature"))
    val withMarginals = joint
      .withColumn("n", sum(col("nxy")).over(wf))
      .withColumn("nx", sum(col("nxy")).over(wf.partitionBy(col("feature"), col("bx"))))
      .withColumn("ny", sum(col("nxy")).over(wf.partitionBy(col("feature"), col("by"))))
    withMarginals
      .groupBy(col("feature"))
      .agg(round(sum((col("nxy") / col("n")) *
        log((col("nxy") * col("n")) / (col("nx") * col("ny")))), 6).as("mutual_info"))
  }

  val miImportanceSql: String = featureFrameSql +
    """,
      |stacked AS (
      |  SELECT 'ret_1' AS feature, ret_1 AS x, target AS y FROM feat
      |  UNION ALL SELECT 'vol_5', vol_5, target FROM feat
      |  UNION ALL SELECT 'mom_5', mom_5, target FROM feat
      |  UNION ALL SELECT 'rng_ratio', rng_ratio, target FROM feat
      |  UNION ALL SELECT 'body_ratio', body_ratio, target FROM feat),
      |fit AS (
      |  SELECT feature, min(x) AS x0, max(x) AS x1, min(y) AS y0, max(y) AS y1
      |  FROM stacked GROUP BY feature),
      |binned AS (
      |  SELECT s.feature,
      |    least(floor((x - x0) / (x1 - x0) * 4), 3) AS bx,
      |    least(floor((y - y0) / (y1 - y0) * 4), 3) AS by
      |  FROM stacked s JOIN fit USING (feature)),
      |joint AS (
      |  SELECT feature, bx, by, count(*) AS nxy FROM binned GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT feature, bx, by, nxy,
      |    sum(nxy) OVER (PARTITION BY feature) AS n,
      |    sum(nxy) OVER (PARTITION BY feature, bx) AS nx,
      |    sum(nxy) OVER (PARTITION BY feature, by) AS ny
      |  FROM joint)
      |SELECT feature,
      |  round(sum((nxy * 1.0 / n) * ln((nxy * 1.0 * n) / (nx * 1.0 * ny))), 6) AS mutual_info
      |FROM m GROUP BY feature""".stripMargin

  // ---------------------------------------------------------------- MLlib
  /** RandomForest feature importances (seeded; rows-only check). */
  def rfImportance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val f = featureFrame(spark, dir)
    val assembled = new VectorAssembler()
      .setInputCols(featureNames.toArray).setOutputCol("fv")
      .transform(f).select(col("fv"), col("target").as("label"))
    val model = new RandomForestRegressor()
      .setFeaturesCol("fv").setLabelCol("label")
      .setNumTrees(20).setMaxDepth(5).setSeed(42)
      .fit(assembled)
    featureNames.zip(model.featureImportances.toArray)
      .toDF("feature", "rf_importance")
      .select(col("feature"), round(col("rf_importance"), 6).as("rf_importance"))
  }

  /** Lasso (elasticNet=1) coefficient magnitudes (rows-only check). */
  def lassoImportance(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val f = featureFrame(spark, dir)
    val assembled = new VectorAssembler()
      .setInputCols(featureNames.toArray).setOutputCol("fv")
      .transform(f).select(col("fv"), col("target").as("label"))
    val model = new LinearRegression()
      .setFeaturesCol("fv").setLabelCol("label")
      .setElasticNetParam(1.0).setRegParam(1e-5).setStandardization(true)
      .fit(assembled)
    featureNames.zip(model.coefficients.toArray)
      .toDF("feature", "coef")
      .select(col("feature"), round(abs(col("coef")), 6).as("abs_coef"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "imp_correlation" -> (corrImportance _),
    "imp_mutual_info" -> (miImportance _),
    "imp_rf"          -> (rfImportance _),
    "imp_lasso"       -> (lassoImportance _))

  def oracles: Map[String, String] = Map(
    "imp_correlation" -> corrImportanceSql,
    "imp_mutual_info" -> miImportanceSql)
}
