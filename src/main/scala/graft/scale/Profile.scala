package graft.scale

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table profiling — the data-validation pass a pipeline runs before
  * training: per-column row/null/distinct counts and min/max, emitted
  * as one row per column.
  *
  * Shape at scale: ONE aggregate over the table (multi-distinct expands
  * via Spark's Expand operator — still a single scan), then a constant
  * `stack` projection of the one-row result; nothing but the scan
  * touches the data. Exact distincts here double as the verification
  * oracle for the HLL path (`sk_approx_distinct`) a 100 TB profile
  * would ship. min/max are computed on the NATIVE type (numeric
  * ordering) and cast to string only for the uniform report schema. */
object Profile {

  private val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  def profileDocuments(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables.documents(spark, dir)
    val aggs = docCols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val stacked = docCols
      .map(c => s"'$c', ${c}__nn, ${c}__nd, ${c}__min, ${c}__max")
      .mkString(", ")
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
      .select(
        expr(s"stack(${docCols.size}, $stacked) AS " +
          "(column_name, n_nonnull, n_distinct, min_value, max_value)"),
        col("n_rows"))
      .select(col("column_name"), col("n_rows"), col("n_nonnull"),
        (col("n_rows") - col("n_nonnull")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  val profileDocumentsSql: String = {
    val aggs = docCols.map { c =>
      s"count($c) AS ${c}__nn, count(DISTINCT $c) AS ${c}__nd, " +
        s"min($c)::VARCHAR AS ${c}__min, max($c)::VARCHAR AS ${c}__max"
    }.mkString(",\n    ")
    val rows = docCols.map { c =>
      s"SELECT '$c' AS column_name, n_rows, ${c}__nn AS n_nonnull, " +
        s"n_rows - ${c}__nn AS n_nulls, ${c}__nd AS n_distinct, " +
        s"${c}__min AS min_value, ${c}__max AS max_value FROM a"
    }.mkString("\nUNION ALL\n")
    s"""WITH a AS (
       |  SELECT count(*) AS n_rows,
       |    $aggs
       |  FROM documents)
       |$rows""".stripMargin
  }

  // ----------------------------------------------------------- histograms
  /** Per-column equi-width histograms over the documents table — the
    * dataset-card artifact a curation pipeline publishes next to the
    * scalar profile (r6 verdict item 6): for each numeric column, 16
    * buckets with count plus the actual min/max landing in each (the
    * real support, which fixed edges alone hide).
    *
    * Determinism design: bucketing is PURE BIGINT arithmetic —
    * `((v − mn) · B) div (mx − mn + 1)` — so the histogram is bit-exact
    * on any engine and any partitioning, the same reproducibility
    * argument as the integer PageRank ([[GraphOps]]); float equi-width
    * (`floor((v−mn)/w)`) puts boundary values one ulp from flipping
    * buckets cross-engine. Shape at scale: fit = one aggregate (3-row
    * min/max frame, broadcast back), apply = one projection + one
    * grouped count — two scans, no shuffle wider than (columns ×
    * buckets). At 100 TB the same apply step would take its edges from
    * the GK sketch ([[Sketches]]) instead of the exact min/max when
    * quantile edges are wanted (equi-depth cards); the exact-min/max
    * form is the one a deterministic oracle can replay. */
  private val HistBuckets = 16

  /** The (column_name, v) tall frame both histogram profilers bucket —
    * one definition (with its SQL twin) so the profiled column set and
    * the token rule can't drift between the two queries or their
    * oracles. */
  private def docLongTall(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        TextAnalysis.wsTokenCount.cast("long").as("n_words"))
    val longCols = Seq("doc_id", "n_chars", "n_words")
    val stacked = longCols.map(c => s"'$c', $c").mkString(", ")
    base.select(expr(s"stack(${longCols.size}, $stacked) AS (column_name, v)"))
  }

  private val docLongTallSql: String =
    s"""SELECT 'doc_id' AS column_name, doc_id AS v FROM documents
       |  UNION ALL
       |  SELECT 'n_chars', n_chars FROM documents
       |  UNION ALL
       |  SELECT 'n_words', CAST(${TextAnalysis.wsTokenCountSql} AS BIGINT)
       |  FROM documents""".stripMargin

  def profileHistograms(spark: SparkSession, dir: String): DataFrame = {
    val tall = docLongTall(spark, dir)
    val fit = tall.groupBy(col("column_name"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    tall.join(broadcast(fit), "column_name")
      .withColumn("bucket",
        expr(s"((v - mn) * $HistBuckets) div (mx - mn + 1)"))
      .groupBy(col("column_name"), col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
  }

  val profileHistogramsSql: String =
    s"""WITH tall AS (
       |  $docLongTallSql),
       |f AS (SELECT column_name, min(v) AS mn, max(v) AS mx FROM tall GROUP BY 1)
       |SELECT t.column_name,
       |       ((t.v - f.mn) * $HistBuckets) // (f.mx - f.mn + 1) AS bucket,
       |       count(*) AS n, min(t.v) AS lo, max(t.v) AS hi
       |FROM tall t JOIN f ON f.column_name = t.column_name
       |GROUP BY 1, 2""".stripMargin

  /** Equi-DEPTH counterpart of [[profileHistograms]] — 16 quantile
    * buckets per column (the dataset-card form that shows distribution
    * shape where equi-width drowns in a long tail). Tie groups stay
    * whole: bucket = `(rows-strictly-below · B) div n` assigns every
    * occurrence of a value to one bucket, so the histogram is a pure
    * function of the value multiset — deterministic, BIGINT-only,
    * hash-oracleable. Scale shape: the corpus is touched once by the
    * (column, value) count aggregate; the cumulative window then runs
    * over the DISTINCT-VALUE frame partitioned per column — and that
    * is exactly why ID-LIKE columns (doc_id) are EXCLUDED here: a
    * unique column's distinct-value frame IS the corpus, collapsing
    * the window to one corpus-sized partition (the anti-pattern),
    * while its equi-depth histogram is rank-trivial anyway. The
    * measure columns (doc-length values) are domain-bounded, the same
    * reason the Zipf rank window is safe; per-column totals broadcast
    * back. No corpus-sized sort or single-partition window anywhere. */
  private val equidepthCols = Seq("n_chars", "n_words")

  def profileEquidepth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docLongTall(spark, dir)
      .filter(col("column_name").isin(equidepthCols: _*))
      .groupBy(col("column_name"), col("v"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.groupBy(col("column_name")).agg(sum(col("cnt")).as("n_rows"))
    val w = Window.partitionBy(col("column_name")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    counts.withColumn("cum_before", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .join(broadcast(tot), "column_name")
      .withColumn("bucket", expr(s"(cum_before * $HistBuckets) div n_rows"))
      .groupBy(col("column_name"), col("bucket"))
      .agg(sum(col("cnt")).as("n"), min(col("v")).as("lo"), max(col("v")).as("hi"))
  }

  val profileEquidepthSql: String =
    s"""WITH tall AS (
       |  $docLongTallSql),
       |counts AS (
       |  SELECT column_name, v, count(*) AS cnt FROM tall
       |  WHERE column_name IN (${equidepthCols.map("'" + _ + "'").mkString(", ")})
       |  GROUP BY 1, 2),
       |tot AS (
       |  SELECT column_name, CAST(sum(cnt) AS BIGINT) AS n_rows
       |  FROM counts GROUP BY 1),
       |cum AS (
       |  SELECT column_name, v, cnt,
       |    CAST(coalesce(sum(cnt) OVER (PARTITION BY column_name ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS cum_before
       |  FROM counts)
       |SELECT c.column_name, (c.cum_before * $HistBuckets) // t.n_rows AS bucket,
       |       CAST(sum(c.cnt) AS BIGINT) AS n, min(c.v) AS lo, max(c.v) AS hi
       |FROM cum c JOIN tot t USING (column_name)
       |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- skew
  /** Join-key SKEW census — the diagnostic that decides between a plain
    * shuffle join, AQE skew splitting, and salting (`j5_skew_salted`):
    * per key-column, the share of rows held by the single heaviest key
    * and by the top 1% of keys, plus the key count. A hot key with 10%
    * of a 100 TB fact table is a 10 TB straggler partition — this census
    * is how the pipeline notices BEFORE the join hangs, and its output
    * feeds the salting fan-out factor (`ceil(top_share · n_rows /
    * target_partition_rows)`).
    *
    * One aggregate per audited column over (key → count), then a tiny
    * ordered aggregate of the per-key counts; never wider than the
    * distinct-key set. */
  def skewCensus(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    // rank-free on purpose: a global row_number over per-key counts is a
    // single-partition window over |distinct keys| — millions at 100 TB.
    // "Top 1% of keys" is instead the keys at or above the p99 count
    // (fit: one percentile over the counts; apply: one aggregate) —
    // same diagnostic, no unbounded window anywhere.
    def censusOf(keyCol: String): DataFrame = {
      val counts = ev.groupBy(col(keyCol).cast("string").as("k"))
        .agg(count(lit(1)).as("n"))
      val fit = counts.agg(expr("percentile(n, 0.99)").as("p99"))
      counts.crossJoin(broadcast(fit))
        .groupBy(lit(keyCol).as("key_column"))
        .agg(
          count(lit(1)).as("n_keys"),
          sum(col("n")).as("n_rows"),
          round(max(col("n")) / sum(col("n")).cast("double"), 6).as("top1_share"),
          round(sum(when(col("n") >= col("p99"), col("n")).otherwise(0L)) /
            sum(col("n")).cast("double"), 6).as("top1pct_share"),
          round(sum(col("n")).cast("double") / count(lit(1)), 6)
            .as("mean_rows_per_key"))
    }
    censusOf("user_id").unionByName(censusOf("event_type"))
  }

  val skewCensusSql: String = {
    def body(tag: String, label: String): String =
      s"""SELECT '$label' AS key_column, count(*) AS n_keys,
         |  CAST(sum(n) AS BIGINT) AS n_rows,
         |  round(max(n) * 1.0 / sum(n), 6) + 0 AS top1_share,
         |  round(sum(CASE WHEN n >= p99 THEN n ELSE 0 END) * 1.0 / sum(n), 6) + 0
         |    AS top1pct_share,
         |  round(sum(n) * 1.0 / count(*), 6) + 0 AS mean_rows_per_key
         |FROM $tag CROSS JOIN f$tag""".stripMargin
    s"""WITH cu AS (SELECT user_id::VARCHAR AS k, count(*) AS n FROM events GROUP BY 1),
       |ce AS (SELECT event_type::VARCHAR AS k, count(*) AS n FROM events GROUP BY 1),
       |fcu AS (SELECT quantile_cont(n, 0.99) AS p99 FROM cu),
       |fce AS (SELECT quantile_cont(n, 0.99) AS p99 FROM ce)
       |${body("cu", "user_id")}
       |UNION ALL BY NAME
       |${body("ce", "event_type")}""".stripMargin
  }

  // ---------------------------------------------------------------- recon
  /** Reconciliation census between two pipeline versions of the same
    * table — the check run after every backfill/reprocess before the
    * new version goes live: per day, row counts and an order-free
    * content checksum (sum of per-row hashes — commutative, so it
    * ignores row order and partitioning) for both versions, plus the
    * match verdicts. "v2" here is a deterministic perturbation of the
    * events table (drops event_id % 97 == 0 and re-scores one user's
    * values) so the census provably catches both row-loss and silent
    * value drift. One aggregate per side, one tiny join — at 100 TB the
    * only thing that moves is the per-day census rows. */
  def reconDiff(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def census(df: DataFrame, suffix: String): DataFrame =
      df.groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as(s"rows_$suffix"),
          sum(conv(substring(md5(concat_ws("|",
              col("event_id"), col("user_id"),
              round(col("value"), 6))).cast("binary"), 1, 8), 16, 10).cast("long"))
            .as(s"checksum_$suffix"))
    val v1 = census(ev, "v1")
    val v2 = census(
      ev.filter(col("event_id") % 97 =!= 0)
        .withColumn("value",
          when(col("user_id") === 7, col("value") * 1.0001).otherwise(col("value"))),
      "v2")
    v1.join(v2, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("rows_v1"), lit(0L)).as("rows_v1"),
        coalesce(col("rows_v2"), lit(0L)).as("rows_v2"),
        (coalesce(col("rows_v1"), lit(0L)) === coalesce(col("rows_v2"), lit(0L)))
          .as("rows_match"),
        (coalesce(col("checksum_v1"), lit(0L)) === coalesce(col("checksum_v2"), lit(0L)))
          .as("content_match"))
  }

  val reconDiffSql: String =
    """WITH v1 AS (
      |  SELECT date_trunc('day', ts) AS day, count(*) AS rows_v1,
      |    CAST(sum(('0x' || substr(md5(event_id::VARCHAR || '|' || user_id::VARCHAR
      |      || '|' || round(value, 6)::VARCHAR), 1, 8))::BIGINT) AS BIGINT) AS checksum_v1
      |  FROM events GROUP BY 1),
      |v2 AS (
      |  SELECT date_trunc('day', ts) AS day, count(*) AS rows_v2,
      |    CAST(sum(('0x' || substr(md5(event_id::VARCHAR || '|' || user_id::VARCHAR
      |      || '|' || round(CASE WHEN user_id = 7 THEN value * 1.0001 ELSE value END,
      |                      6)::VARCHAR), 1, 8))::BIGINT) AS BIGINT) AS checksum_v2
      |  FROM events WHERE event_id % 97 <> 0 GROUP BY 1)
      |SELECT coalesce(v1.day, v2.day) AS day,
      |  coalesce(rows_v1, 0) AS rows_v1, coalesce(rows_v2, 0) AS rows_v2,
      |  coalesce(rows_v1, 0) = coalesce(rows_v2, 0) AS rows_match,
      |  coalesce(checksum_v1, 0) = coalesce(checksum_v2, 0) AS content_match
      |FROM v1 FULL OUTER JOIN v2 ON v1.day = v2.day""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_documents"  -> (profileDocuments _),
    "profile_histograms" -> (profileHistograms _),
    "profile_equidepth"  -> (profileEquidepth _),
    "recon_diff"         -> (reconDiff _),
    "skew_census"        -> (skewCensus _))

  def oracles: Map[String, String] = Map(
    "profile_documents"  -> profileDocumentsSql,
    "profile_histograms" -> profileHistogramsSql,
    "profile_equidepth"  -> profileEquidepthSql,
    "recon_diff"         -> reconDiffSql,
    "skew_census"        -> skewCensusSql)
}
