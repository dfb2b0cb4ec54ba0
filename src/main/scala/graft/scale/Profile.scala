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
    def censusOf(keyCol: String): DataFrame = {
      val counts = ev.groupBy(col(keyCol).cast("string").as("k"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("k"))
      counts
        .withColumn("rk", row_number().over(w))
        .withColumn("total", sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
        .withColumn("n_keys", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
        .groupBy(lit(keyCol).as("key_column"))
        .agg(
          max(col("n_keys")).as("n_keys"),
          max(col("total")).as("n_rows"),
          round(max(when(col("rk") === 1, col("n"))) /
            max(col("total")).cast("double"), 6).as("top1_share"),
          round(sum(when(col("rk") <= greatest(ceil(col("n_keys") / lit(100.0)), lit(1)),
            col("n")).otherwise(0L)) /
            max(col("total")).cast("double"), 6).as("top1pct_share"),
          round(max(col("total")).cast("double") / max(col("n_keys")), 6)
            .as("mean_rows_per_key"))
    }
    censusOf("user_id").unionByName(censusOf("event_type"))
  }

  val skewCensusSql: String = {
    def censusOf(c: String): String =
      s"""SELECT '$c' AS key_column, max(n_keys) AS n_keys,
         |  CAST(max(total) AS BIGINT) AS n_rows,
         |  round(max(CASE WHEN rk = 1 THEN n END) * 1.0 / max(total), 6) + 0 AS top1_share,
         |  round(sum(CASE WHEN rk <= greatest(CAST(ceil(max_keys / 100.0) AS BIGINT), 1)
         |                 THEN n ELSE 0 END) * 1.0 / max(total), 6) + 0 AS top1pct_share,
         |  round(max(total) * 1.0 / max(n_keys), 6) + 0 AS mean_rows_per_key
         |FROM (
         |  SELECT k, n, row_number() OVER (ORDER BY n DESC, k) AS rk,
         |         sum(n) OVER () AS total, count(*) OVER () AS n_keys,
         |         count(*) OVER () AS max_keys
         |  FROM (SELECT $c::VARCHAR AS k, count(*) AS n FROM events GROUP BY 1))""".stripMargin
    censusOf("user_id") + "\nUNION ALL BY NAME\n" + censusOf("event_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_documents" -> (profileDocuments _),
    "skew_census"       -> (skewCensus _))

  def oracles: Map[String, String] = Map(
    "profile_documents" -> profileDocumentsSql,
    "skew_census"       -> skewCensusSql)
}
