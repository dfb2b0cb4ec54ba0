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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_documents" -> (profileDocuments _))

  def oracles: Map[String, String] = Map(
    "profile_documents" -> profileDocumentsSql)
}
