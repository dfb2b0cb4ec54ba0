package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sink operators — SURVEY §2.2. The reference persists to TimescaleDB
  * with per-row upserts, retention/compression policies, and JSON
  * exports; the Spark-native equivalents are partitioned Parquet (ZSTD)
  * with set-based merge semantics:
  *
  *  - K1 upsert ⇒ left-anti join new-vs-existing + append (or Delta
  *    `MERGE INTO` where Delta is available — same plan shape);
  *  - K5 retention ⇒ partition-pruned filter rewrite (at scale: drop
  *    whole date partitions, never row-level deletes);
  *  - K7 export ⇒ `coalesce(1).write.json`.
  *
  * `upsertMerged` is the query-shaped version of K1 so the merge
  * semantics sit under the DuckDB oracle like every other operator.
  */
object Sinks {

  /** K1 — the merged view an upsert produces: existing rows win on key
    * collisions, new rows are appended (`repository.py:28-96` skip-if-
    * exists path). Keys = (user_id, ts). "New" batch = the events rows
    * with event_id % 5 = 0, re-keyed to collide on a subset. */
  def upsertMerged(spark: SparkSession, dir: String): DataFrame = {
    val existing = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"), lit("existing").as("origin"))
    val incoming = Tables.events(spark, dir)
      .filter(col("event_id") % 5 === 0)
      .select(col("user_id"),
        // half the incoming batch collides with existing keys, half is new
        when(col("event_id") % 10 === 0, col("ts"))
          .otherwise(col("ts") + expr("INTERVAL 30 SECONDS")).as("ts"),
        round(col("value") * 2, 6).as("value"), lit("incoming").as("origin"))
    val newRows = incoming.join(existing.select("user_id", "ts"), Seq("user_id", "ts"), "left_anti")
    existing.unionByName(newRows)
      .select(col("user_id"), col("ts"), round(col("value"), 6).as("value"), col("origin"))
  }

  val upsertMergedSql: String =
    """WITH existing AS (
      |  SELECT user_id, ts, value, 'existing' AS origin FROM events),
      |incoming AS (
      |  SELECT user_id,
      |         CASE WHEN event_id % 10 = 0 THEN ts ELSE ts + INTERVAL 30 SECOND END AS ts,
      |         round(value * 2, 6) + 0 AS value, 'incoming' AS origin
      |  FROM events WHERE event_id % 5 = 0),
      |new_rows AS (
      |  SELECT i.* FROM incoming i
      |  WHERE NOT EXISTS (SELECT 1 FROM existing e
      |                    WHERE e.user_id = i.user_id AND e.ts = i.ts))
      |SELECT user_id, ts, round(value, 6) + 0 AS value, origin FROM existing
      |UNION ALL
      |SELECT user_id, ts, round(value, 6) + 0 AS value, origin FROM new_rows""".stripMargin

  /** K5 — retention view: drop rows older than a cutoff. At scale the
    * cutoff predicate hits the date partition column ⇒ partition drop. */
  def retentionFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts") >= lit("2024-01-10").cast("timestamp"))
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))

  val retentionFilterSql: String =
    """SELECT date_trunc('day', ts) AS day, count(*) AS n
      |FROM events WHERE ts >= TIMESTAMP '2024-01-10'
      |GROUP BY 1""".stripMargin

  // -------------------------------------------------------------- writers
  /** K1/K2 physical write: date-partitioned ZSTD Parquet append — the
    * storage layout §1.1 prescribes (partition pruning ≙ chunk
    * exclusion). */
  def writePartitioned(df: DataFrame, path: String): Unit =
    df.withColumn("date", to_date(col("ts")))
      .write.mode(SaveMode.Append)
      .partitionBy("date")
      .option("compression", "zstd")
      .parquet(path)

  /** K5 retention delete as a partition-level rewrite (plain-Parquet
    * stand-in for Delta `DELETE WHERE` / partition drop). */
  def applyRetention(spark: SparkSession, path: String, cutoff: String): Unit = {
    val kept = spark.read.parquet(path).filter(col("date") >= lit(cutoff))
    val tmp = path + "_retained"
    kept.write.mode(SaveMode.Overwrite).partitionBy("date")
      .option("compression", "zstd").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
  }

  /** K7 — JSON export of a small result (reports/params). */
  def exportJson(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).json(path)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k1_upsert_merge"    -> (upsertMerged _),
    "k5_retention"       -> (retentionFilter _))

  def oracles: Map[String, String] = Map(
    "k1_upsert_merge"    -> upsertMergedSql,
    "k5_retention"       -> retentionFilterSql)
}
