package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed storage — the co-located-join half of the 100 TB layout
  * story (`SURVEY.md` §7; the other half is the date-partitioned ZSTD
  * layout in [[Sinks.writePartitioned]]).
  *
  * A fact table bucketed AND sorted by its join key pays its shuffle
  * once at write time; every subsequent equi-join or aggregation on
  * that key runs with ZERO exchanges — at 100 TB this converts the
  * recurring fact⋈fact shuffle (the single largest cost in the
  * enrichment pipeline) into a one-time layout decision. Bucket counts
  * must match across co-bucketed tables; `BucketingSpec` asserts the
  * exchange-free plan and result equality against the shuffled join.
  */
object Bucketing {

  /** Write `df` bucketed+sorted by `key` into the session catalog as
    * `table` (Parquet, ZSTD). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .option("compression", "zstd")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two co-bucketed tables on their bucket keys — plans as a
    * SortMergeJoin with no Exchange on either side. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}
