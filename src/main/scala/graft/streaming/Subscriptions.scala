package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** T7/T8 — per-client subscription management and rate-limit tiers
  * (`websocket_manager.py:129-190`, `:790-800`). The reference keeps a
  * per-client channel set and a per-tier rate limit in process memory;
  * the engine-side equivalents are
  *  - a deterministic subscription TABLE (client × channel, tier,
  *    msg/s budget) any fan-out layer joins against, and
  *  - a stream-static join (tick stream ⋈ subscriptions) producing the
  *    per-client delivery stream — see `ChannelsSpec`'s fan-out test.
  *
  * Tiers map the reference's latency classes
  * (`premium_data_provider.py:26-31`): premium < 10 ms / 1000 msg/s,
  * professional < 100 ms / 100 msg/s, retail best-effort / 10 msg/s.
  */
object Subscriptions {

  val channelNames: Seq[String] = Seq(
    "raw_ticks", "order_book", "trading_signals", "ml_features",
    "technical_analysis", "pattern_alerts", "microstructure", "economic_events")

  /** Deterministic subscription table from the customer dimension:
    * client c subscribes to channel i iff (c_custkey + i) % 3 == 0
    * (~1/3 density); tier from the market segment. */
  def subscriptionTable(spark: SparkSession, dir: String): DataFrame = {
    val channels = array(channelNames.map(lit): _*)
    Tables.customer(spark, dir)
      .select(col("c_custkey").as("client_id"), col("c_mktsegment"),
        posexplode(channels).as(Seq("channel_idx", "channel")))
      .filter((col("client_id") + col("channel_idx")) % 3 === 0)
      .withColumn("tier",
        when(col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY"), "premium")
          .when(col("c_mktsegment").isin("BUILDING", "FURNITURE"), "professional")
          .otherwise("retail"))
      .withColumn("rate_limit_msg_s",
        when(col("tier") === "premium", 1000)
          .when(col("tier") === "professional", 100)
          .otherwise(10))
      .select(col("client_id"), col("channel"), col("tier"), col("rate_limit_msg_s"))
  }

  /** T7/T8 query surface: per-(channel, tier) subscriber counts and the
    * summed delivery budget — the capacity plan a fan-out sink (Kafka
    * topic per channel at scale) is provisioned from. */
  def t7Subscriptions(spark: SparkSession, dir: String): DataFrame =
    subscriptionTable(spark, dir)
      .groupBy(col("channel"), col("tier"))
      .agg(count(lit(1)).as("n_subscribers"),
        sum(col("rate_limit_msg_s")).as("budget_msg_s"))

  val t7SubscriptionsSql: String = {
    val arr = channelNames.map(c => s"'$c'").mkString("[", ", ", "]")
    s"""WITH subs AS (
       |  SELECT c_custkey AS client_id, ch.i - 1 AS channel_idx, ch.channel,
       |         CASE WHEN c_mktsegment IN ('AUTOMOBILE', 'MACHINERY') THEN 'premium'
       |              WHEN c_mktsegment IN ('BUILDING', 'FURNITURE') THEN 'professional'
       |              ELSE 'retail' END AS tier
       |  FROM customer,
       |       (SELECT i, ($arr)[i] AS channel
       |        FROM unnest(generate_series(1, 8)) AS t(i)) ch
       |  WHERE (c_custkey + ch.i - 1) % 3 = 0),
       |rated AS (
       |  SELECT *, CASE tier WHEN 'premium' THEN 1000
       |                      WHEN 'professional' THEN 100 ELSE 10 END AS rate_limit_msg_s
       |  FROM subs)
       |SELECT channel, tier, count(*) AS n_subscribers,
       |       CAST(sum(rate_limit_msg_s) AS BIGINT) AS budget_msg_s
       |FROM rated GROUP BY 1, 2""".stripMargin
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t7_subscriptions" -> (t7Subscriptions _))

  def oracles: Map[String, String] = Map(
    "t7_subscriptions" -> t7SubscriptionsSql)
}
