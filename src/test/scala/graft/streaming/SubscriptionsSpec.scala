package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** T8 per-client delivery adjudication (`t8_client_fanout`) — the gate
  * arithmetic the reference applies per send
  * (`websocket_manager.py:790-800`): auth → filter → rate limit, plus
  * the high-confidence callback hook. sf0.001 keeps the fan-out tiny;
  * the driver oracle pins exact values at sf0.01. */
class SubscriptionsSpec extends SparkSpec {

  private lazy val fanout =
    Subscriptions.t8ClientFanout(spark, sfDir).cache()

  test("gate counts partition the candidates exactly") {
    val bad = fanout.filter(
      col("n_candidates") =!=
        col("n_denied_auth") + col("n_filtered") +
        col("n_rate_limited") + col("n_delivered")).count()
    assert(bad === 0)
  }

  test("callbacks only fire on delivered messages") {
    assert(fanout.filter(col("n_callbacks") > col("n_delivered")).count() === 0)
  }

  test("every channel x tier cell adjudicates; retail saturates its daily budget") {
    val rows = fanout.collect()
    assert(rows.map(_.getString(0)).distinct.sorted ===
      Subscriptions.channelNames.sorted.toArray)
    // retail budget is 10/day vs ~4 msgs/channel/day at sf0.001 after
    // the confidence filter — no drops here, but the premium tier must
    // never drop at ANY scale (1000/day >> any test cadence)
    val premiumDropped = fanout
      .filter(col("tier") === "premium" && col("n_rate_limited") > 0).count()
    assert(premiumDropped === 0)
  }

  test("auth denials match the revoked-token share of connected clients") {
    // revoked clients (client_id % 17 == 0, client_id <= 60) see every
    // candidate denied: per-channel denial count must equal the number
    // of candidate messages offered to revoked subscribers
    val subs = Subscriptions.subscriptionTable(spark, sfDir)
      .filter(col("client_id") <= 60)
    val revoked = subs.filter(col("client_id") % 17 === 0).count()
    val denials = fanout.agg(sum(col("n_denied_auth"))).head().getLong(0)
    if (revoked == 0) assert(denials === 0) else assert(denials > 0)
  }
}
