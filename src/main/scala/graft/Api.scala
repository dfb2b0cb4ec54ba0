package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The switch map: every data-facing endpoint/service of the reference
  * app, by name, delegating to the engine operator that carries its
  * semantics. A reference user migrates by replacing HTTP calls with
  * these entry points (the WebSocket channels live in
  * [[graft.streaming.Channels]]; per-client fan-out in
  * [[graft.streaming.Subscriptions]]).
  *
  * Each method cites the endpoint it replaces. Response-shaping concerns
  * (Pydantic envelopes, HTTP status, HTML test pages) are intentionally
  * out of engine scope.
  */
object Api {

  // ------------------------------------------------------ api/routers.py
  /** GET /quote/latest (`routers.py:103-160`). */
  def getLatestQuote(spark: SparkSession, dir: String): DataFrame =
    operators.Scans.s2LatestQuote(spark, dir)

  /** GET /quotes — historical range + granularity + pagination
    * (`routers.py:162-314`). */
  def getHistoricalQuotes(spark: SparkSession, dir: String): DataFrame =
    operators.Scans.s10RangeScan(spark, dir)

  /** GET /quotes/basic — latest-N lightweight rows (`routers.py:316-360`). */
  def getBasicQuotes(spark: SparkSession, dir: String): DataFrame =
    operators.Scans.s12LatestN(spark, dir)

  // ------------------------------------------------- api/premium_data.py
  /** GET /premium/tick-data (`premium_data.py:130-180`). */
  def getTickData(spark: SparkSession, dir: String): DataFrame =
    operators.Sources.s7TickSynthesis(spark, dir)

  /** GET /premium/order-book (`premium_data.py:182-234`). */
  def getOrderBook(spark: SparkSession, dir: String): DataFrame =
    operators.Sources.s8OrderBook(spark, dir)

  /** GET /premium/microstructure (`premium_data.py:236-267`). */
  def getMarketMicrostructure(spark: SparkSession, dir: String): DataFrame =
    operators.Aggregations.a12Microstructure(spark, dir)

  // -------------------------------------------------- api/persistence.py
  /** POST /persistence/save — upsert semantics (`persistence.py:91-198`). */
  def saveData(spark: SparkSession, dir: String): DataFrame =
    sources.Sinks.upsertMerged(spark, dir)

  /** POST /persistence/query — filtered read-back with resampling
    * (`persistence.py:200-301`). */
  def queryData(spark: SparkSession, dir: String): DataFrame =
    operators.Relational.a4Resample(spark, dir)

  /** GET /persistence/stats (`persistence.py:303-344`). */
  def getDataStats(spark: SparkSession, dir: String): DataFrame =
    operators.Aggregations.a1Stats(spark, dir)

  /** DELETE /persistence/cleanup (`persistence.py:346-378`). */
  def cleanupOldData(spark: SparkSession, dir: String): DataFrame =
    sources.Sinks.retentionFilter(spark, dir)

  /** GET /persistence/analyze — per-symbol quality report
    * (`persistence.py:405-…`). */
  def analyzeSymbolData(spark: SparkSession, dir: String): DataFrame =
    operators.QualityOps.qcScore(spark, dir)

  // -------------------------------------------- api/advanced_features.py
  /** POST /advanced/feature-engineering — the full indicator pipeline
    * (`advanced_features.py:96-143`). */
  def featureEngineering(spark: SparkSession, dir: String): DataFrame =
    operators.Pipeline.pipelineFull(spark, dir)

  /** POST /advanced/backtesting (`advanced_features.py:145-222`). */
  def backtesting(spark: SparkSession, dir: String): DataFrame =
    analysis.Stateful.backtestMetrics(spark, dir)

  /** POST /advanced/feature-importance (`advanced_features.py:224-306`). */
  def featureImportance(spark: SparkSession, dir: String): DataFrame =
    analysis.Importance.consensusImportance(spark, dir)

  /** POST /advanced/pattern-detection (`advanced_features.py:308-372`). */
  def patternDetection(spark: SparkSession, dir: String): DataFrame =
    operators.WindowsAdvanced.w32CandlePatterns(spark, dir)

  /** All endpoints as a smoke-checkable map (name → entry point). */
  def endpoints: Map[String, (SparkSession, String) => DataFrame] = Map(
    "GET /quote/latest"                  -> (getLatestQuote _),
    "GET /quotes"                        -> (getHistoricalQuotes _),
    "GET /quotes/basic"                  -> (getBasicQuotes _),
    "GET /premium/tick-data"             -> (getTickData _),
    "GET /premium/order-book"            -> (getOrderBook _),
    "GET /premium/microstructure"        -> (getMarketMicrostructure _),
    "POST /persistence/save"             -> (saveData _),
    "POST /persistence/query"            -> (queryData _),
    "GET /persistence/stats"             -> (getDataStats _),
    "DELETE /persistence/cleanup"        -> (cleanupOldData _),
    "GET /persistence/analyze"           -> (analyzeSymbolData _),
    "POST /advanced/feature-engineering" -> (featureEngineering _),
    "POST /advanced/backtesting"         -> (backtesting _),
    "POST /advanced/feature-importance"  -> (featureImportance _),
    "POST /advanced/pattern-detection"   -> (patternDetection _))
}
