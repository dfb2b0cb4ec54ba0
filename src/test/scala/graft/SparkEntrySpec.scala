package graft

/** Driver-contract invariants: the merged query registry must not shadow
  * keys, every oracle must have a query, and the flagship must smoke. */
class SparkEntrySpec extends SparkSpec {

  private val modules: Seq[(String, Map[String, _])] = Seq(
    "Relational"      -> operators.Relational.queries,
    "Scans"           -> operators.Scans.queries,
    "Joins"           -> operators.Joins.queries,
    "Aggregations"    -> operators.Aggregations.queries,
    "Windows"         -> operators.Windows.queries,
    "IndicatorPack2"  -> operators.IndicatorPack2.queries,
    "IndicatorPack3"  -> operators.IndicatorPack3.queries,
    "WindowsAdvanced" -> operators.WindowsAdvanced.queries,
    "Segmented"       -> operators.Segmented.queries,
    "EmaFamily"       -> operators.EmaFamily.queries,
    "QualityOps"      -> operators.QualityOps.queries,
    "Pipeline"        -> operators.Pipeline.queries,
    "Sessions"        -> operators.Sessions.queries,
    "Stateful"        -> analysis.Stateful.queries,
    "ZigzagRenko"     -> analysis.ZigzagRenko.queries,
    "Dedup"           -> scale.Dedup.queries,
    "Similarity"      -> scale.Similarity.queries,
    "TextAnalysis"    -> scale.TextAnalysis.queries,
    "Multimodal"      -> scale.Multimodal.queries,
    "Sketches"        -> scale.Sketches.queries,
    "Sampling"        -> scale.Sampling.queries,
    "Profile"         -> scale.Profile.queries,
    "Ranking"         -> scale.Ranking.queries,
    "Curation"        -> scale.Curation.queries,
    "CorpusOps"       -> scale.CorpusOps.queries,
    "FeatureOps"      -> scale.FeatureOps.queries,
    "GraphOps"        -> scale.GraphOps.queries,
    "EntityResolution" -> scale.EntityResolution.queries,
    "Sources"         -> operators.Sources.queries,
    "Sinks"           -> sources.Sinks.queries,
    "Subscriptions"   -> streaming.Subscriptions.queries,
    "Importance"      -> analysis.Importance.queries)

  test("no query key is registered by two modules (merge would shadow one)") {
    val all = modules.flatMap { case (m, qs) => qs.keys.map(_ -> m) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"duplicate keys: ${dups.map { case (k, ms) => s"$k in ${ms.map(_._2)}" }}")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle key has a query; oracles are non-empty SQL") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty && sql.toUpperCase.contains("SELECT"), k)
    }
  }

  test("every query carries an oracle: the driver gate covers the full registry") {
    // the correctness gate is only as strong as its coverage — a query
    // registered without oracle SQL silently downgrades to a rows-only
    // check; as of round 5 the registry is 100% oracled and this pins it
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"queries without oracles: $unoracled")
  }

  test("benchImpls only overrides registered queries") {
    val orphans = SparkEntry.benchImpls.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"benchImpls without queries: $orphans")
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
