package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan assertions — the 100 TB concerns from the build brief:
  * filters/projections reach the parquet scan, dimension joins
  * broadcast, aggregations combine map-side, the whole indicator suite
  * shares ONE exchange, and hot paths stay inside whole-stage codegen.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("range scan pushes predicates and prunes columns at the parquet scan") {
    val p = plan(operators.Scans.s10RangeScan(spark, sfDir))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("IsNotNull(event_type)") || p.contains("EqualTo(event_type"), p)
    // projection pruning: props/user-agnostic columns must not be read
    assert(!p.contains("props"), "props column should be pruned from ReadSchema")
  }

  test("enrichment join broadcasts dimensions; fact join is the only big exchange") {
    val p = plan(operators.Joins.j1Enrich(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("q1 aggregation is partial+final hash agg inside whole-stage codegen") {
    val df = operators.Relational.q1Agg(spark, sfDir)
    val p = plan(df)
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_sum"), "map-side combine missing: " + p)
    // AQE hides codegen spans until the plan is finalized — execute THIS
    // DataFrame (count() would build a different QueryExecution), then
    // inspect its executed plan for whole-stage markers (*(n) ...)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("*("), executed.take(600))
  }

  test("the multi-indicator window query adds exactly ONE exchange over the candle frame") {
    // a cache another suite materialized would substitute InMemoryRelation
    // (whose printed child plan inflates the exchange count) — plan fresh
    spark.catalog.clearCache()
    // r15: candles are memoized (the reference materializes OHLCV once;
    // ~100 queries consume it), so the consumer plan reads the
    // checkpointed frame and adds ONLY the single window exchange on
    // user_id SHARED by every indicator's window spec (diff,
    // pct_change, sma 5/10/20 — five specs, one shuffle+sort)
    val p = plan(operators.Windows.w2w3SmaReturns(spark, sfDir))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 exchange (one shared window), got $exchanges:\n$p")
    val sorts = "\\(\\d+\\) Sort".r.findAllIn(p).size
    assert(sorts == 1, s"expected 1 shared window sort, got $sorts:\n$p")
    // and the memoized frame's BUILD keeps the one-shuffle candle agg
    // with map-side combine (the at-scale contract the old assertion
    // pinned in-plan)
    val b = plan(Tables.candlesUncached(spark, sfDir))
    assert("\\(\\d+\\) Exchange".r.findAllIn(b).size == 1, b)
    assert(b.contains("partial_"), "candle agg lost its map-side combine:\n" + b)
  }

  test("the 4-stage pipeline fuses into one plan: shuffles only for candle agg + shared windows, fit broadcast") {
    spark.catalog.clearCache() // see above: plan without cache substitution
    val p = plan(operators.Pipeline.pipelineFull(spark, sfDir))
    // the reference materializes lists between its 4 stages; here every
    // stage is the same lazy plan — only the candle aggregate and the
    // (shared) window partitioning shuffle, the normalization fit comes
    // back as a broadcast
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges <= 3, s"expected <=3 exchanges, got $exchanges:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("normalization fit+apply broadcasts the one-row stats result") {
    val p = plan(operators.Aggregations.a7Normalize(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("custom ewm_avg window aggregate stays in the window exec, no UDF node") {
    val p = plan(operators.EmaFamily.w4Ema(spark, sfDir))
    assert(p.contains("ewm_avg") || p.contains("ewmavg"), p)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }

  test("ANN brute force broadcasts the query side, corpus never shuffles") {
    val p = plan(scale.Similarity.annBruteForce(spark, sfDir))
    assert(p.contains("BroadcastExchange"), p)
  }

  test("exact embedding near-dup is a distributed block-pair cogroup: no driver data, no cartesian") {
    val p = plan(scale.Dedup.embeddingNearDup(spark, sfDir))
    assert(p.contains("CoGroup"), "expected the block-pair cogroup kernel:\n" + p)
    assert(p.contains("Exchange"), "expected a shuffled block join:\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // driver-collected data would re-enter the plan as a LocalTableScan
    assert(!p.contains("LocalTableScan"), p)
  }

  test("LSH embedding near-dup joins on band buckets, never the cross product") {
    val p = plan(scale.Dedup.embeddingLshPairs(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("semantic dedup pairs join on the centroid list key, never the cross product") {
    val p = plan(scale.Dedup.dedupSemantic(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("centroid_id"), "in-list pair join must key on the centroid:\n" + p)
    // the only nested-loop is the broadcast of the 16 centroids during assignment
    assert(p.contains("graft_dot") || p.contains("DotProduct"),
      "in-list cosine must run through the codegen'd dot:\n" + p)
  }

  test("paragraph dedup is one chunk-hash window plus one per-doc reassembly aggregate") {
    val p = plan(scale.Dedup.dedupParagraphs(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Window"), "keep-first needs the per-chunk window:\n" + p)
    // two key shuffles (chunk, then doc_id) — a join-based keep-first
    // would add a third ("Exchange (" counts tree nodes once; the
    // formatted details repeat the bare word)
    val exchanges = p.sliding("Exchange (".length).count(_ == "Exchange (")
    assert(exchanges <= 2, s"expected 2 exchanges (chunk window, doc agg), got $exchanges:\n" + p)
  }

  test("PQ search: lookup table broadcasts, corpus codes never cartesian") {
    val p = plan(scale.Similarity.annPqSearch(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), "ADC lookup table must broadcast:\n" + p)
  }

  test("salted skew join: salt in the join keys, replication explode below the join, no broadcast of the fact") {
    val p = plan(operators.Joins.j5SkewSalted(spark, sfDir))
    assert(p.contains("SortMergeJoin"), "merge hint should force the shuffle-join shape:\n" + p)
    assert(p.contains("salt"), "salt must appear in the join keys:\n" + p)
    assert(p.contains("Generate") || p.contains("explode"), "replication explode missing:\n" + p)
  }

  test("train/val split is a pure map stage: no exchange anywhere in the plan") {
    val p = plan(scale.Sampling.splitTrainVal(spark, sfDir))
    assert(!p.contains("Exchange"), "split must not shuffle:\n" + p)
  }

  test("ngram jaccard is a per-(lang,source,length-bucket) grouped kernel, never a cross product") {
    val p = plan(scale.Dedup.ngramJaccardPairs(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("MapGroups"), "expected the per-block typed kernel:\n" + p)
    assert(p.contains("Exchange"), "expected the block-key shuffle:\n" + p)
  }

  test("top-k per group gets Spark's native WindowGroupLimit pushdown, partial + final") {
    // the reason the engine does NOT ship a custom top-k-per-group
    // operator: InferWindowGroupLimit already rewrites
    // filter(rank <= k) over row_number into a bounded per-partition
    // group limit below the shuffle AND above it — each task keeps k
    // rows per group instead of sorting the whole partition. Pinned so
    // a regression (e.g. a filter shape change breaking the pattern
    // match) is caught here, not at 100 TB.
    val p = plan(operators.Scans.o4TopKPerGroup(spark, sfDir))
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      "expected partial+final WindowGroupLimit:\n" + p)
  }

  test("symspell fuzzy join keys on delete strings: no cartesian, vocab-sized aggregate below") {
    val p = plan(scale.CorpusOps.vocabSymspell(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "expected an equi join on the delete key:\n" + p)
    assert(p.contains("HashAggregate"), "vocab df aggregate missing:\n" + p)
  }

  test("winsorize is fit-then-apply: the percentile row broadcasts, no whole-table window") {
    val p = plan(scale.CorpusOps.featWinsorize(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), "fit rows should broadcast:\n" + p)
    assert(!p.contains("Window"), "no window should appear in a fit-then-apply plan:\n" + p)
  }

  test("z-order manifest is one map stage + one hash aggregate, no join wider than the stats row") {
    val p = plan(sources.Sinks.layoutZorder(spark, sfDir))
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "z-value must be a map-side expression over the broadcast mins:\n" + p)
  }

  test("curriculum rank partitions by score bucket — no global single-partition window") {
    val df = scale.CorpusOps.curriculumOrder(spark, sfDir)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    // the window ranking DOCUMENTS must be partitioned (by bucket); only
    // the ≤20-row offsets window may be unpartitioned
    val docWindows = windows.filter(_.windowExpressions.exists(
      _.toString.contains("row_number")))
    assert(docWindows.forall(_.partitionSpec.nonEmpty),
      "per-doc row_number must be bucket-partitioned:\n" +
        docWindows.map(_.partitionSpec).mkString(", "))
  }

  test("dynamic partition pruning: a selective dim filter prunes fact partitions at runtime") {
    // the join key IS the partition column, so Catalyst turns the dim
    // filter into a runtime partition-pruning subquery — at 100 TB this
    // is the difference between scanning 3 date partitions and all of them
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = graft.util.Scratch.register(java.nio.file.Files.createTempDirectory("graft_dpp").toString) + "/events"
    sources.Sinks.writePartitioned(
      Tables.events(spark, sfDir).select(col("ts"), col("user_id"), col("value")), dir)
    val fact = spark.read.parquet(dir)
    // the dim must be a REAL scan with a selective filter (a folded
    // LocalRelation doesn't qualify as a pruning source)
    val dim = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("date"), col("event_type"))
      .filter(col("event_type") === "view")
    val p = plan(fact.join(dim, Seq("date")).groupBy(col("date")).count())
    assert(p.contains("dynamicpruning"), "expected a runtime partition-pruning subquery:\n" + p)
  }

  test("runtime bloom filter from a selective dim reaches the fact scan of a shuffle join") {
    // when neither side broadcasts, Spark can still build a bloom filter
    // from the filtered dim and apply it map-side on the fact — the
    // runtime-filtering story for fact⋈dim joins too big to broadcast
    import org.apache.spark.sql.functions._
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // the fixture is far below the 10 GiB production threshold
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val fact = Tables.events(spark, sfDir).select(col("user_id"), col("value"))
      val dim = Tables.events(spark, sfDir)
        .filter(col("event_type") === "view")
        .select(col("user_id"))
      val p = plan(fact.join(dim, "user_id").groupBy(col("user_id")).count())
      assert(p.toLowerCase.contains("might_contain"),
        "expected a bloom-filter probe on the fact side:\n" + p)
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("star join broadcasts the filtered dimensions; filters pushed to all three scans") {
    val p = plan(operators.Relational.q3StarJoin(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(p).size
    assert(pushed >= 3, s"expected pushed filters on all three scans:\n$p")
  }

  test("document chunking is pure map-side: zero exchanges anywhere in the plan") {
    val p = plan(scale.FeatureOps.chunkDocuments(spark, sfDir))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 0, s"chunking must not shuffle, got $exchanges:\n$p")
  }

  test("quality calibration broadcasts the per-source edges, never sorts the corpus") {
    val p = plan(scale.FeatureOps.qualityCalibrate(spark, sfDir))
    assert(p.contains("BroadcastExchange"), "edges should broadcast:\n" + p)
    // the scale property: no window (percent_rank-style) over the docs —
    // the only sort permitted is none at all
    assert(!p.contains(") Window"), "calibration must not window the corpus:\n" + p)
  }

  test("time-decay features are one partial+final hash aggregate over the scan") {
    val p = plan(scale.FeatureOps.featTimeDecay(spark, sfDir))
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected the single user_id shuffle, got $exchanges:\n$p")
    assert(p.contains("partial_"), "map-side combine missing:\n" + p)
  }

  test("KS drift windows are partitioned by event_type — no global window") {
    val p = plan(scale.FeatureOps.driftKs(spark, sfDir))
    val windows = "\\(\\d+\\) Window".r.findAllIn(p).size
    assert(windows >= 1, p)
    assert(p.contains("partitionspec=[event_type") ||
      p.toLowerCase.contains("event_type"), p)
  }

  test("ER candidate generation equi-joins on block keys, never the cross product") {
    // the registered query serves a memoized localCheckpoint; the shape
    // under test is the build-time plan
    val p = plan(scale.EntityResolution.erCandidatesImpl(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "blocking must carry the join as equi-keys:\n" + p)
    // the inequality evidence (key order, length band) rides the join
    // condition; the block keys are the equi-side
    assert(p.toLowerCase.contains("noun"), "block key missing from the join:\n" + p)
  }

  test("K3 round-trip read prunes date partitions at the scan") {
    val p = plan(sources.Sinks.k3IndicatorRoundtrip(spark, sfDir))
    assert(p.contains("PartitionFilters") &&
      (p.contains("date#") || p.contains("date >=") || p.toLowerCase.contains("partitionfilters: [isnotnull(date")),
      "read-back must prune on the date partition column:\n" + p)
  }

  test("bigram LM rows are a pure map stage: no window, no sort below the first aggregate") {
    // adjacent pairs come from zipping the token array with its own
    // tail — the posexplode+lead form paid a doc_id shuffle AND a
    // per-doc sort before any aggregate ran
    val p = plan(scale.TextAnalysis.bigramNll(spark, sfDir))
    assert(!p.contains(") Window"), "no window in the pair build:\n" + p)
    assert(!p.contains(") Sort"), "no sort in the pair build:\n" + p)
  }

  test("T8 fan-out broadcasts the connected-client set; rate-limit window is per client-channel-day") {
    val p = plan(streaming.Subscriptions.t8ClientFanout(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      "subscriptions must broadcast against the event stream:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.toLowerCase.contains("client_id"),
      "rate-limit window must partition by client:\n" + p)
  }
}
