package graft.scale

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-engineering operators a large-scale training/feature
  * pipeline runs beyond the reference's indicator suite: exponential
  * time-decay aggregates (feature-store recency features), two-sample
  * KS drift detection (the distribution-shift companion to the PSI
  * drift in [[graft.analysis.Importance]]), context-window document
  * chunking with overlap (the RAG/pretraining split of long documents),
  * the training-shard manifest (balanced output sharding), and
  * per-source quality-score calibration (quantile mapping so scores
  * from different sources are comparable before mixing).
  *
  * Scale shapes: decay and the shard manifest are single hash
  * aggregates; chunking is a map-side explode (no shuffle at all); KS
  * runs its cumulative window over per-(type, bin) DISTINCT bins, a
  * bounded domain by construction; calibration is fit-small /
  * broadcast-apply — the same two-phase shape as
  * [[graft.normalize.Normalizer]], never a per-source global sort. */
object FeatureOps {

  // epoch micros for the fixed scoring anchor / drift split — raw
  // instant arithmetic (unix_micros vs DuckDB epoch_us) keeps every
  // comparison independent of the session timezone on both engines
  private val anchorUs = 1706745600000000L // 2024-02-01T00:00:00Z
  private val splitUs  = 1705363200000000L // 2024-01-16T00:00:00Z

  // ---------------------------------------------------------------- decay
  /** Exponential TIME-DECAY aggregates per user — the feature-store
    * staple (`sum(value · 2^(−Δt/half_life))` with a 7-day half-life,
    * scored as of a fixed anchor): recent activity dominates, stale
    * activity fades smoothly, and unlike a hard trailing window the
    * feature never cliffs when an event ages past a boundary.
    *
    * ONE hash aggregate over events — the weights are per-row scalar
    * math, partial-aggregated map-side; at 100 TB this is a scan plus
    * a shuffle of one row per user. The anchor is an explicit argument
    * of the semantics (training-serving skew: score time, not wall
    * time — `Date.now()`-style anchors make features irreproducible). */
  def featTimeDecay(spark: SparkSession, dir: String): DataFrame = {
    val days = (lit(anchorUs) - unix_micros(col("ts"))) / lit(86400e6)
    val w = exp(days * (-math.log(2.0) / 7.0))
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(w), 6).as("decayed_count"),
        round(sum(w * col("value")), 6).as("decayed_sum"),
        round(min(days), 6).as("recency_days"))
  }

  val featTimeDecaySql: String =
    """WITH e AS (
      |  SELECT user_id, value,
      |         (1706745600000000 - epoch_us(ts)) / 86400e6 AS days
      |  FROM events)
      |SELECT user_id, count(*) AS n_events,
      |  round(sum(exp(days * (-ln(2) / 7.0))), 6) + 0 AS decayed_count,
      |  round(sum(exp(days * (-ln(2) / 7.0)) * value), 6) + 0 AS decayed_sum,
      |  round(min(days), 6) + 0 AS recency_days
      |FROM e GROUP BY user_id""".stripMargin

  // ---------------------------------------------------------------- ks drift
  /** Two-sample KOLMOGOROV–SMIRNOV drift per event_type: the first half
    * of the time range (before the split instant) is the reference
    * window, the second the current one; KS = max |F_ref − F_cur| over
    * the pooled value domain, compared against the 95% critical value
    * 1.358·√((n₁+n₂)/(n₁·n₂)). Catches shape changes (variance,
    * bimodality) that the binned-PSI drift (`drift_psi`) can smooth
    * over; together they are the standard drift pair.
    *
    * Scale shape: values are binned to 2 decimals FIRST (the sketch
    * step — a continuous column at 100 TB has unbounded distinct
    * values; 2-decimal bins make the domain bounded by construction,
    * and the discrete KS over bins is exactly the statistic on the
    * binned distribution). The aggregate shrinks events → (type, bin)
    * counts, the cumulative window runs per type over that bounded bin
    * set, and the final per-type reduce emits 5 rows. */
  def driftKs(spark: SparkSession, dir: String): DataFrame = {
    val isRef = unix_micros(col("ts")) < lit(splitUs)
    val binned = Tables.events(spark, dir)
      .groupBy(col("event_type"), round(col("value"), 2).as("bin"))
      .agg(
        sum(when(isRef, 1L).otherwise(0L)).as("c_ref"),
        sum(when(isRef, 0L).otherwise(1L)).as("c_cur"))
    val byType = Window.partitionBy(col("event_type"))
    val cum = byType.orderBy(col("bin"))
    val scored = binned.select(
      col("event_type"),
      sum(col("c_ref")).over(cum).as("cum_ref"),
      sum(col("c_cur")).over(cum).as("cum_cur"),
      sum(col("c_ref")).over(byType).as("n_ref"),
      sum(col("c_cur")).over(byType).as("n_cur"))
    scored
      .groupBy(col("event_type"))
      .agg(
        max(col("n_ref")).as("n_ref"),
        max(col("n_cur")).as("n_cur"),
        round(max(abs(
          col("cum_ref").cast("double") / col("n_ref") -
            col("cum_cur").cast("double") / col("n_cur"))), 6).as("ks_stat"))
      .withColumn("ks_crit",
        round(lit(1.358) * sqrt((col("n_ref") + col("n_cur")).cast("double") /
          (col("n_ref") * col("n_cur"))), 6))
      .withColumn("drifted", col("ks_stat") > col("ks_crit"))
  }

  val driftKsSql: String =
    """WITH b AS (
      |  SELECT event_type, round(value, 2) AS bin,
      |         sum(CASE WHEN epoch_us(ts) < 1705363200000000 THEN 1 ELSE 0 END) AS c_ref,
      |         sum(CASE WHEN epoch_us(ts) < 1705363200000000 THEN 0 ELSE 1 END) AS c_cur
      |  FROM events GROUP BY 1, 2),
      |c AS (
      |  SELECT event_type,
      |         sum(c_ref) OVER (PARTITION BY event_type ORDER BY bin) AS cum_ref,
      |         sum(c_cur) OVER (PARTITION BY event_type ORDER BY bin) AS cum_cur,
      |         sum(c_ref) OVER (PARTITION BY event_type) AS n_ref,
      |         sum(c_cur) OVER (PARTITION BY event_type) AS n_cur
      |  FROM b),
      |k AS (
      |  SELECT event_type, CAST(max(n_ref) AS BIGINT) AS n_ref,
      |         CAST(max(n_cur) AS BIGINT) AS n_cur,
      |         round(max(abs(cum_ref * 1.0 / n_ref - cum_cur * 1.0 / n_cur)), 6) + 0 AS ks_stat
      |  FROM c GROUP BY event_type)
      |SELECT event_type, n_ref, n_cur, ks_stat,
      |  round(1.358 * sqrt((n_ref + n_cur) * 1.0 / (n_ref * n_cur)), 6) + 0 AS ks_crit,
      |  ks_stat > round(1.358 * sqrt((n_ref + n_cur) * 1.0 / (n_ref * n_cur)), 6) + 0 AS drifted
      |FROM k""".stripMargin

  // ---------------------------------------------------------------- chunking
  /** Context-window CHUNKING with overlap — the split every RAG index
    * and long-document pretraining pipeline applies before embedding /
    * packing: fixed windows of 40 tokens at stride 30 (10-token
    * overlap so no boundary loses context), last window clamped to the
    * document end, one output row per chunk keyed (doc_id, chunk_idx)
    * with the chunk digest for downstream exact-dedup of chunks.
    *
    * Pure map-side: tokenize → sequence → explode → slice; NO shuffle
    * anywhere — at 100 TB chunking is embarrassingly parallel and this
    * plan keeps it that way (the explode multiplies rows ~n_tokens/30×,
    * which the parquet writer downstream re-blocks; nothing here needs
    * co-location). Shares [[Dedup.tokens]] so chunk tokens, shingle
    * tokens, and quality tokens are ONE definition. */
  def chunkDocuments(spark: SparkSession, dir: String): DataFrame = {
    val chunk = 40
    val stride = 30
    Tables.documents(spark, dir)
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .filter(col("n_tokens") > 0)
      .withColumn("n_chunks",
        (ceil(greatest(col("n_tokens") - chunk, lit(0)) / lit(stride.toDouble)) + 1)
          .cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("start_tok", col("chunk_idx") * stride)
      .withColumn("chunk_toks",
        slice(col("toks"), (col("start_tok") + 1).cast("int"), lit(chunk)))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        col("n_tokens"),
        size(col("chunk_toks")).as("n_chunk_tokens"),
        md5(array_join(col("chunk_toks"), " ").cast("binary")).as("chunk_digest"))
  }

  /** The same chunking through the custom Catalyst GENERATOR
    * ([[graft.functions.ChunkTokens]] — the UDTF tier): one Generate
    * node slices while it emits instead of exploding an index sequence
    * and slicing afterwards, so each generated row carries O(chunk)
    * data, not the O(doc) token array the composed form drags through
    * its explode. Same zero-shuffle plan, same rows — it shares
    * [[chunkDocumentsSql]] as its oracle, which is the equivalence
    * proof. */
  def chunkDocumentsGen(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"),
        call_function("graft_chunk_tokens", col("toks"), lit(40), lit(30))
          .as(Seq("chunk_idx", "start_tok", "chunk_toks")))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        col("n_tokens"),
        size(col("chunk_toks")).as("n_chunk_tokens"),
        md5(array_join(col("chunk_toks"), " ").cast("binary")).as("chunk_digest"))
  }

  val chunkDocumentsSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, ${Dedup.tokensSql} AS ts FROM documents),
       |n AS (
       |  SELECT doc_id, ts, len(ts) AS n_tokens,
       |         CAST(ceil(greatest(len(ts) - 40, 0) / 30.0) AS BIGINT) + 1 AS nc
       |  FROM t WHERE len(ts) > 0),
       |c AS (
       |  SELECT doc_id, n_tokens, ts,
       |         unnest(generate_series(0, nc - 1)) AS chunk_idx
       |  FROM n)
       |SELECT doc_id, chunk_idx, chunk_idx * 30 AS start_tok, n_tokens,
       |  len(array_slice(ts, chunk_idx * 30 + 1, chunk_idx * 30 + 40)) AS n_chunk_tokens,
       |  md5(array_to_string(array_slice(ts, chunk_idx * 30 + 1, chunk_idx * 30 + 40), ' '))
       |    AS chunk_digest
       |FROM c""".stripMargin

  // ---------------------------------------------------------------- shards
  /** Training-SHARD manifest — the census of the final write: each doc
    * is assigned a shard by a Knuth multiplicative hash of its id (the
    * portable stand-in for the murmur3 the writer would use; engine
    * hash functions aren't cross-engine comparable), and the manifest
    * reports per-shard doc/token/byte totals plus each shard's byte
    * skew vs the mean shard. A skew near 1.0 for every shard is the
    * property that makes downstream training readers stragglers-free;
    * the manifest is how the writer PROVES it before anyone trains.
    *
    * One hash aggregate (events → 16 rows) + a 16-row window for the
    * mean — the census costs a scan regardless of corpus size. */
  def shardManifest(spark: SparkSession, dir: String): DataFrame = {
    val shard = pmod((col("doc_id") * lit(2654435761L)) % lit(4294967296L), lit(16L))
    val g = Tables.documents(spark, dir)
      .groupBy(shard.as("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(Dedup.tokens(col("text"))).cast("long")).as("n_tokens"),
        sum(octet_length(col("text")).cast("long")).as("n_bytes"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
    // fit-then-fold: one-row mean crossJoined back instead of a
    // single-partition window over the 16-row manifest
    val avgB = g.agg(avg(col("n_bytes")).as("avg_bytes"))
    g.crossJoin(broadcast(avgB))
      .withColumn("bytes_skew", round(col("n_bytes") / col("avg_bytes"), 6))
      .drop("avg_bytes")
  }

  val shardManifestSql: String =
    s"""WITH s AS (
       |  SELECT (doc_id * 2654435761) % 4294967296 % 16 AS shard_id,
       |         len(${Dedup.tokensSql}) AS n_toks,
       |         octet_length(text::BLOB) AS n_bytes, doc_id
       |  FROM documents),
       |g AS (
       |  SELECT shard_id, count(*) AS n_docs,
       |         CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       |         CAST(sum(n_bytes) AS BIGINT) AS n_bytes, min(doc_id) AS min_doc_id,
       |         max(doc_id) AS max_doc_id
       |  FROM s GROUP BY shard_id)
       |SELECT shard_id, n_docs, n_tokens, n_bytes, min_doc_id, max_doc_id,
       |  round(n_bytes / avg(n_bytes) OVER (), 6) + 0 AS bytes_skew
       |FROM g""".stripMargin

  // ---------------------------------------------------------------- calibrate
  /** Per-source quality-score CALIBRATION — quantile mapping: each
    * source's raw composite score ([[TextAnalysis.qualityScoreCol]]) is
    * replaced by its position among 19 fitted per-source vigintile
    * edges, so "top 10% of src3" and "top 10% of src7" mean the same
    * thing before [[Sampling]] mixes sources. Absolute scores are NOT
    * comparable across sources (boilerplate-heavy sources score
    * uniformly lower); mixing on raw scores silently under-samples
    * them — the classic quality-filter bias.
    *
    * Fit-small / broadcast-apply: the fit is one aggregate emitting 19
    * doubles per source (exact `percentile` here; the 100 TB swap is
    * `approx_percentile`, same plan shape), the apply a broadcast join
    * + a 19-element array scan per row. No per-source global sort — a
    * `percent_rank` over a 30 TB source would be a single-task window;
    * this shape never sorts the corpus at all. Edges and scores are
    * compared at 6-decimal precision so the engine-boundary membership
    * test is deterministic. */
  def qualityCalibrate(spark: SparkSession, dir: String): DataFrame = {
    val ps = (1 to 19).map(_ / 20.0)
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        TextAnalysis.qualityScoreCol.as("score"))
    val edges = scored.groupBy(col("source"))
      .agg(expr(s"percentile(score, array(${ps.mkString(",")}))").as("edges"))
    scored.join(broadcast(edges), "source")
      .select(col("doc_id"), col("source"),
        round(col("score"), 6).as("raw_score"),
        (size(filter(col("edges"),
          e => round(e, 6) <= round(col("score"), 6))) / lit(20.0))
          .as("calibrated_score"))
  }

  val qualityCalibrateSql: String = {
    val ps = (1 to 19).map(_ / 20.0)
    s"""WITH ${TextAnalysis.qualityCtes},
       |sc AS (
       |  SELECT q.doc_id, d.source, q.score
       |  FROM qs q JOIN documents d USING (doc_id)),
       |ed AS (
       |  SELECT source, quantile_cont(score, [${ps.mkString(",")}]) AS edges
       |  FROM sc GROUP BY source)
       |SELECT sc.doc_id, sc.source, round(sc.score, 6) + 0 AS raw_score,
       |  len(list_filter(ed.edges, e -> round(e, 6) <= round(sc.score, 6))) / 20.0
       |    AS calibrated_score
       |FROM sc JOIN ed USING (source)""".stripMargin
  }

  // ---------------------------------------------------------------- bootstrap
  /** POISSON BOOTSTRAP confidence intervals for the per-type mean —
    * the single-pass bootstrap that works at 100 TB: classical
    * resampling needs the whole dataset in hand per replicate, while
    * Poisson(1) weights approximate multinomial resampling row-locally
    * (Chamandy et al., "Estimating Uncertainty for Massive Data
    * Streams"), so all 32 replicates ride ONE scan (explode ×32 →
    * aggregate). The replicate weights come from a PORTABLE hash PRN
    * (md5 of event_id·1000003+rep, first 8 hex digits → uniform in
    * [0,1), inverse-CDF to Poisson counts 0..4) — both engines derive
    * bit-identical weights, which is what makes a resampling procedure
    * hash-oracle-able at all: seeded engine RNGs never match across
    * engines, content-hash RNGs always do. CI = exact 2.5%/97.5%
    * interpolated percentiles over the 32 replicate means. */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val reps = 32
    // inverse Poisson(1) CDF thresholds as exact decimal literals so
    // both engines compare against identical doubles
    val u = conv(substring(md5(concat(
        (col("event_id") * 1000003 + col("rep")).cast("string")).cast("binary")),
      1, 8), 16, 10).cast("double") / lit(4294967296.0)
    val w = when(u < 0.367879441, 0)
      .when(u < 0.735758882, 1)
      .when(u < 0.919698602, 2)
      .when(u < 0.981011843, 3)
      .otherwise(4)
    // r15: a small-file scan is ONE partition, so the ×32 explode +
    // 3.2M md5 PRN draws + the partial aggregate all ran in one task
    // (guide §2.5 input skew). Spread the heavy map work ONLY when the
    // scan under-parallelizes the cluster (hash on event_id — a
    // deterministic key, never round-robin-on-rand); a 100 TB scan is
    // already thousands of tasks and must not pay a fact-table shuffle.
    // The partition count is EXPLICIT: a bare repartition(col) leaves
    // AQE free to coalesce the 2 MB shuffle back to one task by BYTES
    // (measured: the md5 stage stayed 1t/2.4s) — per-row CPU here is
    // ~1000× the per-row bytes, which AQE cannot see.
    // r16: the gate + width policy moved to the shared bytes-aware
    // helper (graft.util.Spread) — same gate, width now follows the
    // input size estimate instead of pinning to the local core count
    val evSpread = graft.util.Spread.ifNarrow(
      Tables.events(spark, dir), col("event_id"))
    val replicated = evSpread
      .select(col("event_type"), col("event_id"), col("value"),
        explode(sequence(lit(0), lit(reps - 1))).as("rep"))
      .select(col("event_type"), col("rep"), col("value"), w.as("w"))
    val repMeans = replicated
      .groupBy(col("event_type"), col("rep"))
      .agg((sum(col("w") * col("value")) /
        nullif(sum(col("w")), lit(0))).as("m"))
    val base = Tables.events(spark, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("mean_value"))
    repMeans.groupBy(col("event_type"))
      .agg(
        round(expr("percentile(m, 0.025)"), 6).as("ci_lo"),
        round(expr("percentile(m, 0.975)"), 6).as("ci_hi"))
      .join(base, "event_type")
      .select(col("event_type"), col("n"), col("mean_value"),
        col("ci_lo"), col("ci_hi"))
  }

  val bootstrapCiSql: String =
    """WITH r AS (
      |  SELECT event_type, value, g.rep,
      |         ('0x' || substr(md5(CAST(event_id * 1000003 + g.rep AS VARCHAR)), 1, 8))::BIGINT
      |           / 4294967296.0 AS u
      |  FROM events, (SELECT unnest(generate_series(0, 31)) AS rep) g),
      |w AS (
      |  SELECT event_type, rep, value,
      |         CASE WHEN u < 0.367879441 THEN 0
      |              WHEN u < 0.735758882 THEN 1
      |              WHEN u < 0.919698602 THEN 2
      |              WHEN u < 0.981011843 THEN 3
      |              ELSE 4 END AS w
      |  FROM r),
      |m AS (
      |  SELECT event_type, rep, sum(w * value) / nullif(sum(w), 0) AS m
      |  FROM w GROUP BY event_type, rep),
      |ci AS (
      |  SELECT event_type,
      |         round(quantile_cont(m, 0.025), 6) + 0 AS ci_lo,
      |         round(quantile_cont(m, 0.975), 6) + 0 AS ci_hi
      |  FROM m GROUP BY event_type),
      |b AS (
      |  SELECT event_type, count(*) AS n, round(avg(value), 6) + 0 AS mean_value
      |  FROM events GROUP BY event_type)
      |SELECT b.event_type, b.n, b.mean_value, ci.ci_lo, ci.ci_hi
      |FROM b JOIN ci USING (event_type)""".stripMargin

  // ---------------------------------------------------------------- anomaly
  /** SEASONAL-BASELINE anomaly detection — the ops-monitoring shape:
    * fit a per-(event_type, hour-of-day) mean/σ profile on the
    * reference window (before the split instant), then flag current-
    * window values outside μ ± 3σ. Hour-of-day captures the daily
    * seasonality a global threshold smears over (a value normal at
    * peak hours is anomalous at 3am). The fit is one aggregate over a
    * BOUNDED domain (types × 24 hours), the apply a broadcast join —
    * the same fit-small/apply-wide shape as the normalizer; at 100 TB
    * neither side shuffles the fact table twice. μ/σ are rounded to 6
    * decimals BEFORE the threshold compare so both engines test
    * identical doubles (raw σ differs in summation order). */
  /** The fitted per-(event_type, hour-of-day) μ/σ profile on the
    * reference window — shared by the batch query below and the
    * streaming scorer ([[graft.streaming.AnomalyStream]]), so offline
    * backfill and online alerting apply ONE definition of "anomalous". */
  def seasonalProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(unix_micros(col("ts")) < lit(splitUs))
      .groupBy(col("event_type"), hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n_ref"),
        round(avg(col("value")), 6).as("mu"),
        round(stddev_samp(col("value")), 6).as("sigma"))

  def anomalySeasonal(spark: SparkSession, dir: String): DataFrame = {
    val isRef = unix_micros(col("ts")) < lit(splitUs)
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), hour(col("ts")).as("hod"),
        col("value"), isRef.as("is_ref"))
    val fit = seasonalProfile(spark, dir)
    ev.filter(!col("is_ref"))
      .join(broadcast(fit), Seq("event_type", "hod"))
      .groupBy(col("event_type"), col("hod"))
      .agg(
        max(col("n_ref")).as("n_ref"),
        max(col("mu")).as("mu"),
        max(col("sigma")).as("sigma"),
        count(lit(1)).as("n_cur"),
        sum(when(abs(col("value") - col("mu")) > col("sigma") * 3, 1L)
          .otherwise(0L)).as("n_anomalies"))
  }

  val anomalySeasonalSql: String =
    """WITH e AS (
      |  SELECT event_type, hour(ts) AS hod, value,
      |         epoch_us(ts) < 1705363200000000 AS is_ref
      |  FROM events),
      |f AS (
      |  SELECT event_type, hod, count(*) AS n_ref,
      |         round(avg(value), 6) + 0 AS mu,
      |         round(stddev_samp(value), 6) + 0 AS sigma
      |  FROM e WHERE is_ref GROUP BY event_type, hod)
      |SELECT e.event_type, e.hod,
      |       CAST(max(f.n_ref) AS BIGINT) AS n_ref, max(f.mu) AS mu,
      |       max(f.sigma) AS sigma, count(*) AS n_cur,
      |       CAST(sum(CASE WHEN abs(e.value - f.mu) > f.sigma * 3
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
      |FROM e JOIN f USING (event_type, hod)
      |WHERE NOT e.is_ref
      |GROUP BY e.event_type, e.hod""".stripMargin

  // ---------------------------------------------------------------- target enc
  /** Leakage-safe TARGET ENCODING of a categorical — the ML-pipeline
    * replacement for one-hot at high cardinality: each row's category
    * is encoded by the mean target of its group COMPUTED WITHOUT THE
    * ROW ITSELF (leave-one-out), plus a Bayesian-smoothed variant
    * (m=10 pseudo-observations of the global mean) that shrinks rare
    * categories toward the prior. Naive mean encoding leaks the row's
    * own label into its feature — the classic train-time inflation —
    * and LOO is the algebraic fix: enc_i = (S_g − y_i)/(n_g − 1).
    *
    * One aggregate for the per-group (S, n) + one one-row global
    * aggregate, both broadcast back over the fact table — no window,
    * no second shuffle of the facts; the encode is a map stage. A
    * singleton group has no leave-one-out mean (n−1 = 0) and falls
    * back to the global mean. */
  def featTargetEncode(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val grp = ev.groupBy(col("event_type"))
      .agg(sum(col("value")).as("s"), count(lit(1)).as("n"))
    val glob = ev.agg(avg(col("value")).as("mu"))
    ev.join(broadcast(grp), "event_type").crossJoin(broadcast(glob))
      .select(col("event_id"), col("event_type"), col("value"),
        round(when(col("n") > 1,
            (col("s") - col("value")) / (col("n") - 1))
          .otherwise(col("mu")), 6).as("loo_enc"),
        round((col("s") - col("value") + lit(10) * col("mu")) /
          (col("n") - 1 + 10), 6).as("smooth_enc"))
  }

  val featTargetEncodeSql: String =
    """WITH g AS (
      |  SELECT event_type, sum(value) AS s, count(*) AS n
      |  FROM events GROUP BY event_type),
      |gl AS (SELECT avg(value) AS mu FROM events)
      |SELECT e.event_id, e.event_type, e.value,
      |  round(CASE WHEN g.n > 1 THEN (g.s - e.value) / (g.n - 1)
      |             ELSE gl.mu END, 6) + 0 AS loo_enc,
      |  round((g.s - e.value + 10 * gl.mu) / (g.n - 1 + 10), 6) + 0 AS smooth_enc
      |FROM events e JOIN g USING (event_type), gl""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "feat_target_encode" -> (featTargetEncode _),
    "feat_time_decay"   -> (featTimeDecay _),
    "drift_ks"          -> (driftKs _),
    "chunk_documents"   -> (chunkDocuments _),
    "chunk_documents_gen" -> (chunkDocumentsGen _),
    "shard_balance"     -> (shardManifest _),
    "quality_calibrate" -> (qualityCalibrate _),
    "bootstrap_ci"      -> (bootstrapCi _),
    "anomaly_seasonal"  -> (anomalySeasonal _))

  def oracles: Map[String, String] = Map(
    "feat_target_encode" -> featTargetEncodeSql,
    "feat_time_decay"   -> featTimeDecaySql,
    "drift_ks"          -> driftKsSql,
    "chunk_documents"   -> chunkDocumentsSql,
    "chunk_documents_gen" -> chunkDocumentsSql,
    "shard_balance"     -> shardManifestSql,
    "quality_calibrate" -> qualityCalibrateSql,
    "bootstrap_ci"      -> bootstrapCiSql,
    "anomaly_seasonal"  -> anomalySeasonalSql)
}
