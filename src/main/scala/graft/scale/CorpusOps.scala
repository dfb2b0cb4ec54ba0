package graft.scale

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Packing fold input: one doc's clamped token count within its
  * (lang, source) shard. */
case class PackIn(lang: String, source: String, doc_id: Long, n_tokens: Long)

/** One packed-document placement: the training sequence and token
  * offset the doc landed at within its shard. */
case class PackOut(lang: String, source: String, doc_id: Long,
    seq_no: Long, tok_offset: Long, n_tokens: Long)

/** Corpus-governance operators a 100 TB training-data pipeline runs
  * between dedup and packing: vocabulary fuzzy-matching, temperature
  * mixture weighting, diversity downsampling, feature winsorization,
  * novelty scoring, a k-anonymity census — and the packing step itself.
  * Each is one declarative plan with a DuckDB oracle; none shuffles
  * more than (vocab | census | bucket) rows beyond a single pass over
  * its input table.
  */
object CorpusOps {

  // ------------------------------------------------------------ symspell
  /** Typo/variant mining over the corpus VOCABULARY via symmetric-delete
    * blocking (the SymSpell scheme, maxEdit = 2): two strings within
    * edit distance 2 share a key in {token} ∪ {token minus ≤2 chars},
    * so joining the delete-neighborhoods finds every such pair without
    * an O(V²) cross join — the scale-correct fuzzy join (a raw
    * levenshtein self-join over a web-corpus vocabulary is quadratic;
    * deletes are O(len²) keys per term). Exact `levenshtein ≤ 2`
    * verifies per candidate (shared keys alone admit distance-4 pairs);
    * the df ratio ≥ 8 flags the rarer spelling as a likely typo of the
    * common one — the signal a vocab-normalization pass keys on.
    *
    * Scale shape: the vocab aggregate is corpus → |V| rows (map-side
    * combine); the delete-key join fans out O(|V|·len²) rows, grouped
    * by short string keys. Keys shorter than 2 chars are dropped — a
    * 1-char key is a HUB joining a constant fraction of the vocabulary
    * (the quadratic this scheme exists to avoid); tokens shorter than
    * 4 chars are excluded for the same reason, standard SymSpell
    * practice. */
  def vocabSymspell(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(spark, dir)
      .select(explode(array_distinct(Dedup.tokens(col("text")))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(length(col("tok")).between(4, 20))
    def dels(s: Column): Column = transform(
      sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))
    val d1 = array_distinct(dels(col("tok")))
    val keyed = vocab.select(col("tok"), col("df"),
      explode(filter(
        array_distinct(array_union(
          array_union(array(col("tok")), d1),
          flatten(transform(d1, s => dels(s))))),
        k => length(k) >= 2)).as("key"))
    val a = keyed.select(col("key"), col("tok").as("tok_a"), col("df").as("df_a"))
    val b = keyed.select(col("key"), col("tok").as("tok_b"), col("df").as("df_b"))
    a.join(b, "key")
      .filter(col("tok_a") < col("tok_b"))
      .select(col("tok_a"), col("tok_b"), col("df_a"), col("df_b")).distinct()
      .filter(levenshtein(col("tok_a"), col("tok_b")) <= 2)
      .withColumn("canonical",
        when(col("df_a") >= col("df_b"), col("tok_a")).otherwise(col("tok_b")))
      .withColumn("variant",
        when(col("df_a") >= col("df_b"), col("tok_b")).otherwise(col("tok_a")))
      .withColumn("df_ratio",
        round(greatest(col("df_a"), col("df_b")).cast("double") /
          least(col("df_a"), col("df_b")), 6))
      .withColumn("likely_typo", col("df_ratio") >= 8.0)
      .select(col("tok_a"), col("tok_b"), col("df_a"), col("df_b"),
        col("canonical"), col("variant"), col("df_ratio"), col("likely_typo"))
  }

  val vocabSymspellSql: String =
    s"""WITH vocab AS (
       |  SELECT tok, count(*) AS df FROM (
       |    SELECT doc_id, unnest(list_distinct(${Dedup.tokensSql})) AS tok
       |    FROM documents)
       |  GROUP BY tok HAVING len(tok) BETWEEN 4 AND 20),
       |d1 AS (
       |  SELECT tok, df, list_distinct(list_transform(generate_series(1, len(tok)),
       |           i -> substr(tok, 1, i - 1) || substr(tok, i + 1, len(tok)))) AS dels
       |  FROM vocab),
       |keyed AS (
       |  SELECT tok, df, unnest(list_filter(list_distinct(
       |           [tok] || dels || flatten(list_transform(dels,
       |             s -> list_transform(generate_series(1, len(s)),
       |                    i -> substr(s, 1, i - 1) || substr(s, i + 1, len(s)))))),
       |           k -> len(k) >= 2)) AS key
       |  FROM d1),
       |cand AS (
       |  SELECT DISTINCT a.tok AS tok_a, b.tok AS tok_b, a.df AS df_a, b.df AS df_b
       |  FROM keyed a JOIN keyed b USING (key) WHERE a.tok < b.tok),
       |v AS (
       |  SELECT * FROM cand WHERE levenshtein(tok_a, tok_b) <= 2)
       |SELECT tok_a, tok_b, df_a, df_b,
       |  CASE WHEN df_a >= df_b THEN tok_a ELSE tok_b END AS canonical,
       |  CASE WHEN df_a >= df_b THEN tok_b ELSE tok_a END AS variant,
       |  round(greatest(df_a, df_b) * 1.0 / least(df_a, df_b), 6) + 0 AS df_ratio,
       |  round(greatest(df_a, df_b) * 1.0 / least(df_a, df_b), 6) >= 8.0 AS likely_typo
       |FROM v""".stripMargin

  // ------------------------------------------------------------ temperature
  /** Temperature-scaled mixture weights — THE multi-domain LLM sampling
    * primitive (multilingual-LM style): sampling share ∝ share^α with
    * α = 0.6 flattens the domain distribution (α = 1 keeps it, α = 0 is
    * uniform), boosting low-resource langs without fixed targets (the
    * complement of [[Sampling.sampleMixture]]'s explicit shares). Census
    * output pins natural share, scaled share, weight, and the epochs a
    * weight > 1 implies over the small domain.
    *
    * Scale shape: one per-lang aggregate (a handful of rows), weights
    * derived entirely inside it — the corpus itself is touched once and
    * never shuffled. */
  def sampleTemperature(spark: SparkSession, dir: String): DataFrame = {
    val stats = Tables.documents(spark, dir)
      .select(col("lang"), size(Dedup.tokens(col("text"))).as("n_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("lang_tokens"))
    // fit-then-fold: one-row totals crossJoined back instead of a
    // single-partition window over the per-lang frame
    val tot = stats.agg(sum(col("lang_tokens")).as("tot_tokens"))
    val withNat = stats.crossJoin(broadcast(tot))
      .withColumn("natural_share",
        col("lang_tokens") / col("tot_tokens").cast("double"))
    val powTot = withNat.agg(sum(pow(col("natural_share"), 0.6)).as("pow_total"))
    withNat.crossJoin(broadcast(powTot))
      .withColumn("scaled_share",
        pow(col("natural_share"), 0.6) / col("pow_total"))
      .withColumn("weight", col("scaled_share") / col("natural_share"))
      .select(col("lang"), col("n_docs"), col("lang_tokens"),
        round(col("natural_share"), 6).as("natural_share"),
        round(col("scaled_share"), 6).as("scaled_share"),
        round(col("weight"), 6).as("weight"),
        round(greatest(col("weight"), lit(1.0)), 2).as("epochs_over_domain"))
  }

  val sampleTemperatureSql: String =
    s"""WITH stats AS (
       |  SELECT lang, count(*) AS n_docs,
       |         CAST(sum(len(${Dedup.tokensSql})) AS BIGINT) AS lang_tokens
       |  FROM documents GROUP BY lang),
       |sh AS (
       |  SELECT *, lang_tokens * 1.0 / sum(lang_tokens) OVER () AS natural_share
       |  FROM stats),
       |sc AS (
       |  SELECT *, pow(natural_share, 0.6) / sum(pow(natural_share, 0.6)) OVER ()
       |           AS scaled_share
       |  FROM sh)
       |SELECT lang, n_docs, lang_tokens,
       |  round(natural_share, 6) + 0 AS natural_share,
       |  round(scaled_share, 6) + 0 AS scaled_share,
       |  round(scaled_share / natural_share, 6) + 0 AS weight,
       |  round(greatest(scaled_share / natural_share, 1.0), 2) + 0 AS epochs_over_domain
       |FROM sc""".stripMargin

  // ------------------------------------------------------------ diversity
  /** Diversity downsample over the embedding space: keep ONE
    * representative (min vec_id) per random-hyperplane LSH bucket — the
    * embedding-space analogue of SemDeDup's keep-one-per-cluster, as a
    * single aggregate over the bucketed corpus (the same 8-plane bucket
    * id the ANN index uses, so the index build is shared work). Emits
    * the kept id per bucket with the redundancy it removed; a training
    * run samples from representatives to cover the space instead of
    * oversampling dense regions.
    *
    * Scale shape: bucket id is a map-side expression; the keep-one is
    * one hash aggregate on a key with ≤ 2^8 distinct values — at web
    * scale the plane count grows with log(corpus) and the aggregate
    * stays one shuffle of |buckets| rows. */
  def sampleDiverse(spark: SparkSession, dir: String): DataFrame =
    Similarity.corpus(spark, dir)
      .select(col("vec_id"), Similarity.lshBucket(col("v")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(min(col("vec_id")).as("rep_vec_id"),
        count(lit(1)).as("n_members"),
        (count(lit(1)) - 1).as("n_removed"))

  val sampleDiverseSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |planes AS (
      |  SELECT j, list_transform(generate_series(0, 63),
      |           d -> ('0x' || substr(md5(j::VARCHAR || '_' || d::VARCHAR), 1, 8))::BIGINT
      |                  / 2147483648.0 - 1.0) AS h
      |  FROM unnest(generate_series(0, 7)) AS t(j)),
      |signs AS (
      |  SELECT e.vec_id, p.j,
      |         CASE WHEN list_sum(list_transform(list_zip(e.v, p.h), q -> q[1] * q[2])) >= 0
      |              THEN CAST(pow(2.0, p.j) AS BIGINT) ELSE 0 END AS bit
      |  FROM e, planes p),
      |b AS (
      |  SELECT vec_id, CAST(sum(bit) AS BIGINT) AS bucket FROM signs GROUP BY vec_id)
      |SELECT bucket, min(vec_id) AS rep_vec_id, count(*) AS n_members,
      |       count(*) - 1 AS n_removed
      |FROM b GROUP BY bucket""".stripMargin

  // ------------------------------------------------------------ winsorize
  /** Per-key exact-percentile winsorization — the standard feature-
    * hygiene stage before normalization fit (A7): clamp each user's
    * event values to their [p05, p95] band so a single fat-finger tick
    * can't stretch the minmax range. Fit-then-apply: the percentile
    * aggregate produces ONE row per key, broadcast back over the fact
    * table — the same two-pass shape as [[normalize.Normalizer]], no
    * whole-table window. At 100 TB the fit pass swaps `percentile` for
    * `approx_percentile` (same plan, sketch-mergeable); the exact form
    * here keeps the oracle byte-stable. The broadcast hint is right
    * while the fit table is |keys| rows ≲ 10M (~hundreds of MB); past
    * that, drop the hint and the identical plan degrades gracefully to
    * a shuffled equi-join on the key. */
  def featWinsorize(spark: SparkSession, dir: String): DataFrame = {
    val fit = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(expr("percentile(value, 0.05)").as("lo"),
        expr("percentile(value, 0.95)").as("hi"))
    Tables.events(spark, dir)
      .join(broadcast(fit), "user_id")
      .select(col("event_id"), col("user_id"),
        round(col("value"), 6).as("value"),
        round(greatest(col("lo"), least(col("hi"), col("value"))), 6)
          .as("value_winsorized"),
        (col("value") < col("lo") || col("value") > col("hi")).as("clamped"),
        round(col("lo"), 6).as("p05"), round(col("hi"), 6).as("p95"))
  }

  val featWinsorizeSql: String =
    """WITH fit AS (
      |  SELECT user_id, quantile_cont(value, 0.05) AS lo,
      |         quantile_cont(value, 0.95) AS hi
      |  FROM events GROUP BY user_id)
      |SELECT event_id, e.user_id, round(value, 6) + 0 AS value,
      |  round(greatest(lo, least(hi, value)), 6) + 0 AS value_winsorized,
      |  (value < lo OR value > hi) AS clamped,
      |  round(lo, 6) + 0 AS p05, round(hi, 6) + 0 AS p95
      |FROM events e JOIN fit USING (user_id)""".stripMargin

  // ------------------------------------------------------------ novelty
  /** Per-doc n-gram novelty: the fraction of a doc's distinct shingles
    * whose global FIRST occurrence (min doc_id) is this doc — the
    * curriculum/value signal dedup-aware samplers order by (a doc that
    * introduces no new n-grams is redundant with the corpus prefix even
    * when no single pair crosses the near-dup threshold). Reads the
    * memoized shingle index shared by six other queries; one min-
    * aggregate over shingles plus one per-doc aggregate — both keyed
    * shuffles bounded by |shingle rows|, the same budget as the MinHash
    * build. */
  /** Memoized per (session, dir): consumed standalone and as the value
    * signal inside [[curriculumOrder]] — the second consumer otherwise
    * re-pays the whole shingle first-occurrence join (~1 s at sf0.1,
    * the warm-pass maximum). Doc-count-sized, so the localCheckpoint
    * is cheap. */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame =
    DirMemo.getOrCompute(spark, "novelty", dir)(
      ngramNoveltyImpl(spark, dir).localCheckpoint())

  private[graft] def ngramNoveltyImpl(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingleIndex(spark, dir)
    val firstSeen = sh.groupBy(col("s")).agg(min(col("doc_id")).as("first_doc"))
    sh.join(firstSeen, "s")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_frac",
        round(col("n_novel") / col("n_shingles").cast("double"), 6))
  }

  val ngramNoveltySql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${Dedup.tokensSql} AS ts FROM documents),
       |srows AS (
       |  SELECT doc_id, unnest(list_distinct(${Dedup.shinglesSql})) AS s FROM toks),
       |first_seen AS (
       |  SELECT s, min(doc_id) AS first_doc FROM srows GROUP BY s)
       |SELECT r.doc_id, count(*) AS n_shingles,
       |  CAST(sum(CASE WHEN f.first_doc = r.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |  round(sum(CASE WHEN f.first_doc = r.doc_id THEN 1 ELSE 0 END) * 1.0
       |        / count(*), 6) + 0 AS novelty_frac
       |FROM srows r JOIN first_seen f USING (s)
       |GROUP BY r.doc_id""".stripMargin

  // ------------------------------------------------------------ k-anonymity
  /** k-anonymity census over the event stream — the privacy gate a
    * training-data release runs: rows whose quasi-identifier tuple
    * (event_type, value quartile-band, hour of day) lands in an
    * equivalence class smaller than k = 5 are re-identifiable and must
    * be suppressed or generalized. Emits the per-event_type census:
    * class counts, suppressed row counts, and the suppression fraction.
    * One aggregate over the QI tuple then one over event_type — no row
    * leaves the cluster, which is the point at 100 TB: the census is
    * the only thing small enough to review. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val k = 5
    Tables.events(spark, dir)
      .select(col("event_type"),
        floor(col("value") / 50.0).as("value_band"),
        hour(col("ts")).as("hour_of_day"))
      .groupBy(col("event_type"), col("value_band"), col("hour_of_day"))
      .agg(count(lit(1)).as("class_size"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("class_size") < k, 1L).otherwise(0L)).as("n_small_classes"),
        sum(col("class_size")).as("n_rows"),
        sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
          .as("rows_suppressed"),
        min(col("class_size")).as("min_class_size"))
      .withColumn("suppressed_frac",
        round(col("rows_suppressed") / col("n_rows").cast("double"), 6))
      .withColumn("k_anonymous", col("min_class_size") >= k)
  }

  val kAnonymitySql: String =
    """WITH qi AS (
      |  SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) AS value_band,
      |         CAST(extract(hour FROM ts) AS BIGINT) AS hour_of_day, count(*) AS class_size
      |  FROM events GROUP BY 1, 2, 3)
      |SELECT event_type, count(*) AS n_classes,
      |  CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_classes,
      |  CAST(sum(class_size) AS BIGINT) AS n_rows,
      |  CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END) AS BIGINT)
      |    AS rows_suppressed,
      |  min(class_size) AS min_class_size,
      |  round(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END) * 1.0
      |        / sum(class_size), 6) + 0 AS suppressed_frac,
      |  min(class_size) >= 5 AS k_anonymous
      |FROM qi GROUP BY event_type""".stripMargin

  // ------------------------------------------------------------ curriculum
  /** Curriculum export: the global training order (easy/valuable docs
    * first) as (rank, chunk, position) — the artifact a training run
    * streams. Score = quality + n-gram novelty (both already
    * first-class: [[TextAnalysis.qualityScoreCol]], [[ngramNovelty]]);
    * the SUM of the two 6-decimal-rounded signals, not their rounded
    * mean — adding identical doubles is bit-identical across engines,
    * while a second `round()` of the mean lands on 7th-decimal
    * boundaries where engine rounding algorithms disagree (observed:
    * 2 cells in 500 at sf0.01). Ordering-equivalent to the mean.
    *
    * The interesting part at 100 TB is the GLOBAL rank: a bare
    * `row_number() OVER (ORDER BY score)` funnels the corpus through one
    * partition. This uses the standard two-phase form instead — a
    * 500-bucket score histogram (tiny, broadcast) supplies each bucket's
    * global offset, and the within-bucket `row_number` runs partitioned
    * by bucket, so the sort is distributed and no task holds more than
    * ~1/500 of the corpus (the bucket count is the knob you scale with
    * the cluster, like `repartitionByRange` partition counts). The
    * oracle pins it against DuckDB's plain global row_number — same
    * order, bucket-free. */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bkt")).orderBy(col("score").desc, col("doc_id"))
    val wHi = org.apache.spark.sql.expressions.Window
      .orderBy(col("bkt").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val quality = Tables.documents(spark, dir)
      .select(col("doc_id"), round(TextAnalysis.qualityScoreCol, 6).as("q"))
    val novelty = ngramNovelty(spark, dir)
      .select(col("doc_id"), col("novelty_frac"))
    val scored = quality.join(novelty, Seq("doc_id"), "left")
      // docs with < 3 tokens shingle to nothing — novelty 0, not null
      .withColumn("score", col("q") + coalesce(col("novelty_frac"), lit(0.0)))
      .withColumn("bkt", least(floor(col("score") * 250), lit(499L)).cast("int"))
    val offsets = scored.groupBy(col("bkt")).agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(wHi), lit(0L)))
      .select(col("bkt"), col("off"))
    scored.join(broadcast(offsets), "bkt")
      .withColumn("rank", col("off") + row_number().over(wIn))
      .select(col("doc_id"), col("score"), col("rank"),
        floor((col("rank") - 1) / 64.0).cast("long").as("chunk_id"),
        pmod(col("rank") - 1, lit(64L)).as("position"))
  }

  val curriculumOrderSql: String =
    s"""WITH ${TextAnalysis.qualityCtes},
       |ntk AS (
       |  SELECT doc_id, ${Dedup.tokensSql} AS ts FROM documents),
       |nsr AS (
       |  SELECT doc_id, unnest(list_distinct(${Dedup.shinglesSql})) AS s FROM ntk),
       |nfs AS (
       |  SELECT s, min(doc_id) AS first_doc FROM nsr GROUP BY s),
       |nov AS (
       |  SELECT r.doc_id, round(sum(CASE WHEN f.first_doc = r.doc_id THEN 1 ELSE 0 END)
       |           * 1.0 / count(*), 6) AS novelty_frac
       |  FROM nsr r JOIN nfs f USING (s) GROUP BY r.doc_id),
       |sc AS (
       |  SELECT q.doc_id,
       |         round(q.score, 6) + 0 + coalesce(n.novelty_frac + 0, 0.0) AS score
       |  FROM qs q LEFT JOIN nov n USING (doc_id)),
       |r AS (
       |  SELECT doc_id, score,
       |         row_number() OVER (ORDER BY score DESC, doc_id) AS rank
       |  FROM sc)
       |SELECT doc_id, score, rank,
       |       (rank - 1) // 64 AS chunk_id, (rank - 1) % 64 AS position
       |FROM r""".stripMargin

  // ------------------------------------------------------------ dataset card
  /** The DATASET CARD row — the datasheet a corpus release ships:
    * volume (docs/tokens/median length), language mix (count + top lang
    * share), exact-duplicate rate, and the quality distribution (mean
    * score + keep-bucket share). Everything derives from aggregates the
    * suite already defines, fused into ONE corpus pass (a single
    * multi-aggregate; the language top-1 is its own tiny census joined
    * in) — how the card stays cheap enough to regenerate on every
    * release at 100 TB. */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    val q = TextAnalysis.qualityScoreCol
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"),
        size(Dedup.tokens(col("text"))).as("n_tokens"), q.as("score"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        round(expr("percentile(n_tokens, 0.5)"), 6).as("p50_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(md5(col("text").cast("binary"))).as("n_unique_texts"),
        round(avg(col("score")), 6).as("mean_quality"),
        round(avg(when(col("score") >= 0.7, 1.0).otherwise(0.0)), 6).as("keep_share"))
      .withColumn("exact_dup_rate",
        round(lit(1.0) - col("n_unique_texts") / col("n_docs").cast("double"), 6))
    val top = Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("n").desc, col("lang"))))
      .filter(col("rk") === 1)
      .select(col("lang").as("top_lang"), col("n").as("top_lang_docs"))
    base.crossJoin(broadcast(top))
      .withColumn("top_lang_share",
        round(col("top_lang_docs") / col("n_docs").cast("double"), 6))
  }

  val datasetCardSql: String =
    s"""WITH ${TextAnalysis.qualityCtes},
       |doc AS (
       |  SELECT d.doc_id, d.lang, d.text, s.n_tokens, s.score
       |  FROM documents d JOIN qs s USING (doc_id)),
       |base AS (
       |  SELECT count(*) AS n_docs,
       |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |    round(quantile_cont(n_tokens, 0.5), 6) + 0 AS p50_tokens,
       |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       |    CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
       |    round(avg(score), 6) + 0 AS mean_quality,
       |    round(avg(CASE WHEN score >= 0.7 THEN 1.0 ELSE 0.0 END), 6) + 0 AS keep_share
       |  FROM doc),
       |top AS (
       |  SELECT lang AS top_lang, n AS top_lang_docs FROM (
       |    SELECT lang, count(*) AS n,
       |           row_number() OVER (ORDER BY count(*) DESC, lang) AS rk
       |    FROM documents GROUP BY lang) WHERE rk = 1)
       |SELECT n_docs, n_tokens, p50_tokens, n_langs, n_unique_texts,
       |  mean_quality, keep_share,
       |  round(1.0 - n_unique_texts * 1.0 / n_docs, 6) + 0 AS exact_dup_rate,
       |  top_lang, top_lang_docs,
       |  round(top_lang_docs * 1.0 / n_docs, 6) + 0 AS top_lang_share
       |FROM base CROSS JOIN top""".stripMargin

  // ------------------------------------------------------------- packing
  /** Sequence packing — the LAST step of a pretraining data pipeline:
    * lay documents end-to-end into fixed token-budget training
    * sequences (next-fit by doc_id within each (lang, source) shard)
    * and record each doc's (sequence, offset) placement, the index the
    * trainer's data loader reads. Next-fit (not best-fit) is chosen
    * because it is ORDER-DETERMINISTIC: the placement is a pure fold
    * over the shard's doc order, so the output is reproducible
    * run-to-run and oracle-replayable — best-fit's bin search makes
    * placement depend on float-free but state-wide lookups that
    * shuffle-scale poorly and are much harder to audit. Docs longer
    * than the budget are clamped (truncation, the standard convention);
    * packing within a shard is inherently sequential (each placement
    * depends on the previous fill), so it rides the same
    * `groupByKey.flatMapSortedGroups` machinery as the stateful TA
    * folds — O(1) state, parallelism = shard count. At 100 TB the
    * shard key grows a date/part component (packing never needs to be
    * global — sequences don't cross shard boundaries by design, for
    * exactly this parallelism). */
  private[graft] val PackBudget = 2048L

  def packNextFit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("lang"), col("source"), col("doc_id"),
        least(TextAnalysis.wsTokenCount.cast("long"), lit(PackBudget)).as("n_tokens"))
      // zero-token docs are dropped BEFORE packing: they have no
      // placement a data loader could read, and keeping them lets one
      // land at tok_offset == PackBudget inside an exactly-full
      // sequence (the fold only rolls when fill + n EXCEEDS the
      // budget) — a semantically absurd index entry both engines would
      // happily agree on
      .filter(col("n_tokens") > 0)
      .as[PackIn]
      .groupByKey(r => (r.lang, r.source))
      .flatMapSortedGroups($"doc_id") { (_: (String, String), rows: Iterator[PackIn]) =>
        var seqNo = 0L
        var fill = 0L
        rows.map { r =>
          if (fill + r.n_tokens > PackBudget) { seqNo += 1; fill = 0L }
          val off = fill
          fill += r.n_tokens
          PackOut(r.lang, r.source, r.doc_id, seqNo, off, r.n_tokens)
        }
      }
      .toDF()
  }

  /** Lockstep recursive replay per (lang, source) shard — the PSAR
    * oracle pattern; all state is BIGINT, so the fold is bit-exact. */
  val packNextFitSql: String =
    s"""WITH RECURSIVE pdocs AS MATERIALIZED (
       |  SELECT lang, source, doc_id,
       |    least(CAST(${TextAnalysis.wsTokenCountSql} AS BIGINT), $PackBudget)
       |      AS n_tokens,
       |    row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
       |  FROM documents
       |  WHERE CAST(${TextAnalysis.wsTokenCountSql} AS BIGINT) > 0),
       |pk(lang, source, rn, doc_id, seq_no, tok_offset, n_tokens, fill) AS (
       |  SELECT lang, source, rn, doc_id, 0::BIGINT, 0::BIGINT, n_tokens, n_tokens
       |  FROM pdocs WHERE rn = 1
       |  UNION ALL
       |  SELECT d.lang, d.source, d.rn, d.doc_id,
       |    CASE WHEN p.fill + d.n_tokens > $PackBudget
       |         THEN p.seq_no + 1 ELSE p.seq_no END,
       |    CASE WHEN p.fill + d.n_tokens > $PackBudget
       |         THEN 0 ELSE p.fill END,
       |    d.n_tokens,
       |    CASE WHEN p.fill + d.n_tokens > $PackBudget
       |         THEN d.n_tokens ELSE p.fill + d.n_tokens END
       |  FROM pk p JOIN pdocs d
       |    ON d.lang = p.lang AND d.source = p.source AND d.rn = p.rn + 1)
       |SELECT lang, source, doc_id, seq_no, tok_offset, n_tokens FROM pk""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pack_next_fit"      -> (packNextFit _),
    "dataset_card"       -> (datasetCard _),
    "vocab_symspell"     -> (vocabSymspell _),
    "sample_temperature" -> (sampleTemperature _),
    "sample_diverse"     -> (sampleDiverse _),
    "feat_winsorize"     -> (featWinsorize _),
    "ngram_novelty"      -> (ngramNovelty _),
    "curriculum_order"   -> (curriculumOrder _),
    "k_anonymity"        -> (kAnonymity _))

  def oracles: Map[String, String] = Map(
    "pack_next_fit"      -> packNextFitSql,
    "dataset_card"       -> datasetCardSql,
    "vocab_symspell"     -> vocabSymspellSql,
    "sample_temperature" -> sampleTemperatureSql,
    "sample_diverse"     -> sampleDiverseSql,
    "feat_winsorize"     -> featWinsorizeSql,
    "ngram_novelty"      -> ngramNoveltySql,
    "curriculum_order"   -> curriculumOrderSql,
    "k_anonymity"        -> kAnonymitySql)
}
