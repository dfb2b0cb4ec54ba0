package graft.scale

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * column expressions (codegen'd map stages — embarrassingly parallel at
  * any scale), with md5-based fingerprints for oracle parity.
  */
object TextAnalysis {

  private def lowerText: Column = lower(col("text"))

  /** chars removed by stripping `pat` — a regex occurrence counter that
    * costs two length() calls (identical semantics in DuckDB). */
  private def strippedLen(c: Column, pat: String): Column =
    length(c) - length(regexp_replace(c, pat, ""))

  // ---------------------------------------------------------------- lang id
  /** Character-statistics language ID (n-gram heuristic): vowel ratio,
    * 'th' bigram rate, vowel-final-word rate, average word length →
    * threshold classifier. Deterministic and engine-portable; accuracy
    * on this synthetic corpus is incidental (labels are random), the
    * operator shape is what scales. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val letters = strippedLen(lowerText, "[^a-z]")
    val vowels = strippedLen(lowerText, "[^aeiou]")
    val thCount = (length(lowerText) - length(regexp_replace(lowerText, "th", ""))) / 2
    val toks = Dedup.tokens(col("text"))
    val vowelEnd = size(filter(toks, t => t.rlike("[aeiou]$")))
    val avgLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      size(toks)
    Tables.documents(spark, dir)
      .withColumn("vowel_ratio", round(vowels.cast("double") / letters, 6))
      .withColumn("th_rate", round(thCount.cast("double") / greatest(size(toks), lit(1)), 6))
      .withColumn("vowel_end_ratio", round(vowelEnd.cast("double") / size(toks), 6))
      .withColumn("avg_word_len", round(avgLen, 6))
      .withColumn("predicted_lang",
        when(col("th_rate") > 0.2, "en")
          .when(col("vowel_end_ratio") > 0.45, "es")
          .when(col("avg_word_len") > 5.0, "de")
          .otherwise("zh"))
      .select(col("doc_id"), col("vowel_ratio"), col("th_rate"),
        col("vowel_end_ratio"), col("avg_word_len"), col("predicted_lang"))
  }

  val langIdSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lower(text) AS lt, ${Dedup.tokensSql} AS ts FROM documents),
       |f AS (
       |  SELECT doc_id,
       |    (length(lt) - length(regexp_replace(lt, '[^aeiou]', '', 'g'))) * 1.0 /
       |      (length(lt) - length(regexp_replace(lt, '[^a-z]', '', 'g'))) AS vowel_ratio,
       |    ((length(lt) - length(replace(lt, 'th', ''))) / 2) * 1.0 /
       |      greatest(len(ts), 1) AS th_rate,
       |    len(list_filter(ts, t -> regexp_matches(t, '[aeiou]$$'))) * 1.0 / len(ts) AS vowel_end_ratio,
       |    list_sum(list_transform(ts, t -> length(t))) * 1.0 / len(ts) AS avg_word_len
       |  FROM t)
       |SELECT doc_id,
       |  round(vowel_ratio, 6) + 0 AS vowel_ratio, round(th_rate, 6) + 0 AS th_rate,
       |  round(vowel_end_ratio, 6) + 0 AS vowel_end_ratio, round(avg_word_len, 6) + 0 AS avg_word_len,
       |  CASE WHEN th_rate > 0.2 THEN 'en'
       |       WHEN vowel_end_ratio > 0.45 THEN 'es'
       |       WHEN avg_word_len > 5.0 THEN 'de'
       |       ELSE 'zh' END AS predicted_lang
       |FROM f""".stripMargin

  // ---------------------------------------------------------------- quality
  /** The composite quality-score expression over a `text` column —
    * shared by the batch query below and the streaming ingest gate
    * ([[graft.streaming.CorpusIngest]]), so both paths apply one
    * definition of "quality". */
  def qualityScoreCol: Column = {
    // r16: all five integer inputs come from ONE codegen'd pass
    // ([[graft.functions.TextStats]] — bit-identical to the
    // regexp_replace / split+interpreted-HOF forms it replaced, see its
    // scaladoc + TextStatsSpec). The five getField references share a
    // single evaluation via codegen subexpression elimination. The
    // IDENTICAL integer counts feed the IDENTICAL double arithmetic,
    // so the score is bit-equal and the oracle SQL is unchanged.
    val st = graft.functions.GraftFunctions.textStats(col("text"))
    val len = st.getField("len")
    val nToks = st.getField("n_tok")
    val stopRatio = st.getField("n_stop").cast("double") / greatest(nToks, lit(1))
    // (len − n_punct) ≡ strippedLen(text, "[^!-/:-@\\[-`{-~]"): the
    // negated-class regexp_replace KEPT the punct chars, so the length
    // difference counts the non-punct ones — mirrored exactly
    val punctRatio = (len - st.getField("n_punct")).cast("double") /
      greatest(len, lit(1))
    val digitRatio = (len - st.getField("n_digit")).cast("double") /
      greatest(len, lit(1))
    val lenScore = least(len.cast("double") / 400.0, lit(1.0))
    lenScore * 0.4 +
      least(stopRatio * 4.0, lit(1.0)) * 0.3 +
      (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.2 +
      (lit(1.0) - least(digitRatio * 10.0, lit(1.0))) * 0.1
  }

  /** Quality scoring (length / punctuation / digit / stopword ratios →
    * composite score + keep/flag/drop bucket) — the filter stage of a
    * pretraining curation pipeline. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    // same single-pass [[graft.functions.TextStats]] struct as
    // [[qualityScoreCol]] (r16) — identical ints, identical doubles
    val st = graft.functions.GraftFunctions.textStats(col("text"))
    val len = st.getField("len")
    val nToks = st.getField("n_tok")
    val stopRatio = st.getField("n_stop").cast("double") / greatest(nToks, lit(1))
    val punctRatio = (len - st.getField("n_punct")).cast("double") /
      greatest(len, lit(1))
    val digitRatio = (len - st.getField("n_digit")).cast("double") /
      greatest(len, lit(1))
    val score = qualityScoreCol
    Tables.documents(spark, dir).select(
      col("doc_id"),
      nToks.as("n_tokens"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(punctRatio, 6).as("punct_ratio"),
      round(digitRatio, 6).as("digit_ratio"),
      round(score, 6).as("quality_score"),
      when(score >= 0.7, "keep").when(score >= 0.4, "flag").otherwise("drop")
        .as("quality_bucket"))
  }

  /** The quality-score CTE chain ending in `qs(doc_id, n_tokens,
    * stop_ratio, punct_ratio, digit_ratio, score)` — shared by the
    * standalone quality oracle and the fused [[Curation.corpusPipeline]]
    * oracle. */
  val qualityCtes: String =
    s"""qt AS (
       |  SELECT doc_id, text, ${Dedup.tokensSql} AS ts FROM documents),
       |qf AS (
       |  SELECT doc_id, len(ts) AS n_tokens,
       |    len(list_filter(ts, x -> x IN ('the','a','of','and','in','to','is','on','for','with')))
       |      * 1.0 / greatest(len(ts), 1) AS stop_ratio,
       |    (length(text) - length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')))
       |      * 1.0 / greatest(length(text), 1) AS punct_ratio,
       |    (length(text) - length(regexp_replace(text, '[^0-9]', '', 'g')))
       |      * 1.0 / greatest(length(text), 1) AS digit_ratio,
       |    least(length(text) * 1.0 / 400.0, 1.0) AS len_score
       |  FROM qt),
       |qs AS (
       |  SELECT doc_id, n_tokens, stop_ratio, punct_ratio, digit_ratio,
       |    len_score * 0.4 + least(stop_ratio * 4.0, 1.0) * 0.3 +
       |    (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.2 +
       |    (1.0 - least(digit_ratio * 10.0, 1.0)) * 0.1 AS score
       |  FROM qf)""".stripMargin

  val qualityScoreSql: String =
    s"""WITH $qualityCtes
       |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       |  round(stop_ratio, 6) + 0 AS stopword_ratio,
       |  round(punct_ratio, 6) + 0 AS punct_ratio,
       |  round(digit_ratio, 6) + 0 AS digit_ratio,
       |  round(score, 6) + 0 AS quality_score,
       |  CASE WHEN score >= 0.7 THEN 'keep' WHEN score >= 0.4 THEN 'flag'
       |       ELSE 'drop' END AS quality_bucket
       |FROM qs""".stripMargin

  // ---------------------------------------------------------------- tokens
  /** Whitespace token count over `text` — THE one definition (with its
    * SQL twin below) shared by tokenCount, the histogram profilers, and
    * the sequence packer, so a tokenization change can't drift between
    * Spark and any oracle. */
  private[graft] def wsTokenCount: org.apache.spark.sql.Column =
    size(filter(split(col("text"), "\\s+"), t => t =!= ""))

  /** DuckDB twin of [[wsTokenCount]] (INT-typed like Spark's `size`;
    * callers cast as needed). Escapes are already resolved — embed via
    * interpolation, not inside another escape layer. */
  private[graft] val wsTokenCountSql: String =
    """len(list_filter(string_split_regex(text, '\s+'), t -> t <> ''))"""

  /** Token counting: whitespace tokens and a BPE-ish regex tokenizer
    * (word pieces + standalone punctuation), plus chars/token. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    val wsToks = wsTokenCount
    val bpeToks = size(regexp_extract_all(col("text"), lit("[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      wsToks.as("ws_tokens"),
      bpeToks.as("bpe_tokens"),
      round(length(col("text")).cast("double") / greatest(bpeToks, lit(1)), 6)
        .as("chars_per_token"))
  }

  val tokenCountSql: String =
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split_regex(text, '\s+'), t -> t <> '')) AS INT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')) AS INT) AS bpe_tokens,
      |  round(length(text) * 1.0 /
      |        greatest(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')), 1), 6)
      |    AS chars_per_token
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- fingerprint
  /** Document fingerprinting: min/max over 3-gram shingle hashes (a
    * winnowing-style content signature) + a 4-hash compact sketch. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    // shingle rows → hash once per shingle → groupBy agg (see
    // Dedup.shingleRows for why the array-lambda form is pathological)
    val exploded = Dedup.shingleIndex(spark, dir)
      .withColumn("h", md5(col("s").cast("binary")))
      .withColumn("hi", conv(substring(col("h"), 1, 15), 16, 10).cast("long") % 1000000007L)
    val sketchMins = (0 until 4).map(k =>
      min((col("hi") + 1) * lit(1000003L + k * 99991L) % 2147483647L).as(s"sk$k"))
    exploded.groupBy(col("doc_id"))
      .agg(min(col("h")).as("fp_min"), max(col("h")).as("fp_max") +: sketchMins: _*)
      .select(col("doc_id"), col("fp_min"), col("fp_max"),
        concat_ws(",", (0 until 4).map(k => col(s"sk$k")): _*).as("fp_sketch"))
  }

  val fingerprintSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${Dedup.tokensSql} AS ts FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |         list_transform(list_distinct(${Dedup.shinglesSql}), s -> md5(s)) AS hs
       |  FROM toks),
       |hi AS (
       |  SELECT doc_id, hs,
       |         list_transform(hs, h -> ('0x' || substr(h, 1, 15))::BIGINT % 1000000007) AS hi
       |  FROM sh WHERE len(hs) > 0)
       |SELECT doc_id,
       |  list_aggregate(hs, 'min') AS fp_min,
       |  list_aggregate(hs, 'max') AS fp_max,
       |  array_to_string(list_transform(generate_series(0, 3),
       |    k -> list_aggregate(list_transform(hi, h -> (h + 1) * (1000003 + k * 99991) % 2147483647),
       |                        'min')), ',') AS fp_sketch
       |FROM hi""".stripMargin

  // ---------------------------------------------------------------- adaptive
  /** Adaptive quality gate — fit-then-apply: the cutoff is the corpus's
    * own 30th-percentile score (one tiny aggregate broadcast back over
    * the scan), not a fixed constant that silently drifts as the corpus
    * mix changes between crawls. Exact interpolated percentile on the
    * rounded score, so both engines see identical doubles. */
  def qualityAdaptive(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), round(qualityScoreCol, 6).as("quality_score"))
    val cut = scored.agg(
      round(expr("percentile(quality_score, 0.3)"), 6).as("threshold"))
    scored.crossJoin(broadcast(cut))
      .select(col("doc_id"), col("quality_score"), col("threshold"),
        (col("quality_score") >= col("threshold")).as("kept"))
  }

  val qualityAdaptiveSql: String =
    s"""WITH $qualityCtes,
       |sc AS (SELECT doc_id, round(score, 6) + 0 AS quality_score FROM qs),
       |cut AS (SELECT round(quantile_cont(quality_score, 0.3), 6) + 0 AS threshold FROM sc)
       |SELECT doc_id, quality_score, threshold, quality_score >= threshold AS kept
       |FROM sc, cut""".stripMargin

  // ---------------------------------------------------------------- vocab/OOV
  /** Vocabulary coverage — the tokenizer-sizing diagnostic: the corpus's
    * top-100 tokens by OCCURRENCE count form the vocab (deterministic
    * count-then-token tie-break), and every doc reports its
    * out-of-vocabulary token fraction. The vocab is tiny by construction
    * → broadcast; token rows shuffle once for the vocab count and once
    * for the per-doc aggregate. */
  def vocabOov(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
    val vocab = tok.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(100)
      .select(col("tok"), lit(1).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("in_vocab").isNull, lit(1))).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6).as("oov_rate"))
  }

  val vocabOovSql: String =
    s"""WITH tr AS (
       |  SELECT doc_id, unnest(${Dedup.tokensSql}) AS tok FROM documents),
       |voc AS (
       |  SELECT tok FROM (SELECT tok, count(*) AS n FROM tr GROUP BY tok
       |                   ORDER BY n DESC, tok LIMIT 100)),
       |j AS (
       |  SELECT t.doc_id, CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
       |  FROM tr t LEFT JOIN voc v ON t.tok = v.tok)
       |SELECT doc_id, count(*) AS n_tokens, CAST(sum(oov) AS BIGINT) AS n_oov,
       |       round(sum(oov) * 1.0 / count(*), 6) + 0 AS oov_rate
       |FROM j GROUP BY doc_id""".stripMargin

  // ---------------------------------------------------------------- bigram LM
  /** Bigram language-model scoring — one order up from [[unigramNll]]:
    * fit P(r|l) = c(l,r)/c(l·) on the corpus, score every doc by mean
    * bigram negative-log-likelihood and its perplexity. A doc whose
    * TOKENS are plausible but whose TRANSITIONS are not (shuffled text,
    * keyword stuffing, template spam) scores high here while passing
    * the unigram filter — the reason curation stacks both. Perplexity
    * exponentiates the 6-dp-rounded mean so the oracle reproduces it
    * bit-for-bit.
    *
    * Scale note: the unigram table saturates at vocab size, so it
    * broadcasts at any corpus scale. The BIGRAM table does not — the
    * distinct (l,r) pairs keep growing toward O(V²) with corpus bytes,
    * so it is deliberately NOT hinted: the bigram rows are already
    * hash-partitioned by (l,r) from their own count aggregate, and AQE
    * picks a shuffle join (or a broadcast one while the table is still
    * small) without the executor-OOM failure mode a forced broadcast
    * has at 100 TB.
    *
    * Bigram rows come from zipping the token array with its own tail
    * (the [[bpeMergesImpl]] shape) — a pure map stage; the
    * posexplode+lead window it replaces paid a doc_id shuffle AND a
    * per-doc sort before the first aggregate. The token array is
    * projected in its own select so the two `slice` references stay on
    * an attribute (CollapseProject only inlines non-cheap expressions
    * used once — the regex split runs exactly once per doc). */
  def bigramNll(spark: SparkSession, dir: String): DataFrame = {
    val n1 = greatest(size(col("ts")) - 1, lit(0))
    val bg = Tables.documents(spark, dir)
      .select(col("doc_id"), Dedup.tokens(col("text")).as("ts"))
      .select(col("doc_id"), explode(zip_with(
        slice(col("ts"), lit(1), n1), slice(col("ts"), lit(2), n1),
        (l, r) => struct(l.as("l"), r.as("r")))).as("p"))
      .select(col("doc_id"), col("p.l").as("l"), col("p.r").as("r"))
    val uni = bg.groupBy(col("l")).agg(count(lit(1)).as("cl"))
    val bic = bg.groupBy(col("l"), col("r")).agg(count(lit(1)).as("clr"))
    bg.join(bic, Seq("l", "r")).join(broadcast(uni), Seq("l"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log(col("clr") / col("cl"))), 6).as("mean_nll"))
      .withColumn("ppl", round(exp(col("mean_nll")), 6))
  }

  val bigramNllSql: String =
    s"""WITH t AS (SELECT doc_id, ${Dedup.tokensSql} AS ts FROM documents),
       |bg AS (
       |  SELECT doc_id, ts[i] AS l, ts[i + 1] AS r
       |  FROM t, unnest(generate_series(1, len(ts) - 1)) g(i)),
       |uni AS (SELECT l, count(*) AS cl FROM bg GROUP BY l),
       |bic AS (SELECT l, r, count(*) AS clr FROM bg GROUP BY l, r)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  round(avg(-ln(clr * 1.0 / cl)), 6) + 0 AS mean_nll,
       |  round(exp(round(avg(-ln(clr * 1.0 / cl)), 6)), 6) + 0 AS ppl
       |FROM bg JOIN bic USING (l, r) JOIN uni USING (l)
       |GROUP BY doc_id""".stripMargin

  // ---------------------------------------------------------------- unigram LM
  /** Unigram language-model scoring — the simplified CCNet-style LM
    * filter: fit P(token) on the corpus itself (one count aggregate),
    * score every doc by its mean token negative-log-likelihood. Docs far
    * above the corpus's typical NLL are gibberish or wrong-language;
    * far below are boilerplate. Two shuffles of token rows; the
    * probability table is vocab-sized (broadcast at any corpus scale —
    * vocabularies don't grow with corpus bytes). */
  def unigramNll(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
    // fit-then-fold: one-row corpus total folded back over the
    // vocab-sized count table — no driver action in the plan builder,
    // and no single-task window serializing the vocab
    val counts = tok.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("c_total"))
    val probs = counts.crossJoin(broadcast(total))
      .select(col("tok"), (col("c") / col("c_total")).as("p"))
    tok.join(broadcast(probs), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(-log(col("p"))), 6).as("mean_nll"))
  }

  val unigramNllSql: String =
    s"""WITH tr AS (
       |  SELECT doc_id, unnest(${Dedup.tokensSql}) AS tok FROM documents),
       |probs AS (
       |  SELECT tok, count(*) * 1.0 / (SELECT count(*) FROM tr) AS p
       |  FROM tr GROUP BY tok)
       |SELECT doc_id, count(*) AS n_tokens,
       |       round(avg(-ln(p)), 6) + 0 AS mean_nll
       |FROM tr JOIN probs USING (tok)
       |GROUP BY doc_id""".stripMargin

  // ---------------------------------------------------------------- PII scrub
  /** PII detection + redaction — the C4/Dolma scrub stage: emails, IPv4
    * addresses, and phone-shaped digit runs are counted and replaced
    * with typed placeholder tags. Pure per-row column expressions
    * (codegen'd `regexp_*`, zero shuffles — the 100 TB cost is exactly
    * one pass over the text bytes). The regexes stay inside the
    * RE2 ∩ java.util.regex common subset, so the DuckDB oracle runs the
    * SAME patterns — on the PII-free corpus fixture the oracle pins the
    * identity transform plus cross-engine regex agreement; the positive
    * path (real hits redacted) is pinned on a PII-bearing fixture in
    * `DedupSpec`-style spec tests. Counts are measured on the original
    * text; redaction applies email → IP → phone so a match is consumed
    * by its most specific class. */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipRe    = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private val phoneRe = "\\+?[0-9][0-9() -]{7,}[0-9]"

  /** Total PII hits in a `text` column — shared with the streaming
    * ingest gate ([[graft.streaming.CorpusIngest]]) so batch and stream
    * apply one definition of "contains PII". */
  def piiHitsCol: Column =
    size(regexp_extract_all(col("text"), lit(emailRe), lit(0))) +
      size(regexp_extract_all(col("text"), lit(ipRe), lit(0))) +
      size(regexp_extract_all(col("text"), lit(phoneRe), lit(0)))

  /** SQL mirror of [[piiHitsCol]] over a given text expression. */
  def piiHitsSql(textExpr: String): String =
    s"CAST(len(regexp_extract_all($textExpr, '$emailRe')) + " +
      s"len(regexp_extract_all($textExpr, '$ipRe')) + " +
      s"len(regexp_extract_all($textExpr, '$phoneRe')) AS INT)"

  /** The redacted text — email → IP → phone, shared batch/stream. */
  def piiCleanCol: Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), emailRe, "[EMAIL]"),
        ipRe, "[IP]"),
      phoneRe, "[PHONE]")

  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(emailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(ipRe), lit(0))).as("n_ips"),
      size(regexp_extract_all(col("text"), lit(phoneRe), lit(0))).as("n_phones"),
      piiCleanCol.as("clean_text"))

  val piiScrubSql: String =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$emailRe')) AS INT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$ipRe')) AS INT) AS n_ips,
       |  CAST(len(regexp_extract_all(text, '$phoneRe')) AS INT) AS n_phones,
       |  regexp_replace(
       |    regexp_replace(
       |      regexp_replace(text, '$emailRe', '[EMAIL]', 'g'),
       |      '$ipRe', '[IP]', 'g'),
       |    '$phoneRe', '[PHONE]', 'g') AS clean_text
       |FROM documents""".stripMargin

  // ---------------------------------------------------------------- BPE fit
  /** Tokenizer fitting — the first 4 merge steps of word-level BPE over
    * the corpus: per step, count adjacent token pairs (one hash
    * aggregate with map-side combine), pick the most frequent (tiny
    * top-1 to the driver — the same fit-loop shape as the RFE driver
    * loop), splice the winning pair into one unit, repeat. The merge
    * applies via delimiter-guarded string `replace` — leftmost
    * non-overlapping scan, the standard greedy-BPE approximation, with
    * IDENTICAL semantics in Spark and DuckDB so the oracle replays the
    * fit exactly. Ties break on (count desc, left, right). Tokens are
    * [a-z0-9]+ so the '_' joiner and ' ' delimiter never collide.
    * Output: the learned merge table (step, left_tok, right_tok,
    * n_pair). Adjacent pairs come from zipping the token array with its
    * tail — a pure map stage; the per-doc posexplode+lead window it
    * replaces paid an extra doc_id shuffle AND a sort per step. At
    * 100 TB each step is therefore ONE shuffle over pair rows; the
    * driver sees 4 single-row results. */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    DirMemo.getOrCompute(spark, "bpe_merges", dir)(bpeMergesImpl(spark, dir))

  /** Doc-count ceiling below which the BPE fit replays on the driver
    * instead of running 4 scheduled corpus jobs (r16 — the
    * [[GraphOps]] `DefaultDriverEdgeCap` pattern): each merge step's
    * distributed plan produces a SINGLE winning row, so at fixture
    * scale the per-step job scheduling + codegen is the whole query
    * (measured 1.27 s warm for 500 docs). 20k docs of the fixture
    * shape is ~20 MB of strings — well under any driver budget — while
    * a corpus OVER the cap is where the distributed loop's cost
    * amortizes. Injectable so the spec pins driver ≡ distributed. */
  private[graft] val DefaultBpeDriverDocCap = 20000

  private[graft] def bpeMergesImpl(spark: SparkSession, dir: String,
      driverDocCap: Int = DefaultBpeDriverDocCap): DataFrame = {
      import spark.implicits._
      val txt0 = Tables.documents(spark, dir).select(col("doc_id"),
        concat(lit(" "), concat_ws(" ", Dedup.tokens(col("text"))), lit(" ")).as("t"))
      // ADAPTIVE small-corpus path: collect the delimited token stream
      // once and replay the fit in memory with IDENTICAL semantics —
      // Java String.replace is the same leftmost non-overlapping scan
      // as the delimiter-guarded `replace` expression, the pair count /
      // (n desc, l, r) tie-break are order-insensitive, and tokens are
      // [a-z0-9]+ so binary and UTF-16 string orderings agree. The
      // oracle pins the equivalence on every fixture.
      val smallDocs = txt0.select(col("t")).limit(driverDocCap + 1).collect()
      if (smallDocs.length <= driverDocCap) {
        var texts = smallDocs.map(_.getString(0))
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
        for (step <- 1 to 4) {
          val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
          texts.foreach { t =>
            val ts = t.split(" ").filter(_.nonEmpty)
            var i = 0
            while (i < ts.length - 1) {
              val k = (ts(i), ts(i + 1))
              counts(k) = counts.getOrElse(k, 0L) + 1
              i += 1
            }
          }
          if (counts.isEmpty)
            return out.toSeq.toDF("step", "left_tok", "right_tok", "n_pair")
          val ((l, r), n) = counts.minBy { case ((l, r), n) => (-n, l, r) }
          out += ((step, l, r, n))
          if (step < 4)
            texts = texts.map(_.replace(s" $l $r ", s" ${l}_$r "))
        }
        return out.toSeq.toDF("step", "left_tok", "right_tok", "n_pair")
      }
      // distributed path (≥ cap): materialize the tokenized stream ONCE —
      // the fit loop's per-step plan otherwise re-runs the regexp
      // tokenizer over the corpus on every iteration (4 scans × regexp
      // split ≈ half the fit's cost); steps stack only the cheap
      // delimiter-guarded replaces on top of this checkpoint. At 100 TB
      // this is the same call pattern — one tokenize pass persisted, k
      // cheap merge passes over it.
      var txt = txt0.localCheckpoint()
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      for (step <- 1 to 4) {
        val toks = filter(split(col("t"), " "), x => x =!= "")
        val n1 = greatest(size(col("toks")) - 1, lit(0))
        val top = txt
          .select(toks.as("toks"))
          .select(explode(zip_with(
            slice(col("toks"), lit(1), n1), slice(col("toks"), lit(2), n1),
            (l, r) => struct(l.as("tok"), r.as("nx")))).as("p"))
          .groupBy(col("p.tok").as("tok"), col("p.nx").as("nx"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("tok"), col("nx"))
          .limit(1).collect()
        // an empty/single-token corpus has no adjacent pair to merge —
        // the learned table just ends early (bpeEncode folds zero merges)
        if (top.isEmpty) {
          return out.toSeq.toDF("step", "left_tok", "right_tok", "n_pair")
        }
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += ((step, l, r, n))
        txt = txt.withColumn("t",
          expr(s"replace(t, ' $l $r ', ' ${l}_$r ')"))
      }
      out.toSeq.toDF("step", "left_tok", "right_tok", "n_pair")
  }

  /** Tokenizer APPLY — encode every document with the merge table that
    * [[bpeMerges]] learned (memoized per (session, dir), so fit runs
    * once however many queries read it): the same delimiter-guarded
    * `replace` per merge step, in merge order, then per-doc stats —
    * pre-merge word count, post-merge token count, compression ratio,
    * and the head of the encoded stream for inspection. This is the
    * shape a 100 TB tokenize stage has: the merge table is a tiny
    * driver-side constant folded into the row expression (no join, no
    * shuffle — a pure map stage over documents). */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val merges = bpeMerges(spark, dir).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2)))
    var enc = Tables.documents(spark, dir).select(col("doc_id"),
      concat(lit(" "), concat_ws(" ", Dedup.tokens(col("text"))), lit(" ")).as("t"))
    merges.foreach { case (l, r) =>
      enc = enc.withColumn("t", expr(s"replace(t, ' $l $r ', ' ${l}_$r ')"))
    }
    enc
      .withColumn("toks", filter(split(col("t"), " "), x => x =!= ""))
      .select(col("doc_id"),
        size(filter(split(col("t"), "_| "), x => x =!= "")).as("n_words"),
        size(col("toks")).as("n_tokens"),
        size(filter(col("toks"), x => x.contains("_"))).as("n_merged"),
        round(size(col("toks")).cast("double") /
          greatest(size(filter(split(col("t"), "_| "), x => x =!= "")), lit(1)), 6)
          .as("ratio"),
        substring(trim(col("t")), 1, 80).as("head"))
  }

  /** The shared 4-step fit CTE chain: `m0` is the space-delimited word
    * stream, `tok$k`/`cnt$k`/`top$k` replay step k's pair count and
    * winner, `m4` is the fully-encoded stream. Opened by both the
    * `text_bpe_merges` and `text_bpe_encode` oracles. */
  private val bpeChainSql: String = {
    def stage(k: Int): String =
      s"""tok$k AS (
         |  SELECT doc_id, list_filter(string_split(t, ' '), x -> x <> '') AS ts FROM m$k),
         |cnt$k AS (
         |  SELECT l, r, count(*) AS n FROM (
         |    SELECT ts[i] AS l, ts[i+1] AS r
         |    FROM tok$k, unnest(generate_series(1, len(ts) - 1)) AS g(i))
         |  GROUP BY l, r),
         |top$k AS (SELECT l, r, n FROM cnt$k ORDER BY n DESC, l, r LIMIT 1),
         |m${k + 1} AS (
         |  SELECT doc_id,
         |         replace(t, ' ' || tp.l || ' ' || tp.r || ' ',
         |                    ' ' || tp.l || '_' || tp.r || ' ') AS t
         |  FROM m$k, top$k tp)""".stripMargin
    s"""m0 AS (
       |  SELECT doc_id, ' ' || array_to_string(${Dedup.tokensSql}, ' ') || ' ' AS t
       |  FROM documents),
       |${stage(0)},
       |${stage(1)},
       |${stage(2)},
       |${stage(3)}""".stripMargin
  }

  val bpeMergesSql: String =
    s"""WITH $bpeChainSql
       |SELECT 1 AS step, l AS left_tok, r AS right_tok, n AS n_pair FROM top0
       |UNION ALL SELECT 2, l, r, n FROM top1
       |UNION ALL SELECT 3, l, r, n FROM top2
       |UNION ALL SELECT 4, l, r, n FROM top3""".stripMargin

  val bpeEncodeSql: String =
    s"""WITH $bpeChainSql
       |SELECT m.doc_id,
       |  len(t0.ts) AS n_words,
       |  len(list_filter(string_split(m.t, ' '), x -> x <> '')) AS n_tokens,
       |  len(list_filter(string_split(m.t, ' '),
       |      x -> x <> '' AND contains(x, '_'))) AS n_merged,
       |  round(len(list_filter(string_split(m.t, ' '), x -> x <> '')) * 1.0
       |        / greatest(len(t0.ts), 1), 6) + 0 AS ratio,
       |  substr(trim(m.t), 1, 80) AS head
       |FROM m4 m JOIN tok0 t0 USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------- zipf
  /** Zipf profile per language — the corpus-naturalness census: natural
    * text follows freq ∝ rank^s with s ≈ −1, and machine-generated /
    * keyword-stuffed text bends the log-log head away from it, so the
    * fitted head slope plus the hapax ratio (singleton-vocab share) is
    * a cheap per-slice quality gate over the whole corpus.
    *
    * Scale shape: one token-count aggregate (map-side combine absorbs
    * heavy tokens), then everything downstream runs on the VOCAB-sized
    * frame — the per-lang rank window and the 200-term OLS never touch
    * corpus-sized data. Slope is closed-form least squares of ln(freq)
    * on ln(rank) over the head (top 200 ranks — the standard fit range;
    * the tail's count quantization flattens it). */
  def textZipf(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(col("lang"), explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("cnt"))
    val stats = counts.groupBy(col("lang")).agg(
      sum(col("cnt")).as("n_tokens"),
      count(lit(1)).as("vocab"),
      sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("hapax"))
    val ranked = counts
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("tok"))))
      .filter(col("rank") <= 200)
      .select(col("lang"), log(col("rank")).as("x"), log(col("cnt")).as("y"))
    // floor(x*1e6+0.5)/1e6, not round(): hapax/vocab is a small-integer
    // ratio that can land exactly on a .5 at the 6th decimal, the
    // HALF_UP/half-to-even divergence class (see w38/w39)
    def r6(c: Column) = floor(c * 1e6 + 0.5) / 1e6
    val fit = ranked.groupBy(col("lang")).agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
      .select(col("lang"),
        when(col("n") >= 2,
          r6((col("n") * col("sxy") - col("sx") * col("sy"))
            / (col("n") * col("sxx") - col("sx") * col("sx"))))
          .as("zipf_slope"))
    stats.join(fit, "lang")
      .select(col("lang"), col("n_tokens"), col("vocab"),
        r6(col("hapax").cast("double") / col("vocab")).as("hapax_ratio"),
        col("zipf_slope"))
  }

  val textZipfSql: String =
    s"""WITH ztoks AS (
       |  SELECT lang, unnest(${Dedup.tokensSql}) AS tok FROM documents),
       |zcounts AS (SELECT lang, tok, count(*) AS cnt FROM ztoks GROUP BY 1, 2),
       |zstats AS (
       |  SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_tokens,
       |         count(*) AS vocab,
       |         CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
       |  FROM zcounts GROUP BY lang),
       |zranked AS (
       |  SELECT lang, ln(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok)) AS x,
       |         ln(cnt) AS y,
       |         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS rank
       |  FROM zcounts QUALIFY rank <= 200),
       |zfit AS (
       |  SELECT lang, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
       |         sum(x * x) AS sxx, sum(x * y) AS sxy
       |  FROM zranked GROUP BY lang)
       |SELECT s.lang, s.n_tokens, s.vocab,
       |       floor(s.hapax * 1.0 / s.vocab * 1e6 + 0.5) / 1e6 AS hapax_ratio,
       |       CASE WHEN f.n >= 2 THEN
       |         floor((f.n * f.sxy - f.sx * f.sy)
       |               / (f.n * f.sxx - f.sx * f.sx) * 1e6 + 0.5) / 1e6 END AS zipf_slope
       |FROM zstats s JOIN zfit f ON f.lang = s.lang""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_zipf"        -> (textZipf _),
    "text_pii_scrub"   -> (piiScrub _),
    "text_bpe_merges"  -> (bpeMerges _),
    "text_bpe_encode"  -> (bpeEncode _),
    "text_lang_id"     -> (langId _),
    "text_quality"     -> (qualityScore _),
    "text_token_count" -> (tokenCount _),
    "text_fingerprint" -> (fingerprint _),
    "text_vocab_oov"   -> (vocabOov _),
    "text_unigram_nll" -> (unigramNll _),
    "text_bigram_nll"  -> (bigramNll _),
    "text_quality_adaptive" -> (qualityAdaptive _))

  def oracles: Map[String, String] = Map(
    "text_zipf"        -> textZipfSql,
    "text_pii_scrub"   -> piiScrubSql,
    "text_bpe_merges"  -> bpeMergesSql,
    "text_bpe_encode"  -> bpeEncodeSql,
    "text_lang_id"     -> langIdSql,
    "text_quality"     -> qualityScoreSql,
    "text_token_count" -> tokenCountSql,
    "text_fingerprint" -> fingerprintSql,
    "text_vocab_oov"   -> vocabOovSql,
    "text_unigram_nll" -> unigramNllSql,
    "text_bigram_nll"  -> bigramNllSql,
    "text_quality_adaptive" -> qualityAdaptiveSql)
}
