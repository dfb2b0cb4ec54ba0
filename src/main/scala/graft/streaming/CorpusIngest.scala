package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming corpus ingest — the training-data counterpart of the FOREX
  * channels: raw documents arrive as a stream and pass the same curation
  * stages the batch engine runs, online.
  *
  *  - exact dedup = `dropDuplicatesWithinWatermark` on the content hash:
  *    state is bounded by the watermark window (per-partition hash set of
  *    one window, never the corpus — the corpus-scale backstop is the
  *    daily [[graft.scale.Dedup.dedupIncremental]] batch);
  *  - quality gate = the SAME score expression as the batch query
  *    ([[graft.scale.TextAnalysis.qualityScoreCol]]), dropping
  *    `score < 0.4` docs and tagging the rest keep/flag;
  *  - PII scrub = the SAME redaction expressions as the batch query
  *    ([[graft.scale.TextAnalysis.piiCleanCol]]) — surviving docs emit
  *    redacted text plus the hit count.
  *
  * Emits one curated row per surviving doc (append mode — every row is
  * final once the watermark passes).
  */
object CorpusIngest {

  private def nTokens: Column = size(graft.scale.Dedup.tokens(col("text")))

  /** docs: streaming DataFrame with (doc_id long, text string, ts
    * timestamp). Returns the curated append stream. */
  def ingest(docs: DataFrame): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text").cast("binary")))
      .withWatermark("ts", "2 minutes")
      .dropDuplicatesWithinWatermark("content_hash")
      .withColumn("quality_score", round(graft.scale.TextAnalysis.qualityScoreCol, 6))
      .filter(col("quality_score") >= 0.4)
      .select(col("doc_id"), col("ts"), col("content_hash"),
        nTokens.as("n_tokens"), col("quality_score"),
        when(col("quality_score") >= 0.7, "keep").otherwise("flag").as("quality_bucket"),
        graft.scale.TextAnalysis.piiHitsCol.as("n_pii"),
        graft.scale.TextAnalysis.piiCleanCol.as("clean_text"))
}
