package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming corpus ingest end-to-end: in-watermark exact duplicates are
  * dropped, the quality gate filters, and the surviving scores equal the
  * batch formula on the same text. */
class CorpusIngestSpec extends SparkSpec {

  private def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)

  test("ingest dedups within the watermark and applies the batch quality gate") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val good = "the quick brown fox jumps over the lazy dog and runs on for " +
      "a while with many of the common stopwords in a long enough sentence " +
      "to clear the length score threshold of the quality formula easily " +
      "and then some more words for good measure in the end of the text"
    val junk = "!!! ??? ### 12345 67890 !!! ??? ### 12345 67890"
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = CorpusIngest.ingest(mem.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("ingest_t")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, good, ts(0)), (2L, good, ts(10)), (3L, junk, ts(20)),
        (4L, good + " extra", ts(30)))
      q.processAllAvailable()
      // advance the watermark so the dedup state flushes and rows emit
      mem.addData((5L, "late watermark pusher text", ts(400)))
      q.processAllAvailable()
      val out = spark.table("ingest_t").orderBy("doc_id").collect()
      val ids = out.map(_.getAs[Long]("doc_id")).toSet
      assert(ids.contains(1L), "first copy must survive")
      assert(!ids.contains(2L), "in-watermark exact duplicate must be dropped")
      assert(!ids.contains(3L), "junk doc must fail the quality gate")
      assert(ids.contains(4L), "near-but-not-exact text is NOT exact-deduped")
      // score equals the batch formula on the same text
      val streamed = out.find(_.getAs[Long]("doc_id") == 1L).get
        .getAs[Double]("quality_score")
      val batch = Seq(good).toDF("text")
        .select(round(graft.scale.TextAnalysis.qualityScoreCol, 6).as("s"))
        .collect().head.getDouble(0)
      assert(streamed == batch, s"stream $streamed vs batch $batch")
    } finally q.stop()
  }

  test("ingest scrubs PII with the batch redaction expressions") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val leaky = "please reach the owner at alice@example.com for all of " +
      "the details on this and mention the host 10.0.0.7 in the report " +
      "which is a long enough sentence with plenty of the stopwords to " +
      "clear the quality gate of the ingest and then some more words on the end"
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = CorpusIngest.ingest(mem.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("ingest_pii")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, leaky, ts(0)))
      mem.addData((9L, "late watermark pusher text", ts(400)))
      q.processAllAvailable()
      val row = spark.table("ingest_pii").filter(col("doc_id") === 1L).collect().head
      assert(row.getAs[Int]("n_pii") == 2)
      val clean = row.getAs[String]("clean_text")
      assert(clean.contains("[EMAIL]") && clean.contains("[IP]"))
      assert(!clean.contains("alice@example.com") && !clean.contains("10.0.0.7"))
    } finally q.stop()
  }

  test("streaming the real corpus reproduces the batch curation to zero diff") {
    // BATCH-EQUIVALENCE: every document of the real table flows through
    // the streaming ingest inside one watermark window, and the output
    // multiset must equal the batch composition of the same stages
    // (exact dedup, quality gate, PII scrub). Compared on content_hash
    // rather than doc_id: batch keep-lowest vs streaming keep-first
    // pick the same GROUP either way, and every derived column comes
    // from the (identical) text.
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = 1700000000000L
    val rows = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        new java.sql.Timestamp(base + (r.getLong(0) % 60) * 1000)))
    assert(rows.length > 100, "fixture must exercise the stream meaningfully")
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = CorpusIngest.ingest(mem.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("ingest_equiv")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(rows.toSeq: _*)
      q.processAllAvailable()
      mem.addData((-1L, "late watermark pusher text",
        new java.sql.Timestamp(base + 600 * 1000)))
      q.processAllAvailable()
      val picked = Seq("content_hash", "n_tokens", "quality_score",
        "quality_bucket", "n_pii", "clean_text")
      val streamed = spark.table("ingest_equiv")
        .filter(col("doc_id") >= 0)
        .select(picked.map(col): _*)
      val t = graft.scale.TextAnalysis
      val batch = graft.Tables.documents(spark, sfDir)
        .withColumn("content_hash", md5(col("text").cast("binary")))
        .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("content_hash")).orderBy(col("doc_id"))))
        .filter(col("rk") === 1)
        .withColumn("quality_score", round(t.qualityScoreCol, 6))
        .filter(col("quality_score") >= 0.4)
        .select(col("content_hash"),
          size(graft.scale.Dedup.tokens(col("text"))).as("n_tokens"),
          col("quality_score"),
          when(col("quality_score") >= 0.7, "keep").otherwise("flag")
            .as("quality_bucket"),
          t.piiHitsCol.as("n_pii"), t.piiCleanCol.as("clean_text"))
      assert(streamed.count() == batch.count(), "same survivor count")
      assert(streamed.exceptAll(batch).count() == 0 &&
        batch.exceptAll(streamed).count() == 0, "curated rows must match exactly")
    } finally q.stop()
  }
}
