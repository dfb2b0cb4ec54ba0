package graft.scale

import graft.SparkSpec

/** PII scrub positive path: the sf corpus contains no PII by
  * construction (the oracle there pins the identity transform and
  * cross-engine regex agreement), so the actual detection + redaction
  * semantics are pinned here on a PII-bearing fixture. */
class TextAnalysisSpec extends SparkSpec {

  test("BPE fit learns merges greedily with deterministic tie-breaks") {
    import spark.implicits._
    val tmp = graft.util.Scratch.register(java.nio.file.Files.createTempDirectory("graft-bpe").toString)
    Seq(
      (1L, "x y x y x y", "en", "web", 11L),
      (2L, "x y z", "en", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.bpeMerges(spark, tmp).collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    // step 1: (x, y) wins with 4 occurrences (3 in doc1, 1 in doc2).
    // The greedy scan consumes shared delimiters, so doc1
    // " x y x y x y " merges its 1st and 3rd pairs: " x_y x y x_y "
    assert(out(1) == (("x", "y", 4L)))
    // step 2: every remaining pair counts 1 — (x, y) wins the
    // lexicographic tie-break and doc1 becomes " x_y x_y x_y "
    assert(out(2) == (("x", "y", 1L)))
    // step 3: (x_y, x_y) now counts 2; greedy merge → " x_y_x_y x_y "
    assert(out(3) == (("x_y", "x_y", 2L)))
    // step 4: (x_y, z) and (x_y_x_y, x_y) tie at 1 — left-asc breaks it
    assert(out(4) == (("x_y", "z", 1L)))
  }

  test("BPE fit: driver replay ≡ distributed loop (r16 adaptive path)") {
    // the r16 small-corpus driver path must learn the IDENTICAL merge
    // table (counts, tie-breaks, splices) as the distributed loop —
    // same contract as the graph loops' driverEdgeCap. Forced via the
    // injectable cap on the real sf0.001 corpus.
    val driver = TextAnalysis.bpeMergesImpl(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val dist = TextAnalysis.bpeMergesImpl(spark, sfDir, driverDocCap = 0).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(driver.nonEmpty && driver == dist)
  }

  test("BPE encode applies the fitted merges and reports compression") {
    import spark.implicits._
    val tmp = graft.util.Scratch.register(java.nio.file.Files.createTempDirectory("graft-bpe-enc").toString)
    Seq(
      (1L, "x y x y x y", "en", "web", 11L),
      (2L, "x y z", "en", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.bpeEncode(spark, tmp).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4), r.getString(5)))).toMap
    // after the 4 fitted merges (see the fit spec): doc1 " x_y_x_y x_y "
    // doc2 " x_y_z " — encode replays them in order on the raw stream
    assert(out(1L) == ((6, 2, 2, 0.333333, "x_y_x_y x_y")))
    assert(out(2L) == ((3, 1, 1, 0.333333, "x_y_z")))
  }

  test("PII scrub counts and redacts emails, IPs, and phone numbers") {
    import spark.implicits._
    val tmp = graft.util.Scratch.register(java.nio.file.Files.createTempDirectory("graft-pii").toString)
    Seq(
      (1L, "contact alice.smith+spam@example-corp.io or bob@mail.co today", "en", "web", 60L),
      (2L, "server at 192.168.0.1 answered; backup at 10.0.0.254 did not", "en", "web", 60L),
      (3L, "call +1 (555) 123-4567 now", "en", "web", 30L),
      (4L, "nothing sensitive here at all", "en", "web", 29L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.piiScrub(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    assert(out(1L) == ((2, 0, 0, "contact [EMAIL] or [EMAIL] today")))
    assert(out(2L) == ((0, 2, 0, "server at [IP] answered; backup at [IP] did not")))
    assert(out(3L) == ((0, 0, 1, "call [PHONE] now")))
    assert(out(4L) == ((0, 0, 0, "nothing sensitive here at all")))
  }
}
