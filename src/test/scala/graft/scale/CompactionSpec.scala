package graft.scale

import graft.SparkSpec

/** The physical half of the `ann_ivf2_compact` contract (the oracle
  * checks content): compaction reduces the append-table's file count
  * to the byte-derived target while leaving every row untouched, and
  * the staleness census derives the documented freeze-caveat rule. */
class CompactionSpec extends SparkSpec {

  private def partFiles(path: String): Seq[java.io.File] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .toSeq

  test("compaction drops the file count and preserves content exactly") {
    val compacted = Similarity.annIvf2Compact(spark, sfDir) // writes src then dst
    val src = graft.util.Scratch.registeredPaths.find(_.contains("graft_ivf2append_")).get
    val dst = graft.util.Scratch.registeredPaths.find(_.contains("graft_ivf2compact_")).get
    val before = partFiles(src)
    val after = partFiles(dst)
    // two write jobs (day-0 overwrite + batch append) leave more files
    // than the single bin-packed rewrite
    assert(before.size > after.size,
      s"expected compaction to reduce files, got ${before.size} -> ${after.size}")
    // fixture table is far below one 128 MB target file
    assert(after.size == 1, s"expected 1 target-sized file, got ${after.size}")
    // row-for-row identical content, both directions
    val appended = Similarity.annIvf2Append(spark, sfDir)
    assert(compacted.count() == appended.count())
    assert(compacted.exceptAll(appended).isEmpty &&
      appended.exceptAll(compacted).isEmpty,
      "compaction must not change a single row")
  }

  test("staleness census flags rebuild exactly when n outgrows the frozen schedule") {
    val rows = Similarity.annIvf2Staleness(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("current", "projected_3x"))
    val n = Similarity.corpusCount(spark, sfDir)
    val kBuilt = Similarity.ivfSchedule(n * 9 / 10).toLong
    Seq("current" -> n, "projected_3x" -> 3 * n).foreach { case (s, nn) =>
      val r = rows(s)
      assert(r.getLong(1) == nn && r.getLong(2) == kBuilt)
      assert(r.getLong(3) == 256L * kBuilt)
      assert(r.getBoolean(4) == (nn > 256L * kBuilt),
        s"$s: rebuild flag must equal n > 256*k")
    }
    // the census exists to catch growth: a corpus 3x past the day-0
    // schedule on the sf0.001 fixture (500 vectors, k_built for 450 =
    // 16, capacity 4096) stays inside capacity — verify the flag flips
    // where the rule says it must, at capacity + 1
    assert(!(256L * kBuilt >= 3 * n) || !rows("projected_3x").getBoolean(4))
    assert(Similarity.ivfSchedule(256L * kBuilt) == kBuilt.toInt &&
      Similarity.ivfSchedule(256L * kBuilt + 1) > kBuilt.toInt,
      "schedule boundary must sit exactly at 256*k")
  }
}
