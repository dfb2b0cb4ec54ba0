package graft

import org.apache.spark.sql.functions.col

/** Degenerate-input sweep: EVERY registered query must execute (not
  * necessarily return rows) against a fully EMPTY corpus — 0-row tables
  * with the production schemas. At scale, empty partitions, empty date
  * ranges, and empty tenants are routine; a fit that crashes on them
  * (`collect()(0)`, `.head` on an empty aggregate, schema inference
  * over a data-less write) takes the whole pipeline down. Round 5
  * found and fixed six such crashes (BPE fit, PCA fit, INT8 quantize
  * stats, PDP moments row, K3 read-back inference); this sweep keeps
  * the invariant. */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val tmp = graft.util.Scratch.register(java.nio.file.Files.createTempDirectory("graft-empty").toString)
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .filter(org.apache.spark.sql.functions.lit(false))
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    tmp
  }

  test("every query executes against 0-row tables (no fit crashes on empty)") {
    // fresh caches: memos and CacheManager entries from other suites are
    // keyed by plan, not dir, only for cache(); DirMemo keys by dir so
    // the empty dir computes its own
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(80)}")
        }
    }
    assert(failures.isEmpty, "queries crashing on empty input:\n  " +
      failures.mkString("\n  "))
  }

  test("an empty write round-trips with its declared schema") {
    val out = sources.Sinks.k3IndicatorRoundtrip(spark, emptyDir)
    assert(out.count() == 0)
    assert(out.columns.toSeq ==
      Seq("user_id", "day", "n_candles", "avg_close", "max_high", "min_low"))
    assert(out.filter(col("n_candles").isNotNull).count() == 0)
  }
}
