package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for per-(dir) derived indexes that multiple
  * registered queries read (cluster labels, the shingle-row index, ANN
  * ground truth): driver-side actions or cache() boundaries make
  * Spark's plan cache unable to deduplicate the repeat work by itself.
  *
  * Entries are STRONG references, evicted only by [[invalidateDir]] (or
  * [[clearAll]]). Round 4 held them as SoftReferences and heap pressure
  * silently collected memoized frames mid-run: the localCheckpoint
  * blocks were GC-cleaned with the DataFrame and the index re-paid
  * non-deterministically, corrupting per-query bench attribution
  * (er_golden measured 3.2 s warm vs 0.5 s cold). The memo is bounded
  * by (#tags × #dirs) small checkpointed frames — index- not
  * corpus-sized — so deterministic retention is the right trade; a
  * checkpoint's blocks are MEMORY_AND_DISK and spill under pressure
  * without losing the frame. */
private[graft] object DirMemo {
  private val memo =
    scala.collection.mutable.Map.empty[(SparkSession, String, String), DataFrame]

  def getOrCompute(spark: SparkSession, tag: String, dir: String)
                  (f: => DataFrame): DataFrame = memo.synchronized {
    memo.getOrElseUpdate((spark, tag, dir), f)
  }

  /** Drop every memoized index derived from `dir` (all sessions, all
    * tags) — call after rewriting the data under it. */
  def invalidateDir(dir: String): Unit = memo.synchronized {
    memo.keys.filter(_._3 == dir).toList.foreach { k =>
      memo.remove(k).foreach(_.unpersist())
    }
  }

  /** Drop everything — for tests that cycle many sessions in one JVM. */
  def clearAll(): Unit = memo.synchronized {
    memo.keys.toList.foreach(k => memo.remove(k).foreach(_.unpersist()))
  }
}
