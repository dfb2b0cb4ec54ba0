package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for per-(dir) derived indexes that multiple
  * registered queries read (cluster labels, the shingle-row index, ANN
  * ground truth): driver-side actions or cache() boundaries make
  * Spark's plan cache unable to deduplicate the repeat work by itself.
  *
  * The session key is WEAK and the DataFrame value SOFT (a DataFrame
  * strongly references its session, so a strong value would pin the
  * weak key forever): a dead session's entries are collectible, memory
  * pressure evicts, and the memo recomputes on miss. [[invalidateDir]]
  * drops every index derived from a dir when the data under it changes
  * mid-session. */
private[graft] object DirMemo {
  private val memo = new java.util.WeakHashMap[SparkSession,
    scala.collection.mutable.Map[(String, String), java.lang.ref.SoftReference[DataFrame]]]()

  def getOrCompute(spark: SparkSession, tag: String, dir: String)
                  (f: => DataFrame): DataFrame = memo.synchronized {
    val m = memo.computeIfAbsent(spark, _ => scala.collection.mutable.Map.empty)
    m.get((tag, dir)).flatMap(r => Option(r.get())).getOrElse {
      val df = f
      m((tag, dir)) = new java.lang.ref.SoftReference(df)
      df
    }
  }

  /** Drop every memoized index derived from `dir` (all sessions, all
    * tags) — call after rewriting the data under it. */
  def invalidateDir(dir: String): Unit = memo.synchronized {
    memo.values.forEach { m =>
      m.keys.filter(_._2 == dir).toList.foreach { k =>
        m.remove(k).flatMap(r => Option(r.get())).foreach(_.unpersist())
      }
    }
  }
}
