package graft

import org.apache.spark.sql.SparkSession

/** Shared dirty-price fixture: 30 hourly bars for one key with a
  * zero-price bar in the middle (bar 5's last event has value 0, so its
  * candle closes at 0 with low 0) — the sf0.1 defect class (events with
  * `value = 0` feeding [[Tables.candles]]) reproduced at spec scale.
  * Written once per JVM as an `events.parquet` any `Tables.candles`
  * consumer can read, so the zero-price rule is asserted against the
  * REAL scan path, not a hand-built DataFrame. */
object ZeroBarFixture {
  val uid = 7L
  val baseMs: Long = 1700000000000L - (1700000000000L % 3600000L)

  /** (hour index, minute, value); bar 5's last event is value 0. */
  val events: Seq[(Int, Int, Double)] =
    (0 until 30).flatMap { i =>
      val v = 100.0 + i
      if (i == 5) Seq((i, 0, v), (i, 20, v + 2.0), (i, 40, 0.0))
      else Seq((i, 0, v), (i, 20, v + 2.0), (i, 40, v - 1.0))
    }

  /** Locally derived OHLC per bar: (bucketMs, open, high, low, close). */
  val bars: Seq[(Long, Double, Double, Double, Double)] =
    (0 until 30).map { i =>
      val e = events.filter(_._1 == i).sortBy(_._2)
      val vs = e.map(_._3)
      (baseMs + i * 3600000L, e.head._3, vs.max, vs.min, e.last._3)
    }

  @volatile private var written: Option[String] = None
  def dir(spark: SparkSession): String = synchronized {
    // self-heal: the memoized dir is Scratch-registered, so an
    // in-process registry sweep (or any external deletion) must
    // trigger a rewrite, not poison every later consumer in the JVM
    written.filter(d => new java.io.File(s"$d/events.parquet").exists()).getOrElse {
      import spark.implicits._
      // pinned: a live cross-suite memo — an in-process cleanupNow()
      // must not delete it mid-session (belt next to the self-heal
      // braces above; the exit hook still removes it)
      val d = graft.util.Scratch.pin(graft.util.Scratch.register(
        java.nio.file.Files.createTempDirectory("graft_zerobar").toString))
      // full sf-events schema so EVERY events consumer (event_id-ordered
      // segmented windows, event_type-gated ffill) runs over the fixture,
      // not only the candle path; event_type alternates so the sparse
      // purchase series w26 forward-fills actually has gaps
      events.zipWithIndex.map { case ((i, m, v), n) =>
        (n.toLong, new java.sql.Timestamp(baseMs + i * 3600000L + m * 60000L),
          uid, if (n % 3 == 0) "purchase" else "view", v, s"""{"k": $n}""")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$d/events.parquet")
      written = Some(d)
      d
    }
  }
}
