package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming channels driven end-to-end with MemoryStream → memory sink:
  * candle aggregation vs its batch equivalent, ring-buffer features vs
  * direct computation, signal derivation. */
class ChannelsSpec extends SparkSpec {

  private def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)

  test("streaming 1-minute candles match the batch aggregation of the same ticks") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val ticks = Channels.decorateTicks(
      mem.toDF().toDF("timestamp", "value"))
    val q = Channels.candleStream(ticks)
      .writeStream.format("memory").queryName("candles_t")
      .outputMode(OutputMode.Complete()).start()
    try {
      val data = (0L until 300L).map(i => (ts(i), i))
      mem.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.table("candles_t")
        .orderBy("bucket", "symbol").collect()
      val batch = Channels.decorateTicks(data.toDF("timestamp", "value"))
        .groupBy(window(col("ts"), "1 minute").as("w"), col("symbol"))
        .agg(min_by(col("mid"), col("ts")).as("open"), max(col("mid")).as("high"),
          min(col("mid")).as("low"), max_by(col("mid"), col("ts")).as("close"),
          count(lit(1)).as("n_ticks"), avg(col("spread")).as("avg_spread"))
        .select(col("w.start").as("bucket"), col("symbol"), col("open"), col("high"),
          col("low"), col("close"), col("n_ticks"), col("avg_spread"))
        .orderBy("bucket", "symbol").collect()
      assert(streamed.length == batch.length && streamed.length >= 15) // 5 min × 3 symbols
      streamed.zip(batch).foreach { case (s, b) =>
        assert(s.getTimestamp(0) == b.getTimestamp(0) && s.getString(1) == b.getString(1))
        // doubles: streaming partial-agg summation order differs by ulps
        (2 to 5).foreach(i => assert(math.abs(s.getDouble(i) - b.getDouble(i)) < 1e-12))
        assert(s.getLong(6) == b.getLong(6))
        assert(math.abs(s.getDouble(7) - b.getDouble(7)) < 1e-12)
      }
    } finally q.stop()
  }

  test("ring-buffer feature stream computes trailing SMAs per symbol") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val ticks = Channels.decorateTicks(mem.toDF().toDF("timestamp", "value"))
    val q = Channels.featureStream(spark, ticks)
      .writeStream.format("memory").queryName("features_t")
      .outputMode(OutputMode.Append()).start()
    try {
      // two batches to exercise state carry-over
      mem.addData((0L until 90L).map(i => (ts(i), i)): _*)
      q.processAllAvailable()
      mem.addData((90L until 120L).map(i => (ts(i), i)): _*)
      q.processAllAvailable()
      val rows = spark.table("features_t").orderBy("symbol", "ts").collect()
      assert(rows.length == 120)
      // recompute per symbol directly
      val bySym = rows.groupBy(_.getString(0))
      assert(bySym.keySet == Set("PAIR0", "PAIR1", "PAIR2"))
      bySym.foreach { case (_, rs) =>
        val mids = rs.map(_.getDouble(6))
        rs.zipWithIndex.foreach { case (r, i) =>
          assert(r.getInt(2) == math.min(i + 1, 100)) // n_ticks in buffer
          if (i >= 4) {
            val exp = mids.slice(i - 4, i + 1).sum / 5
            assert(math.abs(r.getDouble(3) - exp) < 1e-12, s"sma5 at $i")
          } else assert(r.getDouble(3).isNaN)
          // T3 envelope extras: target from RSI bands, confidence in
          // [0,1], normalized vector bounded in [0,1] once warm
          assert(Set(0, 1, 2).contains(r.getInt(10)))
          assert(r.getDouble(11) >= 0.0 && r.getDouble(11) <= 1.0)
          val norm = r.getSeq[Double](12)
          if (i >= 19) assert(norm.nonEmpty && norm.forall(v => v >= 0.0 && v <= 1.0))
        }
      }
    } finally q.stop()
  }

  test("signal stream derives buy/sell/hold with stop-loss offsets") {
    import spark.implicits._
    val feats = Seq(
      ("PAIR0", ts(0), 25.0, 1.08, 1.10),  // rsi<30, mid<sma20 -> buy
      ("PAIR0", ts(1), 75.0, 1.12, 1.10),  // rsi>70, mid>sma20 -> sell
      ("PAIR0", ts(2), 50.0, 1.10, 1.10))  // hold
      .toDF("symbol", "ts", "rsi_14", "mid", "sma_20")
    val out = Channels.signalStream(feats).orderBy("ts").collect()
    assert(out.map(_.getString(3)).toSeq == Seq("buy", "sell", "hold"))
    assert(math.abs(out(0).getDouble(4) - (1.08 - 0.0010)) < 1e-12)
    assert(math.abs(out(1).getDouble(5) - (1.12 - 0.0020)) < 1e-12)
    assert(out(2).isNullAt(4))
  }

  test("T7/T8 per-client fan-out: stream-static join delivers only to subscribed clients") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val subs = Subscriptions.subscriptionTable(spark, sfDir)
      .filter(col("channel") === "raw_ticks")
      .cache()
    val nSubs = subs.count()
    assert(nSubs > 0, "fixture should subscribe some clients to raw_ticks")
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val ticks = Channels.decorateTicks(mem.toDF().toDF("timestamp", "value"))
      .withColumn("channel", lit("raw_ticks"))
    val q = ticks.join(subs, Seq("channel")) // stream-static join = the fan-out
      .select(col("client_id"), col("tier"), col("rate_limit_msg_s"), col("symbol"), col("mid"))
      .writeStream.format("memory").queryName("fanout_t")
      .outputMode(OutputMode.Append()).start()
    try {
      val data = (0L until 30L).map(i => (ts(i), i))
      mem.addData(data: _*)
      q.processAllAvailable()
      val delivered = spark.table("fanout_t")
      assert(delivered.count() == 30L * nSubs, "every subscriber gets every message")
      val badClients = delivered.select("client_id").distinct()
        .join(subs.select("client_id").distinct(), Seq("client_id"), "left_anti").count()
      assert(badClients == 0, "no deliveries to unsubscribed clients")
      // tier budgets rank premium > professional > retail
      val budgets = delivered.select("tier", "rate_limit_msg_s").distinct()
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      budgets.get("premium").foreach(b => assert(b == 1000))
      budgets.get("retail").foreach(b => assert(b == 10))
    } finally q.stop()
  }

  test("T9 restore: feature stream restarts from checkpoint with state intact, no loss or duplication") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val ckpt = graft.util.Scratch.register(java.nio.file.Files.createTempDirectory("graft_ckpt").toString)
    val out = graft.util.Scratch.register(java.nio.file.Files.createTempDirectory("graft_restore").toString) + "/features"
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    // file sink: the exactly-once recoverable path (memory sink is not
    // fault tolerant across restarts)
    def start() = Channels.featureStream(spark,
        Channels.decorateTicks(mem.toDF().toDF("timestamp", "value")))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    // first incarnation: 60 ticks, then stop (simulated failure)
    val q1 = start()
    try { mem.addData((0L until 60L).map(i => (ts(i), i)): _*); q1.processAllAvailable() }
    finally q1.stop()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst == 60, s"first run should emit 60 feature rows, got $afterFirst")
    // second incarnation restores ring-buffer state from the checkpoint
    mem.addData((60L until 120L).map(i => (ts(i), i)): _*)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val rows = spark.read.parquet(out)
      assert(rows.count() == 120, "restart must deliver exactly the missed ticks once")
      // state carried across the restart: the last PAIR2 tick has seen 40
      // ticks of its symbol (120/3), not just the post-restart ones
      val lastN = rows.filter(col("symbol") === "PAIR2").orderBy(col("ts").desc)
        .select(col("n_ticks")).head().getInt(0)
      assert(lastN == 40, s"ring state should survive restart (expected 40 ticks seen, got $lastN)")
    } finally q2.stop()
  }

  test("channel registry covers the reference's 8 channels") {
    assert(Channels.channelTriggers.size == 8)
    assert(Channels.channelTriggers.contains("raw_ticks"))
  }

  test("order book synthesizes decaying side-skewed depth with bounded imbalance") {
    import spark.implicits._
    val ticks = Channels.decorateTicks(
      (0L until 30L).map(i => (ts(i), i)).toDF("timestamp", "value"))
    val book = Channels.orderBookStream(ticks, depth = 5).collect()
    assert(book.length == 30)
    book.foreach { r =>
      val bids = r.getSeq[org.apache.spark.sql.Row](4)
      val asks = r.getSeq[org.apache.spark.sql.Row](5)
      assert(bids.length == 5 && asks.length == 5)
      // level 0 pins the inside market; prices decay/ascend by a pip
      assert(bids.head.getDouble(0) == r.getDouble(2))
      assert(asks.head.getDouble(0) == r.getDouble(3))
      assert(bids.map(_.getDouble(0)).sliding(2).forall(p => p(0) > p(1)))
      assert(asks.map(_.getDouble(0)).sliding(2).forall(p => p(0) < p(1)))
      // sizes decay with depth on both sides (floor() emits longs)
      assert(bids.map(_.getLong(1)).sliding(2).forall(p => p(0) >= p(1)))
      val imb = r.getDouble(8)
      assert(imb >= -1.0 && imb <= 1.0 && imb != 0.0)
    }
  }

  test("pattern alert stream detects doji and engulfing across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamCandle]
    val q = Channels.patternAlertStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("alerts_t")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: a bearish candle, then a (slightly bearish) doji
      mem.addData(
        StreamCandle(ts(0), "PAIR0", 1.10, 1.11, 1.08, 1.09),
        StreamCandle(ts(60), "PAIR0", 1.0905, 1.12, 1.06, 1.090))
      q.processAllAvailable()
      // batch 2: bullish engulfing of the doji — state must remember it
      mem.addData(StreamCandle(ts(120), "PAIR0", 1.085, 1.13, 1.08, 1.12))
      q.processAllAvailable()
      val alerts = spark.table("alerts_t").orderBy("bucket").collect()
      val kinds = alerts.map(r => (r.getString(2), r.getTimestamp(1))).toSeq
      assert(kinds.contains(("doji", ts(60))))
      assert(kinds.contains(("bullish_engulfing", ts(120))))
      alerts.foreach(r => assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1))
    } finally q.stop()
  }

  test("late ticks beyond the watermark are dropped in append-mode candles") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val ticks = Channels.decorateTicks(mem.toDF().toDF("timestamp", "value"))
    val q = Channels.candleStream(ticks)
      .writeStream.format("memory").queryName("candles_wm")
      .outputMode(OutputMode.Append()).start()
    try {
      // minutes 0..9 → after this batch the watermark sits near minute 8
      mem.addData((0L until 600L).map(i => (ts(i), i)): _*)
      q.processAllAvailable()
      // advance: minute 12 → finalizes (emits) windows up to ~minute 10
      mem.addData((720L until 725L).map(i => (ts(i), i)): _*)
      q.processAllAvailable()
      val emitted = spark.table("candles_wm").count()
      assert(emitted >= 15, s"expected the first ~5 minutes emitted, got $emitted")
      // a tick at minute 0 is far behind the watermark — must be dropped,
      // not re-open its (already finalized) window
      mem.addData((5L, 999L).copy(_1 = ts(5)))
      q.processAllAvailable()
      assert(spark.table("candles_wm").count() == emitted)
    } finally q.stop()
  }

  test("broadcast sink envelopes messages, sequences them, and bounds the ring buffer") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val ticks = Channels.decorateTicks(mem.toDF().toDF("timestamp", "value"))
    val sink = new Channels.RingBufferSink("raw_ticks", capacity = 50)
    val q = sink.start(ticks)
    try {
      mem.addData((0L until 40L).map(i => (ts(i), i)): _*)
      q.processAllAvailable()
      mem.addData((40L until 80L).map(i => (ts(i), i)): _*)
      q.processAllAvailable()
      assert(sink.totalEmitted == 80)
      val msgs = sink.snapshot
      assert(msgs.length == 50) // retention bound, oldest dropped
      msgs.foreach(m => assert(m.contains("\"stream_type\":\"raw_ticks\"")))
      // sequence numbers carry across batches (T2 envelope)
      val seqs = msgs.map(m => "\"sequence\":(\\d+)".r.findFirstMatchIn(m).get.group(1).toLong)
      assert(seqs.max == 79 && seqs.min == 30)
    } finally q.stop()
  }

  test("economic events channel derives deterministic calendar fields") {
    import spark.implicits._
    val ev = Channels.decorateEconomicEvents(
      (0L until 12L).map(i => (ts(i), i)).toDF("timestamp", "value")).collect()
    assert(ev.length == 12)
    assert(ev.map(_.getString(1)).distinct.sorted.toSeq ==
      Seq("cpi", "ecb_rate", "fomc", "nfp"))
    assert(ev.map(_.getString(2)).distinct.sorted.toSeq ==
      Seq("high", "low", "medium"))
    ev.foreach(r => assert(math.abs(r.getDouble(3)) <= 0.5))
  }

  test("streaming Heikin-Ashi reproduces the oracled batch fold row-for-row") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // the REAL candle table through the streaming channel, two
    // micro-batches split mid-series so the recurrence state genuinely
    // crosses a batch boundary
    val candles = graft.Tables.candles(spark, sfDir)
      .select(col("bucket"), col("user_id").cast("string").as("symbol"),
        col("open"), col("high"), col("low"), col("close"))
      .as[StreamCandle].collect().sortBy(c => (c.symbol, c.bucket.getTime))
    assert(candles.length > 100)
    val (b1, b2) = candles.splitAt(candles.length / 2)
    val mem = MemoryStream[StreamCandle]
    val q = Channels.heikinAshiStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("ha_equiv")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      def r6(c: org.apache.spark.sql.Column) = floor(c * 1e6 + 0.5) / 1e6
      val streamed = spark.table("ha_equiv")
        .select(col("symbol").cast("long").as("user_id"), col("bucket"),
          r6(col("ha_open")).as("ha_open"), r6(col("ha_high")).as("ha_high"),
          r6(col("ha_low")).as("ha_low"), r6(col("ha_close")).as("ha_close"),
          col("is_bull"))
      val batch = graft.analysis.Stateful.heikinAshi(spark, sfDir)
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0 &&
        batch.exceptAll(streamed).count() == 0,
        "stream/batch Heikin-Ashi rows differ")
    } finally q.stop()
  }

  test("heikin-ashi stream drops cross-batch late candles instead of corrupting the recurrence") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    def c(m: Int, o: Double) = StreamCandle(ts(m), "S", o, o + 2, o - 2, o + 1)
    val mem = MemoryStream[StreamCandle]
    val q = Channels.heikinAshiStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("ha_late")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(c(1, 10), c(2, 11), c(3, 12)); q.processAllAvailable()
      // batch 2 delivers a STALE candle (minute 2 again, wild values)
      // behind a fresh one, AND an at-least-once duplicate of minute 4
      // WITHIN the same batch — stale and duplicate rows must both be
      // dropped (the guard reads live state, not a pre-batch snapshot),
      // and minute 4 folds exactly once from minute 3's state
      mem.addData(c(2, 99), c(4, 13), c(4, 13)); q.processAllAvailable()
      val rows = spark.table("ha_late").as[HaStreamRow].collect()
        .sortBy(_.bucket.getTime)
      assert(rows.length == 4, s"late row must be dropped: ${rows.toSeq}")
      assert(rows.map(_.bucket) sameElements Array(ts(1), ts(2), ts(3), ts(4)))
      // replay the fold without the late row; state must match exactly
      var (pO, pC) = ((10.0 + 11.0) / 2, (10 + 12 + 8 + 11) / 4.0)
      for ((r, o) <- rows.drop(1).zip(Seq(11.0, 12.0, 13.0))) {
        val haC = (o + (o + 2) + (o - 2) + (o + 1)) / 4
        val haO = (pO + pC) / 2
        assert(r.ha_open == haO && r.ha_close == haC,
          s"recurrence corrupted at ${r.bucket}: $r")
        pO = haO; pC = haC
      }
    } finally q.stop()
  }

  test("streaming ZigZag reproduces the batch fold's confirmed pivots across a micro-batch boundary") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val candles = graft.Tables.candles(spark, sfDir)
      .select(col("bucket"), col("user_id").cast("string").as("symbol"),
        col("open"), col("high"), col("low"), col("close"))
      .as[StreamCandle].collect().sortBy(c => (c.symbol, c.bucket.getTime))
    val (b1, b2) = candles.splitAt(candles.length / 2)
    val mem = MemoryStream[StreamCandle]
    val q = Channels.zigzagStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("zz_equiv")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      val streamed = spark.table("zz_equiv")
        .select(col("symbol").cast("long").as("user_id"), col("bucket"),
          col("price"), col("pivot_type"), col("swing_pct"))
      // batch minus each user's final pivot (the provisional one the
      // append-mode channel deliberately never emits)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("bucket").desc)
      val confirmed = graft.analysis.ZigzagRenko.w41Zigzag(spark, sfDir)
        .withColumn("rn", row_number().over(w)).filter(col("rn") > 1).drop("rn")
      assert(streamed.count() > 0, "fixture must confirm pivots")
      assert(streamed.count() == confirmed.count())
      assert(streamed.exceptAll(confirmed).count() == 0 &&
        confirmed.exceptAll(streamed).count() == 0,
        "stream/batch confirmed ZigZag pivots differ")
    } finally q.stop()
  }

  test("streaming Renko reproduces the batch fold's bricks across a micro-batch boundary") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // batch-fit bricks (1/16 of each key's full range) driven through
    // the channel as its per-symbol configuration — the production
    // shape (offline fit, streamed apply)
    val bricks = graft.Tables.candles(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(((max(col("high")) - min(col("low"))) / 16).as("brick"))
      .collect().map(r => r.getLong(0).toString -> r.getDouble(1)).toMap
    val candles = graft.Tables.candles(spark, sfDir)
      .select(col("bucket"), col("user_id").cast("string").as("symbol"),
        col("open"), col("high"), col("low"), col("close"))
      .as[StreamCandle].collect().sortBy(c => (c.symbol, c.bucket.getTime))
    val (b1, b2) = candles.splitAt(candles.length / 2)
    val mem = MemoryStream[StreamCandle]
    val q = Channels.renkoStream(spark, mem.toDS(), bricks)
      .writeStream.format("memory").queryName("renko_equiv")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      val streamed = spark.table("renko_equiv")
        .select(col("symbol").cast("long").as("user_id"), col("bucket"),
          col("brick_no"), col("brick_open"), col("brick_close"), col("direction"))
      val batch = graft.analysis.ZigzagRenko.w41Renko(spark, sfDir)
      assert(streamed.count() > 0, "fixture must emit bricks")
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0 &&
        batch.exceptAll(streamed).count() == 0,
        "stream/batch Renko bricks differ")
    } finally q.stop()
  }

  test("renko stream drops late and duplicate candles instead of corrupting the anchor") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def cts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    def c(m: Int, close: Double) = StreamCandle(cts(m), "S", close, close, close, close)
    val mem = MemoryStream[StreamCandle]
    val q = Channels.renkoStream(spark, mem.toDS(), Map("S" -> 1.0))
      .writeStream.format("memory").queryName("renko_late")
      .outputMode(OutputMode.Append()).start()
    try {
      // anchor 10; close 13.5 → three up bricks, anchor 13
      mem.addData(c(1, 10), c(2, 13.5)); q.processAllAvailable()
      // stale minute-2 candle (wild value) + minute 4 delivered TWICE in
      // one batch: the stale row and the duplicate must both drop, and
      // 10.2 folds once from anchor 13 → two down bricks, anchor 11
      mem.addData(c(2, 99), c(4, 10.2), c(4, 10.2)); q.processAllAvailable()
      val rows = spark.table("renko_late").as[RenkoBrickRow].collect().sortBy(_.brick_no)
      assert(rows.map(r => (r.brick_no, r.brick_open, r.brick_close, r.direction)).toSeq ==
        Seq((1L, 10.0, 11.0, "up"), (2L, 11.0, 12.0, "up"), (3L, 12.0, 13.0, "up"),
          (4L, 13.0, 12.0, "down"), (5L, 12.0, 11.0, "down")),
        s"bricks wrong: ${rows.toSeq}")
    } finally q.stop()
  }

  test("streaming GARCH vol reproduces the batch fold across a micro-batch boundary") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val candles = graft.Tables.candles(spark, sfDir)
      .select(col("bucket"), col("user_id").cast("string").as("symbol"),
        col("open"), col("high"), col("low"), col("close"))
      .as[StreamCandle].collect().sortBy(c => (c.symbol, c.bucket.getTime))
    val (b1, b2) = candles.splitAt(candles.length / 2)
    val mem = MemoryStream[StreamCandle]
    val q = Channels.garchVolStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("garch_equiv")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      // the channel emits raw doubles; round both sides the same way
      val streamed = spark.table("garch_equiv")
        .select(col("symbol").cast("long").as("user_id"), col("bucket"),
          round(col("ret"), 6).as("ret"),
          round(col("cond_vol_bp"), 6).as("cond_vol_bp"))
      val batch = graft.operators.IndicatorPack3.w49GarchVol(spark, sfDir)
      assert(streamed.count() > 0, "fixture must emit vol rows")
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0 &&
        batch.exceptAll(streamed).count() == 0,
        "stream/batch GARCH vol rows differ")
    } finally q.stop()
  }

  test("garch stream skips the return off a zero close, matching batch w49 on the same bars") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dir = graft.ZeroBarFixture.dir(spark)
    val candles = graft.Tables.candles(spark, dir)
      .select(col("bucket"), col("user_id").cast("string").as("symbol"),
        col("open"), col("high"), col("low"), col("close"))
      .as[StreamCandle].collect().sortBy(_.bucket.getTime)
    val (b1, b2) = candles.splitAt(candles.length / 2)
    val mem = MemoryStream[StreamCandle]
    val q = Channels.garchVolStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("garch_zero")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
      val streamed = spark.table("garch_zero")
        .select(col("symbol").cast("long").as("user_id"), col("bucket"),
          round(col("ret"), 6).as("ret"),
          round(col("cond_vol_bp"), 6).as("cond_vol_bp"))
      val batch = graft.operators.IndicatorPack3.w49GarchVol(spark, dir)
      // 30 bars − the seed bar − the one skipped return = 28 rows
      assert(streamed.count() == 28, s"expected 28 rows, got ${streamed.count()}")
      assert(streamed.exceptAll(batch).count() == 0 &&
        batch.exceptAll(streamed).count() == 0,
        "stream/batch GARCH vol rows differ on the zero-close fixture")
    } finally q.stop()
  }

  test("garch stream drops late and duplicate candles instead of corrupting the variance") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def cts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    def c(m: Int, close: Double) = StreamCandle(cts(m), "S", close, close, close, close)
    val mem = MemoryStream[StreamCandle]
    val q = Channels.garchVolStream(spark, mem.toDS())
      .writeStream.format("memory").queryName("garch_late")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(c(1, 100), c(2, 101)); q.processAllAvailable()
      // stale minute-2 candle (wild value) + minute 3 delivered TWICE in
      // one batch: the stale row and the duplicate must both drop, so
      // the fold sees exactly returns r1 = 0.01, r2 = 102/101 - 1
      mem.addData(c(2, 9999), c(3, 102), c(3, 102)); q.processAllAvailable()
      val rows = spark.table("garch_late").as[GarchVolRow].collect()
        .sortBy(_.bucket.getTime)
      val r1 = (101.0 - 100.0) / 100.0
      val r2 = (102.0 - 101.0) / 101.0
      val s2a = r1 * r1
      val s2b = 2.0e-8 + 0.06 * (r1 * r1) + 0.92 * s2a
      assert(rows.map(r => (r.bucket.getTime, r.ret, r.cond_vol_bp)).toSeq ==
        Seq((cts(2).getTime, r1, 10000.0 * math.sqrt(s2a)),
            (cts(3).getTime, r2, 10000.0 * math.sqrt(s2b))),
        s"garch rows wrong: ${rows.toSeq}")
    } finally q.stop()
  }

  test("trending channel emits each window's exact top-k once, when the watermark closes it") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // minute-aligned base so all six seeds land in ONE tumbling window
    def ts(sec: Int) = new java.sql.Timestamp(1700000040000L + sec * 1000L)
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val q = Channels.trendingStream(spark, mem.toDF().toDF("ts", "symbol"))
      .writeStream.format("memory").queryName("trend_t")
      .outputMode(OutputMode.Append()).start()
    try {
      // window W = [t0, t0+60): A x3, B x2, C x1 (max event t0+50 keeps
      // the watermark at t0+20 — the window stays open)
      mem.addData(Seq("A", "B", "A", "C", "B", "A").zipWithIndex
        .map { case (s, i) => (ts(5 + i * 9), s) }: _*)
      q.processAllAvailable()
      assert(spark.table("trend_t").count() == 0, "window must not emit before the watermark closes it")
      // advance event time past W's end + watermark delay; the timeout
      // fires on the batch AFTER the watermark update, hence two nudges
      mem.addData((ts(160), "D")); q.processAllAvailable()
      mem.addData((ts(170), "D")); q.processAllAvailable()
      val rows = spark.table("trend_t")
        .filter(col("window_start") === ts(0))
        .orderBy(col("rank")).collect()
        .map(r => (r.getInt(1), r.getString(2), r.getLong(3)))
      assert(rows.toSeq == Seq((1, "A", 3L), (2, "B", 2L), (3, "C", 1L)),
        s"top-k wrong: ${rows.toSeq}")
      // exactly once: no duplicate emission on further batches
      mem.addData((ts(180), "D")); q.processAllAvailable()
      assert(spark.table("trend_t").filter(col("window_start") === ts(0)).count() == 3)
    } finally q.stop()
  }

  test("trending channel restores timeout state from checkpoint: a window open at crash still emits once") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def tts(sec: Int) = new java.sql.Timestamp(1700000040000L + sec * 1000L)
    val ckpt = graft.util.Scratch.register(java.nio.file.Files.createTempDirectory("graft_trend_ckpt").toString)
    val out = graft.util.Scratch.register(java.nio.file.Files.createTempDirectory("graft_trend_out").toString) + "/trend"
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    def start() = Channels.trendingStream(spark, mem.toDF().toDF("ts", "symbol"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    // first incarnation: fill one window, crash BEFORE the watermark
    // closes it — its tallies exist only in state
    val q1 = start()
    try {
      mem.addData(Seq("A", "A", "B").zipWithIndex.map { case (s, i) => (tts(5 + i * 10), s) }: _*)
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.schema("window_start TIMESTAMP, rank INT, symbol STRING, n_ticks LONG")
      .parquet(out).count() == 0, "window must still be open at crash")
    // second incarnation: advance the watermark; the restored state must
    // produce the window's top-k exactly once, counts intact
    mem.addData((tts(160), "D")); mem.addData((tts(170), "D"))
    val q2 = start()
    try {
      q2.processAllAvailable()
      mem.addData((tts(180), "D")); q2.processAllAvailable()
      val rows = spark.read.parquet(out).filter(col("window_start") === tts(0))
        .orderBy(col("rank")).collect()
        .map(r => (r.getInt(1), r.getString(2), r.getLong(3)))
      assert(rows.toSeq == Seq((1, "A", 2L), (2, "B", 1L)),
        s"restored window tallies wrong: ${rows.toSeq}")
    } finally q2.stop()
  }

  test("stream-stream interval join: each high-impact event collects exactly the ticks in its 2-minute window") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val tickMem = MemoryStream[(java.sql.Timestamp, Long)]
    val econMem = MemoryStream[(java.sql.Timestamp, Long)]
    val joined = Channels.eventImpactStream(
      Channels.decorateTicks(tickMem.toDF().toDF("timestamp", "value")),
      Channels.decorateEconomicEvents(econMem.toDF().toDF("timestamp", "value")))
    val q = joined.writeStream.format("memory").queryName("impact_t")
      .outputMode(OutputMode.Append()).start()
    try {
      // one tick per second for 5 minutes; events at t=0s..11s (mixed impact)
      tickMem.addData((0L until 300L).map(i => (ts(i), i)): _*)
      econMem.addData((0L until 12L).map(i => (ts(i), i)): _*)
      q.processAllAvailable()
      val rows = spark.table("impact_t").collect()
      // expected: per high-impact event, ticks in [event_ts, event_ts+120s]
      val evs = Channels.decorateEconomicEvents(
        (0L until 12L).map(i => (ts(i), i)).toDF("timestamp", "value"))
        .filter(col("impact") === "high").select("event_id", "ts").collect()
      assert(evs.nonEmpty)
      val expected = evs.map { e =>
        val et = e.getTimestamp(1).getTime
        val n = (0L until 300L).count { i =>
          val tt = ts(i).getTime; tt >= et && tt <= et + 120000
        }
        e.getString(0) -> n
      }.toMap
      val actual = rows.groupBy(_.getString(0)).map { case (k, v) => k -> v.length }
      assert(actual == expected, s"actual=$actual expected=$expected")
      // drift bounds: every joined tick is within [0, 120s] after its event
      rows.foreach { r =>
        val ms = r.getLong(6)
        assert(ms >= 0 && ms <= 120000)
      }
    } finally q.stop()
  }
}
