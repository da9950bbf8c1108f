package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamOpsSpec extends SparkSpec {

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$min%02d:$sec%02d")

  private val sample = Seq(
    StreamOps.Evt(1, ts(0, 10), 1, "click", 1.0),
    StreamOps.Evt(2, ts(0, 40), 1, "view", 2.0),
    StreamOps.Evt(3, ts(1, 5), 2, "click", 3.0),
    StreamOps.Evt(4, ts(1, 30), 1, "purchase", 4.0),
    StreamOps.Evt(5, ts(2, 15), 2, "click", 5.0),
    StreamOps.Evt(6, ts(3, 0), 3, "view", 6.0))

  test("windowed counts: streaming result == batch result on same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = snap(StreamOps.windowedTypeCounts(sample.toDF()))

    val stream = MemoryStream[StreamOps.Evt]
    stream.addData(sample: _*)
    val q = StreamOps.windowedTypeCounts(stream.toDF())
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(snap(spark.table("win_counts")) == batch)
    } finally q.stop()
  }

  test("watermark drops late rows in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamOps.Evt]
    val q = StreamOps.windowedTypeCounts(stream.toDF())
      .writeStream.format("memory").queryName("late_counts")
      .outputMode("append").start()
    try {
      stream.addData(sample: _*)
      q.processAllAvailable()
      // advance the watermark far past the sample windows
      stream.addData(StreamOps.Evt(99, ts(30), 9, "click", 1.0))
      q.processAllAvailable()
      val closed = spark.table("late_counts").count()
      assert(closed >= 4) // all four sample windows emitted after watermark passed
      // a straggler behind the watermark must NOT create output
      stream.addData(StreamOps.Evt(100, ts(0, 50), 1, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("late_counts").count() == closed)
    } finally q.stop()
  }

  test("exact sliding counts: streaming == batch, two windows per event") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = snap(StreamOps.slidingTypeCounts(sample.toDF()))
    // length/slide = 2 => every event is counted exactly twice across windows
    val total = StreamOps.slidingTypeCounts(sample.toDF())
      .agg(sum("n")).collect()(0).getLong(0)
    assert(total == 2L * sample.length, s"total=$total")

    val stream = MemoryStream[StreamOps.Evt]
    stream.addData(sample: _*)
    val q = StreamOps.slidingTypeCounts(stream.toDF())
      .writeStream.format("memory").queryName("slide_counts")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(snap(spark.table("slide_counts")) == batch)
    } finally q.stop()
  }

  test("sliding active-user windows produce one row per covering slide") {
    import spark.implicits._
    // an event at 10:03 belongs to 5 sliding windows (slide=1min, size=5min)
    val one = Seq(StreamOps.Evt(1, ts(3, 0), 7, "click", 1.0))
    val out = StreamOps.slidingActiveUsers(one.toDF()).collect()
    assert(out.length == 5)
    assert(out.forall(_.getLong(1) == 1L))
  }

  test("stateful sessionization: stream (after timeout) == batch oracle") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = snap(StreamOps.sessionizeBatch(spark.createDataset(sample)).toDF())

    val stream = MemoryStream[StreamOps.Evt]
    val q = StreamOps.sessionize(stream.toDS(), gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append")
      .start()
    try {
      stream.addData(sample: _*)
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // sessions still open
      // advance the watermark past every session gap with far-future events
      // (event-time timeout: emission is a function of the data, not clocks)
      stream.addData(StreamOps.Evt(900, ts(59), 999, "click", 0.0))
      q.processAllAvailable()
      stream.addData(StreamOps.Evt(901, ts(59, 30), 999, "click", 0.0))
      q.processAllAvailable()
      assert(snap(spark.table("sessions")) == batch)
    } finally q.stop()
  }

  test("native session_window: streaming append (after watermark) == batch sessionAgg") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // exclude the watermark-advancer user from the batch twin
    val batch = snap(StreamOps.sessionAgg(sample.toDF()))

    val stream = MemoryStream[StreamOps.Evt]
    val q = StreamOps.sessionAgg(stream.toDF().withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName("native_sessions")
      .outputMode("append")
      .start()
    try {
      stream.addData(sample: _*)
      q.processAllAvailable()
      // sessions for users 1-3 are still open until the watermark passes
      stream.addData(StreamOps.Evt(900, ts(59), 999, "click", 0.0))
      q.processAllAvailable()
      stream.addData(StreamOps.Evt(901, ts(59, 30), 999, "click", 0.0))
      q.processAllAvailable()
      val emitted = snap(spark.table("native_sessions")
        .filter($"user_id" =!= 999))
      assert(emitted == batch)
    } finally q.stop()
  }

  test("native session_window parity holds on the RocksDB state store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = snap(StreamOps.sessionAgg(sample.toDF()))
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // the 100 TB posture: state off-heap in RocksDB, not executor heap
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[StreamOps.Evt]
    val q = StreamOps.sessionAgg(stream.toDF().withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName("rocksdb_sessions")
      .outputMode("append")
      .start()
    try {
      stream.addData(sample: _*)
      q.processAllAvailable()
      stream.addData(StreamOps.Evt(900, ts(59), 999, "click", 0.0))
      q.processAllAvailable()
      stream.addData(StreamOps.Evt(901, ts(59, 30), 999, "click", 0.0))
      q.processAllAvailable()
      assert(snap(spark.table("rocksdb_sessions").filter($"user_id" =!= 999)) == batch)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("chained window aggs: two stateful levels run in one streaming query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = snap(StreamOps.twoLevelWindows(sample.toDF()))

    val stream = MemoryStream[StreamOps.Evt]
    val q = StreamOps.twoLevelWindows(stream.toDF().withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName("two_level")
      .outputMode("append")
      .start()
    try {
      stream.addData(sample: _*)
      q.processAllAvailable()
      stream.addData(StreamOps.Evt(900, ts(59), 999, "flush", 0.0))
      q.processAllAvailable()
      stream.addData(StreamOps.Evt(901, ts(59, 30), 999, "flush", 0.0))
      q.processAllAvailable()
      val emitted = snap(spark.table("two_level").filter($"event_type" =!= "flush"))
      assert(emitted == batch)
    } finally q.stop()
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark suppresses replays") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamOps.Evt]
    val q = stream.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      stream.addData(sample: _*)
      q.processAllAvailable()
      stream.addData(sample.take(3): _*) // replayed duplicates within watermark
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == sample.size)
    } finally q.stop()
  }

  test("first-per-key dedup: streaming first arrival == batch first-by-ts (in-order feed)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // duplicate keys arriving later, in ts order — first arrival must win
    val feed = sample ++ Seq(
      StreamOps.Evt(7, ts(4, 0), 1, "click", 9.0), // dup of (1, click)
      StreamOps.Evt(8, ts(4, 30), 2, "click", 9.0)) // dup of (2, click)
    val stream = MemoryStream[StreamOps.Evt]
    val q = StreamOps.firstPerKey(stream.toDF())
      .writeStream.format("memory").queryName("first_per_key")
      .outputMode("append").start()
    try {
      stream.addData(feed: _*)
      q.processAllAvailable()
      val got = snap(spark.table("first_per_key")
        .select($"user_id", $"event_type", $"event_id"))
      val want = snap(feed.toDF()
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"user_id", $"event_type").orderBy($"ts", $"event_id")))
        .filter($"rk" === 1)
        .select($"user_id", $"event_type", $"event_id"))
      assert(got == want)
    } finally q.stop()
  }

  test("content dedup: later micro-batches drop already-seen content keys") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamOps.contentDedup(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("content_dedup")
      .outputMode("append").start()
    try {
      stream.addData((1L, "alpha beta"), (2L, "gamma delta"))
      q.processAllAvailable()
      // batch 2: doc 3 re-crawls doc 1's content — state must drop it
      stream.addData((3L, "alpha beta"), (4L, "epsilon"))
      q.processAllAvailable()
      val got = spark.table("content_dedup")
        .select($"doc_id").as[Long].collect().toSet
      assert(got == Set(1L, 2L, 4L), got)
    } finally q.stop()
  }

  test("bounded dedup: in-window dups dropped, key re-admitted after watermark eviction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[StreamOps.Evt]
    val q = StreamOps.boundedFirstPerKey(stream.toDF())
      .writeStream.format("memory").queryName("bounded_dedup")
      .outputMode("append").start()
    try {
      // batch 1: key (1, click) kept at 0:00, dup at 1:00 dropped (within
      // the 2-minute window); filler key at 10:00 advances the watermark to
      // 8:00 AFTER this batch, which evicts (1, click)'s state (expiry 2:00)
      stream.addData(
        StreamOps.Evt(1, ts(0, 0), 1, "click", 1.0),
        StreamOps.Evt(2, ts(1, 0), 1, "click", 1.0),
        StreamOps.Evt(3, ts(10, 0), 9, "filler", 0.0))
      q.processAllAvailable()
      // batch 2: the SAME key returns at 9:00 — state was evicted, so it is
      // re-admitted (the bounded-state trade w04's exact dedup never makes);
      // its 9:30 dup lands in the fresh window and is dropped
      stream.addData(
        StreamOps.Evt(4, ts(9, 0), 1, "click", 1.0),
        StreamOps.Evt(5, ts(9, 30), 1, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("bounded_dedup")
        .select($"event_id").as[Long].collect().toSet
      assert(got == Set(1L, 3L, 4L), got)
    } finally q.stop()
  }

  test("w16 batch twin: keeper chain keeps re-admissions a steady dup drip would hide") {
    import spark.implicits._
    // key (1, click): 0:00 kept; 1:00 and 2:30 are each within 2 min of the
    // LAST KEPT (0:00 and ... 2:30 clears 0:00+2:00 -> kept); 3:00 is within
    // 2 min of 2:30 -> dropped. Gap sessionization would instead chain
    // 0:00 - 1:00 - 2:30 - 3:00 into one session and keep only 0:00.
    val feed = Seq(
      StreamOps.Evt(1, ts(0, 0), 1, "click", 1.0),
      StreamOps.Evt(2, ts(1, 0), 1, "click", 1.0),
      StreamOps.Evt(3, ts(2, 30), 1, "click", 1.0),
      StreamOps.Evt(4, ts(3, 0), 1, "click", 1.0)).toDF()
    val kept = StreamOps.w16BoundedDedup(graft.T(spark, sfDir))
    // shape check on the real table (keeper chain per key, ordered)
    assert(kept.columns.toSeq == Seq("user_id", "event_type", "kept_ts"))
    val chain = feed
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"), $"event_id")
      .groupBy($"user_id", $"event_type")
      .agg(sort_array(collect_list(struct($"us", $"event_id"))).as("evs"))
      .select(explode(expr("""aggregate(slice(evs, 2, size(evs) - 1), array(evs[0].us),
          (acc, e) -> CASE WHEN e.us >= element_at(acc, -1) + 120000000L
                      THEN concat(acc, array(e.us)) ELSE acc END)""")).as("kept_us"))
      .select(timestamp_micros($"kept_us").as("kept_ts"))
    assert(snap(chain) == snap(Seq(ts(0, 0), ts(2, 30)).toDF("kept_ts")))
  }

  test("stream-stream interval join: streaming result == batch join on same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq(
      StreamOps.Evt(1, ts(0, 0), 1, "click", 1.0),
      StreamOps.Evt(2, ts(5, 0), 2, "click", 1.0),
      StreamOps.Evt(3, ts(20, 0), 1, "click", 1.0))
    val purchases = Seq(
      StreamOps.Evt(11, ts(4, 0), 1, "purchase", 9.0),  // within 10m of click 1
      StreamOps.Evt(12, ts(16, 0), 2, "purchase", 9.0), // 11m after click 2 — out
      StreamOps.Evt(13, ts(25, 0), 1, "purchase", 9.0)) // within 10m of click 3
    val batch = snap(StreamOps.clickPurchaseJoin(clicks.toDF(), purchases.toDF()))
    assert(batch.size == 2)

    val cs = MemoryStream[StreamOps.Evt]
    val ps = MemoryStream[StreamOps.Evt]
    val q = StreamOps.clickPurchaseJoin(cs.toDF(), ps.toDF())
      .writeStream.format("memory").queryName("cp_join")
      .outputMode("append").start()
    try {
      cs.addData(clicks: _*)
      ps.addData(purchases: _*)
      q.processAllAvailable()
      // advance both watermarks so every joinable pair is emitted; distinct
      // sentinel users so the sentinels can't join each other
      cs.addData(StreamOps.Evt(98, ts(59), 998, "click", 0.0))
      ps.addData(StreamOps.Evt(99, ts(59), 999, "purchase", 0.0))
      q.processAllAvailable()
      assert(snap(spark.table("cp_join")) == batch)
    } finally q.stop()
  }

  test("stream-static anti join: streaming unmatched rows == batch anti join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(1L, 2L, 3L).toDF("user_id")
    val evts = (1 to 12).map(i => StreamOps.Evt(i, ts(i, 0), i % 6, "click", 1.0))
    val batch = snap(StreamOps.unmatchedEvents(evts.toDF(), dim))
    assert(batch.nonEmpty) // users 0, 4, 5 have no dim row
    val src = MemoryStream[StreamOps.Evt]
    val q = StreamOps.unmatchedEvents(src.toDF(), dim)
      .writeStream.format("memory").queryName("anti_enrich")
      .outputMode("append").start()
    try {
      src.addData(evts: _*)
      q.processAllAvailable()
      assert(snap(spark.table("anti_enrich")) == batch)
    } finally q.stop()
  }

  test("update-mode counts: latest update per key == batch counts, changed keys re-emit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evts = (1 to 24).map(i => StreamOps.Evt(i, ts(i % 10, 0), i % 3,
      Seq("click", "view")(i % 2), 1.0))
    val batch = StreamOps.userTypeCounts(evts.toDF())
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val src = MemoryStream[StreamOps.Evt]
    val q = StreamOps.userTypeCounts(src.toDF())
      .writeStream.format("memory").queryName("user_type_counts")
      .outputMode("update").start()
    try {
      src.addData(evts.take(12): _*)
      q.processAllAvailable()
      src.addData(evts.drop(12): _*)
      q.processAllAvailable()
      val rows = spark.table("user_type_counts").collect()
      // every key changed in both triggers -> two emissions per key
      assert(rows.length > batch.size, s"update mode should re-emit changed keys: ${rows.length}")
      val latest = rows.groupBy(r => (r.getLong(0), r.getString(1)))
        .view.mapValues(_.map(_.getLong(2)).max).toMap
      assert(latest == batch)
    } finally q.stop()
  }

  test("complete-mode top-k: final leaderboard == batch top-k on same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evts = (1 to 20).map(i => StreamOps.Evt(i,
      ts(i % 10, 0), i % 5,
      Seq("click", "click", "view", "purchase")(i % 4), 1.0))
    val batch = snap(StreamOps.topTypeCounts(evts.toDF()))
    val src = MemoryStream[StreamOps.Evt]
    val q = StreamOps.topTypeCounts(src.toDF())
      .writeStream.format("memory").queryName("top_types")
      .outputMode("complete").start()
    try {
      src.addData(evts.take(10): _*)
      q.processAllAvailable()
      src.addData(evts.drop(10): _*) // leaderboard must re-emit, not append
      q.processAllAvailable()
      assert(snap(spark.table("top_types")) == batch)
    } finally q.stop()
  }

  test("outer interval join: orphan clicks emitted with nulls once watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq(
      StreamOps.Evt(1, ts(0, 0), 1, "click", 1.0),  // converts (purchase 11)
      StreamOps.Evt(2, ts(5, 0), 2, "click", 1.0),  // orphan: purchase 12 is 11m out
      StreamOps.Evt(3, ts(20, 0), 1, "click", 1.0)) // converts (purchase 13)
    val purchases = Seq(
      StreamOps.Evt(11, ts(4, 0), 1, "purchase", 9.0),
      StreamOps.Evt(12, ts(16, 0), 2, "purchase", 9.0),
      StreamOps.Evt(13, ts(25, 0), 1, "purchase", 9.0))
    val batch = snap(StreamOps.clickPurchaseOuterJoin(clicks.toDF(), purchases.toDF()))
    assert(batch.size == 3) // 2 matched + 1 null-extended orphan

    val cs = MemoryStream[StreamOps.Evt]
    val ps = MemoryStream[StreamOps.Evt]
    val q = StreamOps.clickPurchaseOuterJoin(cs.toDF(), ps.toDF())
      .writeStream.format("memory").queryName("cp_outer_join")
      .outputMode("append").start()
    try {
      cs.addData(clicks: _*)
      ps.addData(purchases: _*)
      q.processAllAvailable()
      // the orphan row for click 2 only materializes after BOTH watermarks
      // pass its join window — push them far ahead with sentinel users
      cs.addData(StreamOps.Evt(98, ts(59), 998, "click", 0.0))
      ps.addData(StreamOps.Evt(99, ts(59), 999, "purchase", 0.0))
      q.processAllAvailable()
      assert(snap(spark.table("cp_outer_join")) == batch)
    } finally q.stop()
  }

  test("session windows: gap merge/split boundary and streaming parity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evts = Seq(
      StreamOps.Evt(1, ts(0, 0), 1, "click", 1.0),
      StreamOps.Evt(2, ts(5, 0), 1, "view", 2.0),   // exactly 5m: still merges
      StreamOps.Evt(3, ts(10, 1), 1, "view", 3.0),  // 5m01s gap: NEW session
      StreamOps.Evt(4, ts(30, 0), 2, "click", 4.0))
    val batch = StreamOps.sessionWindowCounts(evts.toDF())
    val rows = batch.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    // user 1: sessions of 2 events and 1 event; user 2: 1 event
    assert(rows == Seq((1L, 1L), (1L, 2L), (2L, 1L)), rows)

    val stream = MemoryStream[StreamOps.Evt]
    val q = StreamOps.sessionWindowCounts(
        stream.toDF().withWatermark("ts", "2 minutes"))
      .writeStream.format("memory").queryName("sess_win")
      .outputMode("complete").start()
    try {
      stream.addData(evts: _*)
      q.processAllAvailable()
      assert(snap(spark.table("sess_win")) == snap(batch))
    } finally q.stop()
  }

  test("transformWithState running totals accumulate across batches (RocksDB store)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[StreamOps.Evt]
    val q = StreamOps.runningTotals(stream.toDS())
      .writeStream.format("memory").queryName("run_tot")
      .outputMode("update").start()
    try {
      stream.addData(sample: _*)
      q.processAllAvailable()
      stream.addData(StreamOps.Evt(7, ts(4, 0), 1, "click", 10.0)) // user 1 again
      q.processAllAvailable()
      // last update per user == the batch aggregate over everything seen
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"n_events".desc)
      val finalRows = spark.table("run_tot")
        .withColumn("rk", row_number().over(w)).filter($"rk" === 1)
        .select($"user_id", $"n_events", $"total_value")
      val batch = (sample :+ StreamOps.Evt(7, ts(4, 0), 1, "click", 10.0)).toDF()
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"), sum($"value").as("total_value"))
      assert(snap(finalRows) == snap(batch))
    } finally {
      q.stop()
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("w14: streaming band-ownership rollup == batch near-dup verdict") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // doc 3 is an exact re-crawl of doc 1 (all 4 band keys collide with
    // state), split across micro-batches so the claim is genuinely stateful
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"))
    val b2 = Seq(
      (3L, "the quick brown fox jumps over the lazy dog"),
      (4L, "sphinx of black quartz judge my vow"))
    val stream = MemoryStream[(Long, String)]
    val q = StreamOps.bandOwnership(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("band_own")
      .outputMode("append").start()
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("band_own")
        .groupBy($"doc_id")
        .agg(sum(when($"owned", 1L).otherwise(0L)).as("n_owned"),
          count(lit(1)).as("n_bands"))
        .select($"doc_id", $"n_owned", ($"n_owned" === $"n_bands").as("novel"))
      val batch = StreamOps.nearDupVerdict((b1 ++ b2).toDF("doc_id", "text"))
      assert(snap(streamed) == snap(batch))
      // the re-crawl owns nothing; everyone else owns all 4 bands
      val verdict = streamed.collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(verdict == Map(1L -> true, 2L -> true, 3L -> false, 4L -> true))
    } finally q.stop()
  }

  test("w14: out-of-order arrival pins ARRIVAL-order ownership, not min-id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // ADVICE r7: the batch-parity contract assumes in-order delivery; this
    // spec pins what happens when that contract is BROKEN — the higher id
    // arrives first and legitimately keeps its claim (first-come-first-
    // served is the intended streaming semantics), so the verdict diverges
    // from the batch min-id twin in exactly this one documented way.
    val stream = MemoryStream[(Long, String)]
    val q = StreamOps.bandOwnership(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("band_own_ooo")
      .outputMode("append").start()
    try {
      stream.addData((9L, "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
      stream.addData((1L, "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
      val verdict = spark.table("band_own_ooo")
        .groupBy($"doc_id")
        .agg(sum(when($"owned", 1L).otherwise(0L)).as("n_owned"),
          count(lit(1)).as("n_bands"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1) == r.getLong(2))).toMap
      // arrival order: 9 arrived first and owns everything; 1 owns nothing
      assert(verdict == Map(9L -> true, 1L -> false), verdict.toString)
      // and the batch twin (min-id owner) says the OPPOSITE for this input —
      // the divergence is the documented contract, not a bug
      val batch = StreamOps.nearDupVerdict(
        Seq((9L, "the quick brown fox jumps over the lazy dog"),
          (1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(batch == Map(1L -> true, 9L -> false), batch.toString)
    } finally q.stop()
  }

  test("w15: streaming ANN serving rollup == batch IVF search on same queries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.T(spark, sfDir)
    val queries = t.embeddings.filter($"vec_id" % 25 === 7)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toSeq
    assert(queries.nonEmpty)
    val stream = MemoryStream[(Long, Array[Float])]
    val served = graft.operators.Similarity.annServeStream(
      stream.toDF().toDF("vec_id", "embedding"), t)
    val q = served.writeStream.format("memory").queryName("ann_serve")
      .outputMode("append").start()
    try {
      // split across micro-batches: each batch re-joins the static index
      stream.addData(queries.take(2): _*); q.processAllAvailable()
      stream.addData(queries.drop(2): _*); q.processAllAvailable()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"cosine".desc, $"neighbor_id")
      val ranked = spark.table("ann_serve")
        .withColumn("rk", row_number().over(w).cast("long")).filter($"rk" <= 3)
        .select($"query_id", $"rk", $"neighbor_id", $"cosine")
      assert(snap(ranked) == snap(StreamOps.w15StreamAnn(t)))
    } finally q.stop()
  }

  test("w17: streaming quality admission == batch gate on the same docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t = graft.T(spark, sfDir)
    val docs = t.documents.select($"doc_id", $"text", $"source")
      .as[(Long, String, String)].collect().toSeq
    val stream = MemoryStream[(Long, String, String)]
    val admitted = StreamOps.qualityAdmission(
      stream.toDF().toDF("doc_id", "text", "source"))
    val q = admitted.writeStream.format("memory").queryName("quality_gate")
      .outputMode("append").start()
    try {
      // stateless gate: micro-batch boundaries must not affect the verdict
      stream.addData(docs.take(docs.size / 2): _*); q.processAllAvailable()
      stream.addData(docs.drop(docs.size / 2): _*); q.processAllAvailable()
      val streamed = snap(spark.table("quality_gate"))
      val batch = snap(StreamOps.qualityAdmission(
        t.documents.select($"doc_id", $"text", $"source")))
      assert(streamed == batch)
      // the threshold carries mass on BOTH sides (else the gate is vacuous)
      assert(streamed.nonEmpty && streamed.size < docs.size,
        s"admitted ${streamed.size} of ${docs.size}")
    } finally q.stop()
  }

  test("stream-static enrichment joins the dimension without state") {
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val out = StreamOps.enrichWithUsers(sample.toDF(), dim)
      .select($"event_id", coalesce($"tier", lit("none")).as("tier"))
    val tiers = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tiers(1L) == "gold" && tiers(3L) == "silver" && tiers(6L) == "none")
  }
}
