package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Events
import graft.streaming.{EventStreams, StreamEvent}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val MinNs = 60L * 1000000000L
  // realistic epoch base: an event AT the initial watermark (t=0) would be
  // dropped as late by the stateful operator
  private val Base = 1704067200L * 1000000000L // 2024-01-01T00:00Z

  // user 7: sessions {t0,t10} and {t50}; user 8: {t5}
  // non-dyadic values on purpose: 1.1 + 2.2 != 3.3 in raw double
  // arithmetic, so these catch any streaming/batch divergence from the
  // integer-micro-unit sum rule (a raw double sum would fail the
  // exact-equality asserts below)
  private val events = Seq(
    StreamEvent(1L, Base + 0L * MinNs, 7L, "view", 1.1),
    StreamEvent(2L, Base + 10L * MinNs, 7L, "click", 2.2),
    StreamEvent(3L, Base + 50L * MinNs, 7L, "view", 4.4),
    StreamEvent(4L, Base + 5L * MinNs, 8L, "view", 8.8))

  // sentinel far in the future to push the watermark past every gap
  private val flush = StreamEvent(99L, Base + 1000L * MinNs, 999L, "flush", 0.0)

  test("streaming sessionize agrees with the batch sessionize") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[StreamEvent]
    val q = EventStreams.sessionize(in.toDF())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      in.addData(events)
      q.processAllAvailable()
      in.addData(flush)
      q.processAllAvailable()

      val streamed = s.sql(
        "SELECT user_id, start_us, end_us, n_events, sum_value FROM sessions_out WHERE user_id != 999")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet

      val batch = Events.sessionize(events.toDF())
        .select("user_id", "start_us", "end_us", "n_events", "sum_value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet

      assert(streamed == batch)
      assert(streamed.size == 3)
    } finally q.stop()
  }

  test("dedupStream: first arrival of each content hash wins, duplicates drop") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val t0 = new java.sql.Timestamp(1704067200L * 1000L)
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = EventStreams.dedupStream(
      in.toDF().toDF("doc_id", "text", "event_time"), "text", "event_time", "30 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      in.addData((1L, "alpha", ts(0)), (2L, "beta", ts(1)), (3L, "alpha", ts(2)))
      q.processAllAvailable()
      in.addData((4L, "alpha", ts(3)), (5L, "gamma", ts(4)))
      q.processAllAvailable()
      val out = s.sql("SELECT doc_id, text FROM dedup_out")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out.values.toSet == Set("alpha", "beta", "gamma"))
      assert(out.keySet == Set(1L, 2L, 5L)) // first arrivals only, across batches
    } finally q.stop()
  }

  test("ingestDedupStream: historical index kills known content, stream dedup kills repeats") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val t0 = new java.sql.Timestamp(1704067200L * 1000L)
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // history knows "alpha"
    val idx = Seq("alpha").toDF("t")
      .select(org.apache.spark.sql.functions.md5($"t").as("fp"))
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = EventStreams.ingestDedupStream(
      in.toDF().toDF("doc_id", "text", "event_time"), "text", "event_time",
      idx, "fp", "30 minutes")
      .writeStream.format("memory").queryName("ingest_dedup_out")
      .outputMode("append").start()
    try {
      in.addData((1L, "alpha", ts(0)), (2L, "beta", ts(1)), (3L, "beta", ts(2)))
      q.processAllAvailable()
      in.addData((4L, "gamma", ts(3)), (5L, "alpha", ts(4)))
      q.processAllAvailable()
      val out = s.sql("SELECT doc_id FROM ingest_dedup_out")
        .collect().map(_.getLong(0)).toSet
      // 1 and 5 die on the index, 3 dies in-stream; 2 and 4 survive —
      // the same survivors Dedup.dedupIncremental picks in batch
      assert(out == Set(2L, 4L))
    } finally q.stop()
  }

  test("crawlIngestStream: chrome stripped via static boiler sets, langs routed, " +
      "Gopher gated, PII masked, index + in-stream dedup") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import graft.ops.TextOps
    val t0 = new java.sql.Timestamp(1704067200L * 1000L)
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    def page(body: String) = "<html><head><title>t</title></head><body>" +
      "<div>site menu line</div><p>" + body +
      "</p><div>footer legal line</div></body></html>"
    val bodyGood = "the quick brown fox jumps over the lazy dog and then " +
      "the fox naps across a warm afternoon of calm and quiet rest"
    val bodyNew = "a steady stream of new pages arrives and the cleaner " +
      "keeps the corpus fresh by checking every gate before it admits the text"
    val knownBody = "every member of the committee saw the report and the " +
      "board agreed that the plan was ready for another review cycle today"
    // boiler sets trained on a HISTORICAL batch through the real API —
    // the chrome lines repeat across both docs (frac 1.0 >= 0.4)
    val hist = Seq(
      (100L, "a", "site menu line\nold unique body one\nfooter legal line"),
      (101L, "a", "site menu line\nold unique body two\nfooter legal line"))
      .toDF("doc_id", "source", "text")
    val bsets = TextOps.boilerplateSets(hist, "doc_id", "text", "source", 0.4)
    // the corpus index already holds knownBody's (clean, redacted) hash
    val idx = Seq(knownBody).toDF("t")
      .select(org.apache.spark.sql.functions.md5($"t").as("fp"))
    val in = MemoryStream[(Long, String, String, java.sql.Timestamp)]
    val q = EventStreams.crawlIngestStream(
      in.toDF().toDF("doc_id", "source", "html", "event_time"),
      "doc_id", "html", "source", "event_time", Seq("en"), bsets, idx, "fp",
      "30 minutes")
      .writeStream.format("memory").queryName("crawl_ingest_out")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, "a", page(bodyGood + " mail bob@x.com now"), ts(0)),
        (2L, "a", page("日本語のテキストです これはテスト"), ts(1)), // routed: ja
        (3L, "a", page("tiny doc"), ts(2)), // Gopher: < 20 words
        (4L, "a", page(knownBody), ts(3))) // index kill
      q.processAllAvailable()
      in.addData(
        (5L, "a", page(bodyGood + " mail bob@x.com now"), ts(4)), // in-stream dup of 1
        (6L, "a", page(bodyNew), ts(5)))
      q.processAllAvailable()
      val out = s.sql("SELECT doc_id, lang, text FROM crawl_ingest_out")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
      assert(out.keySet == Set(1L, 6L),
        s"survivors must be 1 and 6, got ${out.keySet}")
      assert(out.values.forall(_._1 == "en"))
      // chrome gone, PII masked, body intact — the same text the batch
      // chain would emit
      assert(out(1L)._2 == bodyGood + " mail <EMAIL> now")
      assert(out(6L)._2 == bodyNew)
    } finally q.stop()
  }

  test("gopherKeep column form == gopherQualityFlags frame keep, row for row") {
    val s = spark
    import s.implicits._
    import graft.ops.TextOps
    // the q_gopher_quality splice shapes: clean pass, bullet/symbol
    // tail, short text, no stopwords
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and then the fox " +
        "naps across a warm afternoon of calm and quiet rest",
      "short one",
      "xxxx yyyy zzzz qqqq wwww",
      "the list doc\n- alpha bullet\n* beta bullet\n" +
        "##############################... ... ...")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val frame = TextOps.gopherQualityFlags(df, "doc_id", "text")
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val col_ = df.select($"doc_id", TextOps.gopherKeep($"text").as("k"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(frame == col_, s"frame=$frame col=$col_")
    assert(frame.values.toSeq.count(identity) == 1, "only the long doc passes")
  }

  test("crawlFrontierStream: canonical variants collapse against index and stream") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val t0 = new java.sql.Timestamp(1704067200L * 1000L)
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // history fetched x.org/p — under a DIFFERENT transport variant
    val idx = Seq("HTTPS://X.ORG:443/p/").toDF("u")
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = EventStreams.crawlFrontierStream(
      in.toDF().toDF("req_id", "url", "event_time"), "url", "event_time",
      idx, "u", "30 minutes")
      .writeStream.format("memory").queryName("frontier_out")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, "https://x.org/p?utm_source=a", ts(0)), // canonical = fetched -> dies
        (2L, "https://y.org/q", ts(1)),              // fresh -> survives
        (3L, "https://Y.ORG/q#frag", ts(2)))         // variant of 2 -> dies in-stream
      q.processAllAvailable()
      in.addData((4L, "https://y.org/q?a=1", ts(3))) // genuinely new query -> survives
      q.processAllAvailable()
      val out = s.sql("SELECT req_id, canonical_url FROM frontier_out")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out.keySet == Set(2L, 4L))
      assert(out(2L) == "https://y.org/q")
      // batch-twin: urlDedup's representatives on the same (non-indexed)
      // arrivals pick the same canonical survivors
      val batch = graft.ops.TextOps.urlDedup(
        Seq((2L, "https://y.org/q"), (3L, "https://Y.ORG/q#frag"),
          (4L, "https://y.org/q?a=1")).toDF("id", "url"), "id", "url")
        .collect().map(_.getString(0)).toSet
      assert(batch == out.values.toSet)
    } finally q.stop()
  }

  test("neardupStream: stream-static band probe equals batch neardupIncremental") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val t0 = new java.sql.Timestamp(1704067200L * 1000L)
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val hist = Seq(
      (2L, "spark catalyst optimizer rewrites logical plans into physical trees"),
      (4L, "ducks swim on the quiet pond under a pale morning sky today"))
      .toDF("doc_id", "text")
    val idx = graft.ops.Dedup.bandKeyIndex(hist, "doc_id", "text", 8, 4)
    val fresh = Seq(
      (11L, "spark catalyst optimizer rewrites logical plans into physical trees", ts(0)),
      (13L, "an entirely new document about watermark state and session windows", ts(1)),
      (15L, "ducks swim on the quiet pond under a pale morning sky today", ts(2)))
    val flush = (99L, "flush row far in the future to close every window", ts(600))
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = EventStreams.neardupStream(
      in.toDF().toDF("doc_id", "text", "event_time"), "doc_id", "text",
      "event_time", idx, 8, 4)
      .writeStream.format("memory").queryName("neardup_stream_out")
      .outputMode("append").start()
    try {
      in.addData(fresh: _*)
      q.processAllAvailable()
      in.addData(flush)
      q.processAllAvailable()
      val out = s.sql("SELECT doc_id, dup_of FROM neardup_stream_out")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = graft.ops.Dedup.neardupIncremental(
        fresh.map(x => (x._1, x._2)).toDF("doc_id", "text"),
        "doc_id", "text", idx, 8, 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == batch)
      assert(out == Map(11L -> 2L, 15L -> 4L))
    } finally q.stop()
  }

  test("pointInTimeEnrich: each event sees the SCD2 version valid at ITS time, no leakage") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val MinNs = 60L * 1000000000L
    val Base = 1704067200L * 1000000000L
    // dimension history for user 7: value 1.0 from t0, 2.0 from t30
    val dimEvents = Seq(
      (1L, Base + 0L * MinNs, 7L, "price", 1.0),
      (2L, Base + 30L * MinNs, 7L, "price", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dim = graft.ops.Events.scd2Intervals(dimEvents)
      .withColumnRenamed("value", "price")
      .drop("event_type")
    val in = MemoryStream[(Long, Long, Long, String, Double)]
    val q = EventStreams.pointInTimeEnrich(
      in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
      dim, "user_id", Seq("price"))
      .select($"event_id", $"dim_price")
      .writeStream.format("memory").queryName("pit_out")
      .outputMode("append").start()
    try {
      in.addData(
        (10L, Base + 10L * MinNs, 7L, "view", 0.0),  // inside v1
        (11L, Base + 30L * MinNs, 7L, "view", 0.0),  // boundary: v2 inclusive
        (12L, Base + 90L * MinNs, 7L, "view", 0.0),  // open-ended v2
        (13L, Base - 5L * MinNs, 7L, "view", 0.0),   // before history: null
        (14L, Base + 10L * MinNs, 8L, "view", 0.0))  // unknown key: null
      q.processAllAvailable()
      val out = s.sql("SELECT event_id, dim_price FROM pit_out")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
      assert(out(10L) == 1.0 && out(11L) == 2.0 && out(12L) == 2.0)
      assert(out(13L).isNaN && out(14L).isNaN)
    } finally q.stop()
  }

  test("file-source -> windowed aggs -> parquet sink round trip (real source+sink)") {
    implicit val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val (inDir, outDir, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    // seed the source dir with one parquet file of events, plus a late
    // flush file so the watermark passes the real windows
    events.toDF().coalesce(1).write.parquet(inDir)
    Seq(flush).toDF().coalesce(1).write.mode("append").parquet(inDir)

    // one file per micro-batch: the flush file lands in a later batch, so
    // the watermark has advanced past every real window when it arrives
    val stream = s.readStream.schema(events.toDF().schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
    val q = EventStreams.windowedAggs(stream)
      .selectExpr("window.start AS ws", "event_type", "n", "sum_value")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
    } finally q.stop()

    val out = s.read.parquet(outDir)
    // every real (non-flush) 5-min window is past the watermark → emitted
    val emitted = out.filter($"event_type" =!= "flush")
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(emitted.map(_._2).sum == events.size)
    assert(emitted.map(_._1).toSet == Set("view", "click"))
  }

  test("checkpoint recovery: restart resumes exactly-once from the sink's view") {
    implicit val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    val (inDir, outDir, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    events.take(2).toDF().coalesce(1).write.parquet(inDir)

    def startQuery() = {
      val stream = s.readStream.schema(events.toDF().schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      EventStreams.windowedAggs(stream)
        .selectExpr("window.start AS ws", "event_type", "n", "sum_value")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // more data lands while the query is DOWN; restart from checkpoint
    events.drop(2).toDF().coalesce(1).write.mode("append").parquet(inDir)
    Seq(flush).toDF().coalesce(1).write.mode("append").parquet(inDir)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val emitted = s.read.parquet(outDir).filter($"event_type" =!= "flush")
      .collect().map(r => (r.getString(1), r.getLong(2)))
    // every event counted exactly once across the restart
    assert(emitted.map(_._2).sum == events.size)
  }

  test("streaming funnel agrees with the batch funnel (view -> click -> view)") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // user 7 completes view(t0) -> click(t10) -> view(t50) across TWO
    // micro-batches; user 8 never passes stage 1; equal-ts click for
    // user 7 at t0 must NOT satisfy the strict > constraint
    val funEvents = Seq(
      StreamEvent(1L, Base + 0L * MinNs, 7L, "view", 1.0),
      StreamEvent(2L, Base + 0L * MinNs, 7L, "click", 1.0),
      StreamEvent(3L, Base + 10L * MinNs, 7L, "click", 1.0),
      StreamEvent(4L, Base + 5L * MinNs, 8L, "view", 1.0))
    val batch2 = Seq(
      StreamEvent(5L, Base + 50L * MinNs, 7L, "view", 1.0),
      StreamEvent(6L, Base + 60L * MinNs, 8L, "purchase", 1.0))
    val stages = Seq("view", "click", "view")

    val in = MemoryStream[StreamEvent]
    val q = EventStreams.funnelStream(in.toDF(), stages)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      in.addData(funEvents)
      q.processAllAvailable()
      in.addData(batch2)
      q.processAllAvailable()

      val streamed = s.sql("SELECT user_id, stage_times FROM funnel_out")
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet

      val batch = Events.funnel(
        (funEvents ++ batch2).toDF()
          .withColumn("tsu", org.apache.spark.sql.functions.expr("ts div 1000L")),
        "user_id", "tsu", "event_type", stages)
        .collect().map(r => (r.getLong(0), Seq(r.getLong(1), r.getLong(2), r.getLong(3)))).toSet

      assert(streamed == batch)
      assert(streamed.size == 1 && streamed.head._1 == 7L)
    } finally q.stop()
  }

  test("funnelStream evicts state for users who never complete the funnel") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[StreamEvent]
    // 10-minute idle expiry so the flush events push the watermark far past it
    val q = EventStreams.funnelStream(in.toDF(), Seq("view", "click"),
        idleExpiryMicros = 10L * 60L * 1000000L)
      .writeStream.format("memory").queryName("funnel_evict_out")
      .outputMode("append").start()
    try {
      // user 7 reaches stage 1 only, then goes silent forever
      in.addData(StreamEvent(1L, Base + 0L * MinNs, 7L, "view", 1.0))
      q.processAllAvailable()
      // two flush batches: the first advances the watermark past
      // t0 + expiry, the second runs with the advanced watermark so the
      // timeout fires and the post-batch state metric reflects the removal
      in.addData(StreamEvent(98L, Base + 1000L * MinNs, 999L, "flush", 0.0))
      q.processAllAvailable()
      in.addData(StreamEvent(99L, Base + 1001L * MinNs, 999L, "flush", 0.0))
      q.processAllAvailable()

      assert(s.sql("SELECT * FROM funnel_evict_out").count() == 0)
      // the never-completing user's entry is GONE from the state store
      // (flush user never matches stage 1, so it holds no state either)
      val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows == 0L, s"state rows: $stateRows")
    } finally q.stop()
  }

  test("streaming windowed aggs count correctly under watermark") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[StreamEvent]
    val q = EventStreams.windowedAggs(in.toDF())
      .writeStream.format("memory").queryName("windows_out")
      .outputMode("complete").start()
    try {
      in.addData(events)
      q.processAllAvailable()
      val total = s.sql("SELECT sum(n) FROM windows_out").collect().head.getLong(0)
      assert(total == events.size)
    } finally q.stop()
  }

  test("attributionJoin: stream-stream interval join agrees with the batch join") {
    implicit val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.expr
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // user 7: view@0 + click@10min (attributed, window 15 min) and
    // view@50 with no click; user 8: view@5 with a click@40min — OUTSIDE
    // the window, must not pair; click@3min for user 8 PRECEDES its view
    // — must not pair either
    val attrEvents = events ++ Seq(
      StreamEvent(5L, Base + 40L * MinNs, 8L, "click", 1.0),
      StreamEvent(6L, Base + 3L * MinNs, 8L, "click", 1.0))

    val in = MemoryStream[StreamEvent]
    val q = EventStreams.attributionJoin(in.toDF(), "view", "click", joinWindowSec = 900L)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      in.addData(attrEvents)
      q.processAllAvailable()
      in.addData(flush)
      q.processAllAvailable()

      val streamed = s.sql("SELECT user_id, view_id, click_id, lag_us FROM attr_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

      // batch twin: plain self-join with the identical predicate
      val df = attrEvents.toDF().withColumn("t_us", expr("ts div 1000"))
      val v = df.filter($"event_type" === "view")
        .select($"event_id".as("view_id"), $"user_id".as("u"), $"t_us".as("vt"))
      val c = df.filter($"event_type" === "click")
        .select($"event_id".as("click_id"), $"user_id".as("cu"), $"t_us".as("ct"))
      val batch = v.join(c, $"u" === $"cu" && $"ct" >= $"vt" && $"ct" < $"vt" + 900L * 1000000L)
        .select($"u", $"view_id", $"click_id", ($"ct" - $"vt").as("lag_us"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

      assert(streamed == batch)
      assert(streamed == Set((7L, 1L, 2L, 600000000L))) // exactly the one attribution
    } finally q.stop()
  }

  test("windowedTopK: bounded per-window heavy hitters agree with the batch top-k") {
    implicit val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val in = MemoryStream[StreamEvent]
    val q = EventStreams.windowedTopK(in.toDF(), k = 2)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("append").start()
    try {
      in.addData(events)
      q.processAllAvailable()
      in.addData(flush) // advance watermark so all windows close
      q.processAllAvailable()

      val streamed = s.sql(
        "SELECT window_start_us, rank, event_id, value FROM topk_out WHERE event_id != 99")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

      val batch = events.toDF()
        .withColumn("w_us", expr("((ts div 1000) div 300000000L) * 300000000L"))
        .groupBy($"w_us")
        .agg(graft.functions.GraftFunctions.topk_by($"event_id", $"value", 2).as("top"))
        .select($"w_us", posexplode($"top"))
        .select($"w_us", ($"pos" + 1).cast("int").as("rank"), $"col.id", $"col.score")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("enrichStream: static dim decorates the stream, unmatched keys keep null") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val dim = Seq(("view", "browse"), ("click", "engage")).toDF("event_type", "category")
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.enrichStream(in.toDF(), dim, "event_type")
      .select($"event_id", $"category")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      in.addData(events)
      q.processAllAvailable()
      val r = s.sql("SELECT event_id, category FROM enrich_out")
        .collect().map(x => x.getLong(0) -> Option(x.getString(1))).toMap
      assert(r(1L).contains("browse") && r(2L).contains("engage"))
      assert(r.size == events.size) // left outer: every event survives
    } finally q.stop()
  }

  test("windowedDistinctHll: sketch registers merge across micro-batches, equals batch") {
    implicit val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // 40 users spread over two 5-min windows, DELIVERED IN TWO BATCHES
    // that split every window — the per-window register state must
    // survive and element-wise-max merge across the batch boundary
    val all = (1 to 40).map { i =>
      StreamEvent(i.toLong, Base + (i % 8).toLong * MinNs, (i % 20).toLong, "view", 1.0)
    }
    val (first, second) = all.splitAt(20)

    val in = MemoryStream[StreamEvent]
    val q = EventStreams.windowedDistinctHll(in.toDF(), b = 8)
      .writeStream.format("memory").queryName("hll_out")
      .outputMode("append").start()
    try {
      in.addData(first)
      q.processAllAvailable()
      in.addData(second)
      q.processAllAvailable()
      in.addData(Seq(flush))
      q.processAllAvailable()

      val streamed = s.sql(
        "SELECT window_start_us, est_users, n_events FROM hll_out WHERE n_events > 1")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet

      val batch = all.toDF()
        .withColumn("w_us", expr("((ts div 1000) div 300000000L) * 300000000L"))
        .groupBy($"w_us")
        .agg(graft.functions.GraftFunctions.hll_distinct($"user_id", 8).as("est_users"),
          count(lit(1)).as("n_events"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet

      assert(streamed == batch, s"streamed $streamed vs batch $batch")
      assert(streamed.nonEmpty)
      // at 20 distinct users the b=8 sketch is in its exact
      // (linear-counting) range: estimates must be near-exact
      streamed.foreach { case (_, est, _) => assert(est > 0 && est < 30) }
    } finally q.stop()
  }

  test("runningMoments: exact integral state is batch-split invariant") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // non-dyadic values: a raw double Σx² would drift across splits
    val all = (1 to 30).map(i =>
      StreamEvent(i.toLong, Base + i.toLong * MinNs, i.toLong, "gauge", i * 1.1))

    def runWith(split: Int): Map[String, (Long, Double, Double)] = {
      val in = MemoryStream[StreamEvent]
      val name = s"moments_out_$split"
      val q = EventStreams.runningMoments(in.toDF())
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        val (a, b) = all.splitAt(split)
        in.addData(a); q.processAllAvailable()
        in.addData(b); q.processAllAvailable()
        // update mode: the LAST row per type is the cumulative answer
        s.sql(s"SELECT event_type, n, mean_value, std_value FROM $name")
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
      } finally q.stop()
    }

    val r10 = runWith(10)
    val r23 = runWith(23)
    assert(r10 == r23, s"split-dependent state: $r10 vs $r23")
    val (n, mean, std) = r10("gauge")
    assert(n == 30L)
    // exact expectation from the same integral-state rule
    val micros = (1 to 30).map(i => BigDecimal(i * 1.1 * 1e6)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong)
    val s1 = micros.sum
    val s2 = micros.map(m => BigInt(m) * BigInt(m)).sum
    val expMean = BigDecimal(BigDecimal(s1).toDouble / 30.0 / 1e6)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    val expStd = BigDecimal(math.sqrt(
      (s2 * 30 - BigInt(s1) * BigInt(s1)).toDouble / (30.0 * 30.0)) / 1e6)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(mean == expMean && std == expStd, s"got ($mean, $std), want ($expMean, $expStd)")
  }

  test("windowedQuantiles: streamed histogram estimates equal the batch sketch") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.functions._

    // two 5-min windows of skewed values, split across micro-batches
    val evs = (1 to 40).map(i =>
      StreamEvent(i.toLong, Base + (i % 8).toLong * MinNs, i.toLong, "m",
        (i * i % 97).toDouble))
    val ps = Seq("p50" -> 0.5, "p90" -> 0.9)
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.windowedQuantiles(in.toDF(), 0.0, 100.0, 20, ps)
      .writeStream.format("memory").queryName("wq_out")
      .outputMode("update").start()
    try {
      val (a, b) = evs.splitAt(17)
      in.addData(a); q.processAllAvailable()
      in.addData(b); q.processAllAvailable()
      // update mode: last row per window is the cumulative answer
      val streamed = s.sql(
        "SELECT window_start_us, n, p50, p90 FROM wq_out")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
      // batch twin: the same grid through quantileSketchGrouped keyed by
      // the same tumbling window start
      val batch = graft.ops.Sketches.quantileSketchGrouped(
        EventStreams.withEventTime(evs.toDF())
          .withColumn("wstart", unix_micros(window(col("event_time"), "5 minutes")("start")))
          .select(col("wstart"), col("value")),
        Seq("wstart"), "value", 0.0, 100.0, 20, ps)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toMap
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
    } finally q.stop()
  }

  test("runningMoments: BigInt variance survives where doubles cancel") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // values ≈ 1e9 with unit-scale spread: S2 ≈ 1e31 micro² where
    // ulp(double) ≈ 2e15, yet n·S2 − S1² = 8.25e14 — BELOW one ulp of
    // the operands. The double-subtraction form returns pure rounding
    // noise here; the exact BigInt difference gives std = √8.25.
    val big = (0 until 10).map(i =>
      StreamEvent(i.toLong, Base + i.toLong * MinNs, i.toLong, "big", 1e9 + i))
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.runningMoments(in.toDF())
      .writeStream.format("memory").queryName("moments_big")
      .outputMode("update").start()
    try {
      in.addData(big); q.processAllAvailable()
      val row = s.sql("SELECT n, std_value FROM moments_big ORDER BY n DESC")
        .collect().head
      assert(row.getLong(0) == 10L)
      val expStd = BigDecimal(math.sqrt(8.25))
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(row.getDouble(1) == expStd,
        s"cancellation: got ${row.getDouble(1)}, want $expStd")
    } finally q.stop()
  }

  test("sessionWindowsStream: native session windows merge across micro-batches, equal batch") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // one user whose session SPANS the micro-batch boundary (10-min
    // steps inside a 30-min gap), plus a separate later session
    val evs = (0 until 6).map(i =>
      StreamEvent(i.toLong, Base + i.toLong * 10L * MinNs, 7L, "m", 1.25)) ++
      Seq(StreamEvent(10L, Base + 300L * MinNs, 7L, "m", 2.5))
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.sessionWindowsStream(in.toDF())
      .writeStream.format("memory").queryName("sw_out")
      .outputMode("append").start()
    try {
      val (a, b) = evs.splitAt(3) // split inside the first session
      in.addData(a); q.processAllAvailable()
      in.addData(b); q.processAllAvailable()
      in.addData(Seq(flush)); q.processAllAvailable()
      val streamed = s.sql(
        "SELECT user_id, start_us, end_us, n_events, sum_value FROM sw_out WHERE user_id = 7")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      val batch = graft.ops.Events.sessionWindows(evs.toDF())
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
      // the boundary-spanning session arrived whole: 6 events, one row
      assert(streamed.exists(_._4 == 6L), streamed.toString)
    } finally q.stop()
  }

  test("phashStream: media ingest probes the static perceptual index, byte-dup flags at Hamming 0") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import graft.ops.{MediaRecord, Multimodal}

    val p1 = "the same leading frame bytes".getBytes("UTF-8")
    val p2 = "completely different payload".getBytes("UTF-8")
    val hist = spark.createDataset(Seq(
      MediaRecord(1L, "image/stub", p1), MediaRecord(2L, "image/stub", p2)))
    val staticSigs = Multimodal.perceptualSignatures(hist).toDF()
      .localCheckpoint(true)

    val in = MemoryStream[(Long, String, Array[Byte], Long)]
    val media = in.toDF().toDF("doc_id", "media_type", "payload", "ts")
      .withColumn("event_time",
        org.apache.spark.sql.functions.timestamp_micros(expr("ts div 1000")))
    val q = EventStreams.phashStream(media, staticSigs)
      .writeStream.format("memory").queryName("ph_out")
      .outputMode("append").start()
    try {
      // doc 100 re-ingests p1's bytes (stub signature collides -> dup
      // of 1 at Hamming 0); doc 101 is novel
      in.addData(Seq((100L, "image/stub", p1, Base),
        (101L, "image/stub", "novel bytes never seen".getBytes("UTF-8"), Base)))
      q.processAllAvailable()
      in.addData(Seq((999L, "image/stub", p2, Base + 1000L * MinNs)))
      q.processAllAvailable()
      val rows = s.sql("SELECT doc_id, dup_of, hamming FROM ph_out")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(rows.contains(100L) && rows(100L) == ((1L, 0L)), rows.toString)
      assert(!rows.contains(101L), rows.toString)
    } finally q.stop()
  }

  test("sessionPathsStream: out-of-order micro-batches yield the batch journey prefix") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // ONE session of 6 events (minutes 0..5, distinct types) delivered
    // shuffled across two micro-batches — the order-free earliest-k
    // merge must still produce the first-5 prefix in event-time order,
    // plus a later second session
    val types = Array("a", "b", "c", "d", "e", "f")
    val evs = (0 until 6).map(i =>
      StreamEvent(10L + i, Base + i.toLong * MinNs, 7L, types(i), 1.0)) :+
      StreamEvent(20L, Base + 300L * MinNs, 7L, "z", 1.0)
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.sessionPathsStream(in.toDF(), maxSteps = 5)
      .writeStream.format("memory").queryName("sp_out")
      .outputMode("append").start()
    try {
      // batch 1: minutes 2, 4, 0 (shuffled); batch 2: 1, 3, 5 + later session
      in.addData(Seq(evs(2), evs(4), evs(0))); q.processAllAvailable()
      in.addData(Seq(evs(1), evs(3), evs(5), evs(6))); q.processAllAvailable()
      in.addData(Seq(flush)); q.processAllAvailable()
      val streamed = s.sql(
        "SELECT user_id, start_us, path, n_events FROM sp_out WHERE user_id = 7")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
      val batch = Events.sessionPaths(evs.toDF(), maxSteps = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
      assert(streamed.exists(_._3 == "a>b>c>d>e"), streamed.toString)
      assert(streamed.exists(t => t._3 == "z" && t._4 == 1L), streamed.toString)
    } finally q.stop()
  }

  test("driftMonitor: streamed KS vs static baseline equals batch, flags the drifted window") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.functions._

    // baseline: uniform-ish historical values in [0, 100)
    val baseline = EventStreams.baselineHistogram(
      (0 until 200).map(i => (i * 37 % 100).toDouble).toDF("v"), "v", 0.0, 100.0, 10)
    // window 1 matches the baseline shape; window 2 collapses to [0,10)
    val evs =
      (1 to 40).map(i => StreamEvent(i.toLong, Base + MinNs, i.toLong, "m",
        (i * 37 % 100).toDouble)) ++
      (1 to 40).map(i => StreamEvent(100L + i, Base + 6L * MinNs, i.toLong, "m",
        (i % 10).toDouble))
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.driftMonitor(in.toDF(), baseline, 0.0, 100.0, 10, 0.5)
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("update").start()
    try {
      val (a, b) = evs.splitAt(30) // split mid-window across micro-batches
      in.addData(a); q.processAllAvailable()
      in.addData(b); q.processAllAvailable()
      // update mode: the row with the max n per window is the final state
      val streamed = s.sql("SELECT window_start_us, n_events, ks, drift FROM drift_out")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
      val batch = EventStreams.ksProjection(
        EventStreams.withEventTime(evs.toDF())
          .groupBy(unix_micros(window(col("event_time"), "5 minutes")("start")).as("window_start_us"))
          .agg(graft.functions.GraftFunctions.histogram(col("value"), 0.0, 100.0, 10).as("hist"))
          .crossJoin(baseline), 0.5)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
        .toMap
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
      val byWindow = streamed.toSeq.sortBy(_._1).map(_._2)
      assert(byWindow.size == 2)
      assert(!byWindow.head._3, s"matching window must not alarm: $streamed")
      assert(byWindow.last._3, s"collapsed window must alarm: $streamed")
    } finally q.stop()
  }

  test("anomalyBandsStream: windowed counts score against the frozen median/MAD bands") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.functions._

    // history: type "m" counts [8, 10, 10, 12, 14] across five 5-min
    // windows -> median 10, MAD 2, band 10 +/- 3*2 = [4, 16]
    val histCounts = Seq(8, 10, 10, 12, 14)
    val history = histCounts.zipWithIndex.flatMap { case (c, w) =>
      (1 to c).map(i => StreamEvent((w * 100 + i).toLong,
        Base + w.toLong * 5L * MinNs, i.toLong, "m", 1.0))
    }
    val baseline = EventStreams.anomalyBaseline(history.toDF())
    val b = baseline.collect().map(r => r.getString(0) ->
      ((r.getDouble(1), r.getDouble(2), r.getInt(3)))).toMap
    assert(b("m") == ((10.0, 2.0, 5)), b.toString)

    // stream: window 1 has 12 "m" (inside band), window 2 has 40
    // (alarm); window 1 also carries an unknown type "z" (no baseline
    // -> anomaly=false, NULL band)
    val evs =
      (1 to 12).map(i => StreamEvent(1000L + i, Base + MinNs, i.toLong, "m", 1.0)) ++
      (1 to 3).map(i => StreamEvent(2000L + i, Base + MinNs, i.toLong, "z", 1.0)) ++
      (1 to 40).map(i => StreamEvent(3000L + i, Base + 6L * MinNs, i.toLong, "m", 1.0))
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.anomalyBandsStream(in.toDF(), baseline, k = 3.0)
      .writeStream.format("memory").queryName("bands_out")
      .outputMode("update").start()
    try {
      val (a2, b2) = evs.splitAt(30) // split mid-window across batches
      in.addData(a2); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      // update mode: max n per (window, type) is the final state
      val streamed = s.sql(
          "SELECT window_start_us, event_type, n, anomaly FROM bands_out")
        .collect().map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getBoolean(3))))
        .groupBy(_._1).map { case (k2, vs) => k2 -> vs.map(_._2).maxBy(_._1) }
      // batch twin: same counts joined against the same baseline
      val batch = EventStreams.withEventTime(evs.toDF())
        .groupBy(window(col("event_time"), "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("ws"), col("event_type"), col("n"))
        .join(baseline.select(col("event_type"), col("expected"), col("mad")),
          Seq("event_type"), "left")
        .select(col("ws"), col("event_type"), col("n"),
          coalesce(abs(col("n").cast("double") - col("expected")) >
            lit(3.0) * col("mad"), lit(false)).as("anomaly"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getBoolean(3))))
        .toMap
      assert(streamed == batch, s"streamed $streamed vs batch $batch")
      val byKey = streamed.map { case ((_, t), (n, an)) => (t, n) -> an }
      assert(byKey(("m", 12L)) == false, streamed.toString)
      assert(byKey(("m", 40L)) == true, streamed.toString)
      assert(byKey(("z", 3L)) == false, streamed.toString)
    } finally q.stop()
  }

  test("labelWindowStream: delayed labels equal batch labelWindow, exactly once per fact") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val H = 3600000000L // 60-minute horizon (µs)
    // user 7: clicks t0/t10; purchases t30 (labels both), t60 (AT click
    // t0's horizon boundary — inside, ots <= fts+h), t65 (labels t10
    // only). user 8: click with no purchases -> zero-outcome label.
    // non-dyadic values: an inexact sum rule would diverge from batch.
    val evs = Seq(
      StreamEvent(1L, Base + 0L * MinNs, 7L, "click", 0.0),
      StreamEvent(2L, Base + 10L * MinNs, 7L, "click", 0.0),
      StreamEvent(3L, Base + 30L * MinNs, 7L, "purchase", 1.1),
      StreamEvent(4L, Base + 60L * MinNs, 7L, "purchase", 2.2),
      StreamEvent(5L, Base + 65L * MinNs, 7L, "purchase", 3.3),
      StreamEvent(6L, Base + 5L * MinNs, 8L, "click", 0.0))
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.labelWindowStream(in.toDF(), "click", "purchase", H)
      .writeStream.format("memory").queryName("labels_out")
      .outputMode("append").start()
    try {
      // out-of-order feed across batches: a purchase (t30) lands BEFORE
      // its clicks' horizons close; the boundary purchase (t60) and a
      // click (t10) arrive in a LATER batch than newer events
      in.addData(evs(0), evs(2), evs(5))
      q.processAllAvailable()
      in.addData(evs(4), evs(1), evs(3))
      q.processAllAvailable()
      // watermark flush: a far-future OUTCOME (stays inside the operator's
      // event-type filter so the watermark actually advances)
      in.addData(StreamEvent(99L, Base + 1000L * MinNs, 999L, "purchase", 0.0))
      q.processAllAvailable()
      in.addData(StreamEvent(98L, Base + 1001L * MinNs, 999L, "purchase", 0.0))
      q.processAllAvailable()

      val streamed = s.sql(
        "SELECT event_id, user_id, tsu, n_outcomes, first_outcome_us, outcome_sum_micro FROM labels_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5)))
      // exactly once per fact
      assert(streamed.map(_._1).distinct.length == streamed.length)

      val e = evs.toDF().withColumn("tsu", expr("ts div 1000"))
      val batch = Events.labelWindow(
          e.filter($"event_type" === "click").select($"user_id", $"tsu", $"event_id"),
          e.filter($"event_type" === "purchase").select($"user_id", $"tsu", $"value"),
          "user_id", "tsu", "event_id", "value", H)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5)))
      assert(streamed.toSet == batch.toSet,
        s"streamed ${streamed.toSet} vs batch ${batch.toSet}")
      assert(streamed.length == 3) // two labeled clicks for user 7, one zero-outcome for user 8
      val byId = streamed.map(l => l._1 -> l).toMap
      // click 1 window (t0, t60]: purchases t30 + boundary t60
      assert(byId(1L)._4 == 2L && byId(1L)._5.contains(Base / 1000 + 30L * 60000000L)
        && byId(1L)._6 == 3300000L)
      // click 6 (user 8): zero outcomes, null first, zero sum
      assert(byId(6L)._4 == 0L && byId(6L)._5.isEmpty && byId(6L)._6 == 0L)
    } finally q.stop()
  }

  test("attributionStream: credits equal batch attribution, exactly once per pair") {
    implicit val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val L = 3600000000L // 60-minute lookback (µs)
    // user 7: clicks t0/t15/t30; purchase t40 v=9.9 (all three in
    // [-20,40) -> credit 3.3 each), purchase t60 v=1.1 (window [0,60):
    // t0 EXACTLY at the floor is included -> n=3), purchase t75 v=2.2
    // (window [15,75): t15+t30). user 8: purchase, no clicks -> nothing.
    val evs = Seq(
      StreamEvent(1L, Base + 0L * MinNs, 7L, "click", 0.0),
      StreamEvent(2L, Base + 15L * MinNs, 7L, "click", 0.0),
      StreamEvent(3L, Base + 30L * MinNs, 7L, "click", 0.0),
      StreamEvent(4L, Base + 40L * MinNs, 7L, "purchase", 9.9),
      StreamEvent(5L, Base + 60L * MinNs, 7L, "purchase", 1.1),
      StreamEvent(6L, Base + 75L * MinNs, 7L, "purchase", 2.2),
      StreamEvent(7L, Base + 5L * MinNs, 8L, "purchase", 7.7))
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.attributionStream(in.toDF(), "click", "purchase", L)
      .writeStream.format("memory").queryName("attrib_out")
      .outputMode("append").start()
    try {
      // cross-batch out-of-order: batch 1's max is t40, so the t15/t30
      // clicks of batch 2 arrive genuinely late (above the t10
      // watermark) and AFTER the t60 purchase in feed order
      in.addData(evs(0), evs(3), evs(6))
      q.processAllAvailable()
      in.addData(evs(4), evs(1), evs(2), evs(5))
      q.processAllAvailable()
      // watermark flush (touch-typed so it passes the operator's filter
      // and emits nothing by itself)
      in.addData(StreamEvent(99L, Base + 1000L * MinNs, 999L, "click", 0.0))
      q.processAllAvailable()
      in.addData(StreamEvent(98L, Base + 1001L * MinNs, 999L, "click", 0.0))
      q.processAllAvailable()

      val streamed = s.sql(
        """SELECT user_id, conv_id, conv_tsu, touch_id, touch_tsu,
          |  n_touches, first_touch, last_touch, linear_credit
          |FROM attrib_out""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6),
          r.getBoolean(7), r.getDouble(8)))
      // exactly once per (conversion, touch) pair
      assert(streamed.map(p => (p._2, p._4)).distinct.length == streamed.length)

      val e = evs.toDF().withColumn("tsu", expr("ts div 1000"))
      val batch = Events.attribution(
          e.filter($"event_type" === "click")
            .select($"user_id", $"tsu", $"event_id"),
          e.filter($"event_type" === "purchase")
            .select($"user_id", $"tsu", $"event_id".as("conv_id"), $"value"),
          "user_id", "tsu", "event_id", "conv_id", "value", L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6),
          r.getBoolean(7), r.getDouble(8)))
      assert(streamed.toSet == batch.toSet,
        s"streamed ${streamed.toSet} vs batch ${batch.toSet}")
      assert(streamed.length == 8) // 3 + 3 + 2 pairs; user 8 absent
      // the t40 conversion: 9.9 / 3 with the batch twin's 6-dp rounding
      val t40 = streamed.filter(_._2 == 4L)
      assert(t40.forall(p => p._6 == 3L && p._9 == 3.3))
      assert(t40.count(_._7) == 1 && t40.count(_._8) == 1)
      // the boundary: click t0 sits exactly at conv t60's window floor
      assert(streamed.exists(p => p._2 == 5L && p._4 == 1L))
    } finally q.stop()
  }
}
