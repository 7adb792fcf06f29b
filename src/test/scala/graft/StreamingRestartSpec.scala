package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventStreams, StreamEvent}

/** Kill-and-restart checkpoint coverage (r9/r10 verdict task): for each
  * stateful streaming operator, events split across a STOPPED query —
  * some arrive before the stop, the rest (including the state-closing
  * watermark push) only after the restart — and the restarted query must
  * produce exactly the batch twin's answer. That proves the operator's
  * state (open sessions / window histograms) round-trips the state-store
  * checkpoint, not just the source offsets. */
class StreamingRestartSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val MinNs = 60L * 1000000000L
  private val Base = 1704067200L * 1000000000L // 2024-01-01T00:00Z

  // user 7: sessions {t0,t10} and {t50}; user 8: {t5}. The {t0,t10}
  // session is OPEN when the query stops — its two events live only in
  // the state store across the restart.
  private val batch1 = Seq(
    StreamEvent(1L, Base + 0L * MinNs, 7L, "view", 1.1),
    StreamEvent(2L, Base + 10L * MinNs, 7L, "click", 2.2),
    StreamEvent(4L, Base + 5L * MinNs, 8L, "view", 8.8))
  private val batch2 = Seq(
    StreamEvent(3L, Base + 50L * MinNs, 7L, "view", 4.4))
  private val flush = StreamEvent(99L, Base + 1000L * MinNs, 999L, "flush", 0.0)
  private def allEvents = batch1 ++ batch2

  /** Run `op` over a file source with a kill/restart between b1 and
    * b2+flush; return the parquet-sink rows. The flush sentinel is
    * overridable: an operator that filters by event_type needs its
    * watermark push to survive that filter. */
  private def runWithRestart(name: String, b1: Seq[StreamEvent] = batch1,
      b2: Seq[StreamEvent] = batch2, flushEvent: StreamEvent = flush)(
      op: DataFrame => DataFrame): DataFrame = {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory(s"graft-restart-$name").toString
    val (inDir, outDir, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    b1.toDF().coalesce(1).write.parquet(inDir)
    def startQuery() = {
      val stream = s.readStream.schema(b1.toDF().schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      op(stream).writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // the session/window state is now only in the checkpoint; more data
    // (including the watermark flush) lands while the query is DOWN
    b2.toDF().coalesce(1).write.mode("append").parquet(inDir)
    Seq(flushEvent).toDF().coalesce(1).write.mode("append").parquet(inDir)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    s.read.parquet(outDir)
  }

  test("sessionWindowsStream: open-session state survives kill-and-restart") {
    val s = spark
    import s.implicits._
    val out = runWithRestart("sess")(EventStreams.sessionWindowsStream(_))
      .filter($"user_id" =!= 999L)
      .select("user_id", "start_us", "end_us", "n_events", "sum_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    val batch = graft.ops.Events.sessionWindows(allEvents.toDF())
      .select("user_id", "start_us", "end_us", "n_events", "sum_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(out == batch)
    // the pre-restart session {t0,t10} must be ONE 2-event session — a
    // lost state store would emit it as two singletons (or drop it)
    assert(out.exists { case (u, _, _, n, sum) => u == 7L && n == 2L && sum == 3.3 })
  }

  test("windowedQuantiles: per-window histogram state survives kill-and-restart") {
    val s = spark
    import s.implicits._
    val ps = Seq("p50" -> 0.5)
    // batch1's t5/t0-t10 events and batch2's t50 land in DIFFERENT 5-min
    // windows; the t0 window {1.1} and t5 window {8.8} and t10 window
    // {2.2} each closed by the post-restart flush
    val out = runWithRestart("quant")(
        EventStreams.windowedQuantiles(_, 0.0, 100.0, 20, ps))
      .filter($"window_start_us" < unix_ts(Base + 900L * MinNs))
      .select("window_start_us", "n", "p50")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = graft.ops.Sketches.quantileSketchGrouped(
        graft.streaming.EventStreams.withEventTime(allEvents.toDF())
          .selectExpr("(ts div 1000) div 300000000 * 300000000 AS window_start_us", "value"),
        Seq("window_start_us"), "value", 0.0, 100.0, 20, ps)
      .select("window_start_us", "n", "p50")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == batch)
    assert(out.size == 4) // t0, t5, t10, t50 windows
  }

  test("driftMonitor: histogram + baseline KS state survives kill-and-restart") {
    val s = spark
    import s.implicits._
    val baseline = EventStreams.baselineHistogram(
      Seq(1.0, 2.0, 5.0, 9.0).toDF("value"), "value", 0.0, 100.0, 20)
    val out = runWithRestart("drift")(
        EventStreams.driftMonitor(_, baseline, 0.0, 100.0, 20, 0.5))
      .filter($"window_start_us" < unix_ts(Base + 900L * MinNs))
      .select("window_start_us", "n_events", "ks", "drift")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
    // batch twin over the same windows
    val hist = EventStreams.withEventTime(allEvents.toDF())
      .selectExpr("(ts div 1000) div 300000000 * 300000000 AS window_start_us", "value")
      .groupBy($"window_start_us")
      .agg(graft.functions.GraftFunctions.histogram($"value", 0.0, 100.0, 20).as("hist"))
    val batch = EventStreams.ksProjection(hist.crossJoin(baseline), 0.5)
      .select("window_start_us", "n_events", "ks", "drift")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
    assert(out == batch)
    assert(out.size == 4)
  }

  private def unix_ts(nanos: Long): Long = nanos / 1000L

  test("neardupStream: per-doc window-min state survives kill-and-restart") {
    val s = spark
    import s.implicits._
    val t0 = new java.sql.Timestamp(1704067200L * 1000L)
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val hist = Seq(
      (2L, "spark catalyst optimizer rewrites logical plans into physical trees"),
      (4L, "ducks swim on the quiet pond under a pale morning sky today"))
      .toDF("doc_id", "text")
    val idx = graft.ops.Dedup.bandKeyIndex(hist, "doc_id", "text", 8, 4)
    // docs 11 (dup) and 13 (novel) arrive, query STOPS with their window
    // open; doc 15 (dup, same window) and the flush land while it's down
    val b1 = Seq(
      (11L, "spark catalyst optimizer rewrites logical plans into physical trees", ts(0)),
      (13L, "an entirely new document about watermark state and session windows", ts(1)))
    val b2 = Seq(
      (15L, "ducks swim on the quiet pond under a pale morning sky today", ts(2)))
    val flushRow = (99L, "flush row far in the future to close every window", ts(600))
    val base = java.nio.file.Files.createTempDirectory("graft-restart-neardup").toString
    val (inDir, outDir, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    b1.toDF("doc_id", "text", "event_time").coalesce(1).write.parquet(inDir)
    def startQuery() = {
      val stream = s.readStream.schema(b1.toDF("doc_id", "text", "event_time").schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      EventStreams.neardupStream(stream, "doc_id", "text", "event_time", idx, 8, 4)
        .select($"doc_id", $"dup_of")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    b2.toDF("doc_id", "text", "event_time").coalesce(1).write.mode("append").parquet(inDir)
    Seq(flushRow).toDF("doc_id", "text", "event_time").coalesce(1)
      .write.mode("append").parquet(inDir)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val out = s.read.parquet(outDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.ops.Dedup.neardupIncremental(
      (b1 ++ b2).map(x => (x._1, x._2)).toDF("doc_id", "text"),
      "doc_id", "text", idx, 8, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 11's flagged row lived ONLY in the checkpointed window state
    // across the restart; a lost state store would drop or double it
    assert(out == batch)
    assert(out == Map(11L -> 2L, 15L -> 4L))
  }

  test("crawlFrontierStream: canonical-dedup state survives kill-and-restart") {
    val s = spark
    import s.implicits._
    val t0 = new java.sql.Timestamp(1704067200L * 1000L)
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val idx = Seq("https://fetched.org/x").toDF("u")
    // page A (canonical https://view.org/p) is seen before the stop;
    // a TRANSPORT VARIANT of A arrives only after the restart — it can
    // only be dropped if A's canonical key round-tripped the checkpoint
    val b1 = Seq(
      (1L, "https://view.org/p", ts(0)),
      (2L, "HTTPS://click.org/p/?utm_source=x", ts(1)))
    val b2 = Seq((3L, "HTTPS://VIEW.ORG:443/p/#frag", ts(2)))
    val flushRow = (99L, "https://flush.org/z", ts(600))
    val base = java.nio.file.Files.createTempDirectory("graft-restart-frontier").toString
    val (inDir, outDir, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    b1.toDF("req_id", "url", "event_time").coalesce(1).write.parquet(inDir)
    def startQuery() = {
      val stream = s.readStream
        .schema(b1.toDF("req_id", "url", "event_time").schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      EventStreams.crawlFrontierStream(stream, "url", "event_time",
        idx, "u", "2 hours")
        .select($"req_id", $"canonical_url")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    b2.toDF("req_id", "url", "event_time").coalesce(1)
      .write.mode("append").parquet(inDir)
    Seq(flushRow).toDF("req_id", "url", "event_time").coalesce(1)
      .write.mode("append").parquet(inDir)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val out = s.read.parquet(outDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(1L, 2L, 99L)) // 3 died on checkpointed state
    assert(out(1L) == "https://view.org/p")
    assert(out(2L) == "https://click.org/p")
  }

  test("crawlIngestStream: content-hash dedup state survives kill-and-restart") {
    val s = spark
    import s.implicits._
    import graft.ops.TextOps
    val t0 = new java.sql.Timestamp(1704067200L * 1000L)
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    def page(body: String) = "<html><body><div>menu bar</div><p>" + body +
      "</p><div>legal note</div></body></html>"
    val body1 = "the quick brown fox jumps over the lazy dog and then the " +
      "fox naps across a warm afternoon of calm and quiet rest"
    val body2 = "a steady stream of new pages arrives and the cleaner keeps " +
      "the corpus fresh by checking every gate before it admits the text"
    val flushBody = "the closing flush page arrives long after the rest and " +
      "simply moves the watermark forward with a calm and ordinary body text"
    val hist = Seq(
      (100L, "a", "menu bar\nold unique body one\nlegal note"),
      (101L, "a", "menu bar\nold unique body two\nlegal note"))
      .toDF("doc_id", "source", "text")
    val bsets = TextOps.boilerplateSets(hist, "doc_id", "text", "source", 0.4)
    val idx = Seq("nothing known").toDF("t")
      .select(org.apache.spark.sql.functions.md5($"t").as("fp"))
    // page 1 is ingested before the stop; its EXACT DUPLICATE (different
    // id, inside the watermark horizon) arrives only after the restart —
    // it can only be dropped if the content-hash state round-tripped the
    // checkpoint
    val b1 = Seq((1L, "a", page(body1), ts(0)))
    val b2 = Seq((2L, "a", page(body1), ts(5)), (3L, "a", page(body2), ts(6)))
    val flushRow = (99L, "a", page(flushBody), ts(600))
    val base = java.nio.file.Files.createTempDirectory("graft-restart-crawl").toString
    val (inDir, outDir, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    b1.toDF("doc_id", "source", "html", "event_time").coalesce(1).write.parquet(inDir)
    def startQuery() = {
      val stream = s.readStream
        .schema(b1.toDF("doc_id", "source", "html", "event_time").schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      EventStreams.crawlIngestStream(stream, "doc_id", "html", "source",
        "event_time", Seq("en"), bsets, idx, "fp", "2 hours")
        .select($"doc_id", $"text")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    b2.toDF("doc_id", "source", "html", "event_time").coalesce(1)
      .write.mode("append").parquet(inDir)
    Seq(flushRow).toDF("doc_id", "source", "html", "event_time").coalesce(1)
      .write.mode("append").parquet(inDir)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val out = s.read.parquet(outDir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(1L, 3L, 99L),
      s"2 must die on checkpointed hash state, got ${out.keySet}")
    assert(out(1L) == body1 && out(3L) == body2,
      "chrome must be stripped by the static boiler sets on both sides of the restart")
  }

  test("labelWindowStream: pending facts and buffered outcomes survive kill-and-restart") {
    val s = spark
    import s.implicits._
    val H = 3600000000L // 60-minute horizon (µs)
    // the click at t0 AND its first outcome (t30) arrive before the
    // stop: both the pending fact and the outcome buffer live only in
    // the checkpoint across the restart; t65 (outside t0's window) and
    // the watermark push arrive after. user 8's zero-outcome click also
    // spans the restart.
    val b1 = Seq(
      StreamEvent(1L, Base + 0L * MinNs, 7L, "click", 0.0),
      StreamEvent(3L, Base + 30L * MinNs, 7L, "purchase", 1.1),
      StreamEvent(6L, Base + 5L * MinNs, 8L, "click", 0.0))
    val b2 = Seq(StreamEvent(5L, Base + 65L * MinNs, 7L, "purchase", 3.3))
    // the flush must BE an outcome event: labelWindowStream filters to
    // its two event types before the watermark, so a 'flush' type would
    // never advance it
    val push = StreamEvent(99L, Base + 1000L * MinNs, 999L, "purchase", 0.0)
    implicit val sp = s
    val out = runWithRestart("labelwin", b1, b2, push)(
        EventStreams.labelWindowStream(_, "click", "purchase", H).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5))).toSet
    val e = (b1 ++ b2 :+ push).toDF().withColumn("tsu", expr("ts div 1000"))
    val batch = graft.ops.Events.labelWindow(
        e.filter($"event_type" === "click").select($"user_id", $"tsu", $"event_id"),
        e.filter($"event_type" === "purchase").select($"user_id", $"tsu", $"value"),
        "user_id", "tsu", "event_id", "value", H)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5))).toSet
    assert(out == batch, s"restarted $out vs batch $batch")
    // click 1: exactly the checkpoint-buffered t30 outcome (t65 outside)
    assert(out.contains((1L, 7L, Base / 1000, 1L,
      Some(Base / 1000 + 30L * 60000000L), 1100000L)))
    // click 6: zero outcomes — emitted once, not lost with the restart
    assert(out.count(_._1 == 6L) == 1)
  }

  test("phashStream: open-window dup state survives kill-and-restart") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import s.implicits._
    import graft.ops.{MediaRecord, Multimodal}
    val p1 = "the same leading frame bytes".getBytes("UTF-8")
    val p2 = "completely different payload".getBytes("UTF-8")
    val staticSigs = Multimodal.perceptualSignatures(
      s.createDataset(Seq(
        MediaRecord(1L, "image/stub", p1), MediaRecord(2L, "image/stub", p2))))
      .toDF().localCheckpoint(true)
    val t0 = new java.sql.Timestamp(1704067200L * 1000L)
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // doc 100 (dup of static #1) arrives with its 10-min window OPEN
    // when the query stops; doc 102 (dup of static #2, SAME window),
    // novel doc 101 and the watermark flush land only after the restart
    val b1 = Seq((100L, "image/stub", p1, ts(0)))
    val b2 = Seq(
      (102L, "image/stub", p2, ts(2)),
      (101L, "image/stub", "novel bytes never seen".getBytes("UTF-8"), ts(3)))
    val flushRow = (999L, "image/stub", p1, ts(600))
    val base = java.nio.file.Files.createTempDirectory("graft-restart-phash").toString
    val (inDir, outDir, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    def toDf(rows: Seq[(Long, String, Array[Byte], java.sql.Timestamp)]) =
      rows.toDF("doc_id", "media_type", "payload", "event_time")
    toDf(b1).coalesce(1).write.parquet(inDir)
    def startQuery() = {
      val stream = s.readStream.schema(toDf(b1).schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      EventStreams.phashStream(stream, staticSigs)
        .select($"doc_id", $"dup_of", $"hamming")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    toDf(b2).coalesce(1).write.mode("append").parquet(inDir)
    toDf(Seq(flushRow)).coalesce(1).write.mode("append").parquet(inDir)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val out = s.read.parquet(outDir)
      .filter($"doc_id" =!= 999L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 100's flagged row lived ONLY in the open-window state across
    // the restart; a lost store drops it (or emits it twice — the map
    // build would keep one, so also pin the row count)
    assert(out == Map(100L -> ((1L, 0L)), 102L -> ((2L, 0L))), out.toString)
    assert(s.read.parquet(outDir).filter($"doc_id" === 100L).count() == 1L)
  }

  test("anomalyBandsStream: open-window counts survive kill-and-restart") {
    val s = spark
    import s.implicits._
    // history: type "m" counts [8, 10, 10, 12, 14] -> median 10, MAD 2,
    // band [4, 16] at k=3
    val history = Seq(8, 10, 10, 12, 14).zipWithIndex.flatMap { case (c, w) =>
      (1 to c).map(i => StreamEvent((w * 100 + i).toLong,
        Base + w.toLong * 5L * MinNs, i.toLong, "m", 1.0))
    }
    val baseline = EventStreams.anomalyBaseline(history.toDF())
      .localCheckpoint(true)
    // window 1 gets 12 "m" events SPLIT across the restart (7 before,
    // 5 after): a lost window count reads 5 (or emits twice); window 2
    // gets 40 (alarm), fully post-restart
    val w1 = (1 to 12).map(i =>
      StreamEvent(1000L + i, Base + MinNs, i.toLong, "m", 1.0))
    val w2 = (1 to 40).map(i =>
      StreamEvent(3000L + i, Base + 31L * MinNs, i.toLong, "m", 1.0))
    val b1 = w1.take(7)
    val b2 = w1.drop(7) ++ w2
    val push = StreamEvent(9999L, Base + 1000L * MinNs, 999L, "m", 1.0)
    val out = runWithRestart("bands", b1, b2, push)(
        EventStreams.anomalyBandsStream(_, baseline, k = 3.0))
      .filter($"window_start_us" < (Base / 1000L + 900L * 60000000L))
      .select("window_start_us", "event_type", "n", "anomaly")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getBoolean(3)))
    assert(out.length == 2, s"expected exactly 2 closed windows, got ${out.toSeq}")
    val byN = out.map(r => r._3 -> r._4).toMap
    assert(byN == Map(12L -> false, 40L -> true), out.toSeq.toString)
  }

  test("attributionStream: pending conversion and touch buffer survive kill-and-restart") {
    val s = spark
    import s.implicits._
    val L = 3600000000L // 60-minute lookback (µs)
    // touches t0/t10 AND the pending conversion t40 arrive before the
    // stop — all three rows live only in the checkpoint across the
    // restart; a second conversion t70 (window [10,70): t10 only) and
    // the watermark push arrive after.
    val b1 = Seq(
      StreamEvent(1L, Base + 0L * MinNs, 7L, "click", 0.0),
      StreamEvent(2L, Base + 10L * MinNs, 7L, "click", 0.0),
      StreamEvent(4L, Base + 40L * MinNs, 7L, "purchase", 9.9))
    val b2 = Seq(StreamEvent(5L, Base + 70L * MinNs, 7L, "purchase", 1.1))
    // the push must be one of the operator's two event types
    val push = StreamEvent(99L, Base + 1000L * MinNs, 999L, "click", 0.0)
    implicit val sp = s
    val out = runWithRestart("attrib", b1, b2, push)(
        EventStreams.attributionStream(_, "click", "purchase", L).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7),
        r.getDouble(8))).toSet
    val e = (b1 ++ b2 :+ push).toDF().withColumn("tsu", expr("ts div 1000"))
    val batch = graft.ops.Events.attribution(
        e.filter($"event_type" === "click").select($"user_id", $"tsu", $"event_id"),
        e.filter($"event_type" === "purchase")
          .select($"user_id", $"tsu", $"event_id".as("conv_id"), $"value"),
        "user_id", "tsu", "event_id", "conv_id", "value", L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7),
        r.getDouble(8))).toSet
    assert(out == batch, s"restarted $out vs batch $batch")
    // conversion t40: both checkpoint-buffered touches credited 4.95 each
    assert(out.count(p => p._2 == 4L && p._6 == 2L && p._9 == 4.95) == 2)
    // conversion t70 (arrived after restart): only t10 in window
    assert(out.count(_._2 == 5L) == 1 &&
      out.exists(p => p._2 == 5L && p._4 == 2L && p._9 == 1.1))
  }
}
