package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Events, Sketches}

/** Round-5 operators: moving average, z-score outliers, session
  * concurrency sweep line, grouped quantile sketch. */
class Round5OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Min = 60L * 1000000000L // ns per minute

  test("movingAvg: RANGE frame includes exactly the trailing window, peers included") {
    // user 1: events at 0, 30, 61 min with values 1, 2, 4; 1-hour window
    val ev = Seq(
      (1L, 0L * Min, 1L, "v", 1.0),
      (2L, 30L * Min, 1L, "v", 2.0),
      (3L, 61L * Min, 1L, "v", 4.0),
      (4L, 61L * Min, 1L, "v", 6.0), // equal-ts peer: must be in 3's frame too
      (5L, 0L * Min, 2L, "v", 8.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.movingAvg(ev, windowMicros = 3600000000L)
      .collect().map(x => x.getLong(1) -> (x.getLong(3), x.getDouble(4))).toMap
    assert(r(1L) == ((1L, 1.0)))
    assert(r(2L) == ((2L, 1.5))) // events 1,2
    // events at 61min: event 1 (0min) is outside the 60-min window;
    // both equal-ts rows are RANGE peers of each other
    assert(r(3L) == ((3L, 4.0))) // events 2,3,4 → (2+4+6)/3
    assert(r(4L) == ((3L, 4.0)))
    assert(r(5L) == ((1L, 8.0)))
  }

  test("movingAvg: null values excluded from the average, counted in n_win") {
    val ev = Seq(
      (1L, 0L * Min, 1L, "v", Some(2.0)),
      (2L, 10L * Min, 1L, "v", None), // in frame, not in avg denominator
      (3L, 20L * Min, 1L, "v", Some(4.0)),
      (4L, 0L * Min, 2L, "v", None) // all-null frame → null avg
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.movingAvg(ev, windowMicros = 3600000000L)
      .collect().map(x => x.getLong(1) -> x).toMap
    assert(r(3L).getLong(3) == 3L) // n_win counts the null row
    assert(r(3L).getDouble(4) == 3.0) // (2+4)/2, not /3
    assert(r(4L).isNullAt(4))
  }

  test("movingAvg: deterministic under repartition") {
    val ev = (1 to 500).map(i =>
      (i.toLong, (i % 97).toLong * Min, (i % 7).toLong, "v", i * 0.37))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val a = Events.movingAvg(ev, 600L * 1000000L).orderBy("event_id").collect().toSeq
    val b = Events.movingAvg(ev.repartition(13), 600L * 1000000L)
      .orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("zscoreOutliers: flags only the far-out value; z is exact") {
    // 9 values at 10.0 and one at 110.0: mean=20, sd_pop=30 → z(110)=3, z(10)=-1/3
    val ev = ((1 to 9).map(i => (i.toLong, i.toLong * Min, 1L, "t", 10.0)) :+
      (10L, 10L * Min, 1L, "t", 110.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.zscoreOutliers(ev, threshold = 2.0).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 10L && r(0).getDouble(2) == 110.0)
    assert(math.abs(r(0).getDouble(3) - 3.0) < 1e-9)
  }

  test("zscoreOutliers: stats are per event_type, not global") {
    // type a: tight around 1.0 plus one at 100; type b: all equal (sd=0 → no
    // finite z, NaN/null comparisons are false → no rows flagged)
    val ev = ((1 to 20).map(i => (i.toLong, i.toLong * Min, 1L, "a", 1.0)) ++
      Seq((21L, 21L * Min, 1L, "a", 100.0)) ++
      (22 to 30).map(i => (i.toLong, i.toLong * Min, 1L, "b", 5.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.zscoreOutliers(ev, 2.0).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(21L))
  }

  test("maxConcurrency: overlap counting with a day-boundary carry-in") {
    val Day = 86400000000L
    // day 0: sessions [0,100], [50,150], [60,70] → max 3 concurrent
    // session [200, Day+100] stays open across midnight → day 1 starts at 1
    // day 1: [Day+50, Day+60] overlaps the carried session → max 2
    val sess = Seq(
      (0L, 100L), (50L, 150L), (60L, 70L), (200L, Day + 100L),
      (Day + 50L, Day + 60L)
    ).toDF("start_us", "end_us")
    val m = Events.maxConcurrency(sess).orderBy("day")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(m == Seq((0L, 3L), (1L, 2L)))
  }

  test("maxConcurrency: day opening on a session END reports the carry-in plateau") {
    val Day = 86400000000L
    // two sessions open across midnight and both end early on day 1: the
    // only day-1 boundaries are ENDS, so the in-day running sum only ever
    // decreases — the true day-1 max is the carry-in plateau of 2
    val sess = Seq((0L, Day + 100L), (50L, Day + 200L)).toDF("start_us", "end_us")
    val m = Events.maxConcurrency(sess).orderBy("day")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(m == Seq((0L, 2L), (1L, 2L)))
  }

  test("maxConcurrency: a day fully spanned by an open session is reported") {
    val Day = 86400000000L
    // [0, 2·Day+100] spans ALL of day 1 with no boundary inside it
    val sess = Seq((0L, 2L * Day + 100L), (10L, 20L)).toDF("start_us", "end_us")
    val m = Events.maxConcurrency(sess).orderBy("day")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(m == Seq((0L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("maxConcurrency: deterministic under repartition") {
    val sess = (1 to 300).map(i => (i.toLong * 10, i.toLong * 10 + (i % 50) * 7))
      .toDF("start_us", "end_us")
    val a = Events.maxConcurrency(sess).orderBy("day").collect().toSeq
    val b = Events.maxConcurrency(sess.repartition(11)).orderBy("day").collect().toSeq
    assert(a == b)
  }

  test("quantileSketchGrouped: per-group estimates within one bin width") {
    val df = ((1 to 1000).map(i => ("a", i.toDouble)) ++
      (1 to 1000).map(i => ("b", 2.0 * i)))
      .toDF("g", "v")
    val r = Sketches.quantileSketchGrouped(df, Seq("g"), "v",
        lo = 0.0, hi = 2048.0, nbins = 1024, ps = Seq("p50" -> 0.5, "p95" -> 0.95))
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2), x.getDouble(3)))
      .toMap
    val w = 2.0
    assert(r("a")._1 == 1000L)
    assert(math.abs(r("a")._2 - 500.5) <= w && math.abs(r("a")._3 - 950.05) <= w)
    assert(math.abs(r("b")._2 - 1001.0) <= 2 * w && math.abs(r("b")._3 - 1900.1) <= 2 * w)
  }

  test("quantileSketchGrouped: partitioning-independent") {
    val df = (1 to 997).map(i => (s"g${i % 3}", i * 1.37)).toDF("g", "v")
    val a = Sketches.quantileSketchGrouped(df, Seq("g"), "v", 0.0, 2048.0, 256,
      Seq("p50" -> 0.5)).orderBy("g").collect().toSeq
    val b = Sketches.quantileSketchGrouped(df.repartition(17), Seq("g"), "v",
      0.0, 2048.0, 256, Seq("p50" -> 0.5)).orderBy("g").collect().toSeq
    assert(a == b)
  }

  // ── transitions / time-weighted average / rolling distinct ──────────

  test("transitions: per-user ordered pairs, per-source normalization") {
    val ev = Seq(
      (1L, 1L * Min, 1L, "A", 0.0), (2L, 2L * Min, 1L, "B", 0.0),
      (3L, 3L * Min, 1L, "A", 0.0),
      (4L, 1L * Min, 2L, "B", 0.0), (5L, 2L * Min, 2L, "B", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.transitions(ev).collect()
      .map(x => (x.getString(0), x.getString(1)) -> (x.getLong(2), x.getDouble(3))).toMap
    assert(r(("A", "B")) == ((1L, 1.0)))
    assert(r(("B", "A")) == ((1L, 0.5)))
    assert(r(("B", "B")) == ((1L, 0.5)))
    assert(r.size == 3) // no cross-user pair (u1's A ↛ u2's B)
  }

  test("timeWeightedAvg: step-function integral over observation span") {
    val S = 1000000000L // ns per second
    val ev = Seq(
      (1L, 0L * S, 1L, "v", 1.0), (2L, 10L * S, 1L, "v", 3.0),
      (3L, 30L * S, 1L, "v", 5.0), // last reading carries no weight
      (4L, 0L * S, 2L, "v", 9.0) // single event: span 0 → excluded
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.timeWeightedAvg(ev).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    // (1.0·10s + 3.0·20s) / 30s = 70/30
    assert(r(1L) == ((2L, 2.333333)))
    assert(!r.contains(2L))
  }

  test("rollingDistinctUsers: exact trailing-window distinct, only real days") {
    val D = 86400L * 1000000000L // ns per day
    val ev = Seq(
      (1L, 0L * D, 10L, "a", 0.0), (2L, 0L * D + 5, 10L, "a", 0.0),
      (3L, 1L * D, 20L, "a", 0.0), (4L, 8L * D, 10L, "a", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = Events.rollingDistinctUsers(ev, windowDays = 7).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(0L) == ((1L, 1L)))
    assert(r(1L) == ((1L, 2L))) // u10 (day 0) still in the 7-day window
    assert(r(8L) == ((1L, 1L))) // day-1 activity aged out (window is 7 days)
    assert(r.size == 3) // days 2..7 have no activity of their own → dropped
  }

  test("fuzzyPairs: blocked Levenshtein finds near pairs, skips far ones") {
    val docs = Seq(
      (1L, "Hello world, this is a test!"),
      (2L, "hello world this is a text"),
      (3L, "completely different content here")
    ).toDF("doc_id", "text")
    val r = graft.ops.Dedup.fuzzyPairs(docs, "doc_id", "text",
      prefixLen = 40, blockLen = 8, maxDist = 5).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 1L && r(0).getLong(1) == 2L)
    assert(r(0).getInt(2) == 1) // normalized prefixes differ only "test"→"text"
  }

  test("fuzzyPairs: non-ASCII texts never collide into a degenerate block") {
    // every one of these normalizes to '' or ' ' — without the
    // short-prefix guard they all share ONE block and pair up at
    // edit_dist 0 despite being unrelated (and go quadratic at scale)
    val docs = Seq(
      (1L, "这是一个完全中文的文档"),
      (2L, "полностью русский текст"),
      (3L, "ελληνικό κείμενο μόνο"),
      (4L, "!!! ??? ***"),
      (5L, "short"), // ASCII but shorter than blockLen — same degeneracy
      (6L, "identical english prefix payload one"),
      (7L, "identical english prefix payload two")
    ).toDF("doc_id", "text")
    val r = graft.ops.Dedup.fuzzyPairs(docs, "doc_id", "text",
      prefixLen = 40, blockLen = 8, maxDist = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(r == Seq((6L, 7L)), r.toString)
  }

  // ── HllSketchAgg ─────────────────────────────────────────────────────

  test("hll eval: large-range correction and 2^32 saturation branches") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    val agg = graft.functions.HllSketchAgg(Literal.create("x", StringType), 4)
    val m = 16
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    def rawOf(buf: Array[Byte]): Double =
      alpha * m * m * 8589934592.0 / buf.map(r => 1L << (33 - r)).sum.toDouble
    // all registers very high → raw ≥ 2^32 → saturate at the hash ceiling
    val sat = Array.fill[Byte](m)(30)
    assert(rawOf(sat) >= 4294967296.0)
    assert(agg.eval(sat) == 4294967296.0)
    // registers tuned so 2^32/30 < raw < 2^32 → the correction branch
    // (−2^32·ln(1−raw/2^32)), which always exceeds the biased raw value
    val mid = Array.fill[Byte](m)(28)
    val rawMid = rawOf(mid)
    assert(rawMid > 4294967296.0 / 30.0 && rawMid < 4294967296.0, s"raw=$rawMid")
    val est = agg.eval(mid).asInstanceOf[Double]
    assert(est == -4294967296.0 * math.log(1.0 - rawMid / 4294967296.0))
    assert(est > rawMid)
  }

  test("rollingActiveHll: sketch WAU within ~3σ of exact; partitioning-independent") {
    val Day = 86400000000000L // ns
    // 40 days × 400 users with day-dependent churn — real overlap between
    // trailing windows
    val ev = (0 until 16000).map { i =>
      val day = i % 40
      (i.toLong, day * Day + (i % 97) * 60000000000L,
        ((i * 2654435761L) % (300 + day * 5)).toLong, "v", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val est = Events.rollingActiveHll(ev, windowDays = 7, b = 8)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Events.rollingDistinctUsers(ev, windowDays = 7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(est.keySet == exact.keySet)
    val tol = 3 * 1.04 / math.sqrt(256.0) // ~19.5% at b=8
    exact.foreach { case (day, (dau, wau)) =>
      val (dauE, wauE) = est(day)
      assert(math.abs(dauE - dau) / dau <= tol, s"day $day dau $dauE vs $dau")
      assert(math.abs(wauE - wau) / wau <= tol, s"day $day wau $wauE vs $wau")
    }
    // md5 determinism: identical output under a different partitioning
    val b2 = Events.rollingActiveHll(ev.repartition(17), windowDays = 7, b = 8)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(b2 == est)
  }

  test("hll_distinct: within ~3σ of truth; partitioning-independent; nulls ignored") {
    val df = (1 to 20000).map(i => s"v${i % 5000}").toDF("x")
    val est = df.agg(graft.functions.GraftFunctions.hll_distinct($"x", 8).as("e"))
      .collect()(0).getDouble(0)
    assert(math.abs(est - 5000.0) / 5000.0 < 3 * 1.04 / math.sqrt(256.0), s"est=$est")
    val est2 = df.repartition(13)
      .agg(graft.functions.GraftFunctions.hll_distinct($"x", 8)).collect()(0).getDouble(0)
    assert(est == est2) // merge of register banks is order-free (max)
    val withNulls = df.union(Seq.fill(100)(null.asInstanceOf[String]).toDF("x"))
    val est3 = withNulls.agg(
      graft.functions.GraftFunctions.hll_distinct($"x", 8)).collect()(0).getDouble(0)
    assert(est == est3)
  }

  test("hll_distinct: linear-counting branch at low cardinality is near-exact") {
    val df = (1 to 50).map(i => s"k$i").toDF("x")
    val est = df.agg(graft.functions.GraftFunctions.hll_distinct($"x", 8))
      .collect()(0).getDouble(0)
    // n << m: V > 0 and E ≤ 2.5m → m·ln(m/V), tight at this range
    assert(math.abs(est - 50.0) < 5.0, s"est=$est")
  }

  test("graft_hll SQL function registered, grouped, matches Column API") {
    val s = spark
    graft.functions.GraftFunctions.registerAll(s)
    val df = (1 to 9000).map(i => (s"g${i % 3}", s"v${i % 600}")).toDF("g", "x")
    df.createOrReplaceTempView("hll_in")
    val viaSql = s.sql(
      "SELECT g, graft_hll(x, 8) AS e FROM hll_in GROUP BY g ORDER BY g")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq
    val viaCol = df.groupBy($"g")
      .agg(graft.functions.GraftFunctions.hll_distinct($"x", 8).as("e"))
      .orderBy($"g").collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq
    assert(viaSql == viaCol)
    viaSql.foreach { case (_, e) => assert(math.abs(e - 200.0) / 200.0 < 0.2) }
  }
}
