package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Events

/**
 * Degenerate-event robustness, the event-side companion of
 * DegenerateDocsSpec: same-instant bursts (zero elapsed time),
 * single-event users, constant-value types, lone outcome events —
 * none may throw under Spark 4's default ANSI dialect (division by a
 * zero time-span / zero variance throws instead of returning NULL),
 * and the contracted outputs are pinned.
 */
class DegenerateEventsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val MinNs = 60L * 1000000000L
  private val Base = 1704067200L * 1000000000L

  // user 1: three events AT THE SAME INSTANT (a burst — zero elapsed
  //   time, the twa divide-by-zero trap); user 2: a single event;
  // user 3: a normal two-point stream; type "flat": constant value
  //   (zero variance); user 4: purchase with no click.
  private def zoo = Seq(
      (1L, Base, 1L, "flat", 5.0),
      (2L, Base, 1L, "flat", 5.0),
      (3L, Base, 1L, "flat", 5.0),
      (4L, Base + 5L * MinNs, 2L, "click", 1.0),
      (5L, Base, 3L, "click", 2.0),
      (6L, Base + 10L * MinNs, 3L, "purchase", 4.0),
      (7L, Base + MinNs, 4L, "purchase", 9.0))
    .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("timeWeightedAvg: a same-instant burst yields NULL twa, not a divide-by-zero crash") {
    val out = Events.timeWeightedAvg(zoo).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    // user 1: two zero-length segments, zero elapsed time -> NULL twa
    assert(out(1L)._1 == 2L && out(1L)._2.isEmpty)
    // user 2: single event, no segment at all -> no row
    assert(!out.contains(2L))
    // user 3: one real 10-minute segment at value 2.0
    assert(out(3L) == ((1L, Some(2.0))))
  }

  test("zscoreOutliers: a zero-variance type flags nothing and does not throw") {
    val out = Events.zscoreOutliers(zoo, threshold = 0.1).collect()
    assert(out.forall(_.getString(1) != "flat"))
  }

  test("r13 event ops survive the degenerate zoo") {
    // interArrival: user 1's same-instant burst -> gaps of ZERO (not
    // dropped, not a throw); single-event users absent
    val ia = Events.interArrival(zoo).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(5))))
      .toMap
    assert(ia(1L) == ((2L, 0.0, 0L))) // two zero gaps, mean 0, max 0
    assert(!ia.contains(2L) && !ia.contains(4L))
    // attribution: a touch AT the conversion instant is excluded even
    // in a burst; lookback 1µs on the burst yields nothing
    val touches = zoo.filter(col("event_type") === "flat")
      .select(col("user_id"), expr("ts div 1000L").as("tsu"), col("event_id"))
    val convs = zoo.filter(col("event_type") === "flat")
      .select(col("user_id"), expr("ts div 1000L").as("tsu"),
        (col("event_id") + 100L).as("conv_id"), col("value"))
    assert(Events.attribution(touches, convs, "user_id", "tsu",
      "event_id", "conv_id", "value", 1L).count() == 0L)
    // levelShift: one day per type -> no full frame -> empty, no throw
    assert(Events.levelShift(zoo, w = 7).count() == 0L)
    // topPaths: same-instant burst orders by event_id (deterministic)
    val paths = Events.topPaths(zoo, maxSteps = 5, k = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(paths("flat>flat>flat") == 1L) // user 1's burst, id order
    // concentration over a single-key frame: gini 0, share 1
    val c = graft.ops.Stats.concentration(
      zoo.filter(col("user_id") === 1L), "user_id").collect()(0)
    assert(c.getLong(0) == 1L && c.getDouble(2) == 0.0 && c.getDouble(3) == 1.0)
  }

  test("r13 wave-3 ops survive the degenerate zoo") {
    // sessionPaths: the same-instant burst is one session whose path
    // orders by event_id; single-event users still emit their session
    val sp = Events.sessionPaths(zoo, maxSteps = 2).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    assert(sp.contains((1L, "flat>flat", 3L))) // truncated at 2 of 3
    assert(sp.contains((2L, "click", 1L)))
    // featureWindows: the burst collapses to one user-day row; lag null
    val fw = Events.featureWindows(zoo).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        r.isNullAt(6)))).toMap
    assert(fw(1L) == ((3L, 3L, true)))
    assert(fw(2L) == ((1L, 1L, true)))
    // abCuped on a tiny frame: n < 2 per arm may null z but never throw
    assert(Events.abCuped(zoo, Base / 1000L + 1L).collect().length == 1)
    // seasonalError: no (day, day-7) overlap anywhere -> empty, no throw
    assert(Events.seasonalError(zoo, periodDays = 7).count() == 0L)
    // targetEncode: the constant-value burst type encodes exactly its
    // leave-one-out mean (5.0); singletons pull fully to the prior
    val te = graft.ops.Stats.targetEncode(zoo, "event_id", "event_type",
        "value", priorStrength = 1.0).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val prior = (5.0 + 5.0 + 5.0 + 1.0 + 2.0 + 4.0 + 9.0) / 7
    assert(math.abs(te(1L) - (5.0 + 5.0 + prior) / 3) < 1e-6)
    // linkRecords: an empty side or no block overlap yields empty
    val names = zoo.select(col("event_id").as("id"),
      col("event_type").as("nm"))
    assert(graft.ops.Dedup.linkRecords(names, names.filter(lit(false)),
      "id", "nm", "id", "nm", 0.5).count() == 0L)
    // kCore on a single edge: both endpoints deg 1 < 2 -> peeled empty
    assert(graft.ops.Graph.kCore(
      Seq((1L, 2L)).toDF("id1", "id2"), k = 2, iters = 3).count() == 0L)
  }

  test("the remaining event ops survive the degenerate zoo") {
    assert(Events.sessionize(zoo).count() >= 4)
    assert(Events.sessionWindows(zoo).count() >= 4)
    assert(Events.movingAvg(zoo, 3600000000L).collect() != null)
    assert(Events.resampleDailyInterp(zoo).collect() != null)
    assert(Events.resampleDailyLocf(zoo).collect() != null)
    assert(Events.transitions(zoo).collect() != null)
    assert(Events.retention(zoo).collect() != null)
    assert(Events.scd2Intervals(zoo).count() >= 4)
    assert(Events.rollingDistinctUsers(zoo, 7).collect().nonEmpty)
    val clicks = zoo.filter(col("event_type") === "click")
      .select(col("user_id"), expr("ts div 1000L").as("tsu"), col("event_id"))
    val purchases = zoo.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000L").as("tsu"), col("value"))
    // user 4's purchase has no click; user 2's click has no purchase
    val lab = Events.labelWindow(clicks, purchases, "user_id", "tsu",
      "event_id", "value", 86400000000L).collect()
    assert(lab.length == 2)
    val asof = Events.asOfJoin(clicks, purchases
      .groupBy(col("user_id"), col("tsu")).agg(round(max(col("value")), 6).as("pvalue")),
      "user_id", "tsu", Seq("pvalue")).collect()
    assert(asof.length == 2)
  }
}
