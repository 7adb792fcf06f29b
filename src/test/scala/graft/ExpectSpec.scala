package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Expect
import graft.ops.Expect._

class ExpectSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def d = Seq[(Long, String, java.lang.Double)](
      (1L, "en", 1.5), (2L, "en", 2.5), (3L, "de", null), (2L, null, 9.0))
    .toDF("id", "lang", "v")

  test("verdict rows: metrics, bounds and pass/fail per check") {
    val out = Expect.run(d, Seq(
        RowsBetween(1L, 10L),
        NullRateAtMost("lang", 0.3),
        NullRateAtMost("lang", 0.2),   // 1/4 = 0.25 > 0.2 -> fail
        Unique("id"),                  // id 2 duplicated -> fail
        InSet("lang", Seq("en", "de")),
        InSet("lang", Seq("en")),      // de violates -> fail
        MinAtLeast("v", 1.0),
        MaxAtMost("v", 5.0)))          // 9.0 -> fail
      .orderBy(col("ord")).collect()
      .map(r => (r.getString(1), r.getDouble(3), r.getBoolean(6)))
    assert(out.toSeq == Seq(
      ("rows_between", 4.0, true),
      ("null_rate_at_most", 0.25, true),
      ("null_rate_at_most", 0.25, false),
      ("unique", 1.0, false),
      ("in_set", 0.0, true),
      ("in_set", 1.0, false),
      ("min_at_least", 1.5, true),
      ("max_at_most", 9.0, false)))
  }

  test("empty table: rate 0, extrema vacuous, rows_between can still fail") {
    val e = d.filter(col("id") < 0L)
    val out = Expect.run(e, Seq(
        RowsBetween(1L, 10L), NullRateAtMost("lang", 0.0),
        Unique("id"), InSet("lang", Seq("en")),
        MinAtLeast("v", 1.0), MaxAtMost("v", 5.0)))
      .orderBy(col("ord")).collect().map(r => (r.getString(1), r.getBoolean(6)))
    assert(out.toSeq == Seq(("rows_between", false), ("null_rate_at_most", true),
      ("unique", true), ("in_set", true), ("min_at_least", true),
      ("max_at_most", true)))
  }

  test("validate throws on failure, names the failing checks, passes otherwise") {
    Expect.validate(d, Seq(RowsBetween(1L, 10L), InSet("lang", Seq("en", "de"))))
    val e = intercept[IllegalArgumentException] {
      Expect.validate(d, Seq(Unique("id"), MaxAtMost("v", 5.0)))
    }
    assert(e.getMessage.contains("unique(id)") && e.getMessage.contains("max_at_most(v)"))
  }

  test("runGrouped: per-group verdicts catch the one bad feed the global check misses") {
    val feeds = Seq[(Long, String, String)](
        (1L, "ok", "good"), (2L, "ok", "good"), (3L, "ok", "good"),
        (4L, "ok", "good"), (5L, "ok", "good"), (6L, "ok", "good"),
        (7L, null, "bad"), (8L, "ok", "bad"))
      .toDF("id", "text", "feed")
    // global: 1/8 nulls = 0.125 <= 0.2 -> PASSES and hides the bad feed
    val global = Expect.run(feeds, Seq(NullRateAtMost("text", 0.2)))
      .collect()(0)
    assert(global.getBoolean(6))
    // grouped: feed 'bad' is 50% null -> its verdict row fails
    val grouped = Expect.runGrouped(feeds, "feed",
        Seq(NullRateAtMost("text", 0.2), RowsBetween(2L, 100L), Unique("id")))
      .collect()
      .map(r => (r.getString(0), r.getString(2), r.getDouble(4), r.getBoolean(7)))
      .toSet
    assert(grouped(("bad", "null_rate_at_most", 0.5, false)))
    assert(grouped(("good", "null_rate_at_most", 0.0, true)))
    assert(grouped(("good", "rows_between", 6.0, true)))
    assert(grouped(("bad", "rows_between", 2.0, true)))
    assert(grouped.count(_._2 == "unique") == 2 &&
      grouped.filter(_._2 == "unique").forall(_._4))
  }

  test("matches_regex: rate over non-null values, vacuous on all-null/empty") {
    val out = Expect.run(d, Seq(
        MatchesRegex("lang", "^[a-z]{2}$", 0.99),  // 3/3 non-null match
        MatchesRegex("lang", "^e", 0.8),           // 2/3 = 0.667 -> fail
        MatchesRegex("lang", "n$", 0.5)))          // en matches anywhere-find
      .orderBy(col("ord")).collect()
      .map(r => (r.getDouble(3), r.getBoolean(6)))
    assert(out.toSeq == Seq((1.0, true), (0.666667, false), (0.666667, true)))
    // all-null column and empty frame are both vacuously true, metric 0
    val allNull = Seq[(Long, String)]((1L, null), (2L, null)).toDF("id", "s")
    val v1 = Expect.run(allNull, Seq(MatchesRegex("s", "x", 1.0))).collect()(0)
    assert(v1.getDouble(3) == 0.0 && v1.getBoolean(6))
    val v2 = Expect.run(allNull.filter(col("id") < 0L),
      Seq(MatchesRegex("s", "x", 1.0))).collect()(0)
    assert(v2.getDouble(3) == 0.0 && v2.getBoolean(6))
  }

  test("reconcile: conservation holds for an exact split, fails for a leaky one") {
    val in = (1L to 10L).toDF("id")
    val out = in.filter(col("id") <= 7L)
    val ok = Expect.reconcile(in, out, in.filter(col("id") > 7L)).collect()(0)
    assert((ok.getLong(0), ok.getLong(1), ok.getLong(2), ok.getBoolean(3)) ==
      ((10L, 7L, 3L, true)))
    val leaky = Expect.reconcile(in, out, in.filter(col("id") > 8L)).collect()(0)
    assert(!leaky.getBoolean(3) && leaky.getLong(2) == 2L)
  }

  test("reconcileBy: absent groups count 0 and fail instead of vanishing") {
    val in = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "g")
    val out = Seq((1L, "a"), (9L, "c")).toDF("id", "g")  // c: spurious group
    val dropped = Seq((2L, "a"), (3L, "b")).toDF("id", "g")
    val rows = Expect.reconcileBy(in, out, dropped, "g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(rows == Set(
      ("a", 2L, 1L, 1L, true),
      ("b", 1L, 0L, 1L, true),
      ("c", 0L, 1L, 0L, false)))  // rows only in `out` fail loudly
  }

  test("one aggregation pass: a single scan and no shuffle beyond the global agg") {
    val plan = Expect.run(d, Seq(RowsBetween(1L, 10L),
        NullRateAtMost("lang", 0.3), MinAtLeast("v", 0.0), MaxAtMost("v", 9.9)))
      .queryExecution.executedPlan.toString
    assert(plan.split("LocalTableScan|Scan ").length <= 3, plan) // one source scan
    assert(!plan.contains("Join"), plan)
  }
}
