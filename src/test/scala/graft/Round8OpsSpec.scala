package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Sketches, TextOps}

/** Round-8 operators: AMS F2 sketch, KMV set-overlap estimate,
  * temperature mixture sampling, BPE merge-candidate scoring, n-gram
  * novelty, cross-source duplication matrix. */
class Round8OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ── AMS tug-of-war F2 ─────────────────────────────────────────────────

  test("amsF2: exact side is Σf², estimate is partitioning-independent") {
    // counts 3/2/1 → F2 = 9 + 4 + 1 = 14
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("k")
    val r = Sketches.amsF2(df, "k", counters = 16).head()
    assert(r.getAs[Long]("exact_f2") == 14L)
    val est1 = Sketches.amsF2(df, "k", counters = 16).head().getAs[Double]("est_f2")
    val est2 = Sketches.amsF2(df.repartition(7), "k", counters = 16)
      .head().getAs[Double]("est_f2")
    assert(est1 == est2, "±1 sums are order-free → identical under any partitioning")
  }

  test("amsF2: estimate lands within the AMS error envelope on a real stream") {
    // 1000 keys, skewed multiplicity (key i repeated (i % 7) + 1 times)
    val df = (1 to 1000).flatMap(i => Seq.fill(i % 7 + 1)(s"k$i")).toDF("k")
    val r = Sketches.amsF2(df, "k", counters = 16).head()
    val (est, exact) = (r.getAs[Double]("est_f2"), r.getAs[Long]("exact_f2"))
    // stderr ≈ sqrt(2/16)·F2 ≈ 0.35·F2 — allow 3σ
    assert(math.abs(est - exact.toDouble) < 1.1 * exact.toDouble,
      s"est $est too far from exact $exact")
  }

  // ── KMV set overlap ───────────────────────────────────────────────────

  test("kmvOverlap: union below k → estimate equals exact Jaccard") {
    // |A∪B| = 90 ≤ k = 256: the k-min set IS the union
    val a = (1 to 60).map(i => s"v$i").toDF("v")
    val b = (31 to 90).map(i => s"v$i").toDF("v")
    val r = Sketches.kmvOverlap(a, b, "v", k = 256).head()
    assert(r.getAs[Long]("n_union") == 90L && r.getAs[Long]("n_both") == 30L)
    assert(r.getAs[Double]("est_jaccard") == r.getAs[Double]("exact_jaccard"))
    assert(math.abs(r.getAs[Double]("exact_jaccard") - 30.0 / 90.0) < 1e-6)
  }

  test("kmvOverlap: k-min sampling tracks exact Jaccard above k") {
    val a = (1 to 3000).map(i => s"v$i").toDF("v")
    val b = (1001 to 4000).map(i => s"v$i").toDF("v")
    // inter 2000, union 4000 → J = 0.5; k = 256 → stderr ≈ sqrt(.25/256) ≈ .03
    val r = Sketches.kmvOverlap(a, b, "v", k = 256).head()
    assert(r.getAs[Long]("k_used") == 256L)
    assert(math.abs(r.getAs[Double]("est_jaccard") - 0.5) < 0.12)
    assert(r.getAs[Double]("exact_jaccard") == 0.5)
    // disjoint sets → both estimates are exactly zero
    val d = Sketches.kmvOverlap(
      (1 to 500).map(i => s"x$i").toDF("v"),
      (1 to 500).map(i => s"y$i").toDF("v"), "v", k = 64).head()
    assert(d.getAs[Double]("est_jaccard") == 0.0 &&
      d.getAs[Double]("exact_jaccard") == 0.0)
  }

  // ── temperature mixture sampling ──────────────────────────────────────

  test("temperatureMix: sqrt weighting up-weights small sources, draw is clamped") {
    // 100 vs 4 docs: proportional share would give 96%/4%; sqrt gives
    // 10/(10+2) ≈ 83%/17% — the small source is up-weighted ~4×
    val df = ((1 to 100).map(i => ("big", i.toLong)) ++
      (101 to 104).map(i => ("small", i.toLong))).toDF("source", "doc_id")
    val r = TextOps.temperatureMix(df, "source", "doc_id", budget = 50L)
      .collect().map(x => x.getString(0) ->
        (x.getAs[Long]("n_docs"), x.getAs[Double]("weight"),
          x.getAs[Long]("target_n"), x.getAs[Long]("sampled_n"))).toMap
    val (_, wBig, tBig, sBig) = r("big")
    val (_, wSmall, tSmall, sSmall) = r("small")
    assert(math.abs(wBig - 10.0 / 12.0) < 1e-4 && math.abs(wSmall - 2.0 / 12.0) < 1e-4)
    assert(tBig + tSmall <= 50L, "floor targets never exceed the budget")
    assert(sBig == tBig, "big source fills its target")
    assert(sSmall == math.min(tSmall, 4L), "draw clamps at the source size")
    // determinism under partitioning
    val r2 = TextOps.temperatureMix(df.repartition(7), "source", "doc_id", 50L)
      .collect().map(x => x.getString(0) -> x.getAs[Long]("sampled_n")).toMap
    assert(r2("big") == sBig && r2("small") == sSmall)
  }

  // ── BPE merge candidates ──────────────────────────────────────────────

  test("bpeMergeCandidates: frequency-weighted pair counts, 1-char words dropped") {
    // "abab" appears 3× → pairs ab(×2), ba(×1) per occurrence;
    // "cd" once → cd(×1); "a" alone contributes nothing
    val df = Seq("abab abab a", "abab cd a").toDF("text")
    val top = TextOps.bpeMergeCandidates(df, "text", k = 10)
      .collect().map(x => x.getString(0) -> x.getLong(1))
    assert(top.head == ("ab" -> 6L), s"expected ab=6, got ${top.head}")
    val m = top.toMap
    assert(m("ba") == 3L && m("cd") == 1L)
    assert(!m.keys.exists(_.length != 2))
  }

  // ── n-gram novelty ────────────────────────────────────────────────────

  test("ngramNovelty: unique docs score 1, verbatim copies score 0") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (3L, "catalyst plans declarative queries into distributed physical operators")
    ).toDF("doc_id", "text")
    val r = Dedup.ngramNovelty(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getAs[Double]("novelty")).toMap
    assert(r(1L) == 0.0 && r(2L) == 0.0, "every gram of a copy recurs")
    assert(r(3L) == 1.0, "every gram of a unique doc has df = 1")
  }

  test("ngramNovelty: gram exchange is shared (one scan, ReusedExchange)") {
    val df = Dedup.ngramNovelty(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val cut = plan.indexOf("== Initial Plan ==")
    val finalPlan = if (cut < 0) plan else plan.substring(0, cut)
    assert(finalPlan.contains("ReusedExchange"), plan)
    assert("FileScan parquet".r.findAllIn(finalPlan).size == 1, plan)
  }

  // ── cross-source duplication matrix ───────────────────────────────────

  test("dupMatrix: pair key is order-normalized, self-dups kept") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "sA"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "sB"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "sB"),
      (4L, "unrelated content entirely different words here throughout always", "sA")
    ).toDF("doc_id", "text", "source")
    val r = Dedup.dupMatrix(df, "doc_id", "text", "source",
        k = 8, bands = 4, minJaccard = 0.9)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getAs[Double]("avg_jaccard"))).toMap
    // pairs: (1,2) cross sA-sB, (1,3) cross sA-sB, (2,3) within sB
    assert(r(("sA", "sB")) == (2L, 1.0), s"got $r")
    assert(r(("sB", "sB")) == (1L, 1.0), s"got $r")
    assert(!r.contains(("sB", "sA")), "source pair must be order-normalized")
  }

  // ── CMS join-size estimate ────────────────────────────────────────────

  test("cmsJoinSize: inner product upper-bounds the true join size, exact when collision-free") {
    // A = {a×3, b×2, d×1}, B = {a×2, c×5, d×4}: |A ⋈ B| = 3·2 + 1·4 = 10
    val a = (Seq.fill(3)("a") ++ Seq.fill(2)("b") ++ Seq("d")).toDF("k")
    val b = (Seq.fill(2)("a") ++ Seq.fill(5)("c") ++ Seq.fill(4)("d")).toDF("k")
    val r = Sketches.cmsJoinSize(a, b, "k", depth = 4, width = 1024).head()
    assert(r.getAs[Long]("exact_join_size") == 10L)
    assert(r.getAs[Long]("est_join_size") >= 10L, "CMS inner product never under-estimates")
    // 4 keys into 1024 buckets: no collisions → the bound is tight
    assert(r.getAs[Long]("est_join_size") == 10L)
    assert(r.getAs[Double]("rel_err") == 0.0)
  }

  // ── daily linear interpolation ────────────────────────────────────────

  test("resampleDailyInterp: gaps fill linearly, null observations pin nothing") {
    import java.sql.Timestamp
    val day = 86400L // seconds
    val rows = Seq[(Long, Long, Long, java.lang.Double)](
      (1L, 1L, 0L * day, 10.0),
      (2L, 1L, 2L * day, 40.0),   // day 1 missing → interp 25.0
      (3L, 1L, 3L * day, null),   // null never pins the curve
      (4L, 1L, 4L * day, 50.0))   // days 3 → interp 45.0
    val df = rows.map { case (eid, uid, tSec, v) =>
      (eid, uid, "gauge", new Timestamp(tSec * 1000L), v)
    }.toDF("event_id", "user_id", "event_type", "tsx", "value")
      .withColumn("ts", expr("unix_micros(tsx) * 1000")).drop("tsx")
    val r = graft.ops.Events.resampleDailyInterp(df)
      .orderBy("day").collect()
      .map(x => (x.getLong(1), x.getDouble(2), x.getInt(3)))
    assert(r.toSeq == Seq(
      (0L, 10.0, 1), (1L, 25.0, 0), (2L, 40.0, 1), (3L, 45.0, 0), (4L, 50.0, 1)),
      s"got ${r.mkString(";")}")
  }

  // ── winsorized mean ───────────────────────────────────────────────────

  test("winsorizedMean: clamps into the exact percentile band, outliers tamed") {
    // g1 = 0..10: p5 = 0.5, p95 = 9.5 (interpolated); the symmetric clamp
    // keeps the mean at exactly 5.0 with 2 rows clamped
    val g1 = (0 to 10).map(i => ("g1", i.toDouble))
    // g2 = ten 1.0s + one 1000.0: the outlier collapses to ~p95
    val g2 = Seq.fill(10)(("g2", 1.0)) :+ (("g2", 1000.0))
    val df = (g1 ++ g2).toDF("k", "v")
    val r = graft.ops.Stats.winsorizedMean(df, Seq("k"), "v")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getAs[Double]("p_lo"), x.getAs[Double]("p_hi"),
          x.getAs[Double]("winsorized_mean"), x.getLong(5))).toMap
    assert(r("g1") == (11L, 0.5, 9.5, 5.0, 2L), s"got ${r("g1")}")
    val (n2, _, hi2, wm2, nc2) = r("g2")
    assert(n2 == 11L && nc2 == 1L)
    assert(wm2 < 100.0, s"outlier must be tamed, got $wm2")
    assert(wm2 == ((10 * 1.0 + hi2) / 11 * 1e6).round / 1e6)
  }

  // ── vocabulary overlap matrix ─────────────────────────────────────────

  test("vocabOverlapMatrix: exact pairwise Jaccard over distinct token sets") {
    val df = Seq(
      ("s1", "alpha beta gamma"), ("s1", "beta delta"),
      ("s2", "beta gamma epsilon"), ("s3", "zeta")).toDF("source", "text")
    val r = TextOps.vocabOverlapMatrix(df, "source", "text")
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getAs[Double]("jaccard"))).toMap
    // s1 = {alpha,beta,gamma,delta} (4), s2 = {beta,gamma,epsilon} (3),
    // common 2, union 5 → J = 0.4; s3 shares nothing → absent (inner join)
    assert(r(("s1", "s2")) == (4L, 3L, 2L, 0.4), s"got $r")
    assert(!r.keys.exists { case (a, b) => a >= b }, "matrix is strictly upper")
    assert(!r.contains(("s1", "s3")) && !r.contains(("s2", "s3")))
  }

  // ── PMI table ─────────────────────────────────────────────────────────

  test("pmiTable: independent columns give zero PMI everywhere") {
    // 2×2 with perfect independence: p(r,c) = p(r)·p(c) for every cell
    val df = (Seq.fill(2)(("en", "s1")) ++ Seq.fill(2)(("en", "s2")) ++
      Seq(("fr", "s1")) ++ Seq(("fr", "s2"))).toDF("lang", "source")
    val r = TextOps.pmiTable(df, "lang", "source").collect()
    assert(r.length == 4)
    r.foreach(x => assert(x.getAs[Double]("pmi") == 0.0, x.toString))
    // and a dependent cell is nonzero: put all fr mass on s1
    val dep = (Seq.fill(3)(("en", "s2")) ++ Seq.fill(3)(("fr", "s1")))
      .toDF("lang", "source")
    val pm = TextOps.pmiTable(dep, "lang", "source")
      .collect().map(x => (x.getString(0), x.getString(1)) -> x.getAs[Double]("pmi")).toMap
    assert(pm(("fr", "s1")) > 0.6, s"got $pm") // ln(2) ≈ 0.693
  }

  // ── SCD-2 intervals ───────────────────────────────────────────────────

  test("scd2Intervals: change points compressed, null-safe, intervals chain") {
    import java.sql.Timestamp
    // value sequence 1, 1, 2, null, null, 2 at t = 1..6 s
    val rows = Seq[(Long, Long, Long, java.lang.Double)](
      (1L, 1L, 1L, 1.0), (2L, 1L, 2L, 1.0), (3L, 1L, 3L, 2.0),
      (4L, 1L, 4L, null), (5L, 1L, 5L, null), (6L, 1L, 6L, 2.0))
    val df = rows.map { case (eid, uid, tSec, v) =>
      (eid, uid, "login", new Timestamp(tSec * 1000L), v)
    }.toDF("event_id", "user_id", "event_type", "tsx", "value")
      // events.ts arrives as nanos-as-long (parquet TIMESTAMP(NANOS))
      .withColumn("ts", expr("unix_micros(tsx) * 1000")).drop("tsx")
    val r = graft.ops.Events.scd2Intervals(df)
      .orderBy("valid_from_us").collect()
      .map(x => (Option(x.get(2)), x.getLong(3), Option(x.get(4))))
    assert(r.length == 4, s"6 events → 4 change intervals, got ${r.mkString(";")}")
    assert(r(0) == (Some(1.0), 1000000L, Some(3000000L)))
    assert(r(1) == (Some(2.0), 3000000L, Some(4000000L)))
    assert(r(2) == (None, 4000000L, Some(6000000L)), "null is a state, not a wildcard")
    assert(r(3) == (Some(2.0), 6000000L, None), "current row is open-ended")
  }

  // ── FILTER / DISTINCT composition over the custom aggregates ─────────

  test("graft_mode composes with SQL FILTER and DISTINCT clauses") {
    // the reference forwards filter/distinct through its rewrite
    // (src/max_min_by.rs:104) — the Spark registrations must too
    graft.functions.GraftFunctions.registerAll(spark)
    Seq(1, 1, 1, 2, 2, 3).toDF("x").createOrReplaceTempView("t8f")
    val r = spark.sql(
      """SELECT graft_mode(x) AS m,
        |  graft_mode(DISTINCT x) AS md,
        |  graft_mode(x) FILTER (WHERE x <> 1) AS mf
        |FROM t8f""".stripMargin).head()
    assert(r.getInt(0) == 1, "plain mode: most frequent")
    assert(r.getInt(1) == 3, "DISTINCT collapses counts to 1 → tie-break = max value")
    assert(r.getInt(2) == 2, "FILTER removes the 1s → mode of {2,2,3}")
  }

  // ── TPC-H anchor plans ────────────────────────────────────────────────

  test("q_tpch_q7: nation membership broadcasts, ship-date filter reaches the scan") {
    val df = SparkEntry.queries("q_tpch_q7")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    val scanLine = plan.linesIterator.filter(_.contains("PushedFilters"))
      .find(_.contains("l_shipdate"))
    assert(scanLine.exists(_.contains("GreaterThanOrEqual")),
      s"ship-date range must push to the lineitem scan:\n$plan")
  }
}
