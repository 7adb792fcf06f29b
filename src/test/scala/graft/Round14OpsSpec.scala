package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Events, Scale, Stats}

/** Round-14 operators: distributed AUC, PSI drift, chi^2 independence,
  * one-pass correlation matrix, SRM check, rolling correlation, and
  * scalable dense-ID assignment. Pinned contracts on hand frames plus
  * naive-form / permutation-invariance equality, the labelWindow /
  * budgetSelect proof pattern. */
class Round14OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")

  private val DAY = 86400000000000L // ns

  // ---- aucRoc ----

  test("aucRoc: perfect separation is 1.0, reversed is 0.0, random ties at 0.5") {
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))
      .toDF("score", "label")
    assert(Stats.aucRoc(perfect, "score", "label").collect()(0).getDouble(2) == 1.0)
    val reversed = Seq((0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0))
      .toDF("score", "label")
    assert(Stats.aucRoc(reversed, "score", "label").collect()(0).getDouble(2) == 0.0)
    // one shared score: every pos-neg pair ties -> 0.5 exactly
    val allTied = Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0))
      .toDF("score", "label")
    assert(Stats.aucRoc(allTied, "score", "label").collect()(0).getDouble(2) == 0.5)
  }

  test("aucRoc: average-rank tie handling matches the closed form") {
    // scores: pos at 0.7, neg at 0.7 (tie -> 1/2), pos at 0.9 above both
    // negs (2), neg at 0.3 below both poss. U = (1 + 0.5) + 2 ... compute:
    // positives {0.9, 0.7}, negatives {0.7, 0.3}.
    // pos 0.9: beats both negs = 2. pos 0.7: beats 0.3 (1) + ties 0.7 (0.5).
    // U = 3.5, P*N = 4 -> AUC = 0.875
    val df = Seq((0.9, 1), (0.7, 1), (0.7, 0), (0.3, 0)).toDF("s", "y")
    assert(Stats.aucRoc(df, "s", "y").collect()(0).getDouble(2) == 0.875)
  }

  test("aucRoc: bucket decomposition is invariant to the bucket count") {
    val e = events.withColumn("label",
      (col("event_type") === "purchase").cast("int"))
    val one = Stats.aucRoc(e, "value", "label", buckets = 1).collect()(0)
    val many = Stats.aucRoc(e, "value", "label", buckets = 4096).collect()(0)
    val default = Stats.aucRoc(e, "value", "label").collect()(0)
    assert(one == many && one == default)
  }

  test("aucRoc: degenerate single-class inputs yield NULL auc, no throw") {
    val allPos = Seq((0.9, 1), (0.1, 1)).toDF("s", "y")
    val r = Stats.aucRoc(allPos, "s", "y").collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.isNullAt(2))
    val empty = Seq.empty[(Double, Int)].toDF("s", "y")
    val r2 = Stats.aucRoc(empty, "s", "y").collect()(0)
    assert(r2.getLong(0) == 0L && r2.getLong(1) == 0L && r2.isNullAt(2))
  }

  test("aucRoc: segmented form ranks each key independently") {
    // segment a: perfect; segment b: reversed; segment null: all tied
    val df = Seq(
      (Some("a"), 0.9, 1), (Some("a"), 0.1, 0),
      (Some("b"), 0.1, 1), (Some("b"), 0.9, 0),
      (None: Option[String], 0.5, 1), (None, 0.5, 0))
      .toDF("seg", "s", "y")
    val out = Stats.aucRoc(df, "s", "y", keys = Seq("seg")).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0)) -> r.getDouble(3))
      .toMap
    assert(out("a") == 1.0 && out("b") == 0.0 && out(null) == 0.5)
  }

  test("aucRoc: segmented totals match the global split") {
    val e = graft.ops.EventTime.normalizeTs(events)
      .withColumn("label", (col("event_type") === "purchase").cast("int"))
      .withColumn("dow", expr("(ts div 86400000000000L + 4) % 7"))
    val by = Stats.aucRoc(e, "value", "label", keys = Seq("dow")).collect()
    val glob = Stats.aucRoc(e, "value", "label").collect()(0)
    assert(by.map(_.getLong(1)).sum == glob.getLong(0))
    assert(by.map(_.getLong(2)).sum == glob.getLong(1))
    // each segment's AUC equals the unsegmented AUC of that slice
    val d0 = by.find(_.getLong(0) == 0L).get
    val solo = Stats.aucRoc(e.filter(expr("(ts div 86400000000000L + 4) % 7 = 0")),
      "value", "label").collect()(0)
    assert(d0.getDouble(3) == solo.getDouble(2))
  }

  // ---- embedCovariance ----

  test("embedCovariance: hand-computed 2-dim matrix is exact") {
    // vectors (1,2),(3,6),(5,10): mean (3,6); cov(0,0)=8/3, cov(0,1)=16/3,
    // cov(1,1)=32/3 (population). quantize at 1000 is exact for these
    val df = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 6.0f), Seq(5.0f, 10.0f))
      .toDF("embedding")
    val out = graft.ops.Similarity.embedCovariance(df, "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(out.size == 3)
    assert(out((0, 0)) == math.rint(8.0 / 3.0 * 1e6) / 1e6)
    assert(out((0, 1)) == math.rint(16.0 / 3.0 * 1e6) / 1e6)
    assert(out((1, 1)) == math.rint(32.0 / 3.0 * 1e6) / 1e6)
  }

  test("embedCovariance: constant dimension has zero variance and covariance") {
    val df = Seq(Seq(1.0f, 7.0f), Seq(2.0f, 7.0f)).toDF("embedding")
    val out = graft.ops.Similarity.embedCovariance(df, "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(out((1, 1)) == 0.0 && out((0, 1)) == 0.0 && out((0, 0)) == 0.25)
  }

  test("embedCovariance: agrees with covar_pop on the quantized values") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ours = graft.ops.Similarity.embedCovariance(emb, "embedding")
      .filter(col("i") === 3 && col("j") === 17).collect()(0).getDouble(3)
    val ref = emb.select(
        (expr("cast(round(embedding[3] * 1000) as bigint)") / 1000.0).as("x"),
        (expr("cast(round(embedding[17] * 1000) as bigint)") / 1000.0).as("y"))
      .agg(covar_pop(col("x"), col("y"))).collect()(0).getDouble(0)
    assert(math.abs(ours - ref) < 1e-6)
  }

  test("vector_outer_sum: SQL-registered form matches the Column API") {
    val df = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 6.0f)).toDF("embedding")
    df.createOrReplaceTempView("r14_vos")
    val viaSql = spark.sql(
      """SELECT graft_vector_outer_sum(
        |  transform(cast(embedding as array<double>),
        |    x -> cast(round(x * 1000) as bigint))) AS st
        |FROM r14_vos""".stripMargin).collect()(0).getStruct(0)
    assert(viaSql.getLong(0) == 2L)
    assert(viaSql.getSeq[Long](1) == Seq(4000L, 8000L))
  }

  test("embedCovariance: dimension mismatch fails loudly, empty input is empty") {
    val bad = Seq(Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f)).toDF("embedding")
    val e = intercept[Exception] {
      graft.ops.Similarity.embedCovariance(bad, "embedding").collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("length mismatch"))
    val empty = Seq.empty[Seq[Float]].toDF("embedding")
    assert(graft.ops.Similarity.embedCovariance(empty, "embedding").count() == 0L)
  }

  // ---- canonicalUrl / urlDedup ----

  test("canonicalUrl: every transport variant of a page collapses to one form") {
    import graft.ops.TextOps
    val variants = Seq(
      "HTTPS://Site.Org:443/a/b/?utm_source=x&z=1&a=2#frag",
      "https://site.org/a/b?a=2&z=1",
      "https://SITE.org/a/b///?z=1&a=2&fbclid=abc",
      "https://site.org:443/a/b?ref=tw&a=2&z=1")
    val out = variants.toDF("url")
      .select(TextOps.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSet
    assert(out == Set("https://site.org/a/b?a=2&z=1"))
    // a genuinely different page does NOT collapse
    val other = Seq("https://site.org/a/b?a=3&z=1", "http://site.org:8080/a/b")
      .toDF("url").select(TextOps.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSet
    assert(other == Set("https://site.org/a/b?a=3&z=1",
      "http://site.org:8080/a/b"))
  }

  test("urlDedup: counts and min-id representative per canonical form") {
    import graft.ops.TextOps
    val df = Seq(
      (3L, "https://x.org/p"), (1L, "HTTPS://X.ORG/p/"),
      (2L, "https://x.org/p?utm_source=a"), (9L, "https://y.org/q"))
      .toDF("id", "url")
    val out = TextOps.urlDedup(df, "id", "url")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("https://x.org/p") == ((3L, 1L)))
    assert(out("https://y.org/q") == ((1L, 9L)))
  }

  // ---- readability ----

  test("readability: hand counts and the FK formula, wordless docs NULL") {
    import graft.ops.TextOps
    // "See Spot run. See Spot jump!" -> 6 words, 2 sentences; vowel runs:
    // see(2: ee... 'see'->'ee' 1 run) count: see=1, spot=1, run=1, see=1,
    // spot=1, jump=1 -> 6 runs -> syllables = max(6, 6) = 6
    val df = Seq((1L, "See Spot run. See Spot jump!"), (2L, "!!! ???"))
      .toDF("doc_id", "text")
    val out = TextOps.readability(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getInt(1) == 6 && r1.getInt(2) == 2 && r1.getInt(3) == 6)
    val expected = math.rint((0.39 * 3.0 + 11.8 * 1.0 - 15.59) * 1e6) / 1e6
    assert(r1.getDouble(4) == expected)
    val r2 = out(2L)
    assert(r2.getInt(1) == 0 && r2.getInt(2) == 0 && r2.getInt(3) == 0 &&
      r2.isNullAt(4)) // no ANSI divide on the wordless doc
  }

  // ---- bootstrapMeanCI ----

  test("bootstrapMeanCI: interval brackets the true mean and tightens with n") {
    val small = (1 to 40).map(i => (i.toLong, (i % 7).toDouble)).toDF("id", "v")
    val big = (1 to 4000).map(i => (i.toLong, (i % 7).toDouble)).toDF("id", "v")
    val rs = Stats.bootstrapMeanCI(small, "id", "v").collect()(0)
    val rb = Stats.bootstrapMeanCI(big, "id", "v").collect()(0)
    assert(rs.getLong(0) == 40L && rb.getLong(0) == 4000L)
    // both intervals bracket their sample mean
    assert(rs.getDouble(2) <= rs.getDouble(1) && rs.getDouble(1) <= rs.getDouble(3))
    assert(rb.getDouble(2) <= rb.getDouble(1) && rb.getDouble(1) <= rb.getDouble(3))
    // 100x the data -> a much tighter interval
    assert((rb.getDouble(3) - rb.getDouble(2)) <
      (rs.getDouble(3) - rs.getDouble(2)) / 3)
  }

  test("bootstrapMeanCI: deterministic across partitionings; constant data "
      + "collapses to a point") {
    val df = (1 to 300).map(i => (i.toLong, math.sin(i).abs)).toDF("id", "v")
    val a = Stats.bootstrapMeanCI(df, "id", "v").collect()(0)
    val b = Stats.bootstrapMeanCI(df.repartition(13), "id", "v").collect()(0)
    assert(a == b)
    val const = (1 to 100).map(i => (i.toLong, 2.5)).toDF("id", "v")
    val rc = Stats.bootstrapMeanCI(const, "id", "v").collect()(0)
    assert(rc.getDouble(1) == 2.5 && rc.getDouble(2) == 2.5 && rc.getDouble(3) == 2.5)
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    val re = Stats.bootstrapMeanCI(empty, "id", "v").collect()(0)
    assert(re.getLong(0) == 0L && re.isNullAt(1) && re.isNullAt(2) && re.isNullAt(3))
  }

  test("bootstrapMeanCI: keyed segments equal the per-slice global computation") {
    val df = (1 to 200).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", math.sin(i).abs)).toDF("id", "g", "v")
    val byKey = Stats.bootstrapMeanCI(df, "id", "v", keys = Seq("g"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    Seq("a", "b").foreach { g =>
      val solo = Stats.bootstrapMeanCI(df.filter(col("g") === g), "id", "v")
        .collect()(0).toSeq
      assert(byKey(g) == solo, s"segment $g")
    }
  }

  test("bootstrapLiftCI: brackets the true lift, zero-width on constant arms") {
    // arm 1 pays exactly 1.0 more than arm 0 -> lift 1.0, CI collapses
    val const = (1 to 200).map(i => (i.toLong, i % 2, 2.0 + (i % 2)))
      .toDF("id", "arm", "v")
    val rc = Stats.bootstrapLiftCI(const, "id", "arm", "v").collect()(0)
    assert(rc.getLong(0) == 100L && rc.getLong(1) == 100L)
    assert(rc.getDouble(2) == 1.0 &&
      rc.getDouble(3) == 1.0 && rc.getDouble(4) == 1.0)
    // noisy arms: interval brackets the sample lift
    val noisy = (1 to 500).map(i =>
      (i.toLong, i % 2, math.sin(i) + (i % 2) * 0.5)).toDF("id", "arm", "v")
    val rn = Stats.bootstrapLiftCI(noisy, "id", "arm", "v").collect()(0)
    assert(rn.getDouble(3) <= rn.getDouble(2) &&
      rn.getDouble(2) <= rn.getDouble(4))
    assert(rn.getDouble(4) - rn.getDouble(3) > 0.0)
  }

  // ---- abLiftBy ----

  test("abLiftBy: segment rows partition the abLift population exactly") {
    val by = Events.abLiftBy(events, "event_type").collect()
    val glob = Events.abLift(events).collect()(0)
    assert(by.map(_.getLong(1)).sum == glob.getLong(0)) // n_c
    assert(by.map(_.getLong(2)).sum == glob.getLong(1)) // n_t
    // every user appears in exactly one segment (first event is unique)
    assert(by.map(r => r.getLong(1) + r.getLong(2)).sum ==
      events.select("user_id").distinct().count())
  }

  test("abLiftBy: a single-segment frame reproduces abLift verbatim") {
    val one = graft.ops.EventTime.normalizeTs(events)
      .withColumn("seg", lit("all"))
    val by = Events.abLiftBy(one, "seg").collect()
    assert(by.length == 1)
    val glob = Events.abLift(events).collect()(0)
    assert(by(0).toSeq.drop(1) == glob.toSeq)
  }

  // ---- cohortLtv ----

  test("cohortLtv: hand frame — cohorts, ages and cumulative revenue exact") {
    // user 1 first active day 0 (click), buys 2.0 on day 0 and 3.0 on day 2
    // user 2 first active day 2, buys 5.0 on day 2 (age 0)
    val df = Seq(
      (1L, 0L * DAY, "click", 0.0), (1L, 0L * DAY, "purchase", 2.0),
      (1L, 2L * DAY, "purchase", 3.0),
      (2L, 2L * DAY, "purchase", 5.0))
      .toDF("user_id", "ts", "event_type", "value")
    val out = Events.cohortLtv(df, "purchase", maxAgeDays = 28)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out((0L, 0)) == ((1L, 2.0)))   // cohort day0: 1 user, 2.0 by age 0
    assert(out((0L, 2)) == ((1L, 5.0)))   // cumulative 2+3 by age 2
    assert(out((2L, 0)) == ((1L, 5.0)))   // cohort day2: its own curve
    assert(out.size == 3)
  }

  test("cohortLtv: age window excludes revenue beyond maxAgeDays") {
    val df = Seq(
      (1L, 0L * DAY, "purchase", 1.0),
      (1L, 40L * DAY, "purchase", 100.0)) // beyond the 28-day window
      .toDF("user_id", "ts", "event_type", "value")
    val out = Events.cohortLtv(df, "purchase", maxAgeDays = 28).collect()
    assert(out.length == 1)
    assert(out(0).getInt(1) == 0 && out(0).getDouble(3) == 1.0)
  }

  // ---- cdfNormalize ----

  test("cdfNormalize: mid-rank positions on a hand frame, ties shared") {
    // group g: values 1,2,2,4 -> cdf(1)=0.125, cdf(2)=(1+1)/4=0.5, cdf(4)=0.875
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 2.0), ("g", 4.0)).toDF("k", "v")
    val out = Stats.cdfNormalize(df, Seq("k"), "v")
      .collect().map(r => r.getDouble(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out(1.0) == ((1L, 0.125)))
    assert(out(2.0) == ((2L, 0.5)))
    assert(out(4.0) == ((1L, 0.875)))
  }

  test("cdfNormalize: bucket-count invariance and null-key group survival") {
    val df = Seq((Some("a"), 1.0), (Some("a"), 2.0),
      (None: Option[String], 5.0), (None, 7.0)).toDF("k", "v")
    val b1 = Stats.cdfNormalize(df, Seq("k"), "v", buckets = 1)
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0),
        r.getDouble(1), r.getDouble(3))).toSet
    val b256 = Stats.cdfNormalize(df, Seq("k"), "v", buckets = 256)
      .collect().map(r => (if (r.isNullAt(0)) null else r.getString(0),
        r.getDouble(1), r.getDouble(3))).toSet
    assert(b1 == b256)
    assert(b1.exists(_._1 == null)) // the null-key group survived the joins
    assert(b1.count(_._1 == null) == 2)
  }

  test("cdfNormalize: matches the window-rank naive form on real data") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ours = Stats.cdfNormalize(li, Seq("l_returnflag"), "l_extendedprice")
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(3)).toMap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_returnflag"))
    val naive = li.groupBy(col("l_returnflag"), col("l_extendedprice"))
      .agg(count(lit(1)).as("c"))
      .withColumn("below", coalesce(sum(col("c")).over(
        w.orderBy(col("l_extendedprice"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("c")).over(w))
      .select(col("l_returnflag"), col("l_extendedprice"),
        round((lit(2L) * col("below") + col("c")).cast("double") /
          (lit(2.0) * col("n").cast("double")), 6).as("cdf"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(ours == naive)
  }

  // ---- annJoin ----

  test("annJoin: identical vector across tables pairs at cosine 1, top-k and "
      + "threshold enforced") {
    import graft.ops.Similarity
    val mk = (id: Long, v: Seq[Float]) => (id, v)
    // left 1 == right 11 (same bucket, cos 1); right 12 is its negation
    // (opposite bucket -> never a candidate even though |cos| = 1)
    val base = Seq.fill(64)(0.1f)
    val left = Similarity.prepared(
      Seq(mk(1L, base)).toDF("vec_id", "embedding"), "vec_id", "embedding")
    val right = Similarity.prepared(
      Seq(mk(11L, base), mk(12L, base.map(-_))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val out = Similarity.annJoin(left, right, planes = 8, dim = 64,
      minCos = 0.5, k = 3).collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 11L &&
      out(0).getDouble(2) == 1.0 && out(0).getInt(3) == 1)
  }

  test("annJoin: every emitted pair shares a bucket, verifies the threshold, "
      + "and ranks correctly") {
    import graft.ops.Similarity
    val all = Similarity.prepared(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
      "vec_id", "embedding")
    val l = all.filter(col("vec_id") % 2 === 0)
    val r = all.filter(col("vec_id") % 2 === 1)
    val out = Similarity.annJoin(l, r, planes = 6, dim = 64,
      minCos = 0.1, k = 3).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getDouble(2) >= 0.1))
    // per left id: ranks are 1..m, scores non-increasing, <= k rows
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.length <= 3)
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a.getDouble(2) >= b.getDouble(2)
        case _ => true
      })
    }
    // bucket agreement: recompute signatures and check each pair collides
    val sig = all.select(col("vec_id"),
      Similarity.lshBucket(col("v"), 6, 64).as("b"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach(r => assert(sig(r.getLong(0)) == sig(r.getLong(1))))
  }

  // ---- randomProject ----

  test("randomProject: signs agree with the SRP signature plane-for-plane") {
    // same md5 plane family: element p's sign must equal lshBucket's
    // p-th bit (>= 0 -> '1')
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pre = graft.ops.Similarity.prepared(emb, "vec_id", "embedding")
    val both = graft.ops.Similarity.randomProject(
        pre.select(col("vec_id"), col("v")), "v", dim = 64, outDim = 16)
      .join(pre.select(col("vec_id"),
        graft.ops.Similarity.lshBucket(col("v"), 16, 64).as("sig")), "vec_id")
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val proj = r.getSeq[Double](r.fieldIndex("proj"))
      val sig = r.getString(r.fieldIndex("sig"))
      proj.zip(sig).foreach { case (x, bit) =>
        assert((x >= 0) == (bit == '1'), s"plane sign mismatch: $x vs $bit")
      }
    }
  }

  test("randomProject: linear to rounding and preserves dimension contract") {
    val df = Seq((1L, Seq.fill(64)(0.25f)), (2L, Seq.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.randomProject(df, "embedding", 64, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](r.fieldIndex("proj")))
      .toMap
    // v2 = 2*v1 exactly -> each projection doubles (to 6-dp rounding)
    out(1L).zip(out(2L)).foreach { case (a, b) =>
      assert(math.abs(b - 2 * a) < 2e-6, s"$b != 2*$a") }
    val bad = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      graft.ops.Similarity.randomProject(bad, "embedding", 64, 8).collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("length mismatch"))
  }

  test("randomProject: rejects outCol == vecCol (input is dropped)") {
    val df = Seq((1L, Seq.fill(64)(0.25f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Similarity.randomProject(df, "embedding", 64, 8,
        outCol = "embedding")
    }
    assert(e.getMessage.contains("outCol must differ"))
  }

  // ---- psi ----

  test("psi: identical base and current distributions score ~0") {
    val df = (1 to 100).flatMap(i => Seq((i.toDouble, true), (i.toDouble, false)))
      .toDF("v", "b")
    val out = Stats.psi(df, "v", col("b"), bins = 10).collect()
    assert(out.length == 10)
    // equal counts + equal smoothing -> every term is exactly 0
    assert(out.forall(_.getDouble(5) == 0.0))
  }

  test("psi: a shifted current distribution scores high and clamps to edge bins") {
    // baseline in [0, 10); current all at 100 -> everything clamps to bin 9
    val base = (0 until 100).map(i => (i % 10 + 0.0, true))
    val cur = (0 until 100).map(_ => (100.0, false))
    val out = Stats.psi((base ++ cur).toDF("v", "b"), "v", col("b"), bins = 10)
      .collect().sortBy(_.getLong(0))
    assert(out(9).getLong(2) == 100L) // all current mass in the top bin
    assert(out(0).getDouble(5) > 1.0) // big drift
  }

  test("psi: all bins densified even when a middle bin is empty") {
    val df = Seq((0.0, true), (9.99, true), (0.0, false)).toDF("v", "b")
    val out = Stats.psi(df, "v", col("b"), bins = 10).collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(0)).sorted.toSeq == (0L to 9L))
  }

  test("psiMulti: single-feature slice is identical to psi()") {
    val df = (1 to 200).map(i => (i.toDouble, (i * 3 % 17).toDouble, i % 2 == 0))
      .toDF("a", "b", "base")
    val multi = Stats.psiMulti(df, Seq("a", "b"), col("base"), bins = 10)
      .filter(col("feature") === "a")
      .select("bin", "n_base", "n_cur", "p_base", "p_cur", "psi")
      .collect().map(_.toSeq).toSet
    val single = Stats.psi(df, "a", col("base"), bins = 10)
      .collect().map(_.toSeq).toSet
    assert(multi == single)
  }

  test("psiMulti: a null in one feature does not leak into another's counts") {
    val df = Seq((1.0, Some(5.0), true), (2.0, None, true), (3.0, Some(6.0), false))
      .toDF("a", "b", "base")
    val out = Stats.psiMulti(df, Seq("a", "b"), col("base"), bins = 2)
      .collect()
    val aTotal = out.filter(_.getString(0) == "a")
      .map(r => r.getLong(2) + r.getLong(3)).sum
    val bTotal = out.filter(_.getString(0) == "b")
      .map(r => r.getLong(2) + r.getLong(3)).sum
    assert(aTotal == 3L) // all three a-values counted
    assert(bTotal == 2L) // the null b row excluded from b only
  }

  // ---- splitQuality ----

  test("splitQuality: a determining feature gains the full base impurity, "
      + "a useless one gains zero") {
    // feature == label: every value is pure -> weighted 0, gain = base
    val pure = (1 to 40).map(i => (if (i % 2 == 0) "a" else "b", i % 2))
      .toDF("f", "y")
    val rp = Stats.splitQuality(pure, "f", "y").collect()(0)
    assert(rp.getDouble(5) == 0.0)                     // weighted
    assert(rp.getDouble(6) == rp.getDouble(4))         // gain == base
    assert(rp.getDouble(4) == 0.5)                     // 50/50 label
    // feature independent of label: every value has the base mix
    val none = (1 to 40).map(i => (if (i % 4 < 2) "a" else "b", i % 2))
      .toDF("f", "y")
    val rn = Stats.splitQuality(none, "f", "y").collect()(0)
    assert(rn.getDouble(5) == rn.getDouble(4) && rn.getDouble(6) == 0.0)
  }

  test("splitQuality: per-value rows carry exact counts and impurities") {
    // value a: 3 pos / 1 neg (gini 1 - .75^2 - .25^2 = .375); b: pure
    val df = (Seq.fill(3)(("a", 1)) ++ Seq(("a", 0)) ++ Seq.fill(4)(("b", 0)))
      .toDF("f", "y")
    val out = Stats.splitQuality(df, "f", "y")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("a") == ((4L, 3L, 0.375)))
    assert(out("b") == ((4L, 0L, 0.0)))
  }

  // ---- anomalyBands ----

  test("anomalyBands: a spike flags; warmup days never do; a spike in the "
      + "window cannot mask the next one") {
    // 10 steady days of 5 events, then a 50-event spike on day 10,
    // then 5 again, then ANOTHER spike on day 12
    def mk(day: Long, cnt: Int) =
      (0 until cnt).map(i => (day * DAY + i, "a"))
    val evs = ((0L to 9L).flatMap(d => mk(d, 5)) ++ mk(10L, 50) ++
      mk(11L, 5) ++ mk(12L, 40)).toDF("ts", "event_type")
    val out = Events.anomalyBands(evs, k = 3.0, windowDays = 14, minDays = 7)
      .collect().map(r => r.getLong(1) -> r).toMap
    // warmup: first days lack history -> no expectation, no flag
    assert(out(0L).isNullAt(4) && !out(0L).getBoolean(6))
    assert(out(6L).isNullAt(4) && !out(6L).getBoolean(6))
    // steady day: expectation 5, no flag
    assert(out(9L).getDouble(4) == 5.0 && !out(9L).getBoolean(6))
    // the spike flags
    assert(out(10L).getBoolean(6))
    // day 12: the day-10 spike sits INSIDE the window, but the MEDIAN
    // band still centers at 5 — the second spike flags too (a mean/sigma
    // band would have been inflated by the first spike)
    assert(out(12L).getDouble(4) == 5.0 && out(12L).getBoolean(6))
  }

  test("anomalyBands: the RANGE frame forgets history beyond windowDays") {
    // activity on days 0..7, silence, then day 40: no history in range
    val evs = ((0L to 7L).flatMap(d => Seq((d * DAY, "a"), (d * DAY + 1, "a"))) ++
      Seq((40L * DAY, "a"))).toDF("ts", "event_type")
    val out = Events.anomalyBands(evs, 3.0, 14, 7)
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(out(40L).getInt(3) == 0 && out(40L).isNullAt(4) &&
      !out(40L).getBoolean(6))
  }

  // ---- bhAdjust ----

  test("bhAdjust: the reverse-min envelope fixes non-monotone raw values") {
    // sorted p (.01, .03, .04): raw m*p/i = (.03, .045, .04) — the naive
    // per-rank value is NON-monotone; BH takes the reverse running min
    val df = Seq(("a", 0.01), ("b", 0.04), ("c", 0.03)).toDF("id", "p")
    val out = Stats.bhAdjust(df, "id", "p", alpha = 0.05)
      .collect().map(r => r.getString(0) -> (r.getInt(2), r.getDouble(3))).toMap
    assert(out("a") == ((1, 0.03)))
    assert(out("c") == ((2, 0.04))) // min(.045, .04), not .045
    assert(out("b") == ((3, 0.04)))
  }

  test("bhAdjust: boundary chain rejects everything at exactly alpha") {
    val df = (1 to 5).map(i => (s"t$i", i * 0.01)).toDF("id", "p")
    val out = Stats.bhAdjust(df, "id", "p", alpha = 0.05).collect()
    assert(out.forall(_.getDouble(3) == 0.05))
    assert(out.forall(_.getBoolean(4)))
    // adjusted p caps at 1.0
    val big = Seq(("x", 0.99), ("y", 0.995)).toDF("id", "p")
    assert(Stats.bhAdjust(big, "id", "p").collect()
      .forall(r => r.getDouble(3) <= 1.0 && !r.getBoolean(4)))
  }

  // ---- theilSen ----

  test("theilSen: one wild outlier cannot move the robust trend") {
    // y = 2x + 3 on days 0..10, except day 5 reports 1000 (an outage
    // backfill); the median pairwise slope stays 2, intercept 3
    val pts = (0 to 10).map(x => (x.toDouble,
      if (x == 5) 1000.0 else 2.0 * x + 3.0)).toDF("x", "y")
    val r = Stats.theilSen(pts, "x", "y").collect()(0)
    assert(r.getLong(0) == 11L)
    assert(r.getDouble(1) == 2.0 && r.getDouble(2) == 3.0)
  }

  test("theilSen: fewer than two points yields an empty result") {
    val one = Seq((1.0, 5.0)).toDF("x", "y")
    assert(Stats.theilSen(one, "x", "y").count() == 0L)
  }

  // ---- kaplanMeier ----

  test("kaplanMeier: hand curve with censoring and exact extinction") {
    // t=1 event (n=3 -> S=2/3), t=2 censored (S unchanged),
    // t=3 event with n=1 -> extinction, S=0 EXACTLY
    val df = Seq((1L, 1), (2L, 0), (3L, 1)).toDF("t", "e")
    val out = Stats.kaplanMeier(df, "t", "e")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(1L) == ((3L, 1L, 0L, 0.666667)))
    assert(out(2L) == ((2L, 0L, 1L, 0.666667)))
    assert(out(3L) == ((1L, 1L, 0L, 0.0)))
  }

  test("kaplanMeier: keyed curves equal the per-slice global computation") {
    val df = Seq((0, 1L, 1), (0, 2L, 0), (0, 3L, 1),
      (1, 1L, 0), (1, 4L, 1)).toDF("g", "t", "e")
    val byKey = Stats.kaplanMeier(df, "t", "e", keys = Seq("g"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.toSeq.drop(1)).toMap
    Seq(0, 1).foreach { g =>
      val solo = Stats.kaplanMeier(df.filter(col("g") === g), "t", "e")
        .collect().map(r => (g, r.getLong(0)) -> r.toSeq).toMap
      solo.foreach { case (k, v) => assert(byKey(k) == v, s"key $k") }
    }
  }

  test("logRank: identical groups score zero; separated groups flag") {
    // identical curves -> o1 == e1 exactly -> chi2 0
    val same = (1 to 50).flatMap(i =>
      Seq((0, (i % 5 + 1).toLong, i % 3 min 1), (1, (i % 5 + 1).toLong, i % 3 min 1)))
      .toDF("g", "t", "e")
    val rs = Stats.logRank(same, "t", "e", "g").collect()(0)
    assert(rs.getDouble(2) == 0.0 && !rs.getBoolean(3))
    // group 1 converts on day 1, group 0 never (censored day 30)
    val split = ((1 to 30).map(i => (1, 1L, 1)) ++
      (1 to 30).map(i => (0, 30L, 0))).toDF("g", "t", "e")
    val rx = Stats.logRank(split, "t", "e", "g").collect()(0)
    assert(rx.getLong(0) == 30L && rx.getBoolean(3))
  }

  test("kaplanMeier: without censoring the curve is one minus the ECDF") {
    val durs = Seq(1L, 1L, 2L, 5L, 5L, 5L, 9L, 12L)
    val df = durs.map(t => (t, 1)).toDF("t", "e")
    val out = Stats.kaplanMeier(df, "t", "e")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    durs.distinct.foreach { t =>
      val frac = durs.count(_ > t).toDouble / durs.size
      assert(math.abs(out(t) - frac) < 1e-6, s"t=$t: ${out(t)} vs $frac")
    }
  }

  // ---- chi2Independence ----

  test("chi2Independence: perfectly independent margins give chi2 = 0") {
    // 2x2 with n_ab = na*nb/N exactly: (10,10),(10,10)
    val rows = Seq.fill(10)(("x", "u")) ++ Seq.fill(10)(("x", "v")) ++
      Seq.fill(10)(("y", "u")) ++ Seq.fill(10)(("y", "v"))
    val r = Stats.chi2Independence(rows.toDF("a", "b"), "a", "b").collect()(0)
    assert(r.getLong(0) == 40L && r.getLong(3) == 1L)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
  }

  test("chi2Independence: a deterministic 2x2 matches the textbook value") {
    // cells: (x,u)=20 (x,v)=10 (y,u)=10 (y,v)=20, N=60
    // e = 30*30/60 = 15 for every cell, chi2 = 4 * (5^2/15) = 6.666667
    val rows = Seq.fill(20)(("x", "u")) ++ Seq.fill(10)(("x", "v")) ++
      Seq.fill(10)(("y", "u")) ++ Seq.fill(20)(("y", "v"))
    val r = Stats.chi2Independence(rows.toDF("a", "b"), "a", "b").collect()(0)
    assert(r.getDouble(4) == 6.666667)
    // V = sqrt(6.666667 / (60 * 1)) = 0.333333
    assert(r.getDouble(5) == 0.333333)
  }

  test("chi2Independence: missing cells contribute via the margin identity") {
    // (x,u)=10, (y,v)=10, no (x,v)/(y,u): complete dependence, V = 1
    val rows = Seq.fill(10)(("x", "u")) ++ Seq.fill(10)(("y", "v"))
    val r = Stats.chi2Independence(rows.toDF("a", "b"), "a", "b").collect()(0)
    assert(r.getDouble(4) == 20.0 && r.getDouble(5) == 1.0)
  }

  // ---- corrMatrix ----

  test("corrMatrix: exact +1/-1/0 on constructed columns") {
    val df = (1 to 50).map(i =>
        (i.toDouble, 2.0 * i + 3.0, -1.0 * i, if (i % 2 == 0) 1.0 else 0.0))
      .toDF("a", "b", "c", "d")
    val out = Stats.corrMatrix(df, Seq("a", "b", "c", "d")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out(("a", "b")).getDouble(3) == 1.0)
    assert(out(("a", "c")).getDouble(3) == -1.0)
    assert(out.size == 6)
    assert(out.values.forall(_.getLong(2) == 50L))
  }

  test("corrMatrix: zero-variance column yields NULL corr, no throw") {
    val df = (1 to 10).map(i => (i.toDouble, 5.0)).toDF("a", "b")
    val r = Stats.corrMatrix(df, Seq("a", "b")).collect()(0)
    assert(r.isNullAt(3))
  }

  test("corrMatrix: matches Spark's builtin corr at 6dp on real data") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ours = Stats.corrMatrix(li, Seq("l_quantity", "l_extendedprice"))
      .collect()(0).getDouble(3)
    val builtin = li.agg(corr(col("l_quantity"), col("l_extendedprice")))
      .collect()(0).getDouble(0)
    assert(math.abs(ours - builtin) < 1e-6)
  }

  // ---- srmCheck ----

  test("srmCheck: arm counts cover every distinct user exactly once") {
    val r = Events.srmCheck(events).collect()(0)
    val users = events.select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(1) == users)
    // chi2 = (n_c - n_t)^2 / N, flag iff > 6.635
    val chi2 = math.round(math.pow(r.getLong(0) - r.getLong(1), 2) /
      users.toDouble * 1e6) / 1e6
    assert(r.getDouble(3) == chi2)
    assert(r.getBoolean(4) == (chi2 > 6.635))
  }

  test("srmCheck: arm split matches abLift's md5 coin") {
    // the same users must land in the same arms as abLift's assignment
    val armOf = events.select(col("user_id")).distinct()
      .withColumn("arm",
        (conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 2).cast("int"))
      .groupBy(col("arm")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val r = Events.srmCheck(events).collect()(0)
    assert(r.getLong(0) == armOf.getOrElse(0, 0L))
    assert(r.getLong(1) == armOf.getOrElse(1, 0L))
  }

  // ---- rollingCorr ----

  test("rollingCorr: exactly co-moving series hit +1, opposing hit -1") {
    // days 0..9: x = i+1, y = 2(i+1) -> corr 1 once minDays reached
    val up = (0 until 10).flatMap { i =>
      Seq.fill(i + 1)((i * DAY, "a")) ++ Seq.fill(2 * (i + 1))((i * DAY, "b"))
    }.toDF("ts", "event_type")
    val out = Events.rollingCorr(up, "a", "b", windowDays = 28, minDays = 2)
      .collect().sortBy(_.getLong(0))
    assert(out.head.isNullAt(4)) // day 0: k=1 < minDays
    assert(out.drop(1).forall(_.getDouble(4) == 1.0))
    // x rises while y falls -> -1
    val down = (0 until 10).flatMap { i =>
      Seq.fill(i + 1)((i * DAY, "a")) ++ Seq.fill(20 - i)((i * DAY, "b"))
    }.toDF("ts", "event_type")
    val out2 = Events.rollingCorr(down, "a", "b", windowDays = 28, minDays = 2)
      .collect().sortBy(_.getLong(0))
    assert(out2.drop(1).forall(_.getDouble(4) == -1.0))
  }

  test("rollingCorr: RANGE frame is calendar-correct across day gaps") {
    // days 0, 1, 40: day 40's trailing-28d window must contain ONLY day 40
    val df = Seq((0L, "a"), (0L, "b"), (1 * DAY, "a"), (1 * DAY, "b"),
      (40 * DAY, "a"), (40 * DAY, "b")).toDF("ts", "event_type")
    val out = Events.rollingCorr(df, "a", "b", windowDays = 28, minDays = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(40L) == 1L) // not 3: days 0/1 fell out of range
  }

  test("rollingCorr: zero-variance window yields NULL, and days with one "
      + "type carry an exact 0 for the other") {
    val df = Seq((0L, "a"), (1 * DAY, "a"), (2 * DAY, "a")).toDF("ts", "event_type")
    val out = Events.rollingCorr(df, "a", "b", windowDays = 28, minDays = 2)
      .collect().sortBy(_.getLong(0))
    assert(out.forall(_.getLong(2) == 0L)) // n_b = 0 on every day
    assert(out.forall(_.isNullAt(4)))      // y variance is 0 -> NULL
  }

  // ---- assignIds ----

  test("assignIds: ids are exactly row_number() over the total order") {
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey"), col("c_name"))
    val ours = Scale.assignIds(c, Seq("c_name"))
      .select(col("c_custkey"), col("uid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = c.orderBy(col("c_name")).collect().map(_.getLong(0))
      .zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap
    assert(ours == naive)
  }

  test("assignIds: ids survive a downstream coalesce(1) (single-file write path)") {
    // regression: a TaskContext-bound id (monotonically_increasing_id /
    // spark_partition_id) re-binds to the merged task under coalesce(1)
    // and silently permutes ids; zipWithIndex's indices bind to the
    // RDD's own partitions and must not move
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey"), col("c_name"))
    val coalesced = Scale.assignIds(c, Seq("c_name")).coalesce(1)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val naive = c.orderBy(col("c_name")).collect().map(_.getString(1))
      .zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap
    assert(coalesced == naive)
  }

  test("assignIds: dense 1..n and invariant to the input partitioning") {
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey"), col("c_name"))
    val base = Scale.assignIds(c, Seq("c_name"))
      .collect().map(r => (r.getString(1), r.getLong(2))).sorted.toSeq
    val ids = base.map(_._2)
    assert(ids.min == 1L && ids.max == ids.length.toLong &&
      ids.distinct.length == ids.length)
    val reshuffled = Scale.assignIds(c.repartition(17), Seq("c_name"))
      .collect().map(r => (r.getString(1), r.getLong(2))).sorted.toSeq
    assert(base == reshuffled)
  }
}
