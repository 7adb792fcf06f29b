package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextOps}

/** Round-7 operators: Bloom decontamination, semi/anti join shapes,
  * disjunctive-predicate join (Q19), exact dyadic EWMA, URL parsing. */
class Round7OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ── Bloom decontamination ─────────────────────────────────────────────

  private val evalDocs = Seq(
    (100L, "the standard benchmark question about world capitals and rivers asked here"),
    (101L, "a second held out evaluation prompt concerning prime numbers and proofs")
  ).toDF("doc_id", "text")

  private val trainDocs = Seq(
    // verbatim copy of eval doc 100 → every shingle hits
    (1L, "the standard benchmark question about world capitals and rivers asked here"),
    // shares a long span with eval doc 101
    (2L, "students love a second held out evaluation prompt concerning prime numbers and proofs they say"),
    // unrelated
    (3L, "spark catalyst pushes filters below joins so columnar scans stay narrow and fast"),
    (4L, "gradient descent converges when the learning rate respects the lipschitz constant")
  ).toDF("doc_id", "text")

  test("bloomDecontaminate: contaminated docs flagged, clean docs pass") {
    val r = Dedup.bloomDecontaminate(trainDocs, evalDocs, "doc_id", "text",
        mBits = 1 << 18, numHashes = 3, minHits = 5L)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r.contains(1L)) // verbatim copy
    assert(r.contains(2L)) // long shared span
    assert(!r.contains(3L) && !r.contains(4L)) // clean docs below threshold
    // the verbatim copy hits on EVERY one of its distinct shingles
    val row1 = Dedup.bloomDecontaminate(trainDocs, evalDocs, "doc_id", "text",
        1 << 18, 3, 1L).filter(col("doc_id") === 1L).head()
    assert(row1.getLong(1) == row1.getLong(2), "n_grams should equal bloom_hits for a verbatim copy")
  }

  test("bloom filter: membership has no false negatives, build is OR-mergeable") {
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    val grams = (1 to 500).map(i => s"gram number $i").toDF("g")
    // build from two disjoint halves in separate partitions → merge path
    val bloom = grams.repartition(8).agg(
      column(graft.functions.BloomBitsAgg(expression(col("g")), 1 << 16, 3)
        .toAggregateExpression()).as("bits"))
    val probe = grams.agg(collect_list(col("g")).as("all"))
      .crossJoin(bloom)
      .select(column(graft.functions.BloomHitCount(
        expression(col("bits")), expression(col("all")), 1 << 16, 3)).as("hits"))
      .head().getLong(0)
    assert(probe == 500L, "every inserted gram must test positive")
  }

  test("bloomDecontaminate plan: corpus side has no shuffle, filter arrives broadcast") {
    val plan = Dedup.bloomDecontaminate(trainDocs, evalDocs, "doc_id", "text",
      1 << 18, 3, 5L).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    // the only exchanges are the 1-row aggregate merge + its broadcast —
    // never a hash repartition of train or eval shingles
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  // ── join shapes ───────────────────────────────────────────────────────

  test("q_semi_join / q_anti_join plans: semi and anti joins, no match multiplication") {
    val semi = SparkEntry.queries("q_semi_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(semi.contains("LeftSemi"), semi)
    val anti = SparkEntry.queries("q_anti_join")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(anti.contains("LeftAnti"), anti)
  }

  test("anti join: part with only small-quantity lineitems survives") {
    val part = Seq((1, "Brand#11"), (2, "Brand#22"), (3, "Brand#33")).toDF("p_partkey", "p_brand")
    val li = Seq((1, 50.0), (2, 10.0)).toDF("l_partkey", "l_quantity")
    val r = part.join(li.filter($"l_quantity" >= 45), part("p_partkey") === li("l_partkey"), "left_anti")
      .select($"p_partkey").as[Int].collect().toSet
    assert(r == Set(2, 3)) // 1 shipped in bulk; 2 only small; 3 never shipped
  }

  test("q_tpch_q19: part side broadcast, disjunctive predicate after the join") {
    val plan = SparkEntry.queries("q_tpch_q19")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  // ── EWMA ──────────────────────────────────────────────────────────────

  test("ewma: dyadic decayed sum matches the hand-computed recurrence") {
    // one user, values 1, 2, 4 in time order; half-life one event:
    // ewma_micro(t3) = 4e6 + 2e6/2 + 1e6/4 = 5.25e6
    val ev = Seq(
      ("e1", "u1", 1000000000L, 1.0),
      ("e2", "u1", 2000000000L, 2.0),
      ("e3", "u1", 3000000000L, 4.0)
    ).toDF("event_id", "user_id", "ts", "value")
    ev.createOrReplaceTempView("ewma_probe")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy(expr("ts div 1000L"), $"event_id")
    val terms = (0 until 10).map(j =>
      coalesce(lag($"vmic", j).over(w), lit(0L)).cast("double") * lit(1.0 / (1L << j)))
    val r = ev.withColumn("vmic", round($"value" * 1000000).cast("long"))
      .select($"event_id", terms.reduce(_ + _).as("ewma_micro"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("e1") == 1000000.0)
    assert(r("e2") == 2500000.0)   // 2e6 + 1e6/2
    assert(r("e3") == 5250000.0)   // 4e6 + 2e6/2 + 1e6/4
  }

  // ── bloom-filtered semi join ──────────────────────────────────────────

  test("bloomFilteredSemiJoin: result identical to a plain semi join") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val p = spark.read.parquet(s"$dir/part.parquet")
      .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
    val bloomed = graft.ops.Scale.bloomFilteredSemiJoin(li, p, "l_partkey", "p_partkey")
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val plain = li.join(p, li("l_partkey") === p("p_partkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(bloomed == plain)
    assert(plain.nonEmpty)
  }

  test("bloomFilteredSemiJoin plan: bloom probe filters the large side before the join") {
    val dir = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val p = spark.read.parquet(s"$dir/part.parquet")
      .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
    val plan = graft.ops.Scale.bloomFilteredSemiJoin(li, p, "l_partkey", "p_partkey")
      .queryExecution.executedPlan.toString
    // the bloom probe must sit UNDER the semi join (prunes before it) —
    // in the printed tree, deeper operators appear later
    val probeAt = plan.indexOf("graft_bloom_hits")
    val joinAt = plan.indexOf("LeftSemi")
    assert(probeAt >= 0 && joinAt >= 0 && probeAt > joinAt, plan)
  }

  // ── z-order key ───────────────────────────────────────────────────────

  test("zorderKey16: exact interleave on known bit patterns") {
    val d = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (0xFFFFL, 0L), (0L, 0xFFFFL), (0xFFFFL, 0xFFFFL),
      (5L, 3L) // 0101 ⨉ 0011 → a-bits even, b-bits odd: 100111
    ).toDF("a", "b")
    val r = d.select(graft.ops.Scale.zorderKey16(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    def morton(a: Long, b: Long): Long =
      (0 until 16).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val want = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (0xFFFFL, 0L), (0L, 0xFFFFL), (0xFFFFL, 0xFFFFL), (5L, 3L)).map((morton _).tupled)
    assert(r.toSeq == want)
    assert(morton(5L, 3L) == 27L) // 011011: a=0101 at even bits, b=0011 at odd
  }

  // ── bigram-LM perplexity ──────────────────────────────────────────────

  test("docPerplexity: repetitive text scores lower nll than novel text") {
    val d = Seq(
      (1L, "the cat sat on the mat and the cat sat on the mat again today"),
      (2L, "the cat sat on the mat and the cat sat on the mat again today"),
      (3L, "quantum chromodynamics lattice regularization breaks chiral symmetry badly")
    ).toDF("doc_id", "text")
    val r = TextOps.docPerplexity(d, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r(1L) == r(2L)) // identical docs, identical score
    assert(r(1L) < r(3L), s"repeated phrasing must be more probable: $r")
  }

  test("docPerplexity: hand-check a two-bigram doc") {
    // corpus: one doc "a b a b c". V=3; bigrams: ab:2, ba:1, bc:1;
    // unigrams a:2 b:2 c:1. nll terms: ln((2+1)/(2+3)) for 'a b' twice,
    // ln((1+1)/(2+3)) for 'b a', ln((1+1)/(2+3)) for 'b c'
    val d = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val row = TextOps.docPerplexity(d, "doc_id", "text").head()
    assert(row.getLong(1) == 4L)
    val t1 = math.rint(math.log(3.0 / 5.0) * 1e6).toLong
    val t2 = math.rint(math.log(2.0 / 5.0) * 1e6).toLong
    val want = -(2 * t1 + 2 * t2) / 4L // exact integer micro-nats
    assert(row.getLong(2) == want, s"got ${row.getLong(2)}, want $want")
  }

  // ── inverted index ────────────────────────────────────────────────────

  test("invertedIndex: df counts docs once, postings are the k smallest ids, capped") {
    val d = Seq(
      (5L, "apple banana apple"), // 'apple' twice in one doc → df 1
      (3L, "apple cherry"),
      (9L, "apple date"),
      (1L, "banana elderberry")
    ).toDF("doc_id", "text")
    val r = TextOps.invertedIndex(d, "doc_id", "text", maxPostings = 2)
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getSeq[Long](2))).toMap
    assert(r("apple") == ((3L, Seq(3L, 5L)))) // df 3, two smallest ids only
    assert(r("banana") == ((2L, Seq(1L, 5L))))
    assert(r("cherry") == ((1L, Seq(3L))))
  }

  test("invertedIndex plan: posting cap is a bounded aggregate, no window sort") {
    val plan = SparkEntry.queries("q_inverted_index")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_topk"), plan) // map-side combine
    assert(!plan.contains("Window"), plan) // no per-term window sort path
  }

  // ── bloom SQL registration ────────────────────────────────────────────

  test("graft_bloom_build / graft_bloom_hits registered in SQL, end to end") {
    graft.functions.GraftFunctions.registerAll(spark)
    Seq("alpha", "beta", "gamma").toDF("g").createOrReplaceTempView("bloom_in")
    Seq(Seq("alpha", "beta", "delta")).toDF("grams").createOrReplaceTempView("bloom_probe")
    val hits = spark.sql(
      """SELECT graft_bloom_hits(
        |  (SELECT graft_bloom_build(g, 65536, 3) FROM bloom_in),
        |  grams, 65536, 3) AS h
        |FROM bloom_probe""".stripMargin).head().getLong(0)
    assert(hits == 2L) // alpha + beta hit, delta misses
  }

  // ── skew profile ──────────────────────────────────────────────────────

  test("keySkewProfile: shares and cumulative concentration, hot key first") {
    val d = (Seq.fill(6)("hot") ++ Seq("a", "a", "b", "c")).toDF("k")
    val r = graft.ops.Scale.keySkewProfile(d, "k", topN = 3)
      .collect().map(x => (x.getInt(0), x.getString(1), x.getLong(2), x.getDouble(3), x.getDouble(4)))
    assert(r(0) == ((1, "hot", 6L, 0.6, 0.6)))
    assert(r(1) == ((2, "a", 2L, 0.2, 0.8)))
    assert(r(2) == ((3, "b", 1L, 0.1, 0.9))) // tie b/c broken by key asc
  }

  // ── profile ───────────────────────────────────────────────────────────

  test("profile: one row per column with null-aware counts and exact small distincts") {
    val d = Seq(
      (1L, Some("a"), 1.5), (2L, None, 1.5), (3L, Some("b"), 2.5), (4L, Some("a"), 3.5)
    ).toDF("id", "s", "v")
    val r = graft.ops.Profile.profile(d, Seq("id", "s", "v"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getString(4), x.getString(5))).toMap
    assert(r("id") == ((4L, 4L, 4.0, "1", "4")))
    assert(r("s") == ((4L, 3L, 2.0, "a", "b"))) // null ignored by count + sketch
    assert(r("v") == ((4L, 4L, 3.0, "1.5", "3.5")))
  }

  // ── PageRank ──────────────────────────────────────────────────────────

  test("pageRank: hand-computed star graph, exact integer micro-units") {
    // star a(1)–b(2), a–c(3): deg(a)=2, deg(b)=deg(c)=1
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id1", "id2")
    val r2 = graft.ops.Graph.pageRank(pairs, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // iter1: r(a)=150000+2*850000=1850000; r(b)=150000+425000=575000
    // iter2: r(a)=150000+2*((575000*17) div 20)=1127500
    //        r(b)=150000+(1850000*17) div 40=936250
    assert(r2 == Map(1L -> 1127500L, 2L -> 936250L, 3L -> 936250L))
  }

  test("pageRank: regular graphs sit at the 1e6 fixed point") {
    // triangle: every node deg 2 → rank stays exactly 1_000_000
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id1", "id2")
    val r = graft.ops.Graph.pageRank(tri, iters = 3)
      .collect().map(x => x.getLong(1)).toSet
    assert(r == Set(1000000L))
  }

  // ── LOCF resample ─────────────────────────────────────────────────────

  test("resampleDailyLocf: dense grid, carry-forward across gaps, last-of-day wins") {
    val ns = 86400L * 1000000000L // one day in nanos
    val ev = Seq(
      // user 1: day 0 (two events — later one wins), day 2; gap at day 1
      (1L, 1L, 0L * ns + 1000000000L, 10.0),
      (2L, 1L, 0L * ns + 2000000000L, 11.0),
      (3L, 1L, 2L * ns, 30.0),
      // user 2: single day
      (4L, 2L, 1L * ns, 99.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val r = graft.ops.Events.resampleDailyLocf(ev)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> (x.getDouble(2), x.getInt(3))).toMap
    assert(r((1L, 0L)) == ((11.0, 1))) // last event of day 0
    assert(r((1L, 1L)) == ((11.0, 0))) // gap day carried forward, unobserved
    assert(r((1L, 2L)) == ((30.0, 1)))
    assert(r((2L, 1L)) == ((99.0, 1)))
    assert(r.size == 4) // no grid rows outside each user's span
  }

  // ── URL parsing ───────────────────────────────────────────────────────

  test("urlParts: host/port/path/query across shapes, absent parts are null") {
    val urls = Seq(
      "https://docs.example.org:8080/en/doc1?ref=src1",
      "http://example.com/path/only",
      "https://bare-host.io",
      "https://q.example.net?x=1"
    ).toDF("url")
    val r = urls.select(Seq(col("url")) ++ TextOps.urlParts(col("url")): _*)
      .collect().map(x => x.getString(0) ->
        (x.getString(1), if (x.isNullAt(2)) -1 else x.getInt(2), x.getString(3), x.getString(4))).toMap
    assert(r("https://docs.example.org:8080/en/doc1?ref=src1") ==
      (("docs.example.org", 8080, "/en/doc1", "ref=src1")))
    assert(r("http://example.com/path/only") == (("example.com", -1, "/path/only", null)))
    assert(r("https://bare-host.io") == (("bare-host.io", -1, null, null)))
    assert(r("https://q.example.net?x=1") == (("q.example.net", -1, null, "x=1")))
  }
}
