package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 work (driver round 15): n-aware SRP band arity (the r14
  * verdict's one `weak`), plus regression pins for the round's other
  * verdict/advice deliverables. */
class Round17OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.ops.{Dedup, Similarity, TextOps}

  // ---- bandBitsFor: the sizing rule, pinned ----

  test("bandBitsFor pins: clamp(4, ceil(ceil(log2 n)/2), 16) rounded up to a divisor of planes") {
    // boundary walk of the rule the scaladoc states; the DuckDB oracle
    // CTE (SrpPairsAutoCte) replays exactly these values from count(*)
    val expect = Seq(
      0L -> 4, 1L -> 4, 2L -> 4, 16L -> 4, 256L -> 4,
      257L -> 8, // lg=9 -> raw=5 -> next divisor 8
      500L -> 8, 2000L -> 8, 20000L -> 8,
      65536L -> 8, // lg=16 -> raw=8
      65537L -> 16, // lg=17 -> raw=9 -> next divisor 16
      1000000L -> 16, 1000000000L -> 16, Long.MaxValue -> 16)
    expect.foreach { case (n, b) =>
      assert(Similarity.bandBitsFor(n) == b, s"bandBitsFor($n)")
    }
    // non-64 planes: arity must tile the signature
    assert(Similarity.bandBitsFor(500L, planes = 60) == 5,
      "raw=5 and 5 divides 60 - no rounding needed")
    assert(Similarity.bandBitsFor(20000L, planes = 48) == 8)
    // planes whose only in-range divisors sit BELOW raw: largest wins
    assert(Similarity.bandBitsFor(Long.MaxValue, planes = 20) == 10,
      "raw=16 but 20's divisors in [4,16] top out at 10")
  }

  // ---- auto front doors == explicit arity with bandBitsFor(n) ----

  private def testEmb(n: Int) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      (i.toLong, Array.fill(16)((rnd.nextDouble() - 0.5).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("embedClustersAuto == embedClustersCollapsed at bandBitsFor(n)") {
    val e = testEmb(300)
    val corpus = Similarity.prepared(e, "vec_id", "embedding")
    val b = Similarity.bandBitsFor(300L)
    assert(b == 8, "300 rows -> lg=9 -> raw=5 -> 8")
    val auto = Dedup.embedClustersAuto(corpus, 0.6, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val explicit = Dedup.embedClustersCollapsed(corpus, 0.6, 64, b, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(auto.sameElements(explicit))
    assert(auto.length == 300, "every input row gets a cluster label")
  }

  test("semanticDedupAuto / semanticDecontaminateAuto == explicit arity") {
    val corpus = Similarity.prepared(testEmb(300), "vec_id", "embedding")
    val b = Similarity.bandBitsFor(300L)
    val autoD = Similarity.semanticDedupAuto(corpus, 0.6, 16)
      .collect().map(_.getLong(0)).sorted
    val explD = Similarity.semanticDedup(corpus, 0.6, 64, b, 16)
      .collect().map(_.getLong(0)).sorted
    assert(autoD.sameElements(explD))

    val bench = Similarity.prepared(
      testEmb(300).filter(col("vec_id") % 29 === 0), "vec_id", "embedding")
    val autoC = Similarity.semanticDecontaminateAuto(corpus, bench, 0.6, 16)
      .collect().map(_.getLong(0)).sorted
    val explC = Similarity.semanticDecontaminate(corpus, bench, 0.6, 64, b, 16)
      .collect().map(_.getLong(0)).sorted
    assert(autoC.sameElements(explC))
    assert(autoC.length < 300,
      "benchmark members are their own cosine-1 matches and must drop")
  }

  // ---- plan construction is lazy: no eager driver-side actions ----

  test("unigramLogProb / tfIdfTopTerms fire ZERO jobs until the frame is consumed") {
    // the r16 forms ran toks.count() / distinct().count() at PLAN
    // construction — an extra corpus scan plus a driver sync per call.
    // A job-counting listener proves the rebuilt forms are fully lazy.
    val docs = Seq((1L, "alpha beta alpha"), (2L, "beta gamma"),
      (3L, "alpha delta")).toDF("doc_id", "text")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val lp = graft.ops.TextOps.unigramLogProb(docs, "doc_id", "text")
      val ti = graft.ops.TextOps.tfIdfTopTerms(docs, "doc_id", "text", 2)
      // listener events post asynchronously; an eager count() would be a
      // BLOCKING runJob during construction, so a short drain suffices
      Thread.sleep(1000)
      assert(jobs.get() == 0,
        s"plan construction must not run jobs, saw ${jobs.get()}")
      // and the results are still right (7 tokens total; ln(3/7) for
      // alpha etc., micro-rounded before the per-doc mean)
      val lpm = lp.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      def mlog(c: Long) = math.round(math.log(c / 7.0) * 1e6)
      def r6(x: Double) = java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(lpm(1L) == r6((2 * mlog(3) + mlog(2)) / 1e6 / 3))
      assert(lpm(2L) == r6((mlog(2) + mlog(1)) / 1e6 / 2))
      val tim = ti.collect().map(r =>
        (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
      // doc 3: delta (df=1) outscores alpha (df=2)
      assert(tim((3L, 1)) == "delta" && tim((3L, 2)) == "alpha")
      assert(jobs.get() > 0, "consuming the frames must run jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  // ---- residual IVFADC (Jégou et al. TPAMI 2011 §IV) ----

  test("residual annIvfPq probing ALL cells == independent reconstruction-scored reference") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (dim, m, kc, cells, sub) = (64, 8, 16, 4, 8)
    val qf = col("vec_id") < 5
    // engine under test
    val got = Similarity.annIvfPq(emb, "vec_id", "embedding",
        dim, m, kc, cells, qf, nprobe = cells, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSet
    // independent reference: reuse the oracle-proven BUILD artifacts
    // (index cells, centroids, residual codes/codebooks) but score by
    // EXPLICIT reconstruction on the driver — a second implementation
    // of routing-free residual ADC
    val corpus = Similarity.prepared(emb, "vec_id", "embedding")
    val unit = corpus.filter(col("nrm") > 0)
      .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("v"))
    val (index, refit) = Similarity.buildIvfIndex(unit, "vec_id", "v", cells)
    val cellOf = index.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cents = refit.collect().map(r => r.getInt(0) ->
      r.getSeq[Long](1).map(_ / 1000000.0).toArray).toMap
    val resid = index.join(
        broadcast(refit.select(col("cell"),
          transform(col("centroid_scaled"), x => x / 1000000.0).as("cvec"))),
        "cell")
      .select(col("vec_id"),
        zip_with(col("v"), col("cvec"), (a, b) => a - b).as("v"))
    val (codesDf, booksDf) = Similarity.quantizePq(resid, "vec_id", "v", dim, m, kc)
    val books = booksDf.collect().map(r => (r.getInt(0), r.getInt(1)) ->
      r.getSeq[Long](2).map(_ / 1000000.0).toArray).toMap
    val codes = codesDf.collect().map(r =>
      r.getLong(0) -> (0 until m).map(s => r.getInt(1 + s)).toArray).toMap
    val qrows = index.filter(qf).select("vec_id", "v", "nrm").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    def dotF(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var j = 0
      while (j < a.length) { acc += a(j) * b(j); j += 1 }; acc
    }
    def round6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val want = qrows.flatMap { case (qid, qv, qnrm) =>
      val scored = codes.keys.filter(_ != qid).toSeq.map { nid =>
        val cvec = cents(cellOf(nid))
        var num = 0.0; var sq = 0.0
        for (s <- 0 until m) {
          val rec = Array.tabulate(sub)(j =>
            cvec(s * sub + j) + books((s, codes(nid)(s)))(j))
          num += dotF(qv.slice(s * sub, s * sub + sub), rec)
          sq += dotF(rec, rec)
        }
        (nid, round6(num / (qnrm * math.sqrt(sq))))
      }
      scored.sortBy { case (nid, sc) => (-sc, nid) }.take(3).zipWithIndex
        .map { case ((nid, sc), i) => (qid, nid, sc, i + 1) }
    }.toSet
    assert(got == want,
      s"all-cells residual IVFADC != reconstruction reference\n$got\nvs\n$want")
  }

  test("residual recall ladder clears the r16 raw pins (0.16@32x, 0.60@16x) and stays monotone") {
    // deterministic (md5-seeded draws, fixed corpus): measured residual
    // recall@5 on the worst-case near-uniform gate embeddings is
    // ~0.29 @ m8k32 (32x) and ~0.71 @ m16k128 (16x) vs the r16
    // raw-encoding pins 0.16 / 0.60 — the Jégou residual lift
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qf = col("vec_id") < 50
    val corpus = Similarity.prepared(emb, "vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(corpus, corpus.filter(qf), 5)
      .select(col("q_id"), col("neighbor_id"))
    def recallAt(m: Int, k: Int): Double =
      exact.join(
          Similarity.annIvfPq(emb, "vec_id", "embedding", 64, m, k, 8,
              qf, nprobe = 8, topK = 5)
            .select(col("q_id"), col("neighbor_id"))
            .withColumn("hit", lit(1L)),
          Seq("q_id", "neighbor_id"), "left_outer")
        .agg(avg(coalesce(col("hit"), lit(0L)))).collect().head.getDouble(0)
    val r32 = recallAt(8, 32)
    val r16 = recallAt(16, 128)
    assert(r32 > 0.16, s"residual @32x must beat the raw pin 0.16, got $r32")
    assert(r16 > 0.60, s"residual @16x must beat the raw pin 0.60, got $r16")
    assert(r16 > r32, s"ladder must stay monotone: $r32 -> $r16")
  }

  test("auto arity actually cuts candidate volume on a larger corpus") {
    // 5000 vectors: fixed b=4 -> 16 buckets/band -> ~n^2/16 candidates;
    // auto (b=8) -> 256 buckets/band. The ratio is the scale argument
    // in miniature (the sf1 soak measures the wall-clock decade).
    val corpus = Similarity.prepared(testEmb(5000), "vec_id", "embedding")
    val fixed = Similarity.srpCandidatePairs(corpus, 64, 4, 16).count()
    val auto = Similarity.srpCandidatePairs(
      corpus, 64, Similarity.bandBitsFor(5000L), 16).count()
    assert(Similarity.bandBitsFor(5000L) == 8)
    assert(auto < fixed / 4,
      s"8-bit bands must prune >= 4x vs 4-bit at n=5000 (got $auto vs $fixed)")
  }

  // ---- the composed crawl front door (r14 verdict task #3) ----

  test("crawlClean composition: same body under different chrome survives ONCE; " +
      "PII masked; non-kept langs routed; junk gated; chrome gone") {
    // a ~27-word English body that passes every Gopher rule
    val bodyShared = "the market report and the annual summary of performance " +
      "gives the board a clear view of progress across all regions during " +
      "the last quarter of the year"
    def uniq(tag: String) = s"the $tag team publishes a detailed and " +
      s"careful analysis of $tag metrics that covers planning quality " +
      s"delivery staffing budget and customer feedback for the $tag region"
    // two sites: same shared body, DIFFERENT per-site chrome lines
    def pageA(body: String) = "<html><head><title>site a</title></head><body>" +
      "<div>alpha site menu</div><p>" + body +
      "</p><div>alpha footer line</div></body></html>"
    def pageB(body: String) = "<html><head><title>site b</title></head><body>" +
      "<div>beta cookie banner</div><p>" + body +
      "</p><div>beta legal notice</div></body></html>"
    val pages = Seq(
      (1L, "a", pageA(bodyShared)),
      (2L, "a", pageA(uniq("polar") + " mail me at bob@example.com today")),
      (3L, "a", pageA(uniq("coral"))),
      (4L, "a", pageA(uniq("ember"))),
      (11L, "b", pageB(bodyShared)), // mirror of doc 1 under other chrome
      (12L, "b", pageB("日本語のテキストです これはテストです")), // routed: ja
      (13L, "b", pageB("tiny doc")), // gated: < 20 words
      (14L, "b", pageB(uniq("quartz"))),
      (15L, "b", pageB(uniq("willow")))
    ).toDF("doc_id", "source", "html")
    val out = Dedup.crawlClean(pages, "doc_id", "html", "source",
      keepLangs = Seq("en")).collect()
    val byId = out.map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    // exactly one of the mirrored pair survives, the smaller id
    assert(byId.contains(1L) && !byId.contains(11L),
      s"mirror pages must dedup to the min id, got ${byId.keySet}")
    // routing and gating
    assert(!byId.contains(12L), "ja page must be routed out")
    assert(!byId.contains(13L), "sub-20-word page must fail the Gopher gate")
    assert(byId.keySet == Set(1L, 2L, 3L, 4L, 14L, 15L))
    assert(out.forall(_.getString(1) == "en"))
    // PII masked before the dedup identity
    assert(byId(2L)._2.contains("<EMAIL>") && !byId(2L)._2.contains("bob@"),
      "email must be masked in the surviving text")
    // chrome is gone from every survivor (containers stripped, per-site
    // boilerplate lines removed), body retained
    val texts = out.map(_.getString(2))
    Seq("site menu", "cookie banner", "footer line", "legal notice",
        "site a", "site b").foreach { chrome =>
      assert(texts.forall(!_.contains(chrome)), s"chrome '$chrome' leaked")
    }
    assert(byId(1L)._2 == bodyShared, "survivor text == extracted body")
  }

  // ---- prebuilt residual-IVFADC halves == the one-shot front door ----

  test("buildIvfPqIndex + annIvfPqSearch is row-identical to the one-shot annIvfPq") {
    val emb = testEmb(300)
    val (codes, refit, codebooks) =
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", 16, 4, 8, 4)
    val unit = Similarity.prepared(emb, "vec_id", "embedding")
      .filter(col("nrm") > 0)
      .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("v"))
    val split = Similarity.annIvfPqSearch(codes, refit, codebooks,
        unit.filter(col("vec_id") < 5), 16, 4, nprobe = 2, topK = 3)
      .select(col("q_id"), col("neighbor_id"), col("score_pq"))
    val oneShot = Similarity.annIvfPq(emb, "vec_id", "embedding", 16, 4, 8, 4,
        col("vec_id") < 5, nprobe = 2, topK = 3)
      .select(col("q_id"), col("neighbor_id"), col("score_pq"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val s = rows(split)
    assert(s == rows(oneShot) && s.nonEmpty,
      "prebuilt-index search must reproduce the one-shot IVFADC exactly")
  }

  // ---- BPE at production vocabulary size (r14 verdict task #4) ----

  test("syntheticMerges(12k) is well-formed; BpeEncode matches an independent " +
      "greedy reference; a same-output subset table proves size independence") {
    val table = TextOps.syntheticMerges(12000)
    assert(table.size == 12000)
    // well-formedness: each rule's parts are single chars or outputs of
    // EARLIER rules (the property every trained table has)
    val derivable = scala.collection.mutable.Set[String]()
    (('a' to 'z') ++ ('0' to '9')).foreach(c => derivable += c.toString)
    table.foreach { case (x, y) =>
      assert(derivable.contains(x) && derivable.contains(y),
        s"rule ($x,$y) uses an underivable part")
      derivable += (x + y)
    }
    // independent reference: canonical greedy — min-rank applicable pair,
    // leftmost-nonoverlapping merge-all per application
    val rank = table.zipWithIndex.map { case (p, i) => p -> i }.toMap
    def ref(w: String): Vector[String] = {
      var s = w.map(_.toString).toVector
      var go = s.length >= 2
      while (go) {
        val best = (0 until s.length - 1)
          .flatMap(i => rank.get((s(i), s(i + 1)))).minOption
        best match {
          case None => go = false
          case Some(r) =>
            val (x, y) = table(r)
            val out = Vector.newBuilder[String]
            var j = 0
            while (j < s.length) {
              if (j < s.length - 1 && s(j) == x && s(j + 1) == y) {
                out += (x + y); j += 2
              } else { out += s(j); j += 1 }
            }
            s = out.result()
            go = s.length >= 2
        }
      }
      s
    }
    val words = Seq("aaaaaa", "abcdabcd", "a1b2c3d4", "zzz9", "qqqq",
      "thequickbrownfox", "0123456789abcdef", "x")
    val got = Seq(Tuple1(words)).toDF("toks")
      .select(TextOps.bpeEncode(col("toks"), table).as("enc"))
      .collect()(0).getSeq[String](0)
    assert(got == words.flatMap(ref),
      "kernel must equal the reference greedy encoder under the 12k table")
    // table-size independence, the SEMANTIC half: dropping rules that
    // cannot apply (non-hex parts) preserves relative order and every
    // applicable rule, so hex words encode IDENTICALLY under a table
    // 5x+ smaller — the wall-clock half is BpeVocabProbe's measurement
    val hexTable = table.filter { case (x, y) =>
      (x + y).forall(c => "0123456789abcdef".contains(c)) }
    assert(hexTable.size * 5 < table.size)
    val hexWords = Seq("0123456789abcdef", "a1b2c3d4", "ffeeddccbbaa0099")
    def enc(t: Seq[(String, String)]) = Seq(Tuple1(hexWords)).toDF("toks")
      .select(TextOps.bpeEncode(col("toks"), t).as("enc"))
      .collect()(0).getSeq[String](0)
    assert(enc(table) == enc(hexTable),
      "hex-subset table must encode hex words identically to the full table")
  }

  test("bpeTrain matches an independent driver-side reference trainer and " +
      "produces a well-formed table the kernel round-trips") {
    val docsDf = Seq(
      "the theme of the thesis is the theory",
      "other theories gather there and then",
      "the weather rather bothers the fathers",
      "breathe the heathen leather tether").toDF("text")
    val got = TextOps.bpeTrain(docsDf, "text", nMerges = 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // independent reference: classic dict-based trainer over the same
    // word counts with the same (cnt desc, x, y) tie-break
    val words = docsDf.collect().flatMap(_.getString(0).split("\\s+"))
      .filter(_.nonEmpty).groupBy(identity).view.mapValues(_.length.toLong).toMap
    var enc: Map[String, Vector[String]] =
      words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val want = (1 to 10).flatMap { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, syms) <- enc; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + words(w)
      if (counts.isEmpty) None
      else {
        val ((x, y), c) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        // canonical leftmost-nonoverlapping merge-all on every word
        enc = enc.map { case (w, syms) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == x && syms(j + 1) == y) {
              out += (x + y); j += 2
            } else { out += syms(j); j += 1 }
          }
          w -> out.result()
        }
        Some((r, x, y, c))
      }
    }
    assert(got.toSeq == want,
      s"trainer must match the reference dict trainer\n got=${got.toSeq}\nwant=$want")
    // well-formed: parts are chars or earlier outputs; kernel accepts it
    val derivable = scala.collection.mutable.Set[String]()
    got.foreach { case (_, x, y, _) =>
      assert((x.length == 1 || derivable.contains(x)) &&
        (y.length == 1 || derivable.contains(y)),
        s"($x,$y) not derivable at its rank")
      derivable += (x + y)
    }
    val rules = got.map(m => (m._2, m._3)).toSeq
    val rt = Seq(Tuple1(Seq("thether"))).toDF("toks")
      .select(TextOps.bpeEncode(col("toks"), rules)).collect()(0).getSeq[String](0)
    assert(rt.mkString == "thether", "round-trip: tokens concatenate to the word")
  }
}
