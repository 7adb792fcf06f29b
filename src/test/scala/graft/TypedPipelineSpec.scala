package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{AucResult, CanonicalUrl, CrawledUrl, Doc, DimVersion, Fact,
  IdPair, MeanCI, Outcome, ScoredLabel, TypedPipeline, UnitMetric}

class TypedPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("typed load/score/clean round-trips the sf0.001 corpus") {
    val docs = TypedPipeline.load(spark, "/root/testdata/sf0.001")
    val scored = TypedPipeline.score(docs).collect()
    assert(scored.nonEmpty)
    assert(scored.forall(s => s.quality >= 0.0 && s.quality <= 1.0))
    assert(scored.forall(s => Set("train", "val", "test").contains(s.split)))
    assert(scored.forall(s => s.n_tokens >= 0))
    val cleaned = TypedPipeline.clean(docs, qualityMin = 0.4, jaccardMax = 0.8)
    val survivors: Array[Doc] = cleaned.collect()
    assert(survivors.nonEmpty && survivors.length <= scored.length)
    // typed clean == the untyped oracle-checked pipeline
    val expected = graft.ops.Dedup
      .cleanCorpus(docs.toDF(), "doc_id", "text", 0.4, 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(survivors.map(_.doc_id).toSet == expected)
  }

  test("typed score matches the untyped query columns") {
    val docs = TypedPipeline.load(spark, "/root/testdata/sf0.001")
    val typed = TypedPipeline.score(docs).collect()
      .map(s => s.doc_id -> ((s.lang_pred, s.quality))).toMap
    val untyped = docs.toDF()
      .select($"doc_id",
        graft.ops.TextOps.langIdText($"text").as("l"),
        graft.ops.TextOps.qualityScore($"text").as("q"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(typed == untyped)
  }

  test("typed selectBudget/assignShards match the oracle-checked untyped ops") {
    val docs = TypedPipeline.load(spark, "/root/testdata/sf0.001")
    val budget = TypedPipeline.selectBudget(docs, 800L).collect()
      .map(b => (b.source, b.doc_id, b.quality, b.n_tokens, b.cum_tokens)).toSet
    val untypedB = graft.ops.TextOps
      .budgetSelect(docs.toDF(), "doc_id", "text", "source", 800L).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4))).toSet
    assert(budget == untypedB && budget.nonEmpty)
    val shards = TypedPipeline.assignShards(docs, 8).collect()
      .map(sd => (sd.source, sd.doc_id, sd.n_tokens, sd.shard)).toSet
    val untypedS = graft.ops.TextOps
      .shardAssign(docs.toDF(), "doc_id", "text", "source", 8).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getInt(3))).toSet
    assert(shards == untypedS && shards.map(_._4).size == 8)
  }

  test("typed sampleNegatives matches the untyped op and honors exclusions") {
    val q = spark.createDataset((0L until 70L by 7).map(java.lang.Long.valueOf))
    val pool = spark.createDataset((0L until 70L).map(java.lang.Long.valueOf))
    val pos = spark.createDataset((0L until 70L by 7).map(i => IdPair(i, i + 1)))
    val typed = TypedPipeline.sampleNegatives(q, pool, pos, k = 3, buckets = 4)
      .collect().map(n => (n.qid, n.rank, n.did)).toSet
    val untyped = graft.ops.TextOps.negativeSample(
        q.toDF("qid"), pool.toDF("did"), pos.toDF(), "qid", "did", 3, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(typed == untyped && typed.nonEmpty)
    assert(typed.forall { case (qid, _, did) => did != qid && did != qid + 1 })
  }

  test("typed labelFacts and enrichPointInTime are leak-free and match naive logic") {
    val facts = spark.createDataset(Seq(
      Fact(1L, 10L, 1000L), Fact(2L, 10L, 5000L), Fact(3L, 20L, 1000L)))
    val outcomes = spark.createDataset(Seq(
      Outcome(10L, 1500L, 2.5), Outcome(10L, 2000L, 1.0), // in fact 1's window
      Outcome(10L, 1000L, 9.0),                           // AT fact 1's ts: excluded
      Outcome(10L, 7000L, 4.0),                           // in fact 2's window only
      Outcome(20L, 99999L, 1.0)))                         // beyond fact 3's horizon
    val lab = TypedPipeline.labelFacts(facts, outcomes, horizonMicros = 2000L)
      .collect().map(l => l.fact_id -> l).toMap
    assert(lab(1L).n_outcomes == 2L && lab(1L).first_outcome_us.contains(1500L)
      && lab(1L).outcome_sum_micro == 3500000L)
    assert(lab(2L).n_outcomes == 1L && lab(2L).outcome_sum_micro == 4000000L)
    assert(lab(3L).n_outcomes == 0L && lab(3L).first_outcome_us.isEmpty)
    val dim = spark.createDataset(Seq(
      DimVersion(10L, 0L, Some(3000L), 1.5), DimVersion(10L, 3000L, None, 7.5)))
    val enriched = TypedPipeline.enrichPointInTime(facts, dim)
      .collect().map(e => e.fact_id -> e.dim_value).toMap
    assert(enriched(1L).contains(1.5))  // ts 1000 -> first version
    assert(enriched(2L).contains(7.5))  // ts 5000 -> open current version
    assert(enriched(3L).isEmpty)        // key 20: no dim row
  }

  test("typed attributeTouches matches the untyped attribution rows") {
    import graft.api.{Conversion, Touch}
    val touches = spark.createDataset(Seq(
      Touch(101L, 10L, 500L), Touch(102L, 10L, 900L),
      Touch(103L, 10L, 1000L),   // AT the conversion instant: excluded
      Touch(104L, 20L, 100L)))
    val convs = spark.createDataset(Seq(
      Conversion(900L, 10L, 1000L, 5.0),
      Conversion(901L, 30L, 1000L, 7.0))) // no touches -> absent
    val out = TypedPipeline.attributeTouches(touches, convs, 600L)
      .collect().map(c => c.touch_id -> c).toMap
    assert(out.keySet == Set(101L, 102L)) // 500 >= 1000-600, 900 < 1000
    assert(out(101L).linear_credit == 2.5 && out(101L).first_touch
      && !out(101L).last_touch && out(101L).n_touches == 2L)
    assert(out(102L).last_touch && out(102L).conv_id == 900L)
    // row-identity with the untyped DataFrame surface
    val untyped = graft.ops.Events.attribution(
        touches.toDF(), convs.toDF(), "key", "ts_us", "touch_id",
        "conv_id", "value", 600L)
      .collect().map(_.toString).sorted.toSeq
    val typed = TypedPipeline.attributeTouches(touches, convs, 600L)
      .toDF().collect().map(_.toString).sorted.toSeq
    assert(typed == untyped)
  }

  test("typed encodeTarget / buildFeatures / sessionJourneys round-trip the r13 ops") {
    import graft.api.CatTarget
    import graft.streaming.StreamEvent
    // LOO encoding through the typed surface
    val enc = TypedPipeline.encodeTarget(spark.createDataset(Seq(
        CatTarget(1L, "a", 1.0), CatTarget(2L, "a", 3.0),
        CatTarget(3L, "b", 10.0))), priorStrength = 0.0)
      .collect().map(e => e.id -> e.enc).toMap
    assert(enc(1L).contains(3.0) && enc(2L).contains(1.0)) // the OTHER row
    assert(enc(3L).isEmpty)                                // singleton, m=0
    // per-user-day features + session journeys over one typed event feed
    val base = 1704067200L * 1000000000L
    val dayNs = 86400L * 1000000000L
    val evs = spark.createDataset(Seq(
      StreamEvent(1L, base, 7L, "view", 1.0),
      StreamEvent(2L, base + 60L * 1000000000L, 7L, "click", 2.0),
      StreamEvent(3L, base + 8L * dayNs, 7L, "purchase", 4.0)))
    val feats = TypedPipeline.buildFeatures(evs)
      .collect().map(f => f.day - 19723L -> f).toMap
    assert(feats(0L).n_1d == 2L && feats(0L).v_7d == 3.0
      && feats(0L).days_since_prev.isEmpty)
    assert(feats(8L).n_7d == 1L && feats(8L).n_28d == 3L
      && feats(8L).days_since_prev.contains(8L))
    val js = TypedPipeline.sessionJourneys(evs).collect()
      .map(j => j.start_us -> j).toMap
    assert(js(base / 1000L).path == "view>click"
      && js(base / 1000L).n_events == 2L)
    assert(js(base / 1000L + 8L * 86400000000L).path == "purchase")
  }

  test("typed r14 facade: ranking eval, URL dedup and mean CI round-trip") {
    val auc = TypedPipeline.evaluateRanking(
      Seq(ScoredLabel(0.9, 1), ScoredLabel(0.1, 0)).toDS()).collect()(0)
    assert(auc == AucResult(1L, 1L, Some(1.0)))
    val urls = TypedPipeline.deduplicateUrls(Seq(
      CrawledUrl(2L, "HTTPS://X.org/p/"),
      CrawledUrl(1L, "https://x.org/p?utm_source=a")).toDS()).collect()
    assert(urls.toSeq == Seq(CanonicalUrl("https://x.org/p", 2L, 1L)))
    val ci = TypedPipeline.estimateMeanCI(
      (1 to 50).map(i => UnitMetric(i.toLong, 3.0)).toDS()).collect()(0)
    assert(ci == MeanCI(50L, Some(3.0), Some(3.0), Some(3.0)))
  }
}
