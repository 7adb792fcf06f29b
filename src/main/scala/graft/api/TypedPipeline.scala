package graft.api

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Events, TextOps}

/** A corpus document (the `documents` testdata schema). */
case class Doc(
    doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

/** Per-document analysis record produced by [[TypedPipeline.score]]. */
case class ScoredDoc(
    doc_id: Long, lang: String, source: String,
    lang_pred: String, quality: Double, n_tokens: Int,
    fingerprint: Long, split: String)

/** A document kept by [[TypedPipeline.selectBudget]] — quality-ranked
  * within its source, running token total within budget. quality and
  * n_tokens are Options: a null/empty-text document scores NULL on
  * both (it ranks last within its source and adds nothing to the
  * cumsum) and a primitive field would throw at decode time. */
case class BudgetedDoc(
    source: String, doc_id: Long, quality: Option[Double],
    n_tokens: Option[Long], cum_tokens: Long)

/** A document dealt to a balanced training shard by
  * [[TypedPipeline.assignShards]] (n_tokens None ≡ null text — ranked
  * last, still dealt a shard). */
case class ShardedDoc(
    source: String, doc_id: Long, n_tokens: Option[Long], shard: Int)

/** A (query, positive) id pair — known positives for negative sampling. */
case class IdPair(qid: Long, did: Long)

/** One sampled negative for a query (rank 1..k, deterministic draw). */
case class NegativePair(qid: Long, rank: Int, did: Long)

/** A supervised-learning fact row: entity key + event-time (epoch-µs)
  * + the fact's own id (the label join key). */
case class Fact(fact_id: Long, key: Long, ts_us: Long)

/** An outcome row used to label facts (key + event-time + value). */
case class Outcome(key: Long, ts_us: Long, value: Double)

/** A fact with its strictly-future-window label aggregate
  * ([[TypedPipeline.labelFacts]]); `outcome_sum_micro` is the exact
  * integer-micro sum of outcome values in the window. */
case class LabeledFact(
    fact_id: Long, key: Long, ts_us: Long,
    n_outcomes: Long, first_outcome_us: Option[Long], outcome_sum_micro: Long)

/** A touch event competing for conversion credit (key + event-time). */
case class Touch(touch_id: Long, key: Long, ts_us: Long)

/** A conversion whose value is attributed over preceding touches. */
case class Conversion(conv_id: Long, key: Long, ts_us: Long, value: Double)

/** One attributed (conversion, touch) credit row
  * ([[TypedPipeline.attributeTouches]]). */
case class CreditedTouch(
    key: Long, conv_id: Long, conv_tsu: Long, touch_id: Long,
    touch_tsu: Long, n_touches: Long, first_touch: Boolean,
    last_touch: Boolean, linear_credit: Double)

/** One SCD2 dimension version: value valid over [valid_from_us,
  * valid_to_us) — `None` = still current. */
case class DimVersion(
    key: Long, valid_from_us: Long, valid_to_us: Option[Long], value: Double)

/** A fact enriched with the dimension value valid AT ITS OWN TIME
  * ([[TypedPipeline.enrichPointInTime]]); `None` = no version covered
  * the fact's timestamp. */
case class EnrichedFact(
    fact_id: Long, key: Long, ts_us: Long, dim_value: Option[Double])

/** A categorical training row to encode (id + category + target). */
case class CatTarget(id: Long, cat: String, target: Double)

/** A leave-one-out encoded row ([[TypedPipeline.encodeTarget]]);
  * `None` = nothing to encode (singleton category at priorStrength 0). */
case class EncodedCat(id: Long, cat: String, enc: Option[Double])

/** One trailing-window feature row per (user, active day)
  * ([[TypedPipeline.buildFeatures]]); `days_since_prev` is None on a
  * user's first active day. */
case class UserDayFeatures(
    user_id: Long, day: Long, n_1d: Long, n_7d: Long, n_28d: Long,
    v_7d: Double, days_since_prev: Option[Long])

/** One gap-sessionized visit with its first-k journey prefix
  * ([[TypedPipeline.sessionJourneys]]). */
case class SessionJourney(
    user_id: Long, start_us: Long, path: String, n_events: Long)

/** One scored unit with its binary label
  * ([[TypedPipeline.evaluateRanking]]). */
case class ScoredLabel(score: Double, label: Int)

/** The ranking-quality readout: class sizes + Mann-Whitney AUC. */
case class AucResult(n_pos: Long, n_neg: Long, auc: Option[Double])

/** A crawled (id, url) row ([[TypedPipeline.deduplicateUrls]]). */
case class CrawledUrl(id: Long, url: String)

/** One canonical page: its duplicate count and min-id representative. */
case class CanonicalUrl(canonical_url: String, n_dups: Long, rep_id: Long)

/** A unit metric row for resampling ([[TypedPipeline.estimateMeanCI]]). */
case class UnitMetric(id: Long, value: Double)

/** A bootstrap mean interval (None fields ≡ empty input). */
case class MeanCI(n: Long, mean: Option[Double],
    ci_lo: Option[Double], ci_hi: Option[Double])

/**
 * Typed `Dataset[T]` facade over the document pipeline — the API shape
 * for callers who want case-class rows and compile-time column safety.
 *
 * Everything inside is still COLUMNAR: the typed surface wraps the same
 * codegen'd Catalyst expressions ([[TextOps]] kernels) and shuffle-
 * minimal plans ([[Dedup.cleanCorpus]]) the untyped API uses — Encoders
 * only pay their serialization cost at the typed boundary, not per
 * operator. (This is the Spark-idiomatic split: `Dataset[T]` where type
 * safety helps the caller, `DataFrame` internals where Catalyst should
 * see plain columns.)
 */
object TypedPipeline {

  /** Load the corpus as a typed Dataset. */
  def load(spark: SparkSession, dir: String): Dataset[Doc] = {
    import spark.implicits._
    graft.sources.Tables.load(spark, dir, "documents").as[Doc]
  }

  /** Language-ID + quality + token count + fingerprint + split for every
    * document — one narrow pass, all kernels, no shuffle. */
  def score(docs: Dataset[Doc]): Dataset[ScoredDoc] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id"), col("lang"), col("source"),
      TextOps.langIdText(col("text")).as("lang_pred"),
      TextOps.qualityScore(col("text")).as("quality"),
      TextOps.textStats(col("text")).getField("n_toks").as("n_tokens"),
      TextOps.fingerprint(col("text")).as("fingerprint"),
      TextOps.splitAssign(col("doc_id")).as("split")).as[ScoredDoc]
  }

  /** The full cleaning pipeline (redact → quality → exact dedup →
    * near-dup removal), returned as the surviving typed documents. */
  def clean(
      docs: Dataset[Doc], qualityMin: Double, jaccardMax: Double): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    val survivors = Dedup.cleanCorpus(docs.toDF(), "doc_id", "text", qualityMin, jaccardMax)
    docs.join(survivors, Seq("doc_id"), "left_semi").as[Doc]
  }

  /** Token-budget data selection ([[TextOps.budgetSelect]]): per source,
    * the highest-quality documents whose running BPE-token total stays
    * within `budgetTokens`. Distributed bounded-bucket form — no
    * per-source serial sort. */
  def selectBudget(docs: Dataset[Doc], budgetTokens: Long): Dataset[BudgetedDoc] = {
    import docs.sparkSession.implicits._
    TextOps.budgetSelect(docs.toDF(), "doc_id", "text", "source", budgetTokens)
      .as[BudgetedDoc]
  }

  /** Balanced training-shard assignment ([[TextOps.shardAssign]]): per
    * source, deal documents ranked by token count round-robin across
    * `nShards` shards (the LPT-bounded greedy). */
  def assignShards(docs: Dataset[Doc], nShards: Int): Dataset[ShardedDoc] = {
    import docs.sparkSession.implicits._
    TextOps.shardAssign(docs.toDF(), "doc_id", "text", "source", nShards)
      .select(col("stratum").as("source"), col("doc_id"), col("n_tokens"), col("shard"))
      .as[ShardedDoc]
  }

  /** Deterministic contrastive negative sampling
    * ([[TextOps.negativeSample]]): for each query id, `k` md5-keyed
    * negatives from the pool, excluding the query itself and its known
    * positives. Size `buckets` so |pool|/buckets comfortably exceeds k
    * plus the per-query positive count, and scale it with the pool. */
  def sampleNegatives(
      queryIds: Dataset[java.lang.Long], poolIds: Dataset[java.lang.Long],
      positives: Dataset[IdPair], k: Int, buckets: Int): Dataset[NegativePair] = {
    import queryIds.sparkSession.implicits._
    TextOps.negativeSample(
        queryIds.toDF("qid"), poolIds.toDF("did"), positives.toDF(),
        "qid", "did", k, buckets)
      .as[NegativePair]
  }

  /** Leak-free supervised labels ([[Events.labelWindow]]): each fact
    * aggregated with its key's outcomes in the strictly-future
    * (ts, ts + horizonMicros] window — banded equi-join, never a
    * key-group cross product. */
  def labelFacts(facts: Dataset[Fact], outcomes: Dataset[Outcome],
      horizonMicros: Long): Dataset[LabeledFact] = {
    import facts.sparkSession.implicits._
    Events.labelWindow(facts.toDF(), outcomes.toDF(), "key", "ts_us",
        "fact_id", "value", horizonMicros)
      .as[LabeledFact]
  }

  /** Point-in-time feature lookup ([[Events.pointInTimeJoin]]): each
    * fact reads the SCD2 dimension version valid AT THE FACT'S OWN TIME
    * (never a future value — the leak-free feature-store join). */
  def enrichPointInTime(
      facts: Dataset[Fact], dim: Dataset[DimVersion]): Dataset[EnrichedFact] = {
    import facts.sparkSession.implicits._
    Events.pointInTimeJoin(facts.toDF(), dim.toDF(), "key", "ts_us", Seq("value"))
      .select(col("fact_id"), col("key"), col("ts_us"), col("dim_value"))
      .as[EnrichedFact]
  }

  /** Multi-touch attribution ([[Events.attribution]]): each
    * conversion's value spread linearly over the key's touches in the
    * strictly-before lookback window, with first/last-touch flags —
    * banded equi-join, bounded per-conversion windows. */
  def attributeTouches(touches: Dataset[Touch], convs: Dataset[Conversion],
      lookbackMicros: Long): Dataset[CreditedTouch] = {
    import touches.sparkSession.implicits._
    Events.attribution(touches.toDF(), convs.toDF(), "key", "ts_us",
        "touch_id", "conv_id", "value", lookbackMicros)
      .as[CreditedTouch]
  }

  /** Leave-one-out smoothed target encoding
    * ([[graft.ops.Stats.targetEncode]]): each row's category encoded as
    * the smoothed mean target of the OTHER rows of its category —
    * leakage-safe by construction. */
  def encodeTarget(rows: Dataset[CatTarget],
      priorStrength: Double): Dataset[EncodedCat] = {
    import rows.sparkSession.implicits._
    graft.ops.Stats.targetEncode(rows.toDF(), "id", "cat", "target",
        priorStrength)
      .as[EncodedCat]
  }

  /** Trailing 1/7/28-day per-user features ([[Events.featureWindows]]):
    * calendar-valued RANGE frames over the compact (user, day) frame —
    * the feature-build stage that pairs with [[enrichPointInTime]]. */
  def buildFeatures(
      events: Dataset[graft.streaming.StreamEvent]): Dataset[UserDayFeatures] = {
    import events.sparkSession.implicits._
    Events.featureWindows(events.toDF()).as[UserDayFeatures]
  }

  /** Per-session journey prefixes ([[Events.sessionPaths]]): the first
    * `maxSteps` event types of each gap-sessionized visit via the
    * bounded PathPrefix aggregate under native session_window. */
  def sessionJourneys(events: Dataset[graft.streaming.StreamEvent],
      maxSteps: Int = 5): Dataset[SessionJourney] = {
    import events.sparkSession.implicits._
    Events.sessionPaths(events.toDF(), maxSteps).as[SessionJourney]
  }

  /** Ranking quality of a scored binary label (r14): one
    * [[ScoredLabel]] per unit in, one exact Mann-Whitney AUC out
    * ([[graft.ops.Stats.aucRoc]] — bucket-decomposed rank sums, no
    * global sort). `auc` is None when a class is absent. */
  def evaluateRanking(rows: Dataset[ScoredLabel]): Dataset[AucResult] = {
    import rows.sparkSession.implicits._
    graft.ops.Stats.aucRoc(rows.toDF(), "score", "label").as[AucResult]
  }

  /** Crawl-level URL dedup (r14): canonicalize transport variants and
    * keep one representative per page
    * ([[graft.ops.TextOps.canonicalUrl]]/[[graft.ops.TextOps.urlDedup]]). */
  def deduplicateUrls(rows: Dataset[CrawledUrl]): Dataset[CanonicalUrl] = {
    import rows.sparkSession.implicits._
    TextOps.urlDedup(rows.toDF(), "id", "url").as[CanonicalUrl]
  }

  /** Distribution-free mean CI (r14): deterministic Poisson bootstrap
    * over unit rows ([[graft.ops.Stats.bootstrapMeanCI]]); None fields
    * on empty input. */
  def estimateMeanCI(rows: Dataset[UnitMetric],
      reps: Int = 32): Dataset[MeanCI] = {
    import rows.sparkSession.implicits._
    graft.ops.Stats.bootstrapMeanCI(rows.toDF(), "id", "value", reps).as[MeanCI]
  }
}
