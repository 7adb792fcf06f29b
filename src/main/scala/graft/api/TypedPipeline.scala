package graft.api

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextOps}

/** A corpus document (the `documents` testdata schema). */
case class Doc(
    doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

/** Per-document analysis record produced by [[TypedPipeline.score]]. */
case class ScoredDoc(
    doc_id: Long, lang: String, source: String,
    lang_pred: String, quality: Double, n_tokens: Int,
    fingerprint: Long, split: String)

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
}
