package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{Doc, TypedPipeline}

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
}
