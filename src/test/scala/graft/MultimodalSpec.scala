package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{MediaRecord, Multimodal}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq((1L, "hello multimodal world"), (2L, "another payload")).toDF("doc_id", "text")

  test("declarative and mapPartitions paths agree on the stub decode") {
    implicit val s = spark
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val declarative = Multimodal.featureColumns(media)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(3), r.getInt(4), r.getString(5)))).toMap
    val typed = Multimodal.extractFeatures(media.as[MediaRecord])
      .collect().map(f => f.doc_id -> ((f.n_bytes, f.width, f.height, f.content_hash))).toMap
    assert(declarative == typed)
    assert(declarative(1L)._1 == "hello multimodal world".getBytes("UTF-8").length.toLong)
    val (_, w, h, hash) = declarative(1L)
    assert(w >= 1 && w <= 1024 && h >= 1 && h <= 1024)
    assert(hash.length == 32)
  }

  test("media payload column prunes away when only features are selected") {
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val plan = media.select("doc_id").queryExecution.optimizedPlan.toString
    assert(!plan.contains("payload"))
  }
}
