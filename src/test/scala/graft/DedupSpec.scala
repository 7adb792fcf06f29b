package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat near the river bank today"), // near dup of 1
    (4L, "spark catalyst optimizer pushes filters below joins for columnar scans"),
    (5L, "completely different content about embeddings and vector similarity search")
  ).toDF("doc_id", "text")

  test("exactDedup: groups exact duplicates, keeps smallest id") {
    val r = Dedup.exactDedup(docs, "doc_id", "text").collect()
    assert(r.length == 4) // 1+2 collapse
    val dup = r.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) == 1L) // keep_id = min
  }

  test("dedupIncremental: index hit dropped, intra-shard dup keeps min id") {
    import org.apache.spark.sql.functions.{col, md5}
    // history = doc 1's text; shard = docs 2..5 (2 collides with history,
    // 4 and 5 duplicate each other within the shard)
    val shard = Seq(
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (3L, "the quick brown fox jumps over the lazy cat near the river bank today"),
      (4L, "spark catalyst optimizer pushes filters below joins for columnar scans"),
      (5L, "spark catalyst optimizer pushes filters below joins for columnar scans")
    ).toDF("doc_id", "text")
    val idx = docs.filter(col("doc_id") === 1L).select(md5(col("text")).as("fp"))
    val r = Dedup.dedupIncremental(shard, "doc_id", "text", idx, "fp")
      .collect().map(_.getLong(0)).sorted
    assert(r.toSeq == Seq(3L, 4L)) // 2 killed by history, 5 by intra-shard
  }

  test("chunkDedup: one global survivor per distinct chunk, keep-first by (doc, idx)") {
    // 4-token chunks; doc 1 repeats its own first chunk, doc 2 repeats
    // doc 1's boilerplate, doc 3 is all fresh, doc 4 is too short
    val d = Seq(
      (1L, "alpha beta gamma delta alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta fresh words here now"),
      (3L, "totally new content in this document body here"),
      (4L, "too short")
    ).toDF("doc_id", "text")
    val r = graft.ops.TextOps.chunkDedup(d, "doc_id", "text", chunkTokens = 4)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(1L) == ((3L, 2L))) // 3 chunks; the repeated one survives once
    assert(r(2L) == ((2L, 1L))) // boilerplate chunk lost to doc 1
    assert(r(3L) == ((2L, 2L))) // 8 tokens → 2 chunks, all fresh
    assert(!r.contains(4L)) // sub-chunk doc dropped
  }

  test("candidatePairs: finds exact and near duplicates, no false cross pairs") {
    val pairs = Dedup.candidatePairs(docs, "doc_id", "text", 8, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical docs always collide
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup likely collides
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L)) // unrelated doc never pairs
  }

  test("simhashPairs: exact dup at hamming 0; unrelated docs never pair") {
    val rows = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(x => ((x.getLong(0), x.getLong(1)), x.getInt(2))).toSeq
    // each pair appears exactly once even though identical signatures
    // collide in every band (the candidate distinct)
    assert(rows.map(_._1).distinct.size == rows.size, s"duplicate pairs: $rows")
    val r = rows.toMap
    assert(r((1L, 2L)) == 0) // identical docs: identical signatures
    assert(!r.keySet.exists(p => p._1 == 5L || p._2 == 5L))
    assert(r.values.forall(_ <= 3))
  }

  test("cleanCorpus: drops exact dup, near dup, and junk; keeps smallest ids") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup
      (3L, "the quick brown fox jumps over the lazy cat near the river bank today"), // near dup
      (4L, "spark catalyst optimizer and the tungsten engine push filters into scans"),
      (5L, "@@@@ ####")) // junk (fails quality)
      .toDF("doc_id", "text")
    // one word changed in 14 → Jaccard 0.6, so τ=0.5 catches the near dup
    val kept = Dedup.cleanCorpus(corpus, "doc_id", "text", qualityMin = 0.4, jaccardMax = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L), s"kept=$kept")
  }

  test("crossContamination: counts distinct shared n-grams between corpora") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "totally unrelated training document content here")).toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, "alpha beta gamma delta something else entirely")).toDF("doc_id", "text")
    val r = Dedup.crossContamination(train, eval_, "doc_id", "text", minShared = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // shared 3-grams: "alpha beta gamma", "beta gamma delta" = 2
    assert(r.toSeq == Seq((1L, 100L, 2L)))
  }

  test("jaccardVerify: exact dup = 1.0, near dup high, ordering sane") {
    val pairs = Dedup.candidatePairs(docs, "doc_id", "text", 8, 4)
    val j = Dedup.jaccardVerify(docs, "doc_id", "text", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 1.0)
    j.get((1L, 3L)).foreach(v => assert(v > 0.5 && v < 1.0))
  }
}
