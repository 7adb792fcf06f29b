package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** Round-11 hardening: skewed-duplicate LSH stress (r9 verdict task 3).
  * A corpus where ONE document is repeated ~10⁴ times makes every one of
  * its band buckets hold 10⁴ members — the all-pairs bucket join's output
  * is O(m²) (~5·10⁷ candidate pairs), which no AQE skew-split or salting
  * can reduce (they re-spread input, the OUTPUT stays quadratic). The
  * mitigation is [[Dedup.candidatePairsCapped]]: oversized buckets emit a
  * min-id STAR (O(m) edges) that is connectivity-equivalent for every
  * clustering consumer. */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cc(pairs: org.apache.spark.sql.DataFrame,
      nodes: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    Dedup.connectedComponents(nodes, "doc_id", pairs.select(col("id1"), col("id2")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("candidatePairsCapped: 10⁴-duplicate corpus emits O(m) star edges, not O(m²)") {
    val m = 10000
    // one hot text repeated m times + a handful of distinct docs
    val docs = spark.range(m).select(col("id").as("doc_id"),
        lit("the quick brown fox jumps over the lazy dog again and again").as("text"))
      .unionByName(Seq(
        (100000L, "completely different text about spark physical planning"),
        (100001L, "completely different text about spark physical planning"),
        (100002L, "a third unrelated document mentioning watermarks and state"))
        .toDF("doc_id", "text"))
    val sh = Dedup.shingleSets(docs, "doc_id", "text")
    val pairs = Dedup.candidatePairsCapped(sh, 8, 4, maxBucket = 64)
    val n = pairs.count()
    // star: the hot cluster contributes m-1 edges (dedup'd across its 4
    // bands), the small pair contributes 1 — NOT the ~2·10⁸/4 all-pairs
    // explosion. Generous bound: a few edges per member, not m²/2.
    assert(n < 4L * m, s"capped candidate count should be O(m), got $n")
    assert(n >= m - 1, s"star must still connect all $m duplicates, got $n edges")
    // the hot cluster is ONE component under the star edges
    val comp = cc(pairs, docs.select(col("doc_id")))
    assert((0L until m.toLong).map(comp).distinct.size == 1,
      "all duplicate copies must share one cluster id")
    assert(comp(100000L) == comp(100001L) && comp(100000L) != comp(0L))
  }

  test("candidatePairsCapped: CC-equivalent to the uncapped all-pairs operator") {
    // moderate corpus with several dup clusters; maxBucket small enough
    // that the clusters overflow into the star path
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "one two three four five six seven eight nine ten eleven",
      "red orange yellow green blue indigo violet ultraviolet light")
    val docs = (0 until 60).map { i =>
      (i.toLong, texts(i % 3))
    }.toDF("doc_id", "text")
    val sh = Dedup.shingleSets(docs, "doc_id", "text")
    val full = Dedup.candidatePairsFromShingles(sh, 8, 4)
    val capped = Dedup.candidatePairsCapped(sh, 8, 4, maxBucket = 5)
    val nodes = docs.select(col("doc_id"))
    // same partition of the id space (cluster LABELS may differ — compare
    // the grouping, not the labels; here min-id labeling makes them equal)
    assert(cc(capped, nodes) == cc(full, nodes))
    // and the capped edge list is strictly smaller on the overflowing clusters
    assert(capped.count() < full.count())
  }

  test("embedClustersCollapsed: output-identical to uncollapsed CC on a dup-heavy corpus") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(7)
    // 6 base vectors: 0/1 near-identical (cos≈1), others spread out;
    // then every vector duplicated 8× under distinct ids
    val base = (0 until 6).map { i =>
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      if (i == 1) (1L, (0 until 16).map(d => v(d) + 0.001f).toArray) else (i.toLong, v)
    }
    val dup = (0 until 8).flatMap(r => base.map { case (id, v) =>
      (id + r * 1000L, v.toSeq)
    })
    val df = spark.createDataFrame(dup).toDF("vec_id", "embedding")
    val corpus = Similarity.prepared(df, "vec_id", "embedding")
    val collapsed = Dedup.embedClustersCollapsed(corpus, 0.4, 16, 4, 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = Dedup.connectedComponents(corpus.select(col("vec_id")), "vec_id",
        Similarity.nearDupPairsLsh(corpus, 0.4, 16, 4, 16).select(col("id1"), col("id2")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(collapsed == plain)
    assert(collapsed.size == dup.size)
    // all 8 copies of vector 3 share one cluster, labeled by the min id
    assert((0 until 8).map(r => collapsed(3L + r * 1000L)).distinct.size == 1)
  }

  test("budgetSelect: greedy quality order, exact integer cutoff, per-source budget") {
    import graft.ops.TextOps
    val docs = Seq(
      // srcA: clean English (high quality) vs junk; each ~5-9 BPE tokens
      (1L, "srcA", "the cat and the dog are good"),
      (2L, "srcA", "@@ ## $$ %% ^^"),
      (3L, "srcA", "a book is on the table"),
      (4L, "srcB", "we have a few words here")
    ).toDF("doc_id", "source", "text")
    val sel = TextOps.budgetSelect(docs, "doc_id", "text", "source", 14L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toList
    val byId = sel.map(x => x._2 -> x._3).toMap
    // srcA: docs 1 and 3 are high quality (7 and 6 tokens; cum 7, 13 ≤ 14);
    // junk doc 2 ranks last and would blow the budget → excluded
    assert(byId.contains(1L) && byId.contains(3L) && !byId.contains(2L))
    assert(byId(4L) <= 14L) // srcB has its own budget
    // budget 0 → nothing survives; budget huge → everything does
    assert(TextOps.budgetSelect(docs, "doc_id", "text", "source", 0L).count() == 0)
    assert(TextOps.budgetSelect(docs, "doc_id", "text", "source", 1000L).count() == 4)
  }

  test("candidatePairsCapped: small buckets are byte-identical to uncapped") {
    val docs = Seq(
      (1L, "spark catalyst optimizer rewrites logical plans into physical"),
      (2L, "spark catalyst optimizer rewrites logical plans into physical"),
      (3L, "ducks swim on the quiet pond under a pale morning sky"),
      (4L, "a completely unrelated line of text with its own shingles here"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingleSets(docs, "doc_id", "text")
    val full = Dedup.candidatePairsFromShingles(sh, 8, 4).collect().map(_.toString).sorted
    val capped = Dedup.candidatePairsCapped(sh, 8, 4, maxBucket = 64)
      .collect().map(_.toString).sorted
    assert(capped.toSeq == full.toSeq)
  }

  test("neardupIncremental: new shard probes the historical band index") {
    val hist = Seq(
      (2L, "spark catalyst optimizer rewrites logical plans into physical trees"),
      (4L, "ducks swim on the quiet pond under a pale morning sky today"))
      .toDF("doc_id", "text")
    val fresh = Seq(
      (11L, "spark catalyst optimizer rewrites logical plans into physical trees"),
      (13L, "an entirely new document about watermark state and session windows"))
      .toDF("doc_id", "text")
    val idx = Dedup.bandKeyIndex(hist, "doc_id", "text", 8, 4)
    val out = Dedup.neardupIncremental(fresh, "doc_id", "text", idx, 8, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the verbatim copy is flagged against its historical twin; the
    // genuinely new doc is NOT flagged
    assert(out == Map(11L -> 2L))
  }

  test("dedupSpans: non-first occurrences of duplicated 8-grams are cut") {
    val span = "one two three four five six seven eight" // exactly 8 tokens
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta"),            // first occurrence kept
      (2L, s"prefix words here $span and a suffix tail"), // copy removed
      (3L, "completely original text with no repeated span at all ok"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupSpans(docs, "doc_id", "text", gram = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) == ((12L, 0L, 0L, s"alpha beta $span gamma delta")))
    // doc 2: the 8 copied tokens cut as ONE merged span, rest survives
    assert(out(2L) == ((15L, 8L, 1L, "prefix words here and a suffix tail")))
    assert(out(3L)._2 == 0L && out(3L)._4.startsWith("completely original"))
  }

  test("dedupSpans: overlapping duplicated grams merge into one interval") {
    // doc 2 copies a 10-token run from doc 1 → three overlapping dup
    // 8-grams covering positions 0..9 = ONE merged 10-token span
    val run = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    val docs = Seq(
      (1L, s"$run closing words"),
      (2L, s"$run different ending"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupSpans(docs, "doc_id", "text", gram = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) == ((0L, 0L, s"$run closing words")))
    assert(out(2L) == ((10L, 1L, "different ending")))
  }

  test("updateBandIndex: delta maintenance equals a from-scratch rebuild") {
    val texts = Seq(
      "spark catalyst optimizer rewrites logical plans into physical trees",
      "ducks swim on the quiet pond under a pale morning sky today",
      "a third unrelated document mentioning watermarks and state stores",
      "an entirely new document about session windows and event time")
    val base = (0 until 20).map(i => (i.toLong, texts(i % 4))).toDF("doc_id", "text")
    val added = Seq(
      (100L, texts(0)), (101L, "fresh text that only the new shard has seen"))
      .toDF("doc_id", "text")
    val removed = Seq(3L, 7L).toDF("rid")
    val maintained = Dedup.updateBandIndex(
      Dedup.bandKeyIndex(base, "doc_id", "text", 8, 4),
      added, "doc_id", "text", removed, 8, 4)
      .collect().map(_.toString).sorted.toSeq
    val rebuilt = Dedup.bandKeyIndex(
      base.filter(!col("doc_id").isin(3L, 7L)).unionByName(added),
      "doc_id", "text", 8, 4)
      .collect().map(_.toString).sorted.toSeq
    assert(maintained == rebuilt)
  }

  test("corpusDiff: added/removed/common counts across snapshots") {
    val oldS = Seq((1L, "aaa"), (2L, "bbb"), (3L, "bbb"), (4L, "ccc"))
      .toDF("doc_id", "text")
    val newS = Seq((10L, "bbb"), (11L, "ddd"), (12L, "ddd"), (13L, "ccc"))
      .toDF("doc_id", "text")
    val out = Dedup.corpusDiff(oldS, newS, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // aaa removed (1 doc), ddd added (2 docs), bbb+ccc common (3 old / 2 new)
    assert(out == Map(
      "removed" -> ((1L, 1L, 0L)),
      "added" -> ((1L, 0L, 2L)),
      "common" -> ((2L, 3L, 2L))))
  }

  test("shardAssign: LPT round-robin balances token mass under length skew") {
    import graft.ops.TextOps
    // Zipfian-ish: one giant doc, a few mid, many small — plain
    // count-balanced sharding would put the giant + extras in one shard
    val docs = (0 until 40).map { i =>
      val words = if (i == 0) 400 else if (i < 5) 60 else 8
      (i.toLong, "s", Seq.fill(words)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val out = TextOps.shardAssign(docs, "doc_id", "text", "source", 4)
    val loads = out.groupBy("shard").agg(sum("n_tokens").as("load"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(loads.keySet == Set(0, 1, 2, 3))
    // the giant doc (rank 1) goes to shard 0; every other shard's load
    // stays within 2x of the non-giant mean (count-balance could not)
    val rest = loads.filterNot(_._1 == 0).values
    assert(rest.max <= 2 * rest.min, loads.toString)
    // deterministic: same input, same assignment
    val again = TextOps.shardAssign(docs, "doc_id", "text", "source", 4)
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    val first = out.collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    assert(again == first)
  }

  test("negativeSample: k per query, never self or a positive, partitioning-invariant") {
    import graft.ops.TextOps
    val ids = (0L until 400L).toDF("id")
    val q = ids.filter(col("id") % 10 === 0).select(col("id").as("qid"))
    val pool = ids.select(col("id").as("did"))
    val pos = q.select(col("qid"), (col("qid") + 1).as("did"))
    def run(parts: Int) =
      TextOps.negativeSample(q.repartition(parts), pool.repartition(parts + 1),
        pos, "qid", "did", k = 5, buckets = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val a = run(1)
    assert(run(6).toSet == a.toSet)
    val byQ = a.groupBy(_._1)
    assert(byQ.size == 40)
    byQ.foreach { case (qid, rows) =>
      assert(rows.length == 5, s"query $qid got ${rows.length} negatives")
      assert(rows.map(_._2).sorted.toSeq == (1 to 5))
      rows.foreach { case (_, _, did) =>
        assert(did != qid && did != qid + 1, s"query $qid drew excluded doc $did")
      }
    }
  }

  test("dedupSpans: abutting removed regions count as ONE contiguous run") {
    // doc 2 copies two DIFFERENT 8-token runs from docs 1a/1b that sit
    // back-to-back in doc 2: coverage is contiguous → n_spans = 1
    val runA = "a1 a2 a3 a4 a5 a6 a7 a8"
    val runB = "b1 b2 b3 b4 b5 b6 b7 b8"
    val docs = Seq(
      (1L, s"$runA tail words here"),
      (2L, s"$runB other tail words"),
      (3L, s"$runA $runB distinct ending"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupSpans(docs, "doc_id", "text", gram = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(3L) == ((16L, 1L, "distinct ending")))
  }
}
