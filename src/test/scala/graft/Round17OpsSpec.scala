package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 work (driver round 15): n-aware SRP band arity (the r14
  * verdict's one `weak`), plus regression pins for the round's other
  * verdict/advice deliverables. */
class Round17OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.ops.{Dedup, Similarity}

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
}
