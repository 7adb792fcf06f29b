package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sketches

/** Round-8 operators: AMS F2 sketch, KMV set-overlap estimate. */
class Round8OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ── AMS tug-of-war F2 ─────────────────────────────────────────────────

  test("amsF2: exact side is Σf², estimate is partitioning-independent") {
    // counts 3/2/1 → F2 = 9 + 4 + 1 = 14
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("k")
    val r = Sketches.amsF2(df, "k", counters = 16).head()
    assert(r.getAs[Long]("exact_f2") == 14L)
    val est1 = Sketches.amsF2(df, "k", counters = 16).head().getAs[Double]("est_f2")
    val est2 = Sketches.amsF2(df.repartition(7), "k", counters = 16)
      .head().getAs[Double]("est_f2")
    assert(est1 == est2, "±1 sums are order-free → identical under any partitioning")
  }

  test("amsF2: estimate lands within the AMS error envelope on a real stream") {
    // 1000 keys, skewed multiplicity (key i repeated (i % 7) + 1 times)
    val df = (1 to 1000).flatMap(i => Seq.fill(i % 7 + 1)(s"k$i")).toDF("k")
    val r = Sketches.amsF2(df, "k", counters = 16).head()
    val (est, exact) = (r.getAs[Double]("est_f2"), r.getAs[Long]("exact_f2"))
    // stderr ≈ sqrt(2/16)·F2 ≈ 0.35·F2 — allow 3σ
    assert(math.abs(est - exact.toDouble) < 1.1 * exact.toDouble,
      s"est $est too far from exact $exact")
  }

  // ── KMV set overlap ───────────────────────────────────────────────────

  test("kmvOverlap: union below k → estimate equals exact Jaccard") {
    // |A∪B| = 90 ≤ k = 256: the k-min set IS the union
    val a = (1 to 60).map(i => s"v$i").toDF("v")
    val b = (31 to 90).map(i => s"v$i").toDF("v")
    val r = Sketches.kmvOverlap(a, b, "v", k = 256).head()
    assert(r.getAs[Long]("n_union") == 90L && r.getAs[Long]("n_both") == 30L)
    assert(r.getAs[Double]("est_jaccard") == r.getAs[Double]("exact_jaccard"))
    assert(math.abs(r.getAs[Double]("exact_jaccard") - 30.0 / 90.0) < 1e-6)
  }

  test("kmvOverlap: k-min sampling tracks exact Jaccard above k") {
    val a = (1 to 3000).map(i => s"v$i").toDF("v")
    val b = (1001 to 4000).map(i => s"v$i").toDF("v")
    // inter 2000, union 4000 → J = 0.5; k = 256 → stderr ≈ sqrt(.25/256) ≈ .03
    val r = Sketches.kmvOverlap(a, b, "v", k = 256).head()
    assert(r.getAs[Long]("k_used") == 256L)
    assert(math.abs(r.getAs[Double]("est_jaccard") - 0.5) < 0.12)
    assert(r.getAs[Double]("exact_jaccard") == 0.5)
    // disjoint sets → both estimates are exactly zero
    val d = Sketches.kmvOverlap(
      (1 to 500).map(i => s"x$i").toDF("v"),
      (1 to 500).map(i => s"y$i").toDF("v"), "v", k = 64).head()
    assert(d.getAs[Double]("est_jaccard") == 0.0 &&
      d.getAs[Double]("exact_jaccard") == 0.0)
  }
}
