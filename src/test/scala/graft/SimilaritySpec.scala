package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosine: known geometry (identical=1, orthogonal=0, opposite=-1)") {
    val c = Similarity.prepared(emb, "vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(c, c.filter($"vec_id" === 0), 4)
      .orderBy($"rn").collect()
    assert(topk.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 4L)) // by similarity
    assert(math.abs(topk(0).getDouble(2) - 0.993884) < 1e-6)
    assert(topk(1).getDouble(2) == 0.0)
    assert(topk(3).getDouble(2) == -1.0)
  }

  test("hardNegatives: the positive is skipped even when it IS the nearest neighbor") {
    val c = Similarity.prepared(emb, "vec_id", "embedding")
    val q = c.filter($"vec_id" === 0)
    // vec 1 is vec 0's nearest neighbor AND its known positive
    val pos = Seq((0L, 1L)).toDF("q_id", "neighbor_id")
    val out = Similarity.hardNegatives(c, q, pos, 3).orderBy($"rn").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 3L, 4L))
    assert(out.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
  }

  test("nearDupPairs: only the close pair passes a high threshold") {
    val c = Similarity.prepared(emb, "vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(c, 0.9).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((0L, 1L)))
  }

  test("lsh buckets: identical vectors share bucket; opposite vectors do not") {
    val c = Similarity.prepared(
      Seq((0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f)),
        (2L, Array(-1.0f, -2.0f, -3.0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val b = c.withColumn("bucket", Similarity.lshBucket($"v", 16, 3))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(b(0L) == b(1L))
    assert(b(0L) != b(2L)) // every sign flips for the negated vector
    assert(b(0L).length == 16)
  }

  test("centroids: integer micro-unit element-wise means per label") {
    val e = Seq(
      (0L, Array(1.0f, 3.0f), 1), (1L, Array(3.0f, 5.0f), 1),
      (2L, Array(10.0f, 0.0f), 2)).toDF("vec_id", "embedding", "label")
    val c = Similarity.centroids(e, "label", "embedding")
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(c(1) == Seq(2000000L, 4000000L)) // mean(1,3), mean(3,5)
    assert(c(2) == Seq(10000000L, 0L))
  }

  test("annIvf: query searches only its nearest centroid cell") {
    val e = Seq(
      (0L, Array(1.0f, 0.1f), 1), (1L, Array(1.0f, 0.2f), 1), // cell 1 near x-axis
      (2L, Array(0.1f, 1.0f), 2), (3L, Array(0.2f, 1.0f), 2)  // cell 2 near y-axis
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.annIvf(e, "vec_id", "embedding", "label", $"vec_id" === 0)
      .collect()
    assert(r.length == 1)
    assert(r.head.getInt(1) == 1)     // assigned to its own cell
    assert(r.head.getLong(2) == 1L)   // nearest in-cell neighbor
  }

  test("VectorMean agg: nulls skipped, partition-invariant, dim mismatch throws") {
    import graft.functions.GraftFunctions
    val rows = (0 until 97).map(i => (i % 3, Array(i.toDouble, (2 * i).toDouble))) :+
      (1, null.asInstanceOf[Array[Double]])
    for (parts <- Seq(1, 7)) {
      val got = rows.toDF("label", "v").repartition(parts)
        .groupBy($"label").agg(GraftFunctions.vector_mean($"v").as("m"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      for (l <- 0 until 3) {
        val vs = rows.filter(r => r._1 == l && r._2 != null).map(_._2)
        val want = Seq(vs.map(_(0)).sum / vs.size, vs.map(_(1)).sum / vs.size)
        assert(got(l).zip(want).forall { case (a, b) => math.abs(a - b) < 1e-9 },
          s"label $l: ${got(l)} vs $want")
      }
    }
    val bad = Seq((1, Array(1.0, 2.0)), (1, Array(1.0))).toDF("label", "v")
      .groupBy($"label").agg(GraftFunctions.vector_mean($"v"))
    val e = intercept[Throwable] { bad.collect() }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(t => Option(t.getMessage).exists(_.contains("length mismatch"))))
  }

  test("VectorMean survives ObjectHashAggregate sort-based fallback (spill path)") {
    val s = spark.newSession()
    graft.functions.GraftFunctions.registerAll(s)
    import s.implicits._
    // force the fallback after 2 in-memory groups: exercises the
    // serialize/deserialize buffer path a real spill takes
    s.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2")
    val df = (0 until 1200).map(i => (i % 30, Array((i % 30).toDouble, 1.0)))
      .toDF("k", "v").repartition(5)
    df.createOrReplaceTempView("t_vm_spill")
    val rows = s.sql("SELECT k, graft_vector_mean(v) AS m FROM t_vm_spill GROUP BY k")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(rows.size == 30)
    rows.foreach { case (k, m) => assert(m == Seq(k.toDouble, 1.0), s"key $k: $m") }
  }

  test("SQL: graft_vector_mean aggregates float vectors (implicit cast)") {
    val r = spark.sql(
      """SELECT graft_vector_mean(v) AS m FROM VALUES
        |  (array(CAST(1.0 AS FLOAT), CAST(3.0 AS FLOAT))),
        |  (array(CAST(3.0 AS FLOAT), CAST(5.0 AS FLOAT))) AS t(v)""".stripMargin)
      .collect().head.getSeq[Double](0)
    assert(r == Seq(2.0, 4.0))
  }

  test("annInt8TopK: quantized top-k recalls the exact top-k on real vectors") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Similarity.bruteForceTopK(
      Similarity.prepared(emb, "vec_id", "embedding"),
      Similarity.prepared(emb, "vec_id", "embedding").filter($"vec_id" < 10), 5)
      .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val quant = Similarity.annInt8TopK(emb, "vec_id", "embedding", $"vec_id" < 10, 5)
      .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    assert(quant.keySet == exact.keySet)
    val recall = exact.map { case (q, ids) => (ids intersect quant(q)).size.toDouble / ids.size }
    assert(recall.sum / recall.size >= 0.8, s"mean recall ${recall.sum / recall.size}")
  }

  test("nearDupPairsLsh: recall ≥ 0.9 vs the all-pairs truth, precision 1.0") {
    val emb = Similarity.prepared(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"),
      "vec_id", "embedding")
    val truth = Similarity.nearDupPairs(emb, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val banded = Similarity.nearDupPairsLsh(emb, 0.4, 64, 4, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every banded pair is a true pair with the identical exact cosine
    banded.foreach { case (ids, cos) =>
      assert(truth.get(ids).contains(cos), s"false positive or cos drift at $ids")
    }
    val recall = banded.size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall (${banded.size}/${truth.size})")
  }

  test("srpCandidatePairs: duplicate vectors always collide; disjoint non-candidates possible") {
    val c = Similarity.prepared(
      Seq((0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f)),
        (2L, Array(-1.0f, -2.0f, -3.0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val pairs = Similarity.srpCandidatePairs(c, 16, 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L))) // identical signature → all 4 bands agree
    assert(!pairs.contains((0L, 2L))) // negated vector flips every sign bit
  }

  test("annLsh finds the duplicate as nearest same-bucket neighbor") {
    val c = Similarity.prepared(
      Seq((0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f)),
        (2L, Array(5.0f, -1.0f, 0.5f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding")
    val r = Similarity.annLsh(c, $"vec_id" === 0, 16, 3).collect()
    assert(r.length == 1 && r.head.getLong(1) == 1L && r.head.getDouble(2) == 1.0)
  }
}
