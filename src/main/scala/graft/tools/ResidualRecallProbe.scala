package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.Similarity

/**
 * Recall@5 ladder for the IVFADC family — RAW codes (r16) vs RESIDUAL
 * codes (r17, Jégou et al. TPAMI 2011 §IV): the number that justifies
 * residual encoding as the default. Candidate side probes ALL cells so
 * the comparison isolates the ENCODING (no routing loss); truth is the
 * exact brute-force top-5 on the same unit corpus.
 */
object ResidualRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qf: Column = col("vec_id") < 50
    val dim = 64
    val kCells = 8
    val corpus = Similarity.prepared(emb, "vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(corpus, corpus.filter(qf), 5)
      .select(col("q_id"), col("neighbor_id"))

    def recallOf(cand: DataFrame): Double =
      exact.join(cand.withColumn("hit", lit(1L)),
          Seq("q_id", "neighbor_id"), "left_outer")
        .agg(avg(coalesce(col("hit"), lit(0L))))
        .collect().head.getDouble(0)

    for ((m, k) <- Seq((4, 8), (8, 32), (8, 64), (16, 128))) {
      val raw = recallOf(Similarity.annIvfPqRaw(emb, "vec_id", "embedding",
        dim, m, k, kCells, qf, nprobe = kCells, topK = 5)
        .select(col("q_id"), col("neighbor_id")))
      val res = recallOf(Similarity.annIvfPq(emb, "vec_id", "embedding",
        dim, m, k, kCells, qf, nprobe = kCells, topK = 5)
        .select(col("q_id"), col("neighbor_id")))
      val comp = (dim * 4).toDouble / m
      println(f"[resid] m=$m%2d k=$k%3d (${comp}%4.0fx): raw=$raw%.3f residual=$res%.3f")
    }
    // clustered corpus: the regime IVFADC is built for — the coarse
    // quantizer explains most variance, residuals are small
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    val clustered = (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val cCorpus = Similarity.prepared(clustered, "vec_id", "embedding")
    val cqf: Column = col("vec_id") < 40
    val cExact = Similarity.bruteForceTopK(cCorpus, cCorpus.filter(cqf), 5)
      .select(col("q_id"), col("neighbor_id"))
    def recallC(cand: DataFrame): Double =
      cExact.join(cand.withColumn("hit", lit(1L)),
          Seq("q_id", "neighbor_id"), "left_outer")
        .agg(avg(coalesce(col("hit"), lit(0L))))
        .collect().head.getDouble(0)
    for ((m, k) <- Seq((4, 8), (8, 16), (8, 32))) {
      val raw = recallC(Similarity.annIvfPqRaw(clustered, "vec_id", "embedding",
        dim, m, k, kCells, cqf, nprobe = kCells, topK = 5)
        .select(col("q_id"), col("neighbor_id")))
      val res = recallC(Similarity.annIvfPq(clustered, "vec_id", "embedding",
        dim, m, k, kCells, cqf, nprobe = kCells, topK = 5)
        .select(col("q_id"), col("neighbor_id")))
      println(f"[resid-clustered] m=$m%2d k=$k%3d: raw=$raw%.3f residual=$res%.3f")
    }
    spark.stop()
  }
}
