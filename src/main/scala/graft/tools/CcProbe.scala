package graft.tools

import graft.GraftSession
import graft.ops.Dedup
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Dev scratch probe: per-iteration timing of connectedComponents on
  * the q_embed_clusters input (SRP-banded pairs over collapsed reps). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    val emb = Similarity.prepared(
      spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
    val withReps = Similarity.exactDupReps(emb)
    val reps = withReps.filter(col("vec_id") === col("rep_id"))
      .select(col("vec_id"), col("v"), col("nrm"))
    val pairs = Similarity.nearDupPairsLsh(reps, 0.4, 64, 8, 64)
      .select(col("id1"), col("id2"))
    val cands = Similarity.srpCandidatePairs(reps, 64, 8, 64)
    var tx = System.nanoTime()
    println("[cc] n_cands = " + cands.count())
    println(f"[cc] cands wall ${(System.nanoTime() - tx) / 1e9}%.2f")
    tx = System.nanoTime()
    println("[cc] n_cands2 = " + cands.count())
    println(f"[cc] cands wall2 ${(System.nanoTime() - tx) / 1e9}%.2f")
    val t0 = System.nanoTime()
    println("[cc] n_pairs = " + pairs.count())
    println(f"[cc] pairs wall ${(System.nanoTime() - t0) / 1e9}%.2f")

    // instrumented copy of Dedup.connectedComponents
    val t1 = System.nanoTime()
    val sym = pairs
      .select(col("id1").as("src"), col("id2").as("dst"))
      .union(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .localCheckpoint()
    var labels = reps.select(col("vec_id").as("node"),
      col("vec_id").cast("long").as("lbl")).localCheckpoint()
    println(f"[cc] setup ${(System.nanoTime() - t1) / 1e9}%.2f")
    def lblSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.agg(sum(col("lbl").cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = lblSum(labels)
    var converged = false
    var iter = 0
    val jumpAfter = 6
    while (!converged && iter < 25) {
      val ti = System.nanoTime()
      val propagated = sym
        .join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("lbl"))
      val hop = labels.union(propagated)
        .groupBy(col("node"))
        .agg(min(col("lbl")).as("lbl"))
      val next = (if (iter < jumpAfter) hop else {
        val h = hop.localCheckpoint()
        h.join(h.select(col("node").as("__jn"), col("lbl").as("__jl")),
            col("lbl") === col("__jn"), "left")
          .select(col("node"),
            least(col("lbl"), coalesce(col("__jl"), col("lbl"))).as("lbl"))
      }).localCheckpoint()
      val s = lblSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      iter += 1
      println(f"[cc] iter $iter ${(System.nanoTime() - ti) / 1e9}%.2f s converged=$converged")
    }
    spark.stop()
  }
}
