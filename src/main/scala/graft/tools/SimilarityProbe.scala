package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.Similarity

/** Perf decomposition for the SRP near-dup path: how many candidate
  * pairs does banding emit at the gate's (threshold, planes, bandBits),
  * and where does the wall-time go — banding+distinct vs the exact
  * cosine verify vs an all-pairs run. */
object SimilarityProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    val emb = Similarity.prepared(
      spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
    emb.cache().count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[simprobe] $label%-28s n=$n%9d  ${(System.nanoTime - t0) / 1e9}%6.2f s")
    }
    // variant A: candidate verify without forced repartition — plain id
    // joins, so Catalyst broadcasts the (small) corpus side
    def lshA(threshold: Double): Long = {
      val cands = Similarity.srpCandidatePairs(emb, 64, 4, 64)
      val v1 = emb.select(col("vec_id").as("id1"), col("v").as("v1"), col("nrm").as("n1"))
      val v2 = emb.select(col("vec_id").as("id2"), col("v").as("v2"), col("nrm").as("n2"))
      cands.join(v1, Seq("id1")).join(v2, Seq("id2"))
        .select(col("id1"), col("id2"),
          Similarity.cosine6(col("v1"), col("n1"), col("v2"), col("n2")).as("cos"))
        .filter(col("cos") >= threshold).count()
    }
    // variant B: defer the pair-dedup until AFTER the cosine filter —
    // raw band collisions verify immediately; the big distinct shuffle
    // becomes a tiny distinct over survivors
    def lshB(threshold: Double): Long = {
      val bands = 64 / 4
      val sigs = emb.select(col("vec_id"), col("v"), col("nrm"),
        Similarity.lshBucket(col("v"), 64, 64).as("sig"))
      val banded = sigs
        .select(col("vec_id"), col("v"), col("nrm"),
          explode(array((0 until bands).map { i =>
            concat(lit(s"$i:"), substring(col("sig"), i * 4 + 1, 4))
          }: _*)).as("band_key"))
      val a = banded.select(col("band_key"), col("vec_id").as("id1"),
        col("v").as("v1"), col("nrm").as("n1"))
      val b = banded.select(col("band_key"), col("vec_id").as("id2"),
        col("v").as("v2"), col("nrm").as("n2"))
      a.join(b, Seq("band_key")).filter(col("id1") < col("id2"))
        .select(col("id1"), col("id2"),
          Similarity.cosine6(col("v1"), col("n1"), col("v2"), col("n2")).as("cos"))
        .filter(col("cos") >= threshold)
        .distinct().count()
    }
    // variant C: ids-only banding (vectors do NOT ride the bands), raw
    // collision pairs go straight to broadcast id-joins + cosine, dedup
    // after the filter
    def lshC(threshold: Double): Long = {
      val bands = 64 / 4
      val sigs = emb.select(col("vec_id"), Similarity.lshBucket(col("v"), 64, 64).as("sig"))
      val banded = sigs.select(col("vec_id"), explode(array((0 until bands).map { i =>
        concat(lit(s"$i:"), substring(col("sig"), i * 4 + 1, 4))
      }: _*)).as("band_key"))
      val raw = banded.as("a").join(banded.as("b"),
          col("a.band_key") === col("b.band_key") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
      val v1 = emb.select(col("vec_id").as("id1"), col("v").as("v1"), col("nrm").as("n1"))
      val v2 = emb.select(col("vec_id").as("id2"), col("v").as("v2"), col("nrm").as("n2"))
      raw.join(v1, Seq("id1")).join(v2, Seq("id2"))
        .select(col("id1"), col("id2"),
          Similarity.cosine6(col("v1"), col("n1"), col("v2"), col("n2")).as("cos"))
        .filter(col("cos") >= threshold)
        .distinct().count()
    }
    // variant D: no forced repartition anywhere — band self-join and
    // verify joins are plain equi-joins; Catalyst broadcasts the small
    // sides at gate scale, reuses identical shuffle subplans at scale
    def lshD(threshold: Double): Long = {
      val bands = 64 / 4
      val sigs = emb.select(col("vec_id"), Similarity.lshBucket(col("v"), 64, 64).as("sig"))
      val banded = sigs.select(col("vec_id"), explode(array((0 until bands).map { i =>
        concat(lit(s"$i:"), substring(col("sig"), i * 4 + 1, 4))
      }: _*)).as("band_key"))
      val cands = banded.as("a").join(banded.as("b"),
          col("a.band_key") === col("b.band_key") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
        .distinct()
      val v1 = emb.select(col("vec_id").as("id1"), col("v").as("v1"), col("nrm").as("n1"))
      val v2 = emb.select(col("vec_id").as("id2"), col("v").as("v2"), col("nrm").as("n2"))
      cands.join(v1, Seq("id1")).join(v2, Seq("id2"))
        .select(col("id1"), col("id2"),
          Similarity.cosine6(col("v1"), col("n1"), col("v2"), col("n2")).as("cos"))
        .filter(col("cos") >= threshold).count()
    }
    for (_ <- 1 to 2) {
      time("lshD(no repartition)")(lshD(0.4))
      time("srpCandidatePairs")(
        Similarity.srpCandidatePairs(emb, 64, 4, 64).count())
      time("nearDupPairsLsh")(
        Similarity.nearDupPairsLsh(emb, 0.4, 64, 4, 64).count())
      time("lshA(bcast verify)")(lshA(0.4))
      time("lshB(vectors ride bands)")(lshB(0.4))
      time("lshC(raw pairs, bcast)")(lshC(0.4))
      time("nearDupPairs(all-pairs)")(
        Similarity.nearDupPairs(emb, 0.4).count())
      time("semanticDedup")(
        Similarity.semanticDedup(emb, 0.4, 64, 4, 64).count())
    }
    spark.stop()
  }
}
