package graft.tools

import graft.GraftSession
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Dev scratch probe (r19): stage-by-stage cost of the q_embed_clusters
  * pipeline AT THE GATE'S PARAMETERS (planes=64, bandBits=4, thr=0.4) —
  * candidate volume pre/post distinct, verified pair count, and
  * per-iteration CC wall. */
object EmbedProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    val emb = Similarity.prepared(
      spark.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding")
    val withReps = Similarity.exactDupReps(emb)
    val reps = withReps.filter(col("vec_id") === col("rep_id"))
      .select(col("vec_id"), col("v"), col("nrm"))
      .localCheckpoint()
    println("[emb] n_reps = " + reps.count())

    val planes = 64; val bandBits = 4; val bands = planes / bandBits
    val sigs = reps.select(col("vec_id"),
      Similarity.lshBucket(col("v"), planes, 64).as("sig"))
    val banded = sigs
      .select(col("vec_id"), explode(array((0 until bands).map { i =>
        concat(lit(s"$i:"), substring(col("sig"), i * bandBits + 1, bandBits))
      }: _*)).as("band_key"))
      .repartition(col("band_key"))
      .localCheckpoint()
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[emb] $tag wall ${(System.nanoTime() - t0) / 1e9}%.2f -> $r")
      r
    }
    timed("banded rows")(banded.count())
    val a = banded.as("a"); val b = banded.as("b")
    val raw = a.join(b, col("a.band_key") === col("b.band_key") &&
      col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"))
    timed("raw band pairs")(raw.count())
    val cands = raw.distinct().localCheckpoint()
    timed("distinct cands")(cands.count())
    val v1 = reps.select(col("vec_id").as("id1"), col("v").as("v1"), col("nrm").as("n1"))
    val v2 = reps.select(col("vec_id").as("id2"), col("v").as("v2"), col("nrm").as("n2"))
    val verified = cands.join(v1, Seq("id1")).join(v2, Seq("id2"))
      .select(col("id1"), col("id2"),
        Similarity.cosine6(col("v1"), col("n1"), col("v2"), col("n2")).as("cos"))
      .filter(col("cos") >= 0.4)
      .localCheckpoint()
    timed("verified pairs")(verified.count())

    // instrumented CC at gate shape
    val symMode = if (args.length > 2) args(2) else "plain"
    val symBase = verified.select(col("id1").as("src"), col("id2").as("dst"))
      .union(verified.select(col("id2").as("src"), col("id1").as("dst")))
    val selfLoops = symMode == "selfloop"
    val symBase2 = if (selfLoops)
      symBase.union(reps.select(col("vec_id").as("src"), col("vec_id").as("dst")))
    else symBase
    val sym = (symMode match {
      case "rep" => symBase2.repartition(col("src"))
      case "repsort" | "selfloop" =>
        symBase2.repartition(col("src")).sortWithinPartitions(col("src"))
      case _ => symBase2
    }).localCheckpoint(eager = false)
    var labels = reps.select(col("vec_id").as("node"),
      col("vec_id").cast("long").as("lbl"))
    def lblSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.agg(sum(col("lbl").cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = lblSum(labels)
    var converged = false
    var iter = 0
    val hopsPerRound = if (args.length > 3) args(3).toInt else 1
    val aqeOff = args.length > 4 && args(4) == "aqeoff"
    if (aqeOff) spark.conf.set("spark.sql.adaptive.enabled", "false")
    while (!converged && iter < 25) {
      val ti = System.nanoTime()
      var cur = labels
      for (_ <- 1 to hopsPerRound) {
        val propagated = sym
          .join(cur.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"), col("lbl"))
        cur = (if (selfLoops) propagated
          else cur.union(propagated))
          .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
      }
      val hop = cur
      val next = (if (iter < (if (args.length > 1) args(1).toInt else 6)) hop else {
        val h = hop.localCheckpoint(eager = false)
        h.join(h.select(col("node").as("__jn"), col("lbl").as("__jl")),
            col("lbl") === col("__jn"), "left")
          .select(col("node"),
            least(col("lbl"), coalesce(col("__jl"), col("lbl"))).as("lbl"))
      }).localCheckpoint(eager = false)
      val s = lblSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      iter += 1
      println(f"[emb] cc iter $iter wall ${(System.nanoTime() - ti) / 1e9}%.2f converged=$converged")
    }
    spark.stop()
  }
}
