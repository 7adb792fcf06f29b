package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.Similarity

/** Stage-level timing of the IVF refit path on a replicated corpus:
  * which stage owns the wall — seed draw, assignment, refit aggregate,
  * or the search composition (incl. DAG re-execution fanout). */
object RefitProbe {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0)
      else "/tmp/graft_scale100/embeddings100.parquet"
    val spark = GraftSession.local()
    val emb = spark.read.parquet(path)
    val n = emb.count()
    val k = math.max(8, math.sqrt(n.toDouble).toInt)
    println(s"[refit-probe] n=$n k=$k")
    def time(label: String)(f: => Unit): Unit =
      ProbeSupport.time("refit-probe", label)(f)
    val (assigned, refit) = Similarity.refitQuantizer(emb, "vec_id", "embedding", k)
    val base = emb
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .filter(col("v").isNotNull && size(col("v")) > 0)
      .withColumn("nrm", Similarity.l2norm(col("v")))
    for (r <- 1 to 2) {
      println(s"[refit-probe] -- round $r --")
      time("base only")(ProbeSupport.noop(base))
      time("assigned only")(ProbeSupport.noop(assigned))
      time("refit only")(ProbeSupport.noop(refit))
      time("full annIvfRefit")(ProbeSupport.noop(Similarity.annIvfRefit(
        emb, "vec_id", "embedding", k,
        col("vec_id") % 10000000000L < 10)))
    }
    spark.stop()
  }
}
