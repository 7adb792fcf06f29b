package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev probe: run selected queries twice in one session — separates
  * one-time planning/codegen-compile cost from steady-state runtime. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q_ann_lsh", "q_embed_neardup", "q_ngram_jaccard", "q_minhash_pairs", "q_tpch_q1")
    val spark = GraftSession.local()
    spark.read.parquet(s"$dir/lineitem.parquet").groupBy("l_returnflag").count().collect()
    for (n <- names) {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[perf] $n%-20s first=${times(0)}%6.2f second=${times(1)}%6.2f")
    }
    spark.stop()
  }
}
