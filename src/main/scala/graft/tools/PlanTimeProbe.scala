package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev probe: split a query's wall into CONSTRUCT (DataFrame build),
  * PLAN (analysis+optimization+physical planning, pre-AQE) and EXECUTE
  * (noop write) — 3 hot runs each, min reported. */
object PlanTimeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val spark = GraftSession.local()
    spark.read.parquet(s"$dir/lineitem.parquet").groupBy("l_returnflag").count().collect()
    for (n <- names) {
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save() // warm
      val (cs, ps, es) = (Array.fill(3)(0.0), Array.fill(3)(0.0), Array.fill(3)(0.0))
      for (i <- 0 until 3) {
        var t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, dir)
        cs(i) = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        df.queryExecution.executedPlan // force planning
        ps(i) = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        es(i) = (System.nanoTime() - t0) / 1e9
      }
      println(f"[pt] $n%-26s construct=${cs.min}%5.2f plan=${ps.min}%5.2f exec=${es.min}%5.2f")
    }
    spark.stop()
  }
}
