package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev probe: the FINAL adaptive plan (post-execution), where AQE stage
  * reuse is visible — the initial plan never shows ReusedExchange. */
object AqePlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.local()
    args(1).split(",").foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      println(s"\n===== $name (final) =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
