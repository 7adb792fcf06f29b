package graft.tools

import graft.{GraftSession, SparkEntry}

/** Driver-style smoke: entry() must return >0 rows on sf0.001. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(10, 40)
    println(s"[entry-smoke] rows=$n ${if (n > 0) "OK" else "FAIL"}")
    spark.stop()
  }
}
