package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.functions.GraftFunctions

/** Does the mixed distinct/non-distinct aggregate (Expand plan) cost
  * more than computing the sketch and the exact audit separately and
  * joining on the bounded group key? */
object AuditCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    li.groupBy("l_returnflag").count().collect() // warmup
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[audit] $label%-24s ${(System.nanoTime - t0) / 1e9}%6.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (_ <- 1 to 2) {
      time("mixed (Expand)")(noop(
        li.groupBy(col("l_returnflag")).agg(
          round(GraftFunctions.hll_distinct(col("l_partkey"), 8), 2).as("est"),
          countDistinct(col("l_partkey")).as("exact"))))
      time("split + join")(noop {
        val est = li.groupBy(col("l_returnflag")).agg(
          round(GraftFunctions.hll_distinct(col("l_partkey"), 8), 2).as("est"))
        val exact = li.select(col("l_returnflag"), col("l_partkey")).distinct()
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as("exact"))
        est.join(exact, "l_returnflag")
      })
    }
    spark.stop()
  }
}
