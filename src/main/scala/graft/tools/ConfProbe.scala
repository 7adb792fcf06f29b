package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev A/B probe: run a query list twice per configuration of runtime
  * SQL confs (KEY=V,KEY=V+KEY=V... first group = control), min of 2. */
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val groups = args(2).split("\\+").map(_.split(",").map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }.toSeq).toSeq
    val spark = GraftSession.local()
    spark.read.parquet(s"$dir/lineitem.parquet").groupBy("l_returnflag").count().collect()
    // warm every query once under the default conf
    for (n <- names) SparkEntry.queries(n)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    for ((g, gi) <- groups.zipWithIndex) {
      val saved = g.map { case (k, _) => (k, spark.conf.getOption(k)) }
      g.foreach { case (k, v) => spark.conf.set(k, v) }
      var tot = 0.0
      for (n <- names) {
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        tot += times.min
        println(f"[conf$gi] $n%-26s min=${times.min}%6.2f")
      }
      println(f"[conf$gi] TOTAL $tot%7.2f  (${g.map(p => p._1 + "=" + p._2).mkString(",")})")
      saved.foreach { case (k, vo) =>
        vo.fold(spark.conf.unset(k))(v => spark.conf.set(k, v)) }
    }
    spark.stop()
  }
}
