package graft.tools

/** Where does a gate query's wall go — plan construction (Catalyst
  * analyze+optimize of the tree, paid on EVERY re-derivation) vs
  * execution? Run twice per query so codegen/scan caches are warm on
  * the second pass; if plan2 ≈ plan1 and dominates exec2, the query's
  * bench price is planning-bound and data-size levers won't move it. */
object PlanCostProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = args(1).split(",").toSeq
    val spark = graft.GraftSession.local()
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    names.foreach { n =>
      def pass(): (Double, Double, Double) = {
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      val (b1, p1, e1) = pass()
      val (b2, p2, e2) = pass()
      println(f"[plancost] $n%-22s build=$b1%6.2f plan=$p1%6.2f exec=$e1%6.2f | build2=$b2%6.2f plan2=$p2%6.2f exec2=$e2%6.2f")
    }
    spark.stop()
  }
}
