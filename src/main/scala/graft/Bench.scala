package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // untimed warmup: JIT + codegen compiler + parquet footer caches, so
    // per-query numbers reflect steady-state throughput
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // noop sink: forces every output column to be computed — count()
      // would let the optimizer prune the very expressions being measured.
      // min of 2 runs: steady-state throughput (planning + janino compile
      // are one-time costs that amortize over a real workload).
      // A failed run records the -1 sentinel (NOT the time-to-exception,
      // which would let a broken query pose as a fast one).
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: $e")
            -1.0
        }
      }
      val ok = times.filter(_ >= 0)
      name -> (if (ok.nonEmpty) ok.min else -1.0)
    }
    // The driver captures only the LAST ~2 KB of stdout; round 4's line
    // (78 queries at full double precision) overflowed that buffer and the
    // driver recorded parsed:null. Keep the stdout line parseable forever:
    // 3-decimal times, and if the full map still exceeds the budget keep
    // only the slowest queries (the interesting ones) plus an omitted
    // count. The complete map goes to stderr for local tuning.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def line(rs: Seq[(String, Double)], omitted: Int): String = {
      val qs = rs.map { case (k, v) => "\"" + k + "\":" + f3(v) }
        .mkString("{", ",", "}")
      val failed = results.collect { case (k, v) if v < 0 => s"\"$k\"" }
        .mkString("[", ",", "]")
      val ok = results.map(_._2).filter(_ >= 0)
      val total = ok.sum
      // n_queries/mean: the suite GROWS round over round (42 -> 85), so
      // the per-query mean is the comparable figure across rounds
      val mean = if (ok.nonEmpty) total / ok.size else -1.0
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${ok.size},"mean":${f3(mean)},"queries":$qs,"queries_omitted":$omitted,"failed":$failed,"sf":"$sfDir"}"""
    }
    System.err.println("[bench-full] " + line(results, 0))
    val budget = 1600
    var keep = results.size
    val bySlowest = results.sortBy(-_._2)
    var out = line(results, 0)
    while (out.length > budget && keep > 1) {
      keep -= 1
      out = line(bySlowest.take(keep).sortBy(_._1), results.size - keep)
    }
    println(out)
    spark.stop()
  }
}
