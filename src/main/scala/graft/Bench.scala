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
      // best of 3 runs: a single-run bench swung individual queries 6-8×
      // on UNCHANGED code (r5→r6), far above the 2× regression gate —
      // min-of-3 is the steady-state figure (planning + janino compile
      // are one-time costs that amortize over a real workload), and the
      // per-query spread is reported so noise is visible, not inferred.
      // A failed run records the -1 sentinel (NOT the time-to-exception,
      // which would let a broken query pose as a fast one).
      val times = (1 to 3).map { _ =>
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
      val best = if (ok.nonEmpty) ok.min else -1.0
      // relative repeat-run spread: (max-min)/min over the successful runs
      val spread = if (ok.size > 1 && best > 0) (ok.max - best) / best else 0.0
      (name, best, spread)
    }
    // The driver captures only the LAST ~2 KB of stdout; round 4's line
    // (78 queries at full double precision) overflowed that buffer and the
    // driver recorded parsed:null. A JSON object map ("name":cs,) spends
    // 4 chars/query on syntax and stopped fitting at 111 queries, so the
    // per-query times ship as two PARALLEL CSV STRINGS: qk = query names
    // (uniform "q_" prefix stripped, declared in key_prefix), qv =
    // best-of-3 INTEGER CENTISECONDS (declared in q_unit; -1 = failed),
    // same order — 2 chars/query, headroom to ~150 queries. If a grown
    // suite overflows anyway, the shrink loop drops the fastest queries
    // last-resort (the complete map always goes to stderr for local
    // tuning).
    def f2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val sfName = sfDir.split("/").filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    def line(rs: Seq[(String, Double, Double)], omitted: Int): String = {
      val qk = rs.map(_._1.stripPrefix("q_")).mkString(",")
      val qv = rs.map { case (_, v, _) =>
        if (v < 0) "-1" else math.round(v * 100).toString
      }.mkString(",")
      val failed = results.collect { case (k, v, _) if v < 0 => s"\"$k\"" }
        .mkString("[", ",", "]")
      val ok = results.map(_._2).filter(_ >= 0)
      val total = ok.sum
      // n_queries: the suite GROWS round over round (42 -> 94 -> 111+),
      // so total/n_queries is the comparable figure across rounds
      // p90 of per-query relative spread over 3 runs: how much a single
      // timing can be trusted (1.2 ⇒ the worst of 3 runs can be 2.2× the
      // best — exactly why best-of-3, not single-run, is the metric)
      val spreads = results.collect { case (_, v, s) if v >= 0 => s }.sorted
      val p90 = if (spreads.isEmpty) 0.0
        else spreads(((spreads.size - 1) * 9) / 10)
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${ok.size},"runs":3,"spread_p90":${f2(p90)},"key_prefix":"q_","q_unit":"cs","qk":"$qk","qv":"$qv","queries_omitted":$omitted,"failed":$failed,"sf":"$sfName"}"""
    }
    System.err.println("[bench-full] " + line(results, 0))
    val budget = 1980
    // shrink policy: the reference-surface queries must NEVER drop out of
    // the visible map (r6 verdict: the fastest-dropped-first rule made all
    // six core aggregates invisible to perf diffing) — keep core first,
    // then slowest-first; the fastest non-core queries go last
    val core = Set("q_mode_string", "q_mode_int", "q_mode_date", "q_mode_grouped",
      "q_mode_float", "q_mode_ts", "q_mode_scalable", "q_max_by", "q_min_by",
      "q_skewness", "q_kurtosis", "q_kurtosis_pop", "q_tpch_q1", "q_tpch_q6")
    var keep = results.size
    val byPriority = results.sortBy(r => (!core.contains(r._1), -r._2))
    var out = line(results, 0)
    while (out.length > budget && keep > 1) {
      keep -= 1
      out = line(byPriority.take(keep).sortBy(_._1), results.size - keep)
    }
    println(out)
    spark.stop()
  }
}
