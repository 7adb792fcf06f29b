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
    // The driver captures only the LAST ~2000 chars of stdout and sbt
    // appends a "[success] Total time..." suffix (~75 chars) after our
    // line — r8's 1980-char line had its HEAD pushed out of the window
    // (BENCH_r08 parsed:null). With 152+ queries the full name list can
    // never fit that budget, so the stdout line now carries:
    //   * qv — best-of-3 INTEGER CENTISECONDS for EVERY query
    //     (queries_omitted is structurally 0), comma-separated, in
    //     LEXICOGRAPHIC query-name order ("q_order":"lex") — the names
    //     are exactly the sorted keys of oracle_sql.json /
    //     CORRECTNESS_r*.json, and qk_md5 (md5 of the comma-joined full
    //     names) lets anyone confirm the alignment;
    //   * "queries" — a named seconds map for the SLOWEST topN, so the
    //     artifact is human-readable where it matters;
    //   * "full":"BENCH_FULL.json" — the complete self-describing map
    //     (name → {sec, spread}) written to the repo working dir, which
    //     the end-of-round commit snapshots.
    def f2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val sfName = sfDir.split("/").filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    val sorted = results // already sorted by name
    val qv = sorted.map { case (_, v, _) =>
      if (v < 0) "-1" else math.round(v * 100).toString
    }.mkString(",")
    val qkMd5 = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(sorted.map(_._1).mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
    }
    val failed = sorted.collect { case (k, v, _) if v < 0 => s"\"$k\"" }
      .mkString("[", ",", "]")
    val ok = sorted.map(_._2).filter(_ >= 0)
    val total = ok.sum
    // p90 of per-query relative spread over 3 runs: how much a single
    // timing can be trusted (1.2 ⇒ the worst of 3 runs can be 2.2× the
    // best — exactly why best-of-3, not single-run, is the metric)
    val spreads = sorted.collect { case (_, v, s) if v >= 0 => s }.sorted
    val p90 = if (spreads.isEmpty) 0.0
      else spreads(((spreads.size - 1) * 9) / 10)
    val fullJson = {
      // failed queries are OMITTED from the map (they are enumerated in
      // failed[]): a -1 sentinel inside the map silently skews any
      // consumer that sums/averages/ratios per-query times. The compact
      // stdout qv field keeps its positional -1s — it is fixed-width
      // aligned to qk_md5 over ALL names, where omission would shift
      // every later entry.
      val entries = sorted.collect { case (k, v, s) if v >= 0 =>
        s""""$k":{"sec":${f3(v)},"spread":${f2(s)}}"""
      }.mkString(",")
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${ok.size},"runs":3,"spread_p90":${f2(p90)},"sf":"$sfName","queries":{$entries},"failed":$failed}"""
    }
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "BENCH_FULL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(fullPath), fullJson + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] full-map write failed: $e") }
    System.err.println("[bench-full] " + fullJson)
    def line(topN: Int, omitQv: Boolean): String = {
      val top = sorted.filter(_._2 >= 0).sortBy(-_._2).take(topN)
        .map { case (k, v, _) => s""""$k":${f2(v)}""" }.mkString(",")
      val qvField = if (omitQv) "" else s""""q_order":"lex","qk_md5":"$qkMd5","q_unit":"cs","qv":"$qv","""
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${ok.size},"runs":3,"spread_p90":${f2(p90)},"queries":{$top},"queries_named_topn":$topN,${qvField}"queries_omitted":0,"failed":$failed,"full":"$fullPath","sf":"$sfName"}"""
    }
    // 2000-char driver window minus the sbt suffix and newline margin
    val budget = 1800
    var out = line(20, omitQv = false)
    for (n <- Seq(10, 5, 0) if out.length > budget) out = line(n, omitQv = false)
    // structurally unreachable below ~350 queries; belt-and-braces so the
    // line NEVER overflows the window again
    if (out.length > budget) out = line(5, omitQv = true)
    println(out)
    spark.stop()
  }
}
