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
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    // INTERLEAVED full sweeps, not 3 consecutive runs per query: a
    // transient contention window on the shared runner (the r10/r11
    // artifact-killer — 2-minute stalls poisoned contiguous lexicographic
    // blocks identically in all 3 consecutive runs) now hits each query in
    // at most ONE sweep, and min-across-sweeps absorbs it. min (not mean)
    // remains the steady-state figure: planning + janino compile are
    // one-time costs that amortize over a real workload. A failed sweep
    // records the -1 sentinel (NOT the time-to-exception, which would let
    // a broken query pose as a fast one).
    val sweeps = 3
    val benchT0 = System.nanoTime()
    // runs(q)(s) = seconds for query q in sweep s (or -1); offs(q)(s) =
    // wall-clock offset (seconds since bench start) at which that run
    // STARTED — a contention window is then visible as a contiguous
    // offset range in exactly one sweep, auditable from the artifact.
    val runs = Array.fill(named.size, sweeps)(-1.0)
    val offs = Array.fill(named.size, sweeps)(0.0)
    // CONTENTION SENTINEL: a fixed trivial in-memory aggregate (no I/O,
    // no SF dependence, ~constant work) interleaved throughout every
    // sweep. On a quiet machine its time is flat; a noisy-neighbor
    // window shows up as outlier sentinel samples at the SAME wall
    // offsets that poisoned the adjacent query runs — so a contaminated
    // artifact is self-evident from the artifact, no forensic
    // run-offset reading needed (the r10/r12 adjudication cost).
    val sentSecs = scala.collection.mutable.ArrayBuffer[Double]()
    val sentOffs = scala.collection.mutable.ArrayBuffer[Double]()
    def sentinel(): Unit = {
      val t0 = System.nanoTime()
      sentOffs += (t0 - benchT0) / 1e9
      spark.range(2000000L).selectExpr("sum(id)").collect()
      sentSecs += (System.nanoTime() - t0) / 1e9
    }
    val sentEvery = math.max(1, named.size / 10) // ~10 samples per sweep
    for (s <- 0 until sweeps; ((name, fn), qi) <- named.zipWithIndex) {
      if (qi % sentEvery == 0) sentinel()
      val t0 = System.nanoTime()
      offs(qi)(s) = (t0 - benchT0) / 1e9
      // noop sink: forces every output column to be computed — count()
      // would let the optimizer prune the very expressions being measured.
      runs(qi)(s) =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name sweep $s failed: $e")
            -1.0
        }
    }
    val results = named.zipWithIndex.map { case ((name, _), qi) =>
      val ok = runs(qi).filter(_ >= 0)
      val best = if (ok.nonEmpty) ok.min else -1.0
      // relative cross-sweep spread: (max-min)/min over successful sweeps.
      // Under interleaving a large spread means ONE sweep was disturbed —
      // the min is still clean; under the old consecutive scheme a
      // disturbance inflated all three and was invisible here.
      val spread = if (ok.length > 1 && best > 0) (ok.max - best) / best else 0.0
      (name, best, spread)
    }
    // The driver captures only the LAST ~2000 chars of stdout and sbt
    // appends a "[success] Total time..." suffix (~75 chars) after our
    // line — r8's 1980-char line had its HEAD pushed out of the window
    // (BENCH_r08 parsed:null). With 152+ queries the full name list can
    // never fit that budget, so the stdout line now carries:
    //   * qv — best-of-sweeps INTEGER CENTISECONDS for EVERY query
    //     (queries_omitted is structurally 0), comma-separated, in
    //     LEXICOGRAPHIC query-name order ("q_order":"lex") — the names
    //     are exactly the sorted keys of oracle_sql.json /
    //     CORRECTNESS_r*.json, and qk_md5 (md5 of the comma-joined full
    //     names) lets anyone confirm the alignment;
    //   * "queries" — a named seconds map for the SLOWEST topN, so the
    //     artifact is human-readable where it matters;
    //   * "full":"BENCH_FULL.json" — the complete self-describing map
    //     (name → {sec, spread, per-sweep runs + wall offsets}) written to
    //     the repo working dir, which the end-of-round commit snapshots.
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
    // p90 of per-query relative cross-sweep spread: how much a single
    // timing can be trusted (1.2 ⇒ the worst sweep can be 2.2× the best —
    // exactly why min-across-sweeps, not single-run, is the metric)
    val spreads = sorted.collect { case (_, v, s) if v >= 0 => s }.sorted
    val p90 = if (spreads.isEmpty) 0.0
      else spreads(((spreads.size - 1) * 9) / 10)
    // sentinel verdict: max/median of the trivial-query samples. The
    // first sample pays the sentinel's own one-time codegen — drop it.
    // ratio ≤ 3 on a quiet box; a contention window sends it 10×+.
    val sent = sentSecs.drop(1).toArray.sorted
    val sentMed = if (sent.isEmpty) 0.0 else sent(sent.length / 2)
    val sentMax = if (sent.isEmpty) 0.0 else sent.last
    val sentRatio = if (sentMed > 0) sentMax / sentMed else 0.0
    val contention = if (sent.length >= 5 && sentRatio > 3.0) "suspect" else "clean"
    val fullJson = {
      // failed queries are OMITTED from the map (they are enumerated in
      // failed[]): a -1 sentinel inside the map silently skews any
      // consumer that sums/averages/ratios per-query times. The compact
      // stdout qv field keeps its positional -1s — it is fixed-width
      // aligned to qk_md5 over ALL names, where omission would shift
      // every later entry. "runs" holds the raw per-sweep seconds (with
      // -1 sentinels) and "off" the sweep wall-clock start offsets, so a
      // contention window can be localized post-hoc to one sweep's time
      // range instead of needing judge adjudication.
      val entries = sorted.zipWithIndex.collect { case ((k, v, s), qi) if v >= 0 =>
        val rs = runs(qi).map(r => if (r < 0) "-1" else f3(r)).mkString("[", ",", "]")
        val os = offs(qi).map(o => f2(o)).mkString("[", ",", "]")
        s""""$k":{"sec":${f3(v)},"spread":${f2(s)},"runs":$rs,"off":$os}"""
      }.mkString(",")
      val sentRuns = sentSecs.zip(sentOffs).map { case (sec, off) =>
        s"[${f2(off)},${f3(sec)}]" }.mkString("[", ",", "]")
      val sentinelJson = s""""sentinel":{"n":${sent.length},"med":${f3(sentMed)},"max":${f3(sentMax)},"ratio":${f2(sentRatio)},"samples":$sentRuns},"contention":"$contention""""
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${ok.size},"runs":$sweeps,"scheme":"interleaved-sweeps","spread_p90":${f2(p90)},$sentinelJson,"sf":"$sfName","queries":{$entries},"failed":$failed}"""
    }
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "BENCH_FULL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(fullPath), fullJson + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] full-map write failed: $e") }
    System.err.println("[bench-full] " + fullJson)
    def line(topN: Int, omitQv: Boolean): String = {
      val top = sorted.filter(_._2 >= 0).sortBy(-_._2).take(topN)
        .map { case (k, v, _) => s""""$k":${f2(v)}""" }.mkString(",")
      val qvField = if (omitQv) "" else s""""q_order":"lex","qk_md5":"$qkMd5","q_unit":"cs","qv":"$qv","""
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${ok.size},"runs":$sweeps,"scheme":"interleaved-sweeps","spread_p90":${f2(p90)},"sentinel_ratio":${f2(sentRatio)},"contention":"$contention","queries":{$top},"queries_named_topn":$topN,${qvField}"queries_omitted":0,"failed":$failed,"full":"$fullPath","sf":"$sfName"}"""
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
