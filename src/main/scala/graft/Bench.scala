package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // WALL BUDGET (r18, closing the r15 verdict's red item): BENCH_r15
    // died at the driver's timeout (rc=124) with parsed:null because the
    // bench had no time awareness and emitted its artifact only at the
    // very end. The budget is a hard planning ceiling measured from main()
    // entry: the preflight stops eating into it past 20%, a new sweep is
    // only started if the previous sweep's wall (×1.15 margin) still
    // fits, and the artifact is re-emitted AFTER EVERY SWEEP — a kill at
    // any point leaves the last complete artifact in the stdout window
    // instead of nothing. Default 1400s: the driver's limit is above
    // r14's observed 2013s total, and sbt/JVM startup + verify overhead
    // live outside this measurement — a ~350s/sweep slow box (this
    // round's sustained window) fits compile sweep + 2 measured sweeps
    // + preflight inside 1400, and 1400 + overhead stays well under
    // the r14-proven >=2000s driver wall.
    val budgetSec =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1400").toDouble
    val mainT0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - mainT0) / 1e9
    val spark = GraftSession.local()
    // untimed warmup: JIT + codegen compiler + parquet footer caches, so
    // per-query numbers reflect steady-state throughput
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    // PRE-FLIGHT QUIET GATE (r17): before the first sweep, run the
    // sentinel alone in a short sampling loop and only start measuring
    // once the box is quiet: 5 samples (first discarded — it pays the
    // sentinel's codegen), quiet = max/median ≤ 3 within the batch. If
    // not quiet, sleep 30 s and retry — but never spend more than 20% of
    // the wall budget waiting (r18: the r15 death partially fed on up to
    // ~4.5 min of preflight sleeps); on exhaustion proceed anyway (the
    // quarantine still guards the artifact).
    def sentOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(2000000L).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    sentOnce() // codegen warmup for the sentinel shape
    // QUIET GATE threshold (r20): gates demand ratio ≤ 2 — stricter than
    // the 3.0 quarantine line — because a gate's job is to PREDICT the
    // next sweep will classify clean, and a box already at 2-3× is one
    // neighbor away from quarantine. Quarantine keeps 3.0: it judges a
    // sweep that already ran, where the sentinel shares the window with
    // the bench's own work.
    val gateRatio = 2.0
    def quietProbe(): Double = {
      val s = Vector.fill(5)(sentOnce()).sorted
      if (s(2) > 0) s.last / s(2) else 0.0
    }
    // Wait for a quiet window, sampling every 20s, never past `deadline`
    // (seconds of elapsed wall). Returns (last observed ratio, #probes).
    var gateWaitSec = 0.0
    def waitForQuiet(deadline: Double, tag: String): (Double, Int) = {
      var tries = 1
      var ratio = quietProbe()
      while (ratio > gateRatio && elapsed + 21.0 < deadline) {
        System.err.println(
          f"[bench] $tag try $tries: sentinel ratio=$ratio%.2f > " +
            f"$gateRatio%.1f (elapsed $elapsed%.0fs / deadline " +
            f"$deadline%.0fs) - waiting 20s")
        val w0 = elapsed
        Thread.sleep(20000L)
        gateWaitSec += elapsed - w0
        ratio = quietProbe()
        tries += 1
      }
      System.err.println(
        f"[bench] $tag try $tries: sentinel ratio=$ratio%.2f " +
          (if (ratio <= gateRatio) "(quiet - starting sweep)"
           else "(deadline reached - proceeding; quarantine still guards)"))
      (ratio, tries)
    }
    // PRE-FLIGHT QUIET GATE: before the first sweep, spend at most 20% of
    // the wall budget waiting for a quiet window (no sweep-wall estimate
    // exists yet to size a longer wait).
    val (preflightRatio, preflightTries) =
      waitForQuiet(budgetSec * 0.2, "preflight")
    val preflightQuiet = preflightRatio <= gateRatio
    if (!preflightQuiet) System.err.println(
      s"[bench] preflight gave up without a quiet window - proceeding; " +
        "per-sweep quarantine still applies")
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
    //
    // SELF-QUARANTINE (r16): each sweep is classified by its own sentinel
    // samples (max of the sweep vs the global sentinel median); a sweep
    // whose ratio exceeds the threshold is QUARANTINED — excluded from
    // the best/spread computation. Only if NO clean sweep exists does the
    // artifact carry contention:"suspect".
    //
    // COMPILE SWEEP 0 (r18, closing the r15 verdict loop): sweep 0
    // reproducibly self-quarantined (ratio 3.1-6.5 every round) because
    // its sentinels run while janino compiles ~290 fresh plans — the
    // contamination is the bench's OWN codegen, not a noisy neighbor, and
    // burning a replacement sweep on it wastes ~180s of wall every round.
    // Sweep 0 is now the declared WARMUP/COMPILE sweep: its runs are
    // recorded (and participate in min if it happens to be clean), but
    // its quarantine is expected and it never counts toward the clean
    // target, which is 2 measured sweeps (the r15 clean snapshot proved
    // 2 ultra-clean sweeps converge the artifact).
    val targetClean = 2
    val maxSweeps = 5
    val sentThreshold = 3.0 // ratio ≤ 3 on a quiet box; contention is 10×+
    val benchT0 = System.nanoTime()
    val sentEvery = math.max(1, named.size / 10) // ~10 samples per sweep
    val sweepRuns = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val sweepOffs = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val sweepWall = scala.collection.mutable.ArrayBuffer[Double]()
    val sweepSent =
      scala.collection.mutable.ArrayBuffer[Vector[(Double, Double)]]()
    def runSweep(): Unit = {
      val wallT0 = System.nanoTime()
      val r = Array.fill(named.size)(-1.0)
      val o = Array.fill(named.size)(0.0)
      val sents = Vector.newBuilder[(Double, Double)]
      // CONTENTION SENTINEL: a fixed trivial in-memory aggregate (no I/O,
      // no SF dependence, ~constant work) interleaved throughout every
      // sweep. On a quiet machine its time is flat; a noisy-neighbor
      // window shows up as outlier samples at the SAME wall offsets that
      // poisoned the adjacent query runs.
      def sentinel(): Unit = {
        val t0 = System.nanoTime()
        val off = (t0 - benchT0) / 1e9
        spark.range(2000000L).selectExpr("sum(id)").collect()
        sents += ((off, (System.nanoTime() - t0) / 1e9))
      }
      for (((name, fn), qi) <- named.zipWithIndex) {
        if (qi % sentEvery == 0) sentinel()
        val t0 = System.nanoTime()
        o(qi) = (t0 - benchT0) / 1e9
        // noop sink: forces every output column to be computed — count()
        // would let the optimizer prune the very expressions measured.
        r(qi) =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          } catch {
            case e: Throwable =>
              System.err.println(
                s"[bench] $name sweep ${sweepRuns.size} failed: $e")
              -1.0
          }
      }
      sweepRuns += r
      sweepOffs += o
      sweepSent += sents.result()
      sweepWall += (System.nanoTime() - wallT0) / 1e9
    }
    // all sentinel samples in time order, minus the global FIRST (it
    // pays the sentinel's own one-time codegen)
    def allSentSecs: Vector[Double] =
      sweepSent.toVector.flatten.map(_._2).drop(1)
    def sentMedian: Double = {
      val s = allSentSecs.sorted
      if (s.isEmpty) 0.0 else s(s.length / 2)
    }
    // per-sweep ratio: the sweep's worst sentinel sample vs the global
    // median (sweep 0's first sample is the dropped codegen one)
    def sweepRatio(si: Int): Double = {
      val samples =
        (if (si == 0) sweepSent(si).drop(1) else sweepSent(si)).map(_._2)
      val med = sentMedian
      if (samples.isEmpty || med <= 0) 0.0 else samples.max / med
    }
    def cleanSweeps: Vector[Int] =
      sweepRuns.indices.toVector.filter(si =>
        sweepSent(si).size >= 2 && sweepRatio(si) <= sentThreshold)
    // clean MEASURED sweeps: sweep 0 is the compile sweep and never
    // counts toward the target (though its runs are used when clean)
    def cleanMeasured: Vector[Int] = cleanSweeps.filter(_ > 0)
    // budget check: does another sweep (estimated at the worst observed
    // sweep wall, ×1.15 margin) still fit? The FIRST sweep always runs —
    // an empty artifact is the one unacceptable outcome.
    var budgetStopped = false
    def nextSweepFits: Boolean =
      if (sweepWall.isEmpty) true
      else {
        val fits = elapsed + sweepWall.max * 1.15 < budgetSec
        if (!fits) budgetStopped = true
        fits
      }
    def emitArtifact(): Unit = {
      val executed = sweepRuns.size
      val clean = cleanSweeps
      val quarantined = sweepRuns.indices.toVector.diff(clean)
      // used sweeps: the clean ones; if contention never lifted, use all
      // (there is nothing better) and say so. Sweep 0 alone counts as
      // clean-if-clean here: with a single executed sweep it is all we
      // have.
      val used = if (clean.nonEmpty) clean else sweepRuns.indices.toVector
      val contention = if (clean.nonEmpty) "clean" else "suspect"
      val results = named.zipWithIndex.map { case ((name, _), qi) =>
        val ok = used.map(si => sweepRuns(si)(qi)).filter(_ >= 0)
        val best = if (ok.nonEmpty) ok.min else -1.0
        // relative cross-sweep spread over the USED sweeps: (max-min)/min.
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
      //     (name → {sec, spread, per-sweep runs + wall offsets}) written
      //     to the repo working dir, which the end-of-round commit
      //     snapshots.
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
      // reported sentinel ratio: the worst ratio among the USED sweeps —
      // the quality of the numbers actually in the artifact
      val sentRatio = if (used.nonEmpty) used.map(sweepRatio).max else 0.0
      val sentAll = allSentSecs.sorted
      val sentMed = if (sentAll.isEmpty) 0.0 else sentAll(sentAll.length / 2)
      val quarantinedJson = quarantined.mkString("[", ",", "]")
      val usedJson = used.mkString("[", ",", "]")
      val fullJson = {
        // failed queries are OMITTED from the map (they are enumerated in
        // failed[]): a -1 sentinel inside the map silently skews any
        // consumer that sums/averages/ratios per-query times. The compact
        // stdout qv field keeps its positional -1s — it is fixed-width
        // aligned to qk_md5 over ALL names, where omission would shift
        // every later entry. "runs" holds the raw per-sweep seconds for
        // EVERY executed sweep (quarantined ones included — flagged by
        // index in sweeps_quarantined) and "off" the sweep wall-clock
        // start offsets, so a contention window can be localized post-hoc.
        val entries = sorted.zipWithIndex.collect { case ((k, v, s), qi) if v >= 0 =>
          val rs = (0 until executed).map { si =>
            val r = sweepRuns(si)(qi); if (r < 0) "-1" else f3(r)
          }.mkString("[", ",", "]")
          val os = (0 until executed).map(si => f2(sweepOffs(si)(qi)))
            .mkString("[", ",", "]")
          s""""$k":{"sec":${f3(v)},"spread":${f2(s)},"runs":$rs,"off":$os}"""
        }.mkString(",")
        val sentRuns = sweepSent.flatten.map { case (off, sec) =>
          s"[${f2(off)},${f3(sec)}]" }.mkString("[", ",", "]")
        val ratios = (0 until executed).map(si => f2(sweepRatio(si)))
          .mkString("[", ",", "]")
        val sentinelJson =
          s""""sentinel":{"n":${sentAll.length},"med":${f3(sentMed)},"ratio":${f2(sentRatio)},"sweep_ratios":$ratios,"samples":$sentRuns},"preflight":{"tries":$preflightTries,"ratio":${f2(preflightRatio)},"quiet":$preflightQuiet},"budget":{"sec":${f2(budgetSec)},"elapsed":${f2(elapsed)},"gate_wait":${f2(gateWaitSec)},"stopped":$budgetStopped},"contention":"$contention","sweeps_executed":$executed,"sweeps_used":$usedJson,"sweeps_quarantined":$quarantinedJson"""
        s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${ok.size},"runs":${used.size},"scheme":"interleaved-sweeps","spread_p90":${f2(p90)},$sentinelJson,"sf":"$sfName","queries":{$entries},"failed":$failed}"""
      }
      // default full-map path is the DRIVER-run file, NOT the committed
      // clean snapshot: two rounds running, the driver's (contention-prone)
      // per-round run clobbered HEAD's quiet-window BENCH_FULL.json. The
      // round-close snapshot run sets SPARK_GRAFT_BENCH_FULL=BENCH_FULL.json
      // explicitly; anything else (the driver included) lands in the
      // gitignored BENCH_FULL_DRIVER.json.
      val fullPath =
        sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "BENCH_FULL_DRIVER.json")
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(fullPath), fullJson + "\n")
      catch { case e: Throwable => System.err.println(s"[bench] full-map write failed: $e") }
      System.err.println("[bench-full] " + fullJson)
      def line(topN: Int, omitQv: Boolean): String = {
        val top = sorted.filter(_._2 >= 0).sortBy(-_._2).take(topN)
          .map { case (k, v, _) => s""""$k":${f2(v)}""" }.mkString(",")
        val qvField = if (omitQv) "" else s""""q_order":"lex","qk_md5":"$qkMd5","q_unit":"cs","qv":"$qv","""
        s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${ok.size},"runs":${used.size},"scheme":"interleaved-sweeps","spread_p90":${f2(p90)},"sentinel_ratio":${f2(sentRatio)},"preflight_tries":$preflightTries,"budget_stopped":$budgetStopped,"contention":"$contention","sweeps_executed":$executed,"sweeps_quarantined":$quarantinedJson,"queries":{$top},"queries_named_topn":$topN,${qvField}"queries_omitted":0,"failed":$failed,"full":"$fullPath","sf":"$sfName"}"""
      }
      // 2000-char driver window minus the sbt suffix and newline margin
      val budget = 1800
      var out = line(20, omitQv = false)
      for (n <- Seq(10, 5, 0) if out.length > budget) out = line(n, omitQv = false)
      // structurally unreachable below ~350 queries; belt-and-braces so the
      // line NEVER overflows the window again
      if (out.length > budget) out = line(5, omitQv = true)
      println(out)
      System.out.flush()
    }
    // run sweeps until 2 clean MEASURED sweeps exist (sweep 0 = compile
    // sweep), the sweep cap is hit, or the wall budget says stop —
    // emitting the artifact after EVERY sweep so a driver kill at any
    // point still leaves the last complete artifact on stdout.
    while (sweepRuns.size < maxSweeps && cleanMeasured.size < targetClean &&
        nextSweepFits) {
      // INTER-SWEEP QUIET GATE (r20, the three-rounds-of-suspect-driver-
      // artifacts fix): a quarantined sweep means the box is storming —
      // launching the next sweep straight into the same storm just burns
      // a sweep slot. Once a sweep wall is known, the latest viable start
      // time for the REMAINING needed sweeps is computable, and every
      // second before it is free to spend waiting for quiet. (After a
      // CLEAN sweep the probe passes immediately and costs ~2s.)
      if (sweepRuns.nonEmpty && !cleanSweeps.contains(sweepRuns.size - 1)) {
        val sweepsNeeded =
          math.max(1, targetClean - cleanMeasured.size)
        val latestStart = budgetSec - sweepWall.max * 1.15 * sweepsNeeded
        if (elapsed < latestStart)
          waitForQuiet(latestStart,
            s"inter-sweep gate (sweep ${sweepRuns.size - 1} quarantined)")
      }
      runSweep()
      val q = sweepRuns.indices.toVector.diff(cleanSweeps)
      if (q.nonEmpty) System.err.println(
        s"[bench] sentinel quarantine after sweep ${sweepRuns.size - 1}: " +
          s"contaminated sweeps $q (ratios ${q.map(si => "%.1f".format(sweepRatio(si)))})" +
          (if (q == Vector(0)) " (sweep 0 = compile sweep, expected)" else ""))
      emitArtifact()
    }
    if (budgetStopped) {
      System.err.println(
        f"[bench] wall budget $budgetSec%.0fs reached after ${sweepRuns.size} " +
          f"sweeps (elapsed $elapsed%.0fs) - stopping with what exists")
      // the flag only flips when the WHILE condition re-evaluates
      // nextSweepFits AFTER the last in-loop emit, so the artifact on
      // stdout would say budget_stopped:false for a budget-stopped run
      // unless re-emitted here with the final flag value
      emitArtifact()
    }
    spark.stop()
  }
}
