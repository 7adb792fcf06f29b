package graft

import org.apache.spark.sql.SparkSession

/**
 * Canonical session configuration for the graft engine.
 *
 * - `nanosAsLong`: the testdata's `events.ts` is parquet TIMESTAMP(NANOS),
 *   which Spark rejects natively; read it as an epoch-nanos long (exactly
 *   DuckDB's `epoch_ns`), so time arithmetic is integral and engine-portable.
 * - AQE on: runtime coalescing + skew-join splitting — the 100 TB defaults.
 * - shuffle.partitions sized to local cores here; on a real cluster this
 *   becomes ~2-3× total executor cores (AQE coalesces the excess).
 * - codegen cache sized for a MULTI-QUERY workload: the default 100
 *   compiled-class entries thrash under this library's ~200-query gate
 *   (every interleaved bench sweep re-paid ~0.3s of janino compilation
 *   PER QUERY — measured 1.5× total inflation); a long-lived analytics
 *   session serving many distinct queries wants the cache to hold them
 *   all. Static conf — must be set before the first session.
 */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    common(shufflePartitions).master(master)

  private def common(shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // r18: AQE's coalescing floor. The default 1m floors every small
      // shuffle at totalBytes/1m read partitions — on kernel-heavy
      // pipelines whose shuffles are byte-small but CPU-expensive
      // (per-gram hashing, regex chains, session windows over a 2 MB
      // event table) that serialized post-shuffle work onto 1-3 tasks.
      // 64k restores parallelism for exactly those stages (measured:
      // −30% over a 12-query mixed set, −14% over the heavy set, no
      // regressions). Scale-neutral by construction: the floor only
      // binds when a shuffle is tiny relative to the session's
      // parallelism — at real scale advisoryPartitionSizeInBytes
      // governs (see clusterBuilder), and a cluster handed a tiny
      // shuffle wants it parallelized too.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-warehouse")
      .config("spark.ui.enabled", "false")

  /**
   * PRODUCTION (cluster) builder — [[builder]]'s settings with the
   * knobs that only matter beyond one machine, sized from the
   * deployment's scale instead of local cores. The numbers encode the
   * 100 TB operating rules this library's operators assume:
   *  - shuffle.partitions ≈ 2-3× total executor cores (AQE coalesces
   *    the excess; too FEW partitions is the unrecoverable direction —
   *    a partition must fit in executor memory);
   *  - advisory partition size caps what AQE coalesces toward, and
   *    files.maxPartitionBytes what a scan task reads — both sized so
   *    a task's working set stays spill-free at default executor
   *    memory;
   *  - skew-join splitting ON with the factor/threshold the salting
   *    ops treat as the "AQE handles moderate skew" boundary (beyond
   *    it, use [[graft.ops.Scale]]'s explicit salting);
   *  - shuffled hash join enabled: sort-merge's sort is wasted work
   *    for the hash-aggregable band/bucket joins this library plans.
   */
  def clusterBuilder(totalExecutorCores: Int): SparkSession.Builder = {
    require(totalExecutorCores >= 1, "totalExecutorCores must be >= 1")
    // no .master() here: the deployment supplies it (spark-submit /
    // operator); everything else is the library's operating point
    common(totalExecutorCores * 3)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "256m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128m")
      .config("spark.sql.files.maxPartitionBytes", "256m")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
  }

  /** Local session sized from SPARK_GRAFT_CPUS (driver contract). */
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val s = builder(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // WindowExec's "No Partition Defined" warning fires once per
    // unpartitioned window per query — hundreds of lines across the
    // ~290-query gate that buried the r15 bench's death. Every global
    // frame in this library is arity-bounded by construction (seed
    // draws over limit(k) rows, #checks/#days/#ranks frames) and
    // audited in PlanAuditSpec, so the warning carries no information
    // here; silence that one logger, keep WARN everywhere else.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    graft.functions.GraftFunctions.registerAll(s)
    s
  }
}
