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
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-warehouse")
      .config("spark.ui.enabled", "false")

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
