package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Dev probe (r19, VERDICT #3): synthesize a FULL ×10 test-data
  * directory ("synthetic sf1") so the gate queries can be timed one
  * decade above the bench SF at different core counts — the parallel-
  * scaling evidence the sf0.1 bench cannot produce (its inputs are
  * 1-3 parquet row groups and every heavy kernel is already sub-second
  * after fan-out).
  *
  * Replication recipes (all deterministic):
  *  - documents: the [[Sf1Soak]] mutation — replica k suffixes an
  *    md5-selected ~30% of tokens with the replica id, so replica
  *    pairs share ~34% of 3-shingles (below every near-dup threshold;
  *    no candidate flood) while corpus statistics track the original.
  *    All columns kept (lang/source/n_chars ride along).
  *  - embeddings: replica k rotates the vector by k·6 elements —
  *    near-orthogonal to the base, norm preserved.
  *  - lineitem / events / orders: id-shifted copies (values unchanged —
  *    these feed aggregates, not near-dup joins).
  *  - dimension tables: copied as-is.
  *
  * Usage: runMain graft.tools.ScaleCurveProbe <srcDir> <workDir>
  * — generates workDir once (skips tables that exist), then exit; time
  * queries with PerfProbe against workDir at each SPARK_GRAFT_CPUS.
  */
object ScaleCurveProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_sfcurve"
    val spark = GraftSession.local()
    new java.io.File(workDir).mkdirs()
    val reps = spark.range(10).select(col("id").cast("int").as("k"))
    def gen(name: String)(build: => org.apache.spark.sql.DataFrame): Unit = {
      val path = s"$workDir/$name.parquet"
      if (new java.io.File(path).exists()) { println(s"[curve] $name: exists"); return }
      val t0 = System.nanoTime()
      build.write.mode("overwrite").parquet(path)
      println(f"[curve] $name: generated in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def src(name: String) = spark.read.parquet(s"$srcDir/$name.parquet")

    gen("documents") {
      src("documents").crossJoin(reps).select(
        (col("doc_id") + col("k").cast("long") * 10000000L).as("doc_id"),
        when(col("k") === 0, col("text")).otherwise(
          concat_ws(" ", transform(split(col("text"), " "), w =>
            when(conv(substring(md5(concat(w, lit("_"),
                col("k").cast("string"))), 1, 4), 16, 10) % 10 < 3,
              concat(w, lit("q"), col("k").cast("string"))).otherwise(w))))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    gen("embeddings") {
      src("embeddings").crossJoin(reps).select(
        (col("vec_id") + col("k").cast("long") * 10000000L).as("vec_id"),
        when(col("k") === 0, col("embedding")).otherwise(
          concat(
            slice(col("embedding"), col("k") * 6 + 1, lit(64) - col("k") * 6),
            slice(col("embedding"), lit(1), col("k") * 6))).as("embedding"),
        col("label"))
    }
    gen("lineitem") {
      src("lineitem").crossJoin(reps).select(
        (col("l_orderkey") + col("k").cast("long") * 100000000L).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
    }
    gen("events") {
      src("events").crossJoin(reps).select(
        (col("event_id") + col("k").cast("long") * 100000000L).as("event_id"),
        col("ts"),
        (col("user_id") + col("k").cast("long") * 10000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    gen("orders") {
      val o = src("orders")
      o.crossJoin(reps).select(
        (col(o.columns.head) + col("k").cast("long") * 100000000L)
          .as(o.columns.head) +: o.columns.tail.map(col): _*)
    }
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      gen(t) { src(t) }
    spark.stop()
  }
}
