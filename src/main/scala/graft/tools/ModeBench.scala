package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * Single-node mode-aggregate throughput in the REFERENCE's own bench
 * shape (benches/mode.rs: sizes 100k/1M, null fractions 0/0.3/0.7,
 * Int32 and Utf8 inputs) — the reference's criterion run needs
 * crates.io and cannot execute in this offline environment, so this
 * mirrors its input generation and reports rows/s for our
 * TypedImperativeAggregate end-to-end (scan + agg, steady state,
 * best of 5 after warmup). local[1] isolates per-core accumulator
 * throughput; local[N] shows the distributed-merge scaling the
 * reference's single accumulator has no analogue for.
 */
object ModeBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    import spark.implicits._

    def dataset(n: Int, nullPct: Double, strings: Boolean): DataFrame = {
      // same sizes / null fractions / types as the reference's
      // benches/mode.rs matrix; values here cycle over a bounded
      // distinct set with positional nulls (arrow's bench_util draws
      // seeded-random values, so distributions — and thus rows/s —
      // are comparable in shape, not strictly head-to-head)
      val base = spark.range(n.toLong).select(
        col("id"),
        when(pmod(col("id"), lit(100)) < lit((nullPct * 100).toInt), lit(null))
          .otherwise(pmod(col("id"), lit(1000)))
          .cast("int").as("v_int"))
      val df =
        if (strings)
          base.select(col("id"),
            when(col("v_int").isNull, lit(null))
              .otherwise(concat(lit("value-padpadpadpadpadpadpad-"), col("v_int")))
              .as("v"))
        else base.select(col("id"), col("v_int").as("v"))
      df.select(col("v")).cache()
    }

    for {
      n <- Seq(100000, 1000000)
      nullPct <- Seq(0.0, 0.3, 0.7)
      strings <- Seq(false, true)
    } {
      val df = dataset(n, nullPct, strings)
      df.count() // materialize cache
      // warmup
      df.agg(GraftFunctions.mode_agg(col("v"))).collect()
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.agg(GraftFunctions.mode_agg(col("v"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      val ty = if (strings) "utf8 " else "int32"
      println(f"[mode-bench] n=$n%8d nulls=${(nullPct * 100).toInt}%2d%% $ty " +
        f"best=${best}%7.4f s  ${n / best / 1e6}%7.1f M rows/s")
      df.unpersist()
    }
    spark.stop()
  }
}
