package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-handling utilities for 100 TB-scale aggregation and joins.
 *
 * A single hot key (the empty document, the default user, the null-ish
 * category) can pin an entire 1000-executor stage on one reducer. The
 * standard fixes, expressed Spark-natively:
 *
 *  - salted two-stage aggregation: split each key into up to `salts`
 *    partial groups, aggregate, then merge the partials — the hot key's
 *    work fans out over `salts` reducers.
 *  - salted shuffle join: spread the skewed fact side, replicate the
 *    dim side per salt.
 *
 * The salt is `spark_partition_id() mod salts`: deterministic within a
 * run, free to compute, and it spreads a CONSTANT hot key (a value-hash
 * salt would map every copy of the hot key to one salt — no fan-out).
 * Map-side combine is unaffected: the salt is constant per partition.
 *
 * AQE's skew-join splitting (on in [[graft.GraftSession]]) handles
 * sort-merge join skew at runtime; these helpers cover aggregation
 * fan-out and pre-planned join salting.
 */
object Scale {

  private def salt(salts: Int): Column = pmod(spark_partition_id(), lit(salts))

  /**
   * Skew-proof sum/count aggregation: stage 1 groups by (keys, salt) —
   * map-side combine still applies — stage 2 merges per key. The hot
   * key's rows spread over up to `salts` reducers in stage 1; stage 2
   * merges at most `salts` partial rows per key.
   */
  def saltedSumCount(
      df: DataFrame, keys: Seq[String], valueCol: String, salts: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(salts))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n"))
  }

  /**
   * Shuffle-join a skewed fact table against a dim too large to
   * broadcast: the fact side salts per-partition, the dim side is
   * replicated once per salt; the equi-join key becomes (key, salt), so
   * the hot key's rows land on `salts` different reducers.
   */
  def saltedShuffleJoin(
      fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", salt(salts))
    val repl = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(repl, Seq(key, "__salt")).drop("__salt")
  }
}
