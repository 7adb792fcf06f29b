package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * One-pass column profiler — the data-quality audit a pipeline runs
 * before training on a new table: per column, row count, non-null
 * count, a DISTINCT-COUNT SKETCH, and lexicographic min/max.
 *
 * Scale shape: ONE aggregation over one scan — 4 aggregate expressions
 * per column, all map-side combinable. The distinct count is the
 * engine-replayable KMV sketch ([[graft.functions.KmvDistinctAgg]],
 * exact below k, error ~1/√k above) rather than `countDistinct`: n
 * exact distincts in one agg would Expand the scan n-fold and shuffle
 * every distinct value, where the sketch ships k longs per column per
 * map task. The wide 1-row aggregate unpivots to a row per column with
 * `stack` (no second scan).
 *
 * min/max are over the STRING cast (profile semantics: a lexicographic
 * fingerprint, not numeric extrema — those belong to typed queries);
 * the oracle applies the identical casts.
 */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], kmvK: Int = 256): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"nn_$c"),
        round(graft.functions.GraftFunctions.kmv_distinct(col(c), kmvK), 6).as(s"nd_$c"),
        min(col(c).cast("string")).as(s"mn_$c"),
        max(col(c).cast("string")).as(s"mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("n"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `n`, `nn_$c`, `nd_$c`, `mn_$c`, `mx_$c`"
    }.mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $stackArgs) AS (column, n, non_null, distinct_est, min_s, max_s)"))
  }
}
