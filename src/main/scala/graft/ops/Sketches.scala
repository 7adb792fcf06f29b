package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sketching for corpus-scale statistics: KMV (k-minimum
 * values) distinct-count estimation and a count-min sketch for heavy
 * hitters.
 *
 * Both sketches are built on md5 (identical hex in every engine), so a
 * sketch computed by Spark, DuckDB or any other engine over the same data
 * is bit-identical — sketches become portable artifacts: a 100 TB job can
 * build them once and any downstream system can merge or query them.
 *
 * Scale shape:
 *  - KMV: `distinct` on the 4-byte hash (map-side partial), then a global
 *    top-k via sort-limit — Spark plans TakeOrderedAndProject (per
 *    partition top-k, driver merges k·numPartitions values, never a full
 *    sort). State is k longs.
 *  - CMS: the sketch is a (depth × width) grid of counters built with ONE
 *    map-side-combinable aggregation over (row, bucket) pairs; point
 *    queries join against the grid. The grid size is fixed (d·w counters)
 *    regardless of corpus size — it IS broadcastable by construction.
 */
object Sketches {

  /** first-8-hex-chars of md5(s) as an unsigned 32-bit value in a long —
    * the portable uniform hash used across the library. */
  private[ops] def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /**
   * KMV distinct-count estimate of `valueCol`: keep the k smallest
   * distinct 32-bit hash values; if the k-th smallest is `m` (hashes
   * uniform on [0, 2^32)), the estimated distinct count is
   * (k-1) · 2^32 / m. When fewer than k distinct hashes exist the count
   * is exact. Returns one row: (sample_k, kth_hash, est_distinct).
   *
   * Error is ~1/sqrt(k) (k=256 → ~6%); the sketch itself is k longs, and
   * two KMV sketches union by merging their value sets — the reason this
   * beats exact countDistinct at 100 TB, where the exact distinct set
   * (billions of tokens) no longer fits anywhere.
   */
  def kmvDistinct(df: DataFrame, valueCol: String, k: Int = 256): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val kmin = df
      .select(h32(col(valueCol)).as("h"))
      .distinct()
      .orderBy(col("h").asc)
      .limit(k)
    kmin.agg(
      count(lit(1)).as("sample_k"),
      max(col("h")).as("kth_hash"),
      round(
        when(count(lit(1)) < k, count(lit(1)).cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(4294967296.0) / max(col("h")).cast("double")),
        6).as("est_distinct"))
  }

  /**
   * Count-min sketch over a pre-aggregated `(term, cnt)` frame: `depth`
   * independent hash rows, each mapping a term to one of `width` buckets
   * via md5(j ‖ ':' ‖ term); the sketch counter is the sum of counts in
   * the bucket. Returns (j, bucket, c) — the distributed representation
   * of the d×w counter grid.
   */
  def cmsSketch(termCounts: DataFrame, termCol: String, cntCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad cms dims d=$depth w=$width")
    termCounts
      .select(col(termCol).as("term"), col(cntCol).as("cnt"),
        explode(array((0 until depth).map(j => lit(j)): _*)).as("j"))
      .withColumn("bucket",
        pmod(h32(concat(col("j").cast("string"), lit(":"), col("term"))), lit(width.toLong)))
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("cnt")).as("c"))
  }

  /**
   * Mergeable fixed-bin quantile sketch: bucket values into `nbins`
   * equal-width bins over [lo, hi) (out-of-range values clamp into the
   * edge bins), then estimate each requested quantile by linear
   * interpolation inside the bin that straddles the target rank
   * t = (n−1)·p: est = lo + w·(bin + (t − cumBefore)/binCount).
   *
   * Scale shape vs [[Stats.percentileExact]]: the exact form range-sorts
   * every group member; this sketch is ONE combinable aggregation to
   * `nbins` counters (map-side partial, O(nbins) state — merge two
   * sketches by summing counters), a bounded-size frame that a single
   * task finishes. Error is bounded by the bin width w = (hi−lo)/nbins.
   * All arithmetic is integral counts + literal doubles in a fixed
   * operation order — bit-replayable in any engine.
   *
   * Returns one row: (n, <name> per requested quantile).
   */
  def quantileSketch(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      nbins: Int, ps: Seq[(String, Double)]): DataFrame = {
    require(nbins >= 2 && hi > lo, s"bad sketch dims [$lo,$hi)/$nbins")
    require(ps.nonEmpty, "at least one quantile required")
    val w = (hi - lo) / nbins
    // clamp in the INTEGER domain: Spark's floor(double) is already a
    // long while DuckDB's floor stays double — comparing after the cast
    // keeps both engines in exact integer arithmetic
    // null/NaN are not quantile-rankable: greatest(null,0) would drop a
    // null into bin 0 and NaN (> every double) would clamp into the top
    // bin — both also inflating n and skewing every estimate. Filter
    // once; n below comes from the SAME filtered frame.
    val clean = df
      .select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull && !isnan(col("__v")))
    val bins = clean
      .select(least(greatest(
        floor((col("__v") - lit(lo)) / lit(w)), lit(0L)),
        lit((nbins - 1).toLong)).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("c"))
    // nbins rows by construction → the unpartitioned running-sum window
    // and the final single-row aggregate are bounded regardless of input
    // size (the one case where a global window is scale-safe)
    val cum = bins
      .withColumn("cum",
        sum(col("c")).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("bin"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(clean.agg(count(lit(1)).as("n"))))
    val aggs = ps.map { case (name, p) =>
      val t = (col("n") - 1).cast("double") * lit(p)
      val cumBefore = (col("cum") - col("c")).cast("double")
      val est = lit(lo) + lit(w) *
        (col("bin").cast("double") + (t - cumBefore) / col("c").cast("double"))
      // first bin whose cumulative count exceeds the target rank:
      // min_by over the qualifying suffix (null ordering values skipped)
      min_by(round(est, 6), when(col("cum").cast("double") > t, col("bin"))).as(name)
    }
    cum.groupBy(col("n")).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Per-group [[quantileSketch]]: the same mergeable fixed-bin sketch,
   * keyed. The bin aggregation shuffles (key, bin) partials (map-side
   * combinable, ≤ nbins rows per group); the running-sum window is
   * PARTITIONED by key — never a global sort — and the per-group n rides
   * in on a key equi-join of a groups×1-row frame. At 100 TB with any
   * realistic group count this is two bounded shuffles; contrast
   * [[graft.ops.Stats.percentileExact]], which ranks every raw row.
   */
  def quantileSketchGrouped(df: DataFrame, keys: Seq[String], valueCol: String,
      lo: Double, hi: Double, nbins: Int, ps: Seq[(String, Double)]): DataFrame = {
    require(nbins >= 2 && hi > lo, s"bad sketch dims [$lo,$hi)/$nbins")
    require(ps.nonEmpty, "at least one quantile required")
    require(keys.nonEmpty, "use quantileSketch for the ungrouped form")
    val w = (hi - lo) / nbins
    val keyCols = keys.map(col)
    val clean = df
      .select((keyCols :+ col(valueCol).cast("double").as("__v")): _*)
      .filter(col("__v").isNotNull && !isnan(col("__v")))
    val bins = clean
      .select((keyCols :+ least(greatest(
        floor((col("__v") - lit(lo)) / lit(w)), lit(0L)),
        lit((nbins - 1).toLong)).as("bin")): _*)
      .groupBy((keyCols :+ col("bin")): _*).agg(count(lit(1)).as("c"))
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols: _*).orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = bins
      .withColumn("cum", sum(col("c")).over(wk))
      .join(clean.groupBy(keyCols: _*).agg(count(lit(1)).as("n")), keys)
    val aggs = ps.map { case (name, p) =>
      val t = (col("n") - 1).cast("double") * lit(p)
      val cumBefore = (col("cum") - col("c")).cast("double")
      val est = lit(lo) + lit(w) *
        (col("bin").cast("double") + (t - cumBefore) / col("c").cast("double"))
      min_by(round(est, 6), when(col("cum").cast("double") > t, col("bin"))).as(name)
    }
    cum.groupBy((keyCols :+ col("n")): _*).agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Point-query the CMS grid for each row of `items(termCol)`: the
   * estimate is min_j grid(j, bucket_j(term)) — always ≥ the true count
   * (counters only over-count on collisions). The grid side is d·w rows
   * independent of data size, so AQE broadcast-joins it.
   */
  def cmsEstimate(items: DataFrame, sketch: DataFrame, termCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    val probes = items
      .withColumn("j", explode(array((0 until depth).map(j => lit(j)): _*)))
      .withColumn("bucket",
        pmod(h32(concat(col("j").cast("string"), lit(":"), col(termCol))), lit(width.toLong)))
    probes
      .join(sketch, Seq("j", "bucket"))
      .groupBy(items.columns.map(col): _*)
      .agg(min(col("c")).as("est_cnt"))
  }
}
