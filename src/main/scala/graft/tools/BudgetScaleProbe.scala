package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.TextOps

/** Head-to-head: the r11 single-window budgetSelect/shardAssign vs the
  * r12 bucket-decomposed forms, on the 1× and 10× duplicate-heavy
  * corpora (built by [[ScaleStress]]). The 10× replica is the
  * adversarial case for BOTH: the old form's per-source serial window
  * grows 10×, and the new form's tie groups grow 10×. */
object BudgetScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val workDir = if (args.length > 1) args(1) else "/tmp/graft_scale"
    val spark = GraftSession.local()

    def budgetNaive(docs: DataFrame, budget: Long): DataFrame = {
      val scored = docs.select(
        col("source"), col("doc_id"),
        TextOps.qualityScore(col("text")).as("quality"),
        TextOps.tokenCountBpe(col("text")).cast("long").as("n_tokens"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("quality").desc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      scored.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .filter(col("cum_tokens") <= budget)
    }
    def shardNaive(docs: DataFrame, nShards: Int): DataFrame = {
      val scored = docs.select(
        col("source").as("stratum"), col("doc_id"),
        TextOps.tokenCountBpe(col("text")).cast("long").as("n_tokens"))
      val w = Window.partitionBy(col("stratum"))
        .orderBy(col("n_tokens").desc, col("doc_id").asc)
      scored.withColumn("shard",
        ((row_number().over(w) - 1) % nShards).cast("int"))
    }

    val d1 = spark.read.parquet(s"$sfDir/documents.parquet")
    val d10 = spark.read.parquet(s"$workDir/documents10.parquet")
    def time(label: String)(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime - t0) / 1e9
      println(f"[probe] $label%-32s $s%6.2f s"); s
    }
    // the scale entry points take a PRE-SCORED frame (the kernel runs
    // once, materialized — the pattern the scaladoc prescribes); probe
    // them on scored parquet so the measured ratio isolates the
    // selection machinery itself
    def score(d: DataFrame): DataFrame = d.select(
      col("source"), col("doc_id"),
      TextOps.qualityScore(col("text")).as("quality"),
      TextOps.tokenCountBpe(col("text")).cast("long").as("n_tokens"))
    // each file gated on ITS OWN existence: a run killed between the two
    // writes must not leave the probe reading a path that was never
    // (re)written on the next attempt
    val s1Path = s"$workDir/scored1.parquet"
    val s10Path = s"$workDir/scored10.parquet"
    if (!new java.io.File(s1Path).exists())
      score(d1).write.mode("overwrite").parquet(s1Path)
    if (!new java.io.File(s10Path).exists())
      score(d10).write.mode("overwrite").parquet(s10Path)
    val s1 = spark.read.parquet(s1Path)
    val s10 = spark.read.parquet(s10Path)

    // warmup
    d1.groupBy(col("source")).count().collect()
    for (round <- 1 to 2) {
      println(s"[probe] -- round $round --")
      time("budget naive 1x")(budgetNaive(d1, 800L))
      time("budget naive 10x")(budgetNaive(d10, 800L))
      time("budget bucketed 1x")(TextOps.budgetSelect(d1, "doc_id", "text", "source", 800L))
      time("budget bucketed 10x")(TextOps.budgetSelect(d10, "doc_id", "text", "source", 800L))
      time("budget scored 1x")(TextOps.budgetSelectScored(s1, 800L))
      time("budget scored 10x")(TextOps.budgetSelectScored(s10, 800L))
      time("shard naive 1x")(shardNaive(d1, 8))
      time("shard naive 10x")(shardNaive(d10, 8))
      time("shard bucketed 1x")(TextOps.shardAssign(d1, "doc_id", "text", "source", 8))
      time("shard bucketed 10x")(TextOps.shardAssign(d10, "doc_id", "text", "source", 8))
      time("shard scored 1x")(TextOps.shardAssignScored(
        s1.select(col("source").as("stratum"), col("doc_id"), col("n_tokens")), 8))
      time("shard scored 10x")(TextOps.shardAssignScored(
        s10.select(col("source").as("stratum"), col("doc_id"), col("n_tokens")), 8))
    }
    spark.stop()
  }
}
