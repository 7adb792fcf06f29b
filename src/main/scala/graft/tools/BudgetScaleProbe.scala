package graft.tools

import org.apache.spark.sql.DataFrame
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

    import ProbeSupport.{budgetNaive, shardNaive}

    val d1 = spark.read.parquet(s"$sfDir/documents.parquet")
    val d10 = spark.read.parquet(s"$workDir/documents10.parquet")
    def time(label: String)(df: => DataFrame): Double =
      ProbeSupport.time("probe", label)(ProbeSupport.noop(df))
    // the scale entry points take a PRE-SCORED frame (the kernel runs
    // once, materialized — the pattern the scaladoc prescribes); probe
    // them on scored parquet so the measured ratio isolates the
    // selection machinery itself
    def score(d: DataFrame): DataFrame = d.select(
      col("source"), col("doc_id"),
      TextOps.qualityScore(col("text")).as("quality"),
      TextOps.tokenCountBpe(col("text")).cast("long").as("n_tokens"))
    val s1 = ProbeSupport.materialize(spark, s"$workDir/scored1.parquet", score(d1))
    val s10 = ProbeSupport.materialize(spark, s"$workDir/scored10.parquet", score(d10))

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
