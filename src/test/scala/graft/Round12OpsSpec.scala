package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextOps

/** Round-12: the distributed budgetSelect/shardAssign rewrites must be
  * ANSWER-IDENTICAL to the single-window forms they replaced — proven
  * against the naive form on the real sf0.001 documents table, not on a
  * toy frame, so quality ties, punctuation-only docs and every source
  * partition exercise the bucket decomposition. */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  /** The r11 single-window reference implementation of budgetSelect. */
  private def budgetNaive(budget: Long) = {
    val scored = docs.select(
      col("source"), col("doc_id"),
      TextOps.qualityScore(col("text")).as("quality"),
      TextOps.tokenCountBpe(col("text")).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** The r11 single-window reference implementation of shardAssign. */
  private def shardNaive(nShards: Int) = {
    val scored = docs.select(
      col("source").as("stratum"), col("doc_id"),
      TextOps.tokenCountBpe(col("text")).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("stratum"))
      .orderBy(col("n_tokens").desc, col("doc_id").asc)
    scored.withColumn("shard",
      ((row_number().over(w) - 1) % nShards).cast("int"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val names = df.columns.sorted
    df.select(names.map(col): _*).collect().map(_.toString).toSet
  }

  test("budgetSelect: bucket-decomposed form is row-identical to the single-window form") {
    // several budgets: 0 (empty), mid (straddling bucket exercised),
    // huge (every bucket below the cut — max broadcast frame)
    for (b <- Seq(0L, 300L, 800L, 5000L, 10000000L)) {
      assert(rows(TextOps.budgetSelect(docs, "doc_id", "text", "source", b))
        == rows(budgetNaive(b)), s"budget=$b")
    }
  }

  test("shardAssign: bucket-decomposed form is row-identical to the single-window form") {
    for (n <- Seq(1, 4, 8, 31)) {
      assert(rows(TextOps.shardAssign(docs, "doc_id", "text", "source", n))
        == rows(shardNaive(n)), s"nShards=$n")
    }
  }
}
