package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scale

class ScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // heavily skewed: key "hot" holds 10k of 10.1k rows
  private def skewed = ((1 to 10000).map(i => ("hot", i.toDouble)) ++
    (1 to 100).map(i => (s"k$i", i.toDouble))).toDF("k", "v").repartition(8)

  test("saltedSumCount equals plain groupBy aggregation") {
    val plain = skewed.groupBy("k").agg(
      org.apache.spark.sql.functions.sum($"v").as("sum_v"),
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Scale.saltedSumCount(skewed, Seq("k"), "v", 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted stage-1 actually fans the hot key out over several groups") {
    import org.apache.spark.sql.functions._
    val fanout = skewed.withColumn("__salt", pmod(spark_partition_id(), lit(8)))
      .filter($"k" === "hot").select("__salt").distinct().count()
    assert(fanout > 1)
  }

  test("saltedShuffleJoin equals plain join") {
    val dim = (Seq("hot") ++ (1 to 100).map(i => s"k$i")).zipWithIndex.toDF("k", "dim_id")
    val plain = skewed.join(dim, "k")
      .groupBy("k").count().collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Scale.saltedShuffleJoin(skewed, dim, "k", 8)
      .groupBy("k").count().collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }
}
