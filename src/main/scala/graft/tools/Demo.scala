package graft.tools

import org.apache.spark.sql.SparkSession
import graft.functions.GraftFunctions

/** Smoke/demo entry: exercises the graft public surface the way a user
  * would — SQL + Column API over the real testdata parquet. */
object Demo {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.registerAll(spark)

    spark.read.parquet(s"$sf/lineitem.parquet").createOrReplaceTempView("lineitem")

    println("== README example: mode over the reference test table ==")
    spark.sql(
      """SELECT graft_mode(utf8_col) AS mode_utf8, graft_mode(int64_col) AS mode_int
        |FROM VALUES ('apple',1),('banana',2),('apple',2),('orange',3),('banana',3),('apple',3),(NULL,NULL)
        |AS t(utf8_col, int64_col)""".stripMargin).show()

    println("== README example: max_by / min_by ==")
    spark.sql("SELECT max_by(x, y) AS mx, min_by(x, y) AS mn FROM VALUES (1,10),(2,5),(3,15),(4,8) AS tab(x,y)").show()

    println("== stats aggregates over real lineitem ==")
    spark.sql(
      """SELECT l_returnflag,
        |       graft_mode(l_linestatus)            AS mode_status,
        |       round(graft_kurtosis(l_quantity),6)  AS kurt,
        |       round(graft_kurtosis_pop(l_quantity),6) AS kurt_pop,
        |       round(graft_skewness(l_quantity),6)  AS skew,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin).show()

    println("== Column API over real lineitem ==")
    import GraftFunctions._
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    li.groupBy(col("l_linestatus"))
      .agg(kurtosis_samp(col("l_extendedprice")).as("k"),
           skewness_samp(col("l_extendedprice")).as("s"),
           mode_agg(col("l_returnflag")).as("m"))
      .orderBy(col("l_linestatus")).show()

    println("== explain (partial aggregation check) ==")
    spark.sql("SELECT l_returnflag, graft_kurtosis(l_quantity) FROM lineitem GROUP BY 1")
      .explain("formatted")

    spark.stop()
  }
}
