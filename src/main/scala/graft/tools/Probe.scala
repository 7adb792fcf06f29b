package graft.tools

import org.apache.spark.sql.SparkSession
import graft.functions.GraftFunctions

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.registerAll(spark)

    def tryQ(label: String, q: String): Unit =
      try println(s"[$label] OK -> " + spark.sql(q).collect().mkString(","))
      catch { case e: Throwable => println(s"[$label] ERR -> ${e.getClass.getSimpleName}: ${e.getMessage.take(200)}") }

    tryQ("arity-2-kurtosis", "SELECT graft_kurtosis(x, x) FROM VALUES (1.0) t(x)")
    tryQ("arity-0-mode", "SELECT graft_mode() FROM VALUES (1.0) t(x)")
    tryQ("mode-on-array", "SELECT graft_mode(array(1,2)) FROM VALUES (1) t(x)")
    tryQ("mode-on-bool", "SELECT graft_mode(b) FROM VALUES (true),(true),(false) t(b)")
    tryQ("mode-decimal", "SELECT graft_mode(d) FROM VALUES (CAST(1.5 AS DECIMAL(5,2))),(CAST(1.5 AS DECIMAL(5,2))),(CAST(2.5 AS DECIMAL(5,2))) t(d)")
    tryQ("kurtosis-string-input", "SELECT graft_kurtosis(s) FROM VALUES ('1'),('2'),('3'),('4'),('oops') t(s)")
    tryQ("kurtosis-nan", "SELECT graft_kurtosis(x) FROM VALUES (1.0),(2.0),(cast('NaN' as double)),(3.0),(4.0) t(x)")
    tryQ("mode-distinct", "SELECT graft_mode(DISTINCT x) FROM VALUES (1),(1),(2) t(x)")
    tryQ("kurtosis-filter", "SELECT graft_kurtosis(x) FILTER (WHERE x < 100) FROM VALUES (1.0),(2.0),(3.0),(4.0),(5.0),(1000.0) t(x)")
    spark.stop()
  }
}
