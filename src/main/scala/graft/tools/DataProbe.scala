package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: how Spark reads the driver-generated testdata (schemas,
  * nanos-timestamp handling, sample rows). Not part of the library surface. */
object DataProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- Seq("events", "documents", "embeddings", "lineitem")) {
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        println(s"== $t ==")
        df.printSchema()
        df.show(3, 60)
      } catch { case e: Throwable =>
        println(s"== $t == ERR ${e.getClass.getSimpleName}: ${e.getMessage.take(300)}")
      }
    }
    spark.stop()
  }
}
