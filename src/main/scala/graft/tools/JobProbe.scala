package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev probe: per-job wall + task time + stage callsites for ONE query
  * (2nd hot run), to localize which sub-jobs of a multi-job query eat
  * the wall. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val spark = GraftSession.local()
    spark.read.parquet(s"$dir/lineitem.parquet").groupBy("l_returnflag").count().collect()
    SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
    val jobs = mutable.ArrayBuffer[(Int, Long, Long, String)]()
    val stageInfo = mutable.Map[Int, (String, Int, Long)]()
    val jobStart = mutable.Map[Int, (Long, Seq[Int])]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobStart(js.jobId) = (js.time, js.stageInfos.map(_.stageId))
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stageInfo(si.stageId) = (si.name.take(90), si.numTasks,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, stages) = jobStart(je.jobId)
        jobs += ((je.jobId, je.time - t0, 0L,
          stages.flatMap(stageInfo.get).map { case (n, nt, ms) => s"$n[$nt tasks ${ms}ms]" }
            .mkString(" | ")))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1500)
    println(f"[job] TOTAL wall $wall%6.2f s, ${jobs.size} jobs, " +
      f"sum job wall ${jobs.map(_._2).sum / 1000.0}%6.2f s")
    jobs.sortBy(-_._2).take(25).foreach { case (id, ms, _, st) =>
      println(f"[job] #$id%3d ${ms / 1000.0}%6.2f s  $st")
    }
    spark.stop()
  }
}
