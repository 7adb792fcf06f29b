package graft.tools

import graft.GraftSession
import graft.ops.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

/**
 * Measures the PERSISTED ANN deployment shape (r14 verdict task #6):
 * build the IVF index and the PQ codes ONCE, write them via
 * [[graft.sources.Tables]], then time repeated query-batch searches
 * reading ONLY the on-disk index — the amortized number a serving
 * deployment actually pays, vs the per-query build price the gate
 * queries demonstrate. Also reports the on-disk byte ratio of PQ codes
 * vs raw vectors (the storage half of the PQ claim). Results go to
 * PLANS.md. Run: sbt "runMain graft.tools.AnnDiskProbe /root/testdata/sf0.1".
 */
object AnnDiskProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-ann-disk").toString
    val spark = GraftSession.local()

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val kCells = math.max(8, math.sqrt(n.toDouble).toInt)
    println(s"[ann-disk] corpus n=$n kCells=$kCells store=$out")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ann-disk] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    // one-time build + persist
    val (index, refit) = Similarity.buildIvfIndex(emb, "vec_id", "embedding", kCells)
    timed("ivf build+write")(Tables.writeIvfIndex(index, refit, s"$out/ivf"))
    val unit = Similarity.prepared(emb, "vec_id", "embedding")
      .filter(col("nrm") > 0)
      .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("v"))
    val (codes, codebooks) = Similarity.quantizePq(unit, "vec_id", "v", 64, 8, 32)
    timed("pq train+encode+write")(Tables.writePqIndex(codes, codebooks, s"$out/pq"))

    // amortized on-disk IVF search: repeated batches, steady-state =
    // runs 2+ (run 1 pays codegen)
    for (i <- 1 to 3) {
      timed(s"ivf disk search (run $i)") {
        Similarity.annIvfSearchOnDisk(spark, s"$out/ivf",
          col("vec_id") % 100 === i, nprobe = 2)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // amortized on-disk ADC search over the persisted codes
    val (codesD, cbD) = Tables.readPqIndex(spark, s"$out/pq")
    val queries = unit.filter(col("vec_id") < 10)
    for (i <- 1 to 3) {
      timed(s"pq disk ADC search (run $i)") {
        Similarity.annPq(codesD, cbD, queries, 64, 8, 5)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // residual IVFADC: build+persist once, amortized pruned ADC search
    val (rcodes, rrefit, rbooks) =
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", 64, 8, 32, kCells)
    timed("ivfpq build+write")(
      Tables.writeIvfPqIndex(rcodes, rrefit, rbooks, s"$out/ivfpq"))
    for (i <- 1 to 3) {
      timed(s"ivfpq disk search (run $i)") {
        Similarity.annIvfPqSearchOnDisk(spark, s"$out/ivfpq",
          unit.filter(col("vec_id") % 100 === i), 64, 8, nprobe = 2, topK = 5)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // storage ratio: PQ codes vs the raw vector column on disk
    def dirBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
        else if (f.getName.endsWith(".parquet")) f.length else 0L
      walk(new java.io.File(p))
    }
    val cb = dirBytes(s"$out/pq/codes")
    val vbFile = new java.io.File(s"$dir/embeddings.parquet")
    val rawBytes =
      if (vbFile.isFile) vbFile.length else dirBytes(vbFile.getPath)
    println(f"[ann-disk] bytes: pq codes=$cb raw vectors=$rawBytes " +
      f"ratio=${rawBytes.toDouble / cb}%.1fx")
    spark.stop()
  }
}
