package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Persisted, incrementally-maintained PageRank over a growing link
 * graph (r20) — the serving store that closes the streaming link-graph
 * loop: [[graft.streaming.EventStreams.pageRankMaintainStream]] feeds
 * each micro-batch of edges through
 * [[graft.ops.Graph.pageRankWeightedDeltaHistory]], so ranking a
 * growing crawl costs the delta's reach per batch, not a full
 * 5-iteration recompute (the r17 verdict's stated gap).
 *
 * Layout under `path`:
 *   - `edges/b<k>/`   append-only edge batches (src, dst, w) — the
 *                     graph itself; never rewritten, never pruned
 *   - `hist/v<n>/`    per-version full iteration history (node, iter,
 *                     r) — what the NEXT delta chains off
 *   - `_manifests/manifest-<c>`  atomic commit marker (write tmp +
 *                     rename, the [[Tables]] convention): the commit
 *                     sequence; each records WHICH history version it
 *                     points at, how many edge batches that history
 *                     covers, the iteration count, and the last
 *                     applied streaming batchId (an empty replayed
 *                     batch advances the high-water mark without
 *                     minting a new history — pointer and history
 *                     version are deliberately decoupled)
 *
 * Crash semantics: the manifest commits LAST. A crash after the edge
 * batch or history write leaves orphans no manifest points to; the
 * retry overwrites them (edge batch k and history v(n+1) are
 * deterministic names derived from the manifest, written with
 * overwrite). Readers resolve the max manifest only — never a half
 * commit. Exactly-once under Structured Streaming restart replays:
 * `appendDelta` is a no-op for any `batchId` at or below the recorded
 * high-water mark.
 */
object RankStore {

  /** One committed store state: `hist/v<histVersion>` covers edge
    * batches `edges/b0 .. b<nBatches-1>`; `commitSeq` is the manifest
    * sequence number (≥ histVersion — empty streamed batches advance
    * the sequence and the batchId mark without a new history). */
  final case class RankManifest(commitSeq: Int, histVersion: Int,
      nBatches: Int, iters: Int, lastBatchId: Long)

  private def manifestDir(path: String) = s"$path/_manifests"
  private val ManifestName = "manifest-([0-9]+)".r

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Current committed manifest, or None if the store is uninitialized. */
  def currentManifest(spark: SparkSession, path: String): Option[RankManifest] = {
    val md = new Path(manifestDir(path))
    val f = fs(spark, path)
    if (!f.exists(md)) return None
    val vs = f.listStatus(md).toSeq.map(_.getPath.getName).collect {
      case ManifestName(n) => n.toInt
    }
    if (vs.isEmpty) return None
    val c = vs.max
    val in = f.open(new Path(md, s"manifest-$c"))
    val body =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val kv = body.linesIterator.filter(_.contains('='))
      .map { l => val a = l.split("=", 2); (a(0).trim, a(1).trim) }.toMap
    Some(RankManifest(c, kv("hist").toInt, kv("batches").toInt,
      kv("iters").toInt, kv("lastBatchId").toLong))
  }

  private def commit(spark: SparkSession, path: String, m: RankManifest): Unit = {
    val f = fs(spark, path)
    f.mkdirs(new Path(manifestDir(path)))
    val tmp = new Path(manifestDir(path), s".manifest-${m.commitSeq}.tmp")
    val out = f.create(tmp, true)
    try out.write(
      (s"hist=${m.histVersion}\nbatches=${m.nBatches}\niters=${m.iters}\n" +
        s"lastBatchId=${m.lastBatchId}\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(f.rename(tmp,
      new Path(manifestDir(path), s"manifest-${m.commitSeq}")),
      s"manifest commit rename failed for seq ${m.commitSeq} under $path")
  }

  /** Bootstrap the store: edge batch b0 + history v0 + manifest. */
  def init(spark: SparkSession, path: String, edges: DataFrame,
      iters: Int = 5): RankManifest = {
    require(currentManifest(spark, path).isEmpty,
      s"rank store already initialized under $path")
    edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .write.mode("overwrite").parquet(s"$path/edges/b0")
    val stored = spark.read.parquet(s"$path/edges/b0")
    graft.ops.Graph.pageRankWeightedHistory(stored, iters)
      .write.mode("overwrite").partitionBy("iter").parquet(s"$path/hist/v0")
    val m = RankManifest(0, 0, 1, iters, -1L)
    commit(spark, path, m)
    m
  }

  /** The manifest-covered edge batches of the CURRENT version (orphan
    * batch directories from crashed appends are invisible by design). */
  def edges(spark: SparkSession, path: String): DataFrame = {
    val m = currentManifest(spark, path).getOrElse(
      sys.error(s"no committed rank-store version under $path"))
    spark.read.parquet((0 until m.nBatches).map(k => s"$path/edges/b$k"): _*)
  }

  /** Current final ranks (node, rank_micro) — the serving read. */
  def ranks(spark: SparkSession, path: String): DataFrame = {
    val m = currentManifest(spark, path).getOrElse(
      sys.error(s"no committed rank-store version under $path"))
    spark.read.parquet(s"$path/hist/v${m.histVersion}")
      .filter(col("iter") === m.iters)
      .select(col("node"), col("r").as("rank_micro"))
  }

  /**
   * Apply one delta edge batch: append it as the next edge batch,
   * chain the history through the exact delta update, commit the next
   * version, prune histories beyond `keepVersions`. Returns false
   * (bit-exact store no-op) for an already-applied `batchId` (≤ the
   * stored high-water mark — the streaming-restart replay guard) and
   * for an empty delta (which only advances the high-water mark);
   * `batchId = -1` means "not from a stream", always applied.
   */
  def appendDelta(spark: SparkSession, path: String, delta: DataFrame,
      batchId: Long = -1L, keepVersions: Int = 2): Boolean = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val m = currentManifest(spark, path).getOrElse(
      sys.error(s"no committed rank-store version under $path — init first"))
    if (batchId >= 0 && batchId <= m.lastBatchId) return false
    val d = delta.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .filter(col("w") > 0)
    if (d.isEmpty) {
      if (batchId > m.lastBatchId)
        commit(spark, path,
          m.copy(commitSeq = m.commitSeq + 1, lastBatchId = batchId))
      return false
    }
    d.write.mode("overwrite").parquet(s"$path/edges/b${m.nBatches}")
    val storedDelta = spark.read.parquet(s"$path/edges/b${m.nBatches}")
    val oldEdges = spark.read.parquet(
      (0 until m.nBatches).map(k => s"$path/edges/b$k"): _*)
    val oldHist = spark.read.parquet(s"$path/hist/v${m.histVersion}")
    val nextHist = m.histVersion + 1
    graft.ops.Graph
      .pageRankWeightedDeltaHistory(oldEdges, oldHist, storedDelta, m.iters)
      .write.mode("overwrite").partitionBy("iter")
      .parquet(s"$path/hist/v$nextHist")
    commit(spark, path, RankManifest(m.commitSeq + 1, nextHist,
      m.nBatches + 1, m.iters, math.max(batchId, m.lastBatchId)))
    val f = fs(spark, path)
    (0 to nextHist - keepVersions).foreach { old =>
      f.delete(new Path(s"$path/hist/v$old"), true)
    }
    (0 until m.commitSeq + 2 - keepVersions).foreach { old =>
      f.delete(new Path(manifestDir(path), s"manifest-$old"), false)
    }
    true
  }
}
