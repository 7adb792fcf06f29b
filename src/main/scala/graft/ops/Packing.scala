package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/**
 * Greedy sequence packing — the step that turns a cleaned document corpus
 * into fixed-budget training sequences (context windows): walk documents
 * in a deterministic order and open a new sequence whenever the next
 * document would overflow the token budget.
 *
 * Packing is inherently sequential (each decision depends on every prior
 * one), so it cannot be a window function. The scalable shape is
 * shard-parallelism:
 *
 *   1. shard = md5(doc_id) mod `shards` — narrow, deterministic,
 *      hash-uniform, stable under corpus growth;
 *   2. ONE shuffle: repartition by shard + sortWithinPartitions
 *      (shard, doc_id) — shards arrive contiguous and ordered;
 *   3. mapPartitions runs the greedy fold as a pure ITERATOR pass:
 *      O(1) state (current shard, running token count, sequence counter),
 *      nothing collected, arbitrarily large shards stream through.
 *
 * At 100 TB: shards ≈ a few × total cores; each task packs its shards
 * independently; the result is reproducible because both the shard
 * assignment and the in-shard order are data-determined, not
 * partitioning-determined.
 */
object Packing {

  /**
   * Pack `(idCol, nTokCol)` rows into sequences of at most `budget`
   * tokens per shard (greedy, in doc-id order). A document longer than
   * the budget gets a sequence of its own. Returns
   * (doc_id, shard, seq_idx) with seq_idx counted per shard.
   */
  def packSequences(df: DataFrame, idCol: String, nTokCol: String,
      budget: Int, shards: Int): DataFrame = {
    require(budget > 0, s"budget must be > 0, got $budget")
    require(shards > 0, s"shards must be > 0, got $shards")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("shard", IntegerType, nullable = false),
      StructField("seq_idx", IntegerType, nullable = false)))
    val prepared = df
      // a null id or token count cannot be packed — drop up front rather
      // than NPE inside the iterator pass with an opaque task failure
      .filter(col(idCol).isNotNull && col(nTokCol).isNotNull)
      .select(
        col(idCol).cast("long").as("doc_id"),
        col(nTokCol).cast("int").as("ntok"),
        (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long")
          % shards).cast("int").as("shard"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
    prepared.mapPartitions { rows =>
      var curShard = Int.MinValue
      var running = 0L
      var seq = 0
      rows.map { r =>
        val id = r.getLong(0)
        val ntok = r.getInt(1)
        val shard = r.getInt(2)
        if (shard != curShard) { // first doc of a (contiguous, sorted) shard
          curShard = shard
          running = ntok.toLong
          seq = 0
        } else if (running + ntok > budget) { // would overflow: new sequence
          running = ntok.toLong
          seq += 1
        } else {
          running += ntok
        }
        Row(id, shard, seq)
      }
    }(RowEncoder.encoderFor(outSchema))
  }
}
