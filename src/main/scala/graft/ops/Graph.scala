package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph analytics over near-duplicate pair graphs — the
 * companion to [[Dedup.connectedComponents]]: where CC answers "which
 * docs form one duplicate cluster", PageRank ranks docs by how central
 * they are in the duplication structure (a high-rank doc is boilerplate
 * shared by many near-dups — a better removal candidate than an edge
 * member).
 */
object Graph {

  /**
   * Fixed-iteration PageRank in EXACT INTEGER micro-units, damping
   * 0.85 expressed as ×17/20 integer arithmetic:
   *
   *   r₀(v) = 1 000 000
   *   rₜ₊₁(v) = 150 000 + Σ_{u∼v} (rₜ(u)·17) div (20·deg(u))
   *
   * Every operation is exact long arithmetic — the result is
   * bit-identical under ANY partitioning and in any engine (the DuckDB
   * oracle replays it with a recursive CTE carrying an iteration
   * counter), unlike double-accumulated PageRank where neighbor sum
   * order changes low bits.
   *
   * Scale shape: per iteration, one join of the (src, dst) edge list
   * against the O(|V|) rank table (both hash-partitioned on the join
   * key) + one dst-keyed sum — the classic two-shuffle PR round, no
   * broadcast of anything unbounded. `localCheckpoint` truncates
   * lineage per round (same as CC). Nodes outside `pairs` are excluded
   * (an isolated node's rank is the constant 150 000 — uninformative).
   *
   * `pairs` (id1, id2) is treated UNDIRECTED: each pair contributes
   * both directed edges; deg(u) = #neighbors of u.
   */
  def pageRank(pairs: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50], got $iters")
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .union(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct()
      .localCheckpoint(eager = true)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, "src").localCheckpoint(eager = true)
    var rank = deg.select(col("src").as("doc_id"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      rank = withDeg
        .join(rank, withDeg("src") === rank("doc_id"))
        // `div` = integer division (Column./ would be a double divide)
        .select(col("dst"), expr("(r * 17L) div (20L * deg)").as("c"))
        .groupBy(col("dst"))
        .agg((lit(150000L) + sum(col("c"))).as("r"))
        .select(col("dst").as("doc_id"), col("r"))
        .localCheckpoint(eager = true)
    }
    rank.select(col("doc_id"), col("r").as("rank_micro"))
  }
}
