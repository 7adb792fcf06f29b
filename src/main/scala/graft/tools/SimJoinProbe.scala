package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: stage-level timings for similarityJoinExact at a given
  * sf dir — which of (df join+window, candidates, verify) dominates. */
object SimJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    val docs = spark.read.parquet(args(0) + "/documents.parquet")
    import org.apache.spark.sql.expressions.Window
    val (tNum, tDen) = (1, 2)
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[simj] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    val dtok = docs.select(col("doc_id"),
      explode(array_distinct(graft.ops.TextOps.tokenShingles(col("text")))).as("token"))
    val freq = dtok.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val staged = dtok.join(freq, "token").repartition(col("doc_id"))
    val byDoc = Window.partitionBy(col("doc_id"))
    val ranked = staged
      .withColumn("rn", row_number().over(byDoc.orderBy(col("df").asc, col("token").asc)))
      .withColumn("n", count(lit(1)).over(byDoc))
      .withColumn("pfx_len", col("n") - expr(s"($tNum * n + ${tDen - 1}) div $tDen") + lit(1L))
    val prefixes = ranked.filter(col("rn") <= col("pfx_len"))
      .select(col("doc_id"), col("token"), col("n")).repartition(col("token"))
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id") &&
        col("a.n") * tDen >= col("b.n") * tNum && col("b.n") * tDen >= col("a.n") * tNum)
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2")).distinct()
    val sets = staged.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("token"))).as("toks"), count(lit(1)).as("n"))
    time("staged")(staged.count())
    time("ranked+prefix")(prefixes.count())
    time("candidates")(cand.count())
    time("sets")(sets.count())
    val j = cand
      .join(sets.select(col("doc_id").as("id1"), col("toks").as("t1"), col("n").as("n1")), "id1")
      .join(sets.select(col("doc_id").as("id2"), col("toks").as("t2"), col("n").as("n2")), "id2")
      .withColumn("inter", size(array_intersect(col("t1"), col("t2"))).cast("long"))
      .withColumn("un", col("n1") + col("n2") - col("inter"))
      .filter(col("inter") * tDen >= col("un") * tNum)
    time("full (verify)")(j.count())
    time("full (2nd run)")(j.count())
    spark.stop()
  }
}
