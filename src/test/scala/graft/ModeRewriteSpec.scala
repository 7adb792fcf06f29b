package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RewriteModeToTwoPhase

class ModeRewriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def sessionWithRule() = {
    val s = spark.newSession()
    graft.functions.GraftFunctions.registerAll(s)
    s.experimental.extraOptimizations = Seq(RewriteModeToTwoPhase)
    s.conf.set("spark.graft.mode.twoPhase", "true")
    s
  }

  test("rewrites grouped graft_mode into count + max_by; results unchanged") {
    val s = sessionWithRule()
    import s.implicits._
    Seq(("a", 1), ("a", 2), ("a", 2), ("a", 3), ("b", 5), ("b", 5), ("b", 4), ("b", 4))
      .toDF("k", "v").createOrReplaceTempView("t_mode_rw")
    val q = s.sql("SELECT k, graft_mode(v) AS m FROM t_mode_rw GROUP BY k")
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_mode"), optimized)
    assert(optimized.contains("max_by"), optimized)
    // values + reference tie-break (b: 4 vs 5 both twice → greatest = 5)
    assert(q.collect().map(r => (r.getString(0), r.getInt(1))).toSet == Set(("a", 2), ("b", 5)))
  }

  test("string mode rewrites to min_by with smallest-value tie-break; nulls ignored") {
    val s = sessionWithRule()
    import s.implicits._
    Seq(("g", "pear"), ("g", "apple"), ("g", "pear"), ("g", "apple"),
      ("h", null), ("h", null), ("h", "kiwi"), ("n", null))
      .toDF("k", "v").createOrReplaceTempView("t_mode_rw_s")
    val q = s.sql("SELECT k, graft_mode(v) AS m FROM t_mode_rw_s GROUP BY k")
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_mode"), optimized)
    assert(optimized.contains("min_by"), optimized)
    val res = q.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(res("g") == "apple") // tie → smallest string
    assert(res("h") == "kiwi") // nulls ignored
    assert(res("n") == null)   // all-null group → null
  }

  test("does not fire when other aggregates are present or flag off") {
    val s = sessionWithRule()
    import s.implicits._
    Seq(("a", 1)).toDF("k", "v").createOrReplaceTempView("t_mode_rw_2")
    val mixed = s.sql("SELECT k, graft_mode(v) AS m, sum(v) AS sv FROM t_mode_rw_2 GROUP BY k")
    assert(mixed.queryExecution.optimizedPlan.toString.contains("graft_mode"))

    s.conf.set("spark.graft.mode.twoPhase", "false")
    val off = s.sql("SELECT k, graft_mode(v) AS m FROM t_mode_rw_2 GROUP BY k")
    assert(off.queryExecution.optimizedPlan.toString.contains("graft_mode"))
  }
}
