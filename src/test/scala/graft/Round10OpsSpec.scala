package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.ops.Sketches

/** Round-10 hardening: library operators must be immune to the
  * `registerReferenceNames` max_by/min_by session shadowing (the
  * reference's null-key-WINS semantics, max_min_by.rs:99,196). On
  * Spark 4, `functions.max_by` is `Column.fn("max_by", …)` — resolved
  * by NAME through the session registry — so any library call site on
  * the name-resolved built-in silently flips semantics in a shadowed
  * session. These specs pin the fix: all library call sites build the
  * Catalyst MinBy/MaxBy nodes directly. */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def valuesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    (1 to 1000).map(_.toDouble).toDF("v")
  }

  private def sketch(s: SparkSession): Seq[Any] =
    Sketches.quantileSketch(valuesDf(s), "v", 0.0, 1001.0, 64,
      Seq(("p50", 0.5), ("p95", 0.95))).collect().head.toSeq

  private def shadowedSession(): SparkSession = {
    val s2 = spark.newSession()
    GraftFunctions.registerReferenceNames(s2)
    // prove the shadowing is ACTIVE: SQL max_by must now return the
    // NULL-ordering-key row (reference semantics), where Spark's
    // built-in would ignore it and return 1
    val probe = s2.sql(
      "SELECT max_by(x, y) AS m FROM VALUES (1, 10), (2, CAST(NULL AS INT)), (3, 5) AS t(x, y)")
      .collect().head.getInt(0)
    assert(probe == 2, s"registerReferenceNames shadowing not active (got $probe)")
    s2
  }

  test("quantileSketch is identical under registerReferenceNames shadowing") {
    val plain = sketch(spark)
    assert(sketch(shadowedSession()) == plain)
  }

  test("quantileSketchGrouped is identical under registerReferenceNames shadowing") {
    def grouped(s: SparkSession): Set[Seq[Any]] = {
      import s.implicits._
      val df = (1 to 600).map(i => (s"g${i % 3}", i.toDouble)).toDF("k", "v")
      Sketches.quantileSketchGrouped(df, Seq("k"), "v", 0.0, 601.0, 32,
        Seq(("p50", 0.5))).collect().map(_.toSeq).toSet
    }
    assert(grouped(shadowedSession()) == grouped(spark))
  }

  test("GraftFunctions.max_by/min_by keep null-ignoring semantics when shadowed") {
    def run(s: SparkSession): (Long, Long) = {
      import s.implicits._
      val df = Seq((1L, Some(10L)), (2L, None: Option[Long]), (3L, Some(5L)))
        .toDF("x", "y")
      val r = df.agg(
        GraftFunctions.max_by(col("x"), col("y")).as("mx"),
        GraftFunctions.min_by(col("x"), col("y")).as("mn")).collect().head
      (r.getLong(0), r.getLong(1))
    }
    // null-y row ignored in BOTH sessions: max at y=10 -> 1, min at y=5 -> 3
    assert(run(spark) == ((1L, 3L)))
    assert(run(shadowedSession()) == ((1L, 3L)))
  }
}
