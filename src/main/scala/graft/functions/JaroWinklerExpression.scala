package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Classic Jaro-Winkler kernel over UTF-8 BYTES: match window
 * max(l1,l2)/2 − 1, Winkler prefix boost up to 4 bytes at scale 0.1
 * applied only when jaro > 0.7, both-empty/one-empty → 0.0 — the exact
 * contract of DuckDB's `jaro_winkler_similarity` (engine-replayable on
 * any input; for ASCII, bytes ≡ characters). A static method so
 * [[JaroWinkler]]'s generated code calls it directly inside
 * whole-stage codegen.
 */
object JaroWinklerKernel {
  def similarity(s1: UTF8String, s2: UTF8String): Double = {
    val a = s1.getBytes
    val b = s2.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (java.util.Arrays.equals(a, b)) return 1.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var unmatched = true
      while (j <= hi && unmatched) {
        if (!bm(j) && a(i) == b(j)) {
          am(i) = true; bm(j) = true; m += 1; unmatched = false
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // half-transpositions: walk both matched sequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxP = math.min(4, math.min(la, lb))
    while (l < maxP && a(l) == b(l)) l += 1
    jaro + 0.1 * l * (1.0 - jaro)
  }
}

/**
 * Native Jaro-Winkler similarity expression — the fuzzy-matching
 * complement to Spark's built-in `levenshtein` for record linkage /
 * near-key joins (block first, score candidates with this). Full
 * `doGenCode`: the kernel call inlines into whole-stage codegen (no
 * CodegenFallback row boxing in the hot candidate-scoring loop).
 */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got " +
          s"${a.catalogString}, ${b.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinklerKernel.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
