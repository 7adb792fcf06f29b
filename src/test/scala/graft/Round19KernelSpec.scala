package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** r19: unit pins for the four r18 hot-path kernels (the r18 verdict
  * shipped them spec-less) — null/mismatch edges, codegen ==
  * interpreted, and the NearestSeed lazy-seedNorms cache contract. */
class Round19KernelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import graft.functions.{ArrayDivScalar, NearestSeed, SortedIntersectCount, ZipArith}

  private def sic(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  // ---- SortedIntersectCount -------------------------------------------

  test("SortedIntersectCount == size(array_intersect) on sorted distinct arrays (codegen path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      def arr() = (0 until rnd.nextInt(12)).map(_ => s"t${rnd.nextInt(20)}")
        .distinct.sorted
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
      .select(sic(col("a"), col("b")).as("merge"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
    assert(df.filter(col("merge") =!= col("builtin")).count() === 0)
  }

  test("SortedIntersectCount: nulls, empties, duplicate runs") {
    val aT = ArrayType(StringType)
    def lit(v: Any) = org.apache.spark.sql.catalyst.expressions.Literal.create(v, aT)
    def run(a: Any, b: Any): Any =
      SortedIntersectCount(lit(a), lit(b)).eval(InternalRow.empty)
    assert(run(null, Seq("a")) === null)
    assert(run(Seq("a"), null) === null)
    assert(run(Seq(), Seq("a")) === 0L)
    assert(run(Seq("a", "b"), Seq()) === 0L)
    // duplicate runs count once — array_intersect's distinct semantics
    assert(run(Seq("a", "a", "b"), Seq("a", "b", "b", "c")) === 2L)
    assert(run(Seq("a", "b", "c"), Seq("b")) === 1L)
  }

  test("SortedIntersectCount: interpreted eval == codegen result on a spot sample") {
    import spark.implicits._
    val a = Seq("a", "c", "d", "f"); val b = Seq("b", "c", "f", "g")
    val interp = SortedIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(a, ArrayType(StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(b, ArrayType(StringType)))
      .eval(InternalRow.empty)
    val fromDf = Seq((a, b)).toDF("a", "b")
      .select(sic(col("a"), col("b"))).head.getLong(0)
    assert(interp === 2L && fromDf === 2L)
  }

  // ---- ArrayDivScalar --------------------------------------------------

  test("ArrayDivScalar == transform HOF division; null array/scalar -> null") {
    import spark.implicits._
    val df = Seq((Seq(1.0, -2.5, 0.0, 3.75), 1.6), (Seq.empty[Double], 2.0))
      .toDF("v", "s")
    val out = df.select(
      ColumnBridge.column(ArrayDivScalar(
        ColumnBridge.expression(col("v")), ColumnBridge.expression(col("s")))).as("k"),
      transform(col("v"), x => x / col("s")).as("hof")).collect()
    out.foreach { r =>
      assert(r.getSeq[Double](0) === r.getSeq[Double](1)) }
    val nulls = df.select(
      ColumnBridge.column(ArrayDivScalar(
        ColumnBridge.expression(org.apache.spark.sql.functions.lit(null)
          .cast("array<double>")),
        ColumnBridge.expression(col("s")))).as("na"),
      ColumnBridge.column(ArrayDivScalar(
        ColumnBridge.expression(col("v")),
        ColumnBridge.expression(org.apache.spark.sql.functions.lit(null)
          .cast("double")))).as("ns")).collect()
    nulls.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
  }

  test("ArrayDivScalar: null ELEMENT throws (both eval paths)") {
    // interpreted
    val e = ArrayDivScalar(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq[java.lang.Double](1.0, null), ArrayType(DoubleType, containsNull = true)),
      org.apache.spark.sql.catalyst.expressions.Literal(2.0))
    val ex = intercept[IllegalArgumentException] { e.eval(InternalRow.empty) }
    assert(ex.getMessage.contains("null element"))
    // codegen (through a DataFrame projection)
    import spark.implicits._
    val thrown = intercept[Throwable] {
      Seq(1).toDF("x").select(ColumnBridge.column(ArrayDivScalar(
        ColumnBridge.expression(array(lit(1.0), lit(null).cast("double"))),
        ColumnBridge.expression(lit(2.0))))).collect()
    }
    def rootChain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(rootChain(thrown).exists(c =>
      c.isInstanceOf[IllegalArgumentException] &&
        c.getMessage.contains("null element")))
  }

  // ---- ZipArith --------------------------------------------------------

  test("ZipArith == zip_with on dense vectors; length mismatch and null element throw") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, -3.5), Seq(0.5, -1.0, 4.25))).toDF("a", "b")
    val out = df.select(
      ColumnBridge.column(ZipArith(ColumnBridge.expression(col("a")),
        ColumnBridge.expression(col("b")), add = true)).as("kadd"),
      zip_with(col("a"), col("b"), (x, y) => x + y).as("hadd"),
      ColumnBridge.column(ZipArith(ColumnBridge.expression(col("a")),
        ColumnBridge.expression(col("b")), add = false)).as("ksub"),
      zip_with(col("a"), col("b"), (x, y) => x - y).as("hsub")).head
    assert(out.getSeq[Double](0) === out.getSeq[Double](1))
    assert(out.getSeq[Double](2) === out.getSeq[Double](3))

    def arrLit(v: Any) = org.apache.spark.sql.catalyst.expressions.Literal
      .create(v, ArrayType(DoubleType, containsNull = true))
    val mism = intercept[IllegalArgumentException] {
      ZipArith(arrLit(Seq(1.0)), arrLit(Seq(1.0, 2.0)), add = true)
        .eval(InternalRow.empty)
    }
    assert(mism.getMessage.contains("length mismatch"))
    val nel = intercept[IllegalArgumentException] {
      ZipArith(arrLit(Seq[java.lang.Double](1.0, null)),
        arrLit(Seq[java.lang.Double](1.0, 2.0)), add = false)
        .eval(InternalRow.empty)
    }
    assert(nel.getMessage.contains("null element"))
  }

  // ---- NearestSeed -----------------------------------------------------

  private def mkRow(vec: Array[Double], nrm: Double,
      seeds: AnyRef, norms: AnyRef): InternalRow =
    new GenericInternalRow(Array[Any](new GenericArrayData(vec), nrm, seeds, norms))

  private def nsExpr(subOffset: Int = -1, subLen: Int = -1,
      augBias: Boolean = false) = NearestSeed(
    BoundReference(0, ArrayType(DoubleType), nullable = true),
    BoundReference(1, DoubleType, nullable = true),
    BoundReference(2, ArrayType(ArrayType(DoubleType)), nullable = true),
    BoundReference(3, ArrayType(DoubleType), nullable = true),
    subOffset, subLen, augBias)

  private def seedsData(m: Array[Array[Double]]): GenericArrayData =
    new GenericArrayData(m.map(new GenericArrayData(_)).toArray[Any])

  test("NearestSeed SUBSPACE mode: dot over the slice + bias, fold-order identical to the aug-query form") {
    // seeds are AUGMENTED subspace codewords [c0, c1, -(c·c)/2]; query
    // subspace = vec[2..4) with implicit +1.0 aug component
    val seeds = Array(Array(1.0, 0.0, -0.5), Array(0.25, -1.0, -0.53125))
    val sd = seedsData(seeds)
    val norms = new GenericArrayData(Array(1.0, 1.0))
    val e = nsExpr(subOffset = 2, subLen = 2, augBias = true)
    val v = Array(9.0, 9.0, 0.3, -0.9) // subvector (0.3, -0.9)
    val got = e.eval(mkRow(v, 1.0, sd, norms)).asInstanceOf[Int]
    // reference: argmax_p round6(dot(concat(sub,[1]), seed_p)) (unit norms)
    val scores = seeds.map { s =>
      val raw = 0.3 * s(0) + (-0.9) * s(1) + 1.0 * s(2)
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = scores.zipWithIndex.maxBy { case (sc, i) => (sc, -i) }._2
    assert(got === want)
  }

  test("NearestSeed lazy seedNorms CONTRACT: warm cache ignores a changed seedNorms until the matrix changes") {
    val m1 = seedsData(Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val e = nsExpr()
    val norms = new GenericArrayData(Array(1.0, 1.0))
    val r1 = e.eval(mkRow(Array(0.9, 0.1), 1.0, m1, norms))
    assert(r1 === 0)
    // SAME matrix instance, seedNorms now NULL: the cache is warm, so
    // seedNorms is never consulted — computed result, not null. This is
    // exactly why seedNorms must be a pure function of seedVecs.
    val r2 = e.eval(mkRow(Array(0.1, 0.9), 1.0, m1, null))
    assert(r2 === 1)
    // DIFFERENT matrix: cache miss -> seedNorms IS consulted -> null in,
    // null out.
    val m2 = seedsData(Array(Array(1.0, 0.0), Array(0.5, 0.5)))
    val r3 = e.eval(mkRow(Array(0.1, 0.9), 1.0, m2, null))
    assert(r3 === null)
  }
}
