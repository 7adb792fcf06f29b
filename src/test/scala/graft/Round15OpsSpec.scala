package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Stats

/** Round-15 work: the fused PoissonWeights bootstrap kernel
  * (bit-identity against the expression ladder it replaced), q_project
  * gate-shape guards, and oracle NULL-placement contracts. */
class Round15OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- PoissonWeights kernel ----

  test("PoissonWeights: bit-identical to the conv/substring/CASE md5 ladder") {
    // the ladder the kernel replaced — every oracle still replays this
    // SQL form, so the kernel must match it EXACTLY on every id
    val cdf = graft.functions.PoissonWeightsKernel.Cdf
    val reps = 32
    val ids = (0 until 500).map(i => s"user_$i") ++
      Seq("", "0", "漢字", "a b c", "-1", "9223372036854775807")
    val df = ids.toDF("id")
    def ladder(r: Int) = {
      val u = (conv(substring(md5(concat(col("id"), lit(s"_${r / 4}"))),
        1 + 8 * (r % 4), 8), 16, 10).cast("double") + lit(0.5)) /
        lit(4294967296.0)
      cdf.zipWithIndex.foldRight(lit(8L): org.apache.spark.sql.Column) {
        case ((t, k), rest) => when(u < t, lit(k.toLong)).otherwise(rest)
      }
    }
    val kcol = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.PoissonWeights(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("id")), reps))
    val rows = df.select(col("id"), kcol.as("kw"),
      array((0 until reps).map(ladder): _*).as("lw")).collect()
    assert(rows.length == ids.size)
    rows.foreach { r =>
      val kw = r.getSeq[Long](1)
      val lw = r.getSeq[Long](2)
      assert(kw == lw, s"id=${r.getString(0)}: kernel $kw != ladder $lw")
    }
    // sanity: weights use the full support (0 and >= 3 both occur)
    val flat = rows.flatMap(_.getSeq[Long](1))
    assert(flat.contains(0L) && flat.exists(_ >= 3L))
    assert(flat.forall(w => w >= 0L && w <= 8L))
  }

  test("PoissonWeights: null id -> null; mean weight ~ 1 (Poisson(1))") {
    val df = Seq(Some("a"), None, Some("b")).toDF("id")
    val kcol = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.PoissonWeights(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("id")), 8))
    val rows = df.select(kcol.as("w")).collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    val mean = (0 until 2000).map(i => s"u$i").toDF("id")
      .select(explode(org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.PoissonWeights(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("id")), 4))
        .as("w")).as("x"))
      .agg(avg(col("x"))).collect()(0).getDouble(0)
    assert(math.abs(mean - 1.0) < 0.05, s"mean weight $mean far from 1")
  }

  // ---- CJK-aware language ID + token counting ----

  test("langIdCjk: script arms pinned on hand texts, Latin falls back to voting") {
    import graft.ops.TextOps
    val cases = Seq(
      ("こんにちは世界", "ja"), // hiragana (+Han) -> ja
      ("カタカナ", "ja"), // katakana alone -> ja
      ("日本語のテキスト", "ja"), // Han + kana -> ja (kana wins)
      ("안녕하세요", "ko"), // hangul -> ko
      ("你好世界", "zh"), // Han only -> zh
      ("中文 hello the and of to a in", "zh"), // Han beats the en vote
      ("the cat sat on the mat and it was good", "en"),
      ("el perro y la casa de los gatos", "es"),
      ("12345 67890", "und"), // no script, no stopword -> und
      ("", "und"))
    val out = cases.map(_._1).toDF("text")
      .select(col("text"), TextOps.langIdCjk(col("text")).as("lang"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (t, want) =>
      assert(out(t) == want, s"'$t': got ${out(t)}, want $want") }
  }

  test("tokenCountCjk: char-as-token for CJK + ws tokens for the rest") {
    import graft.ops.TextOps
    val cases = Seq(
      ("你好世界", 4), // 4 Han chars, no Latin tokens... blanked -> empty split = 1? pinned below
      ("hello 世界 world", 2 + 2), // 2 cjk chars + "hello","world"
      ("こんにちは", 5),
      ("plain english text", 3))
    val out = cases.map(_._1).toDF("text")
      .select(col("text"), TextOps.tokenCountCjk(col("text")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // "你好世界" blanked = "    " -> trim = "" -> split('') = [""] -> 1
    // phantom ws token; the estimate is cjk + ws(remainder) BY CONTRACT
    // (same empty-string edge tokenCountWs itself has — q_token_count
    // ships it), so pin the contract value, not the wish
    assert(out("你好世界") == 5, s"got ${out("你好世界")}")
    assert(out("hello 世界 world") == 4, s"got ${out("hello 世界 world")}")
    assert(out("こんにちは") == 6, s"got ${out("こんにちは")}")
    assert(out("plain english text") == 3)
    // the headline property: a CJK sentence is NOT one token anymore
    assert(out("你好世界") > 1 && out("こんにちは") > 1)
  }

  // ---- boilerplate ----

  test("boilerplate: per-source frequent lines stripped, bodies kept, no cross-source leak") {
    import graft.ops.TextOps
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Seq(
      // source a: footer on all 3 (frac 1), header on 2/3 (frac .67),
      // bodies unique
      (1L, "a", "HEADER\nbody one\nfooter"),
      (2L, "a", "HEADER\nbody two\nfooter"),
      (3L, "a", "body three\nfooter"),
      // source b: ONE doc shares source-a's footer text — different
      // source, must NOT be stripped here
      (4L, "b", "body four\nfooter"),
      (5L, "b", "body five"),
      // all-boiler doc in source c (both docs identical) + empty doc
      (6L, "c", "same\nsame"),
      (7L, "c", "same"),
      (8L, "c", ""))
      .toDF("doc_id", "source", "text")
    val out = TextOps.boilerplate(docs, "doc_id", "text", "source", 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), r.getDouble(4), r.getString(5)))).toMap
    // source a: HEADER (2/3) and footer (3/3) are boiler
    assert(out(1L) == ((3, 2, 0.666667, md5hex("body one"))))
    assert(out(2L) == ((3, 2, 0.666667, md5hex("body two"))))
    assert(out(3L) == ((2, 1, 0.5, md5hex("body three"))))
    // source b: footer appears in 1/2 docs -> frac .5 but n_with=1 < 2
    // -> NOT boiler; nothing stripped
    assert(out(4L) == ((2, 0, 0.0, md5hex("body four\nfooter"))))
    assert(out(5L) == ((1, 0, 0.0, md5hex("body five"))))
    // source c: 'same' in 2/3 docs (frac .67) -> boiler; doc 6 keeps
    // NOTHING (clean hash of empty string); empty doc 8 is 0/0 -> 0.0
    assert(out(6L) == ((2, 2, 1.0, md5hex(""))))
    assert(out(7L) == ((1, 1, 1.0, md5hex(""))))
    assert(out(8L) == ((0, 0, 0.0, md5hex(""))))
  }

  test("gopherQualityFlags: each rule fires on its designed offender") {
    import graft.ops.TextOps
    val good = ("the quick brown fox jumps over the lazy dog and then " +
      "it runs far away into the green woods beyond the hill") // 22 words
    val docs = Seq(
      (1L, good),
      (2L, "the cat and dog sat"), // 5 words -> pass_words false
      (3L, good + " ##### ##### ##### ##### ##### #####"), // symbols
      (4L, ("a b c " * 10).trim + " the and of it is"), // mean len < 3
      (5L, "- one\n- two\n- three\n- four\n- five\n- six\n- seven\n- eight\n" +
        "- nine\n- ten\nthe only normal line is this one and it has the " +
        "needed words in it for sure really truly"), // 10/11 bullets > 0.9
      (6L, good.split(" ").map(w => w + "...").mkString("\n")), // ellipsis lines
      (7L, (1 to 25).map(_.toString).mkString(" ") + " the and"), // alpha < .8
      (8L, "uno dos tres cuatro cinco seis siete ocho nueve diez once doce " +
        "trece catorce quince dieciseis diecisiete dieciocho diecinueve " +
        "veinte veintiuno veintidos")) // no english stopwords
      .toDF("doc_id", "text")
    val out = TextOps.gopherQualityFlags(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def flag(id: Long, name: String): Boolean =
      out(id).getBoolean(out(id).fieldIndex(name))
    assert(flag(1L, "keep"), out(1L).toString)
    assert(!flag(2L, "pass_words") && !flag(2L, "keep"))
    assert(!flag(3L, "pass_symbols") && !flag(3L, "keep"))
    assert(!flag(4L, "pass_mean_len") && !flag(4L, "keep"))
    assert(!flag(5L, "pass_bullets") && !flag(5L, "keep"))
    assert(!flag(6L, "pass_ellipsis") && !flag(6L, "keep"))
    assert(!flag(7L, "pass_alpha") && !flag(7L, "keep"))
    assert(!flag(8L, "pass_stopwords") && !flag(8L, "keep"))
  }

  // ---- annIvfRefit ----

  test("refitQuantizer: cells partition the corpus; centroids are cell means") {
    import graft.ops.Similarity
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.1f, 1.0f)),
      (4L, Array(-1.0f, 0.0f)), (5L, Array(-1.0f, -0.1f)))
      .toDF("vec_id", "embedding")
    val (assigned, refit) = Similarity.refitQuantizer(e, "vec_id", "embedding", 3)
    val asg = assigned.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(asg.size == 6) // every vector assigned exactly once
    assert(asg.values.toSet.size <= 3)
    // near-parallel vectors land in the same cell
    assert(asg(0L) == asg(1L))
    assert(asg(2L) == asg(3L))
    assert(asg(4L) == asg(5L))
    // centroid of each cell = micro-scaled element-wise mean of members
    val cents = refit.collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val byCell = asg.groupBy(_._2).view.mapValues(_.keys.toSeq.sorted).toMap
    val vecs = Map(0L -> Seq(1.0, 0.0), 1L -> Seq(1.0, 0.1),
      2L -> Seq(0.0, 1.0), 3L -> Seq(0.1, 1.0),
      4L -> Seq(-1.0, 0.0), 5L -> Seq(-1.0, -0.1))
    byCell.foreach { case (cell, ids) =>
      val want = (0 until 2).map(d =>
        math.round(ids.map(i => vecs(i)(d)).sum / ids.size * 1e6))
      assert(cents(cell) == want, s"cell $cell: ${cents(cell)} vs $want")
    }
  }

  test("annIvfRefit: neighbor is the best of the query's cell; recall >= label-IVF") {
    import graft.ops.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qf = col("vec_id") < 10
    val refit = Similarity.annIvfRefit(emb, "vec_id", "embedding", 8, qf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val fixed = Similarity.annIvf(emb, "vec_id", "embedding", "label", qf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // brute-force truth (gate-scale corpus)
    val pre = Similarity.prepared(emb, "vec_id", "embedding")
    val truth = Similarity.bruteForceTopK(pre, pre.filter(qf), 1)
      .collect().map(r => r.getLong(r.fieldIndex("q_id")) ->
        r.getLong(r.fieldIndex("neighbor_id"))).toMap
    assert(refit.nonEmpty && refit.keySet == fixed.keySet)
    val refitHits = refit.count { case (q, n) => truth.get(q).contains(n) }
    val fixedHits = fixed.count { case (q, n) => truth.get(q).contains(n) }
    // the refit quantizer must not cost recall vs the frozen one
    assert(refitHits >= fixedHits,
      s"refit recall $refitHits < fixed $fixedHits of ${truth.size}")
  }

  test("annIvfSearch nprobe=2: per-query best cosine never worse than nprobe=1") {
    import graft.ops.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qf = col("vec_id") < 15
    def best(nprobe: Int): Map[Long, Double] =
      Similarity.annIvfRefit(emb, "vec_id", "embedding", 8, qf, nprobe)
        .collect().map(r => r.getLong(0) ->
          r.getDouble(r.fieldIndex("cos"))).toMap
    val one = best(1)
    val two = best(2)
    assert(one.nonEmpty && two.keySet == one.keySet)
    // probing a second cell can only improve (or tie) the best neighbor
    one.foreach { case (q, c1) =>
      assert(two(q) >= c1, s"query $q: nprobe=2 cos ${two(q)} < nprobe=1 $c1")
    }
    assert(two.exists { case (q, c2) => c2 > one(q) } ||
      two == one) // improvement is data-dependent; equality is legal
  }

  test("semanticDecontaminate: near-benchmark corpus vectors dropped, rest survive") {
    import graft.ops.Similarity
    // corpus 0/2/4: 0 ≈ benchmark 1 (same direction), 2 orthogonal,
    // 4 anti-parallel (cos -1, never ≥ threshold)
    def vec(axis: Int, eps: Double = 0.0): Array[Float] =
      Array.tabulate(64)(i =>
        (if (i == axis) 1.0 else if (i == (axis + 1) % 64) eps else 0.0).toFloat)
    val emb = Seq(
      (0L, vec(0, 0.05)), (2L, vec(7)), (4L, vec(0).map(-_)),
      (1L, vec(0)), (3L, vec(21)))
      .toDF("vec_id", "embedding")
    val pre = Similarity.prepared(emb, "vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(
      pre.filter(col("vec_id") % 2 === 0), pre.filter(col("vec_id") % 2 === 1),
      threshold = 0.9, planes = 64, bandBits = 4, dim = 64)
      .collect().map(_.getLong(0)).toSet
    assert(!out.contains(0L), "near-benchmark vector must be dropped")
    assert(out.contains(2L) && out.contains(4L), s"survivors wrong: $out")
  }

  test("semanticDecontaminate on real embeddings: survivors + drops partition the corpus") {
    import graft.ops.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pre = Similarity.prepared(emb, "vec_id", "embedding")
    val corpus = pre.filter(col("vec_id") % 2 === 0)
    val out = Similarity.semanticDecontaminate(
      corpus, pre.filter(col("vec_id") % 2 === 1), 0.4, 64, 4, 64)
      .collect().map(_.getLong(0)).toSet
    val all = corpus.collect().map(_.getLong(0)).toSet
    assert(out.subsetOf(all) && out.nonEmpty)
    // every survivor really has no BANDED candidate at cos >= 0.4:
    // dropped ids must each have an all-pairs witness (banding only
    // ever UNDER-drops, never over-drops)
    val bench = pre.filter(col("vec_id") % 2 === 1)
    val truth = corpus.as("c").crossJoin(bench.as("b"))
      .select(col("c.vec_id").as("c_id"),
        Similarity.cosine6(col("c.v"), col("c.nrm"), col("b.v"), col("b.nrm")).as("cos"))
      .filter(col("cos") >= 0.4)
      .select(col("c_id")).distinct().collect().map(_.getLong(0)).toSet
    val dropped = all -- out
    assert(dropped.subsetOf(truth),
      s"over-dropped ids without an all-pairs witness: ${dropped -- truth}")
  }

  test("bootstrapMeanCI on the kernel: interval brackets the mean, n exact") {
    val df = (1 to 400).map(i => (s"u$i", (i % 7).toDouble)).toDF("id", "v")
    val out = Stats.bootstrapMeanCI(df, "id", "v").collect()(0)
    assert(out.getLong(out.fieldIndex("n")) == 400L)
    val mean = out.getDouble(out.fieldIndex("mean"))
    val lo = out.getDouble(out.fieldIndex("ci_lo"))
    val hi = out.getDouble(out.fieldIndex("ci_hi"))
    assert(lo <= mean && mean <= hi, s"$lo <= $mean <= $hi")
    assert(hi - lo < 1.0, s"32-rep CI on 400 rows should be tight: [$lo, $hi]")
  }
}
