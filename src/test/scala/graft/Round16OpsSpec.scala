package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 work (driver round 14): the r13 ADVICE regression pins
  * (NearestSeed stale-buffer cache, WavAudio undeclared frame count)
  * plus specs for the round's new operators. */
class Round16OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- NearestSeed cache: same Unsafe buffer, different bytes ----

  test("NearestSeed re-unpacks when a reused UnsafeRow buffer carries new seed bytes") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection, GenericInternalRow}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._

    val fields: Array[DataType] = Array(
      ArrayType(DoubleType), DoubleType,
      ArrayType(ArrayType(DoubleType)), ArrayType(DoubleType))
    // ONE projection => one BufferHolder: every apply() rewrites the
    // SAME backing array at the SAME offset — the exact aliasing the
    // (baseObject, baseOffset) cache key cannot distinguish.
    val proj = UnsafeProjection.create(fields)
    def unsafeRow(vec: Array[Double], seeds: Array[Array[Double]]): InternalRow = {
      val g = new GenericInternalRow(4)
      g.update(0, new GenericArrayData(vec))
      g.update(1, math.sqrt(vec.map(x => x * x).sum))
      g.update(2, new GenericArrayData(
        seeds.map(s => new GenericArrayData(s)): Array[Any]))
      g.update(3, new GenericArrayData(
        seeds.map(s => math.sqrt(s.map(x => x * x).sum)): Array[Any]))
      proj.apply(g)
    }
    val expr = graft.functions.NearestSeed(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      BoundReference(1, DoubleType, nullable = true),
      BoundReference(2, ArrayType(ArrayType(DoubleType)), nullable = true),
      BoundReference(3, ArrayType(DoubleType), nullable = true))

    def e(i: Int): Array[Double] = Array.tabulate(8)(d => if (d == i) 1.0 else 0.0)

    // Case 1: corner elements differ between the two matrices.
    val vecA = Array(1.0, 0.0)
    val seedsA1 = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val seedsA2 = Array(Array(0.0, 1.0), Array(1.0, 0.0))
    assert(expr.eval(unsafeRow(vecA, seedsA1)) == 0)
    assert(expr.eval(unsafeRow(vecA, seedsA2)) == 1,
      "stale cache served the previous row's seed matrix (corner case)")

    // Case 2: corners IDENTICAL, only interior seeds rewritten — the
    // sampled-word checksum has to catch this one.
    val vecB = e(2)
    val seedsB1 = Array(e(0), e(2), e(3), e(7)) // argmax cos at position 1
    val seedsB2 = Array(e(0), e(4), e(5), e(7)) // all cos 0 -> tie -> position 0
    assert(expr.eval(unsafeRow(vecB, seedsB1)) == 1)
    assert(expr.eval(unsafeRow(vecB, seedsB2)) == 0,
      "stale cache served the previous row's seed matrix (interior case)")

    // And the legitimate broadcast-constant pattern still hits the
    // cache path correctly (same bytes, repeated evals).
    val r = unsafeRow(vecB, seedsB1)
    assert(expr.eval(r) == 1 && expr.eval(r) == 1)
  }

  // ---- extractHtmlText: the crawl pipeline's first stage ----

  private def extract(htmls: String*): Seq[String] = {
    val df = htmls.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "html")
    df.select(col("id"),
        graft.ops.TextOps.extractHtmlText(col("html")).as("t"))
      .orderBy("id").collect().map(r => r.getString(1)).toSeq
  }

  test("extractHtmlText: full page -> main content with line structure") {
    val html = "<html><!-- c with <tags> & stuff --><head><title>T</title>" +
      "<style type=\"text/css\">body { color: red; }</style></head><body>" +
      "<nav><ul><li>Home</li><li>About</li></ul></nav>" +
      "<script type=\"text/javascript\">var x = 1 < 2 && 3 > 2;</script>" +
      "<h1>Doc 1</h1><p>Hello   world, <b>bold</b> and <i>italic</i>.</p>" +
      "<div>Tail &amp; more &lt;b&gt; &quot;q&quot; &#39;s&#39; and&nbsp;end</div>" +
      "<![CDATA[ raw <cdata> payload ]]>" +
      "<table><tr><td>cell1</td><td>cell2</td></tr></table>" +
      "<footer>copyright 2026</footer></body></html>"
    assert(extract(html) == Seq(
      "Doc 1\nHello world, bold and italic.\n" +
        "Tail & more <b> \"q\" 's' and end\ncell1\ncell2"))
  }

  test("extractHtmlText contracts: malformed tags, unclosed containers, entity order, case") {
    val out = extract(
      // malformed trailing tag without '>' survives as text
      "<p>keep this</p><div class=\"x",
      // unclosed script: the open tag strips as a plain tag, its body
      // SURVIVES (nothing silently swallowed without a closing tag)
      "<script>var y = 1;<p>after</p>",
      // &amp;lt; decodes to the TEXT &lt;, never a stripped <
      "<p>&amp;lt;not-a-tag&amp;gt;</p>",
      // case-insensitive containers
      "<SCRIPT>gone();</SCRIPT><P>Kept</P><STYLE>x{}</STYLE>",
      // nested tables keep cell text, one line per block boundary
      "<table><tr><td>a<table><tr><td>b</td></tr></table></td></tr></table>",
      // bare '<'/'>' comparison prose is NOT tag-shaped and survives
      // whole (r17: the old '<[^>]+>' stripper swallowed ' b and c ')
      "<p>a < b and c > d</p>",
      // declarations ARE tag-shaped and strip
      "<!DOCTYPE html><p>doc</p>",
      // whitespace-only and empty
      "   ", "")
    assert(out == Seq(
      "keep this\n<div class=\"x",
      "var y = 1;\nafter",
      "&lt;not-a-tag&gt;",
      "Kept",
      "a\nb",
      "a < b and c > d",
      "doc",
      "", ""))
  }

  test("extractHtmlText: null html -> null") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("<p>x</p>")))
      .toDF("id", "html")
    val rows = df.select(col("id"),
        graft.ops.TextOps.extractHtmlText(col("html")).as("t"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1) && rows(1).getString(1) == "x")
  }

  test("extractHtmlText -> cleanCorpus composition: same content under different chrome dedups") {
    // two pages with IDENTICAL article text but different site chrome:
    // raw exact-dedup keeps both (different bytes); extraction first
    // collapses them to one survivor. A third page is unique content.
    val article = "The quick brown fox jumps over the lazy dog. " * 5
    val p1 = s"<html><head><title>site-a</title></head><body>" +
      s"<nav><li>A</li></nav><p>$article</p><footer>a.com</footer></body></html>"
    val p2 = s"<html><head><title>site-b</title></head><body>" +
      s"<nav><li>B</li><li>Contact</li></nav><p>$article</p>" +
      s"<footer>b.org (c)</footer></body></html>"
    val p3 = s"<html><body><p>Entirely different content here, long " +
      s"enough to pass the quality bar of the corpus cleaner stage " +
      s"with many common words the and of to in is it for on.</p></body></html>"
    val raw = Seq((1L, p1), (2L, p2), (3L, p3)).toDF("doc_id", "text")
    // raw bytes: all three distinct -> exact dedup keeps 3
    val rawClean = graft.ops.Dedup.cleanCorpus(raw, "doc_id", "text",
      qualityMin = 0.0, jaccardMax = 1.1)
    assert(rawClean.count() == 3)
    // extracted text: p1/p2 identical -> 2 survivors, min doc_id wins
    val extracted = raw.select(col("doc_id"),
      graft.ops.TextOps.extractHtmlText(col("text")).as("text"))
    val clean = graft.ops.Dedup.cleanCorpus(extracted, "doc_id", "text",
      qualityMin = 0.0, jaccardMax = 1.1)
    val kept = clean.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L),
      s"expected chrome-stripped dedup to keep docs 1 and 3, got ${kept.toSeq}")
  }

  // ---- bpeEncode: real merges-table tokenizer ----

  private def bpe(merges: Seq[(String, String)], words: String*): Seq[String] = {
    val df = Seq((1L, words.toArray)).toDF("id", "toks")
    df.select(graft.ops.TextOps.bpeEncode(col("toks"), merges).as("enc"))
      .collect().head.getSeq[String](0).toSeq
  }

  test("bpeEncode: hand-pinned encodings under the gate merges table") {
    val m = graft.ops.TextOps.BpeGateMerges
    assert(bpe(m, "the") == Seq("the"))
    assert(bpe(m, "thing") == Seq("th", "ing"))
    assert(bpe(m, "questions") == Seq("qu", "es", "t", "i", "on", "s"))
    assert(bpe(m, "matters") == Seq("m", "at", "t", "ers"))
    assert(bpe(m, "answering") == Seq("an", "s", "w", "er", "ing"))
    assert(bpe(m, "q7") == Seq("q", "7"))
    // multiple words flatten in order
    assert(bpe(m, "the", "thing") == Seq("the", "th", "ing"))
  }

  test("bpeEncode contract: canonical self-merge, non-firing table, null handling") {
    // self-pair runs follow the CANONICAL greedy scan (r17, closing the
    // r14 ADVICE finding): leftmost-nonoverlapping merge-all, odd
    // leftover at the run's END — the r16 two-pass string form gave 4
    // tokens for 'aaaaaa' vs canonical 3
    assert(bpe(Seq("a" -> "a"), "aaaaa") == Seq("aa", "aa", "a"))
    assert(bpe(Seq("a" -> "a"), "aaaa") == Seq("aa", "aa"))
    assert(bpe(Seq("a" -> "a"), "aaaaaa") == Seq("aa", "aa", "aa"))
    assert(bpe(Seq("a" -> "a", "aa" -> "a"), "aaaaa") ==
      Seq("aa", "aaa"), "rank-1 (aa,a) fires on the canonical leftover")
    // a table that never fires -> pure character split
    assert(bpe(Seq("z" -> "z"), "hello") == Seq("h", "e", "l", "l", "o"))
    // null toks -> null; null/empty elements skipped
    val df = Seq((1L, null: Array[String]), (2L, Array("ab", null, "")))
      .toDF("id", "toks")
    val rows = df.select(col("id"),
        graft.ops.TextOps.bpeEncode(col("toks"), Seq("a" -> "b")).as("enc"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1))
    assert(rows(1).getSeq[String](1) == Seq("ab"))
  }

  test("bpeEncode == naive ascending-rank reference on random words (well-formed table)") {
    val m = graft.ops.TextOps.BpeGateMerges
    def naive(w: String): Seq[String] = {
      // the oracle's wrapped-symbol form: each symbol is '|s|', ONE LTR
      // replace per rank == canonical leftmost-nonoverlapping merge-all
      var s = w.toCharArray.map(c => s"|$c|").mkString
      m.foreach { case (x, y) =>
        s = s.replace(s"|$x||$y|", s"|$x$y|")
      }
      s.split('|').filter(_.nonEmpty).toSeq
    }
    val rnd = new scala.util.Random(42)
    val alpha = "aeinorstuthlqcgdxz"
    val words = (0 until 300).map(_ =>
      (0 until (1 + rnd.nextInt(12))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    words.foreach { w =>
      assert(bpe(m, w) == naive(w), s"kernel != ascending-rank replay on '$w'")
    }
  }

  test("bpeEncode with a TRAINED table: counts sit between words and chars; estimate parity") {
    val texts = Seq(
      "the things that matter most are the answers we question",
      "another thing the matter hinges on is that other answer",
      "the thing about the answer is that it matters a lot")
    val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // train: top-20 char-pair candidates -> a (char,char) merges table
    val trained = graft.ops.TextOps.bpeMergeCandidates(corpus, "text", 20)
      .collect().map(r => { val p = r.getString(0)
        (p.substring(0, 1), p.substring(1)) }).toSeq
    val enc = corpus.select(col("doc_id"),
      graft.ops.TextOps.tokensNative(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n_words"),
        aggregate(transform(col("toks"), w => length(w)), lit(0),
          (a, x) => a + x).as("n_chars"),
        size(graft.ops.TextOps.bpeEncode(col("toks"), trained)).as("n_real"))
      .collect()
    enc.foreach { r =>
      val (w, c, real) = (r.getInt(1), r.getInt(2), r.getInt(3))
      assert(real >= w && real <= c,
        s"real token count $real must sit in [n_words=$w, n_chars=$c]")
      assert(real < c, "a trained table must fire at least once per doc here")
    }
  }

  // ---- IVF front door: annIvfSearch over a prebuilt index ----

  test("annIvf deprecation shim is row-identical to annIvfFrozenLabels") {
    import graft.ops.Similarity
    val emb = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 0.7 + d)), s"l${i % 3}")
    }.toDF("vec_id", "embedding", "label")
    val qf = col("vec_id") < 5
    val a = Similarity.annIvf(emb, "vec_id", "embedding", "label", qf)
      .orderBy("q_id").collect().map(_.toSeq)
    val b = Similarity.annIvfFrozenLabels(emb, "vec_id", "embedding", "label", qf)
      .orderBy("q_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("buildIvfIndex + annIvfSearch (the front door) == one-shot annIvfRefit; default nprobe is 2") {
    import graft.ops.Similarity
    val emb = (0L until 80L).map { i =>
      (i, Array.tabulate(8)(d => math.cos(i * 1.3 + d * 0.5)))
    }.toDF("vec_id", "embedding")
    val qf = col("vec_id") < 6
    val (index, refit) = Similarity.buildIvfIndex(emb, "vec_id", "embedding", k = 8)
    val front = Similarity.annIvfSearch(index, refit, qf)
      .orderBy("q_id").collect().map(_.toSeq)
    val oneShot = Similarity.annIvfRefit(emb, "vec_id", "embedding", 8, qf)
      .orderBy("q_id").collect().map(_.toSeq)
    val probe2 = Similarity.annIvfSearch(index, refit, qf, nprobe = 2)
      .orderBy("q_id").collect().map(_.toSeq)
    assert(front.toSeq == oneShot.toSeq)
    assert(front.toSeq == probe2.toSeq,
      "default nprobe must be 2 (the recall-default front door)")
  }

  // ---- boilerplateClean ----

  test("boilerplateClean: md5(clean_text) == boilerplate's clean_hash; text is the kept lines") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "s", "NAV\nbody one\ncopyright s"),
      (2L, "s", "NAV\nbody two\ncopyright s"),
      (3L, "s", "body three only\ncopyright s"),
      (4L, "t", "NAV\nother source keeps its nav\nend")).toDF("doc_id", "source", "text")
    val stats = TextOps.boilerplate(docs, "doc_id", "text", "source", 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    val clean = TextOps.boilerplateClean(docs, "doc_id", "text", "source", 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val hash = Seq((1L, clean(1L)), (2L, clean(2L)), (3L, clean(3L)), (4L, clean(4L)))
      .toDF("id", "t").select(col("id"), md5(col("t"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (1L to 4L).foreach(i => assert(hash(i) == stats(i),
      s"doc $i: md5(clean_text) must equal clean_hash"))
    // and the actual text: source s drops NAV (2/3 docs) and copyright
    // (3/3); doc 4's NAV survives — its source has only one doc
    assert(clean(1L) == "body one")
    assert(clean(3L) == "body three only")
    assert(clean(4L) == "NAV\nother source keeps its nav\nend")
  }

  // ---- normalizeUnicode + mojibakeScore ----

  test("normalizeUnicode: every step fires; clean ASCII text is untouched") {
    import graft.ops.TextOps
    val dirty = "a​b­c “q” ‘s’ – — " +
      "x… nb sp wide　space ctldel crlf\r\nlone\rend"
    val out = Seq((1L, dirty), (2L, "plain ascii text\twith tab\nand newline"))
      .toDF("id", "text")
      .select(col("id"), TextOps.normalizeUnicode(col("text")).as("t"))
      .orderBy("id").collect().map(_.getString(1))
    assert(out(0) == "abc \"q\" 's' - - x... nb sp wide space ctldel crlf\nlone\nend")
    assert(out(1) == "plain ascii text\twith tab\nand newline")
    // the dedup-poisoner case: zero-width-infested twin hashes EQUAL
    // after normalization
    val a = "same visible text"
    val b = "same​ visible﻿ text­"
    val eq = Seq((a, b)).toDF("a", "b")
      .select((md5(TextOps.normalizeUnicode(col("a"))) ===
        md5(TextOps.normalizeUnicode(col("b")))).as("eq"))
      .collect().head.getBoolean(0)
    assert(eq)
  }

  test("mojibakeScore: UTF-8-as-Latin1 artifacts count; clean text scores 0") {
    import graft.ops.TextOps
    val rows = Seq(
      (1L, "cafÃ© and aâ€™b and tailÂ end"),
      (2L, "perfectly clean text with café and “quotes”"),
      (3L, "")).toDF("id", "text")
      .select(col("id"), TextOps.mojibakeScore(col("text")).as("hits"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows == Map(1L -> 3, 2L -> 0, 3L -> 0), rows.toString)
  }

  // ---- cdcChunks ----

  test("cdcChunks: boundaries re-sync after a prefix edit so the copied body still dedups") {
    import graft.ops.TextOps
    val body = (1 to 12).map(i =>
      s"paragraph $i of the original article carries enough distinct " +
      s"prose that the rolling mask finds several boundaries inside it")
      .mkString(" ")
    val docs = Seq(
      (1L, body),
      // the fixed-stride killer: ONE inserted sentence shifts every
      // byte offset of the copy
      (2L, "breaking update inserted by the mirror site editor. " + body),
      (3L, "entirely unrelated content with nothing in common here"),
      (4L, ""), (5L, "short")).toDF("doc_id", "text")
    val out = TextOps.cdcChunks(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    // both copies share chunks DESPITE the offset shift
    assert(out(1L)._3 >= 2 && out(2L)._3 >= 2,
      s"re-synced chunks must be shared: $out")
    // unrelated doc shares nothing
    assert(out(3L)._3 == 0, out.toString)
    // degenerate arms: empty -> 0 chunks; shorter than window -> 1 chunk
    assert(out(4L)._1 == 0 && out(5L)._1 == 1, out.toString)
    // and the shared fraction is high for the true copy pair
    val fullShared = out(1L)._3.toDouble / out(1L)._2
    assert(fullShared >= 0.5, s"copy should share most chunks: $out")
  }

  test("CdcChunkHashes kernel == the declarative md5-per-position form (incl unicode)") {
    val w = 16
    val rnd = new scala.util.Random(7)
    val texts = (0 until 60).map { i =>
      val n = rnd.nextInt(400)
      (0 until n).map(_ => "abcdef é日本 xyz 0189 "(rnd.nextInt(20))).mkString
    } ++ Seq("", "short", "a" * 200)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "nrm")
    val kernel = df.select(col("id"),
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.CdcChunkHashes(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("nrm")), w, 6)).as("chs"))
    // the naive declarative reference (what the DuckDB oracle replays)
    val cand = filter(
      when(length(col("nrm")) >= w, sequence(lit(w), length(col("nrm"))))
        .otherwise(array().cast("array<int>")),
      i => conv(substring(md5(col("nrm").substr(i - w + 1, lit(w))), 1, 8),
        16, 10).cast("long") % 64 === 0)
    val bounds = concat(array(lit(0)), cand, array(length(col("nrm"))))
    val naive = df.withColumn("bounds", bounds)
      .select(col("id"), transform(
        filter(transform(sequence(lit(1), size(col("bounds")) - 1), j =>
          col("nrm").substr(element_at(col("bounds"), j) + 1,
            element_at(col("bounds"), j + 1) - element_at(col("bounds"), j))),
          c => c =!= ""), c => md5(c)).as("chs"))
    val k = kernel.orderBy("id").collect().map(_.getSeq[String](1).toSeq)
    val n = naive.orderBy("id").collect().map(_.getSeq[String](1).toSeq)
    k.zip(n).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"text $i: kernel $a != naive $b")
    }
  }

  // ---- redactPii ----

  test("redactPii: every pattern fires exactly once; non-PII digit runs survive") {
    import graft.ops.TextOps
    val t = "mail a@b.co see https://x.io/p call 555-867-5309 " +
      "or +1 (415) 555-2671 card 4111 1111 1111 1111 host 10.0.255.254 " +
      "id 1234567890 stays, version 1.2.3.4 is an IP-shape too"
    val out = Seq(Tuple1(t)).toDF("text")
      .select(TextOps.redactPii(col("text"))).collect().head.getString(0)
    assert(out == "mail <EMAIL> see <URL> call <PHONE> or <PHONE> " +
      "card <CC> host <IP> id 1234567890 stays, version <IP> is an IP-shape too",
      out)
    // 999 octets are not IPv4; ungrouped 16 digits are not a card
    val neg = Seq(Tuple1("999.999.999.999 and 4111111111111111")).toDF("text")
      .select(TextOps.redactPii(col("text"))).collect().head.getString(0)
    assert(neg == "999.999.999.999 and 4111111111111111", neg)
  }

  // ---- langIdSpans: per-paragraph language segmentation ----

  test("langIdSpans: code-switched doc segments per paragraph; consecutive same-lang collapses") {
    val doc =
      "the cat sat on the mat with the dog and it was good\n" +  // en
      "\n" +                                                     // blank: dropped
      "le chat est sur le tapis avec le chien du jour\n" +       // fr
      "el gato y el perro en la casa con los amigos\n" +         // es
      "日本語のテキストです\n" +                                   // ja
      "これも日本語の行です\n" +                                   // ja (collapses)
      "한국어 텍스트 단락\n" +                                     // ko
      "the end is here with the final words of it all"           // en again
    val df = Seq((7L, doc)).toDF("doc_id", "text")
    val spans = graft.ops.TextOps.langIdSpans(df, "doc_id", "text")
      .orderBy("span_idx").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getLong(3), r.getInt(5)))
    assert(spans.toSeq == Seq(
      (1, "en", 1L, 0), (2, "fr", 1L, 1), (3, "es", 1L, 2),
      (4, "ja", 2L, 3), (5, "ko", 1L, 5), (6, "en", 1L, 6)),
      s"got ${spans.toSeq}")
    // doc-level langIdCjk collapses this whole page to 'ja' (CJK arms
    // win before voting) — exactly the mislabeling spans fix
    val docLevel = df.select(graft.ops.TextOps.langIdCjk(col("text")))
      .collect().head.getString(0)
    assert(docLevel == "ja")
  }

  test("langIdSpans: single-language doc is one span; und lines segment too; empty text -> no rows") {
    val df = Seq(
      (1L, "the cat and the dog\nwith all of it\nand more of the same"),
      (2L, "zzz qqq xxx\nthe real text is here with the words"),
      (3L, "   \n  \n"), (4L, "")).toDF("doc_id", "text")
    val out = graft.ops.TextOps.langIdSpans(df, "doc_id", "text")
      .orderBy("doc_id", "span_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 1, "en", 3L),       // one collapsed en span
      (2L, 1, "und", 1L), (2L, 2, "en", 1L)))
  }

  // ---- product quantization ----

  private def pqEmb(n: Int) = {
    // 3 well-separated direction clusters + per-vector jitter, dim 8
    (0L until n.toLong).map { i =>
      val base = (i % 3).toInt
      val v = Array.tabulate(8) { d =>
        (if (d / 3 == base) 1.0 else 0.05) * (1.0 + 0.01 * (i % 7)) *
          (if (d % 2 == 0) 1.0 else 0.8)
      }
      (i, v)
    }.toDF("vec_id", "embedding")
  }

  test("quantizePq: codes are valid codebook cells; codebooks cover every (s, cell)") {
    import graft.ops.Similarity
    val (codes, books) = Similarity.quantizePq(pqEmb(90), "vec_id", "embedding",
      dim = 8, m = 4, k = 4)
    val bk = books.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(bk.forall { case (s, c) => s >= 0 && s < 4 && c >= 0 && c < 4 })
    val cd = codes.collect()
    assert(cd.length == 90)
    cd.foreach { r =>
      (0 until 4).foreach { s =>
        val code = r.getInt(1 + s)
        assert(bk.contains((s, code)),
          s"code ($s, $code) must reference an existing codebook cell")
      }
    }
    // codeword dims = d/m
    books.collect().foreach(r => assert(r.getSeq[Long](2).length == 2))
    // deterministic: a second build is byte-identical
    val (codes2, _) = Similarity.quantizePq(pqEmb(90), "vec_id", "embedding", 8, 4, 4)
    assert(codes.orderBy("vec_id").collect().map(_.toSeq).toSeq ==
      codes2.orderBy("vec_id").collect().map(_.toSeq).toSeq)
  }

  test("annPq: clustered data routes to same-cluster neighbors; recall audit beats chance") {
    import graft.ops.Similarity
    val emb = pqEmb(90)
    val audit = Similarity.annPqRecallAudit(emb, "vec_id", "embedding",
      col("vec_id") < 6, dim = 8, m = 4, kCodes = 4, topK = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(audit.size == 6)
    val mean = audit.values.sum / audit.size
    assert(mean >= 0.6, s"PQ recall@5 on separable clusters should be high, got $mean")
  }

  test("PQ compression is 16x+ vs float32 and recall is comparable to int8 at gate scale") {
    import graft.ops.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dim = 64
    // these embeddings are near-uniform random vectors — the WORST case
    // for any quantizer (top-5 and rank-50 differ by ~0.02 cosine), so
    // the pins are the measured m/k recall ladder, not absolute quality
    def recallAt(m: Int, k: Int): Double =
      Similarity.annPqRecallAudit(emb, "vec_id", "embedding",
        col("vec_id") < 5, dim, m, kCodes = k, topK = 5)
        .agg(avg("recall")).collect().head.getDouble(0)
    val gate = recallAt(8, 32)   // the gate sizing: 32x compression
    val fine = recallAt(16, 128) // 16x compression, finest ladder rung
    // compression (m one-byte codes vs d float32 bytes; codebooks are
    // shared and amortize to ~0 per vector): gate 32x, fine 16x
    assert((dim * 4).toDouble / 8 >= 16.0)
    assert((dim * 4).toDouble / 16 >= 16.0)
    // int8 recall@5 against the same exact truth (4x, near-exact)
    val corpus = Similarity.prepared(emb, "vec_id", "embedding")
    val exact = Similarity.bruteForceTopK(corpus, corpus.filter(col("vec_id") < 5), 5)
      .select(col("q_id"), col("neighbor_id"))
    val i8 = Similarity.annInt8TopK(emb, "vec_id", "embedding", col("vec_id") < 5, 5)
      .select(col("q_id"), col("neighbor_id"))
    val i8Recall = exact.join(i8.withColumn("hit", lit(1L)),
        Seq("q_id", "neighbor_id"), "left_outer")
      .agg(avg(coalesce(col("hit"), lit(0L)))).collect().head.getDouble(0)
    // the trade is monotone and PQ never beats the near-exact int8 scan;
    // chance recall@5 over this corpus is ~0.01, the gate sizing must
    // clear it by an order of magnitude
    assert(gate >= 0.15 && gate <= i8Recall + 1e-9,
      s"gate-sizing pq=$gate int8=$i8Recall")
    assert(fine >= gate - 1e-9,
      s"finer codebooks must not lose recall: 16x=$fine vs 32x=$gate")
    info(f"recall@5: pq32x=$gate%.3f pq16x=$fine%.3f int8(4x)=$i8Recall%.3f")
  }

  // ---- sphericalKmeans ----

  test("sphericalKmeans: separable clusters recovered pure; centroids are member means") {
    import graft.ops.Similarity
    // 3 tight direction clusters of 30 (ground truth = vec_id / 30;
    // the md5-order k=4 seed draw spans all three: ids 27,63,60,59 ->
    // clusters 0,2,2,1), per-element jitter so within-cluster cosine
    // is high but NOT a tie
    def truth(i: Long): Int = (i / 30L).toInt
    val emb = (0L until 90L).map { i =>
      (i, Array.tabulate(9)(d =>
        (if (d / 3 == truth(i)) 1.0 else 0.03) +
          0.02 * (((i * 13 + d * 7) % 10) / 10.0)))
    }.toDF("vec_id", "embedding")
    val (asg, cents) = Similarity.sphericalKmeans(emb, "vec_id", "embedding",
      k = 4, iters = 3)
    val rows = asg.collect().map(r => r.getLong(0) -> r.getInt(1))
    // PURITY: no cell mixes ground-truth clusters
    rows.groupBy(_._2).foreach { case (cell, ms) =>
      assert(ms.map(m => truth(m._1)).distinct.length == 1,
        s"cell $cell mixes clusters: ${ms.toSeq}")
    }
    // and no ground-truth cluster is scattered beyond the seed count
    // it received (0 and 1 got one seed each -> exactly one cell)
    val cellsOf = rows.groupBy(m => truth(m._1))
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(cellsOf(0).size == 1 && cellsOf(1).size == 1, cellsOf.toString)
    // centroid of EVERY cell == micro-rounded element mean of members
    val cmap = cents.collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    val vecs = emb.collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    rows.groupBy(_._2).foreach { case (cell, ms) =>
      val vs = ms.map(m => vecs(m._1))
      val mean = (0 until 9).map(d =>
        math.round(vs.map(_(d)).sum / vs.size * 1000000))
      assert(cmap(cell) == mean, s"cell $cell centroid mismatch")
    }
  }

  test("sphericalKmeans: extra iterations never hurt the objective; degenerate arms") {
    import graft.ops.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def objective(iters: Int): Double = {
      val (asg, cents) = Similarity.sphericalKmeans(emb, "vec_id", "embedding",
        k = 8, iters = iters)
      val c = cents.select(col("cell"),
          transform(col("centroid_scaled"), x => x / 1000000.0).as("cv"))
        .withColumn("cnrm", Similarity.l2norm(col("cv")))
      Similarity.prepared(emb, "vec_id", "embedding")
        .join(asg, "vec_id").join(c, "cell")
        .select(Similarity.cosine6(col("v"), col("nrm"), col("cv"), col("cnrm"))
          .as("cos"))
        .agg(avg("cos")).collect().head.getDouble(0)
    }
    val (o1, o3) = (objective(1), objective(3))
    assert(o3 >= o1 - 1e-4, s"iters=3 objective $o3 < iters=1 $o1")
    // k > n: every vector its own cell, all cells distinct
    val tiny = (0L until 3L).map(i =>
      (i, Array.tabulate(4)(d => if (d == i) 1.0 else 0.0))).toDF("vec_id", "embedding")
    val (ta, _) = Similarity.sphericalKmeans(tiny, "vec_id", "embedding", 8, 2)
    assert(ta.collect().map(_.getInt(1)).distinct.length == 3)
    // all-identical vectors: ties -> everyone in ONE cell
    val same = (0L until 6L).map(i => (i, Array(1.0, 2.0, 3.0))).toDF("vec_id", "embedding")
    val (sa, sc) = Similarity.sphericalKmeans(same, "vec_id", "embedding", 4, 2)
    assert(sa.collect().map(_.getInt(1)).distinct.length == 1)
    assert(sc.count() == 1L)
  }

  // ---- annIvfPq: the composed IVFADC path ----

  test("annIvfPq probing ALL cells == the full-scan annPq ranking; nprobe cuts candidates") {
    import graft.ops.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qf = col("vec_id") < 5
    val (dim, m, kc, cells) = (64, 8, 16, 4)
    // full-scan twin on the same unit-normalized corpus
    val corpus = Similarity.prepared(emb, "vec_id", "embedding")
    val unit = corpus.filter(col("nrm") > 0)
      .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("v"))
    val (codes, books) = Similarity.quantizePq(unit, "vec_id", "v", dim, m, kc)
    val full = Similarity.annPq(codes, books,
        unit.filter(qf).select(col("vec_id"), col("v")), dim, m, 3)
      .select("q_id", "neighbor_id", "score_pq", "rn")
      .collect().map(_.toSeq).toSet
    // probing every cell = no candidate is ever routed away
    // (r17: the RAW baseline form — the residual default reconstructs
    // c + r̃ and has its own full-scan twin in Round17OpsSpec)
    val allCells = Similarity.annIvfPqRaw(emb, "vec_id", "embedding",
        dim, m, kc, cells, qf, nprobe = cells, topK = 3)
      .select("q_id", "neighbor_id", "score_pq", "rn")
      .collect().map(_.toSeq).toSet
    assert(allCells == full,
      s"all-cells IVFADC must equal the full ADC scan\n$allCells\nvs\n$full")
    // nprobe=1: per query the top-1 neighbor comes from ONE cell's
    // members only — a (possibly empty or lower-scoring) subset ranking
    val one = Similarity.annIvfPqRaw(emb, "vec_id", "embedding",
        dim, m, kc, cells, qf, nprobe = 1, topK = 3)
      .groupBy("q_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fullCounts = full.groupBy(_.head).view.mapValues(_.size).toMap
    one.foreach { case (q, n) =>
      assert(n <= fullCounts(q), "nprobe=1 can never ADD candidates")
    }
  }

  // ---- WavAudio: container with no declared frame count ----

  test("WavAudio derives the frame count when the container declares none (AU unknown size)") {
    val frames = 100
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    d.writeInt(0x2e736e64) // ".snd"
    d.writeInt(24)         // data offset
    d.writeInt(0xffffffff) // data size UNKNOWN -> reader frameLength -1
    d.writeInt(3)          // 16-bit linear PCM
    d.writeInt(8000)       // sample rate
    d.writeInt(1)          // channels
    (0 until frames).foreach(i => d.writeShort((i * 100).toShort))
    val payload = bos.toByteArray
    val s = graft.ops.Multimodal.MediaCodec.WavAudio.open()
    val dec = s.decode("audio/basic", payload)
    assert(dec.width == frames,
      s"expected derived frame count $frames, got ${dec.width}")
    assert(dec.height == 1)
    s.close()
  }
}
