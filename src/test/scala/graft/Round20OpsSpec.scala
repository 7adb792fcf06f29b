package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-20 work (driver round 18): the r17 verdict's gaps —
  * charset-aware WARC payload decode (#2), ADC re-rank refinement
  * (#4), deep published-vocab parity (#5), incremental PageRank (#6)
  * — plus pins for this round's ADVICE fixes. */
class Round20OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmpDir(prefix: String): java.io.File =
    java.nio.file.Files.createTempDirectory(prefix).toFile
  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
  }

  // ---- WARC record-building helpers (same framing as Round18's) ----

  private def rec(typ: String, url: String, date: String,
      body: Array[Byte], extra: Seq[(String, String)] = Nil): Array[Byte] = {
    val h = new StringBuilder
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $typ\r\n"
    if (url.nonEmpty) h ++= s"WARC-Target-URI: $url\r\n"
    h ++= s"WARC-Date: $date\r\n"
    h ++= s"WARC-Record-ID: <urn:uuid:${typ}-${math.abs(url.hashCode)}>\r\n"
    extra.foreach { case (k, v) => h ++= s"$k: $v\r\n" }
    h ++= s"Content-Length: ${body.length}\r\n\r\n"
    h.toString.getBytes("UTF-8") ++ body ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(bytes); g.close()
    bo.toByteArray
  }

  /** An HTTP response block whose body is `text` encoded with
    * `bodyCharset`, advertising `labeledCharset` (None = no charset
    * parameter on the Content-Type). */
  private def httpResponse(text: String, bodyCharset: String,
      labeledCharset: Option[String]): Array[Byte] = {
    val body = text.getBytes(java.nio.charset.Charset.forName(bodyCharset))
    val ct = "text/html" + labeledCharset.map("; charset=" + _).getOrElse("")
    (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n")
      .getBytes("UTF-8") ++ body
  }

  // ---- charset-aware WARC payload decode (r17 verdict #2) ----

  test("decodeText: labeled ISO-8859-1 / Windows-1252 / Shift_JIS payloads round-trip") {
    import graft.sources.Warc
    val cases = Seq(
      ("café münchen à noël", "ISO-8859-1", "iso-8859-1"),
      // € (0x80) and curly quotes exist in cp1252 but NOT in latin-1
      ("price €99 “quoted” — dash", "windows-1252",
        "windows-1252"),
      ("日本語のテキスト", "Shift_JIS",
        "shift_jis"))
    for ((text, enc, want) <- cases) {
      val headers = s"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=$enc"
      val body = text.getBytes(java.nio.charset.Charset.forName(enc))
      val (got, cs) = Warc.decodeText("response", headers, body)
      assert(got == text, s"$enc round-trip")
      assert(cs == want, s"$enc reported charset")
      // the blind-UTF-8 cast this replaces WOULD have produced mojibake
      assert(new String(body, "UTF-8") != text || text.forall(_ < 128),
        s"$enc case must actually exercise non-UTF-8 bytes")
    }
  }

  test("decodeText: meta-tag fallback, wrong-label repair, unlabeled ladder") {
    import graft.sources.Warc
    // 1. no HTTP charset, <meta charset> in the first KB wins
    val jp = "東京の天気"
    val metaDoc = s"""<html><head><meta charset="shift_jis"></head>""" +
      s"""<body>$jp</body></html>"""
    val metaBody = metaDoc.getBytes(
      java.nio.charset.Charset.forName("Shift_JIS"))
    val (mGot, mCs) = Warc.decodeText("response",
      "HTTP/1.1 200 OK\r\nContent-Type: text/html", metaBody)
    assert(mCs == "shift_jis" && mGot.contains(jp))
    // 2. meta http-equiv spelling works too
    val eqDoc = "<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=ISO-8859-1\"></head>" +
      "<body>façade</body></html>"
    val (eGot, eCs) = Warc.decodeText("response",
      "HTTP/1.1 200 OK\r\nContent-Type: text/html",
      eqDoc.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(eCs == "iso-8859-1" && eGot.contains("façade"))
    // 3. WRONG-LABEL REPAIR: bytes are valid non-trivial UTF-8 but the
    // label says latin-1 — mislabeled UTF-8 is endemic in crawls
    val utf8Text = "naïve café résumé"
    val (rGot, rCs) = Warc.decodeText("response",
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1",
      utf8Text.getBytes("UTF-8"))
    assert(rCs == "utf-8", "valid multi-byte UTF-8 overrides a latin label")
    assert(rGot == utf8Text)
    // ...but a TRUE latin-1 body under the same label is untouched
    // (its high bytes do not form valid UTF-8 sequences)
    val (tGot, tCs) = Warc.decodeText("response",
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1",
      utf8Text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(tCs == "iso-8859-1" && tGot == utf8Text)
    // 4. unlabeled: valid UTF-8 → utf-8; invalid → ISO-8859-1 default
    val (uGot, uCs) = Warc.decodeText("response",
      "HTTP/1.1 200 OK\r\nContent-Type: text/html",
      utf8Text.getBytes("UTF-8"))
    assert(uCs == "utf-8" && uGot == utf8Text)
    val (lGot, lCs) = Warc.decodeText("response",
      "HTTP/1.1 200 OK\r\nContent-Type: text/html",
      utf8Text.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(lCs == "iso-8859-1" && lGot == utf8Text,
      "non-UTF-8 unlabeled bytes fall back to the HTTP default and " +
        "round-trip losslessly")
    // 5. an unknown charset label falls through the ladder, not crashes
    val (kGot, kCs) = Warc.decodeText("response",
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=x-bogus-enc",
      utf8Text.getBytes("UTF-8"))
    assert(kCs == "utf-8" && kGot == utf8Text)
    // 6. non-response records (WET conversions) decode as UTF-8
    val (wGot, wCs) = Warc.decodeText("conversion", "",
      utf8Text.getBytes("UTF-8"))
    assert(wCs == "utf-8" && wGot == utf8Text)
  }

  // ---- ADC re-rank refinement (r17 verdict #4, the FAISS refine) ----

  test("annPqRerank: refine buys recall back, monotone in c, exact at c = corpus") {
    import graft.ops.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .cache()
    val dim = 64
    def rerankAt(c: Int): Double =
      Similarity.annPqRerankRecallAudit(emb, "vec_id", "embedding",
        col("vec_id") < 5, dim, m = 8, kCodes = 32, topK = 5, c = c)
        .agg(avg("recall")).collect().head.getDouble(0)
    val raw = Similarity.annPqRecallAudit(emb, "vec_id", "embedding",
      col("vec_id") < 5, dim, m = 8, kCodes = 32, topK = 5)
      .agg(avg("recall")).collect().head.getDouble(0)
    // c = topK re-orders the same ADC picks — identical SET, so the
    // recall (a set measure) must equal raw ADC exactly
    val r5 = rerankAt(5)
    assert(math.abs(r5 - raw) < 1e-9, s"c=topK must equal raw ADC ($r5 vs $raw)")
    // monotone in c: a larger candidate pool can only move the
    // re-ranked top-k TOWARD the exact top-k (anything that displaces
    // a truth member would itself be a truth member)
    val r20 = rerankAt(20)
    val r80 = rerankAt(80)
    assert(r20 >= r5 - 1e-9 && r80 >= r20 - 1e-9,
      s"recall must be monotone in c: $r5 -> $r20 -> $r80")
    assert(r80 > raw,
      s"refine must buy recall back over raw ADC ($r80 vs $raw)")
    // with c = the whole corpus the re-rank IS the exact scan
    val rAll = rerankAt(emb.count().toInt)
    assert(math.abs(rAll - 1.0) < 1e-9, s"c=N must be exact, got $rAll")
    assert(intercept[IllegalArgumentException](rerankAt(4))
      .getMessage.contains(">= topK"))
    emb.unpersist()
    ()
  }

  test("readWarc end-to-end: mixed-charset segment decodes every page; pages() uses the decode") {
    import graft.sources.Warc
    val dir = tmpDir("warc-charset")
    try {
      val latin = "café crème brûlée"
      val jp = "こんにちは世界"
      val utf = "plain ascii with élèves in UTF-8"
      val bytes =
        gzipMember(rec("response", "https://fr.example.org/a",
          "2024-05-01T10:00:00Z",
          httpResponse(s"<html><body>$latin</body></html>", "ISO-8859-1",
            Some("ISO-8859-1")))) ++
        gzipMember(rec("response", "https://jp.example.org/b",
          "2024-05-01T11:00:00Z",
          httpResponse(s"<html><body>$jp</body></html>", "Shift_JIS",
            Some("Shift_JIS")))) ++
        gzipMember(rec("response", "https://en.example.org/c",
          "2024-05-01T12:00:00Z",
          httpResponse(s"<html><body>$utf</body></html>", "UTF-8", None)))
      java.nio.file.Files.write(
        new java.io.File(dir, "seg-00000.warc.gz").toPath, bytes)
      val df = Warc.readWarc(spark, dir.getAbsolutePath).cache()
      val byUrl = df.collect().map(r =>
        r.getAs[String]("url") -> (r.getAs[String]("text"),
          r.getAs[String]("charset"))).toMap
      assert(byUrl("https://fr.example.org/a")._1.contains(latin))
      assert(byUrl("https://fr.example.org/a")._2 == "iso-8859-1")
      assert(byUrl("https://jp.example.org/b")._1.contains(jp))
      assert(byUrl("https://jp.example.org/b")._2 == "shift_jis")
      assert(byUrl("https://en.example.org/c")._1.contains(utf))
      assert(byUrl("https://en.example.org/c")._2 == "utf-8")
      // the crawl-chain adapter consumes the DECODED text
      val pages = Warc.pages(df).collect()
        .map(r => r.getAs[String]("source") -> r.getAs[String]("html")).toMap
      assert(pages("fr.example.org").contains(latin))
      assert(pages("jp.example.org").contains(jp))
      df.unpersist()
    } finally rm(dir)
  }

  test("http_status: readWarc exposes the response code; pages() keeps 2xx and no-status records only") {
    import graft.sources.Warc
    val dir = tmpDir("warc-status")
    try {
      def resp(status: String, body: String): Array[Byte] =
        (s"HTTP/1.1 $status\r\nContent-Type: text/html\r\n\r\n$body")
          .getBytes("UTF-8")
      val bytes =
        gzipMember(rec("response", "https://ok.example.org/a",
          "2024-05-01T10:00:00Z", resp("200 OK", "<html>good page</html>"))) ++
        gzipMember(rec("response", "https://gone.example.org/b",
          "2024-05-01T11:00:00Z",
          resp("404 Not Found", "<html>error page chrome</html>"))) ++
        gzipMember(rec("response", "https://moved.example.org/c",
          "2024-05-01T12:00:00Z",
          resp("301 Moved Permanently", "<html>redirect stub</html>"))) ++
        gzipMember(rec("conversion", "https://wet.example.org/d",
          "2024-05-01T13:00:00Z", "plain wet text".getBytes("UTF-8")))
      java.nio.file.Files.write(
        new java.io.File(dir, "seg-00000.warc.gz").toPath, bytes)
      val df = Warc.readWarc(spark, dir.getAbsolutePath).cache()
      val st = df.collect().map { r =>
        r.getAs[String]("url") ->
          (if (r.isNullAt(r.fieldIndex("http_status"))) None
           else Some(r.getAs[Int]("http_status")))
      }.toMap
      assert(st("https://ok.example.org/a") == Some(200))
      assert(st("https://gone.example.org/b") == Some(404))
      assert(st("https://moved.example.org/c") == Some(301))
      assert(st("https://wet.example.org/d") == None)
      // the corpus adapter: 404 error pages and 3xx stubs are noise;
      // the 200 and the statusless WET conversion survive
      val kept = Warc.pages(df).collect().map(_.getAs[String]("source")).toSet
      assert(kept == Set("ok.example.org", "wet.example.org"))
      df.unpersist()
    } finally rm(dir)
  }

  // ---- deeper published-vocab parity (verdict #5) ----

  /** The first 35 merges of the published GPT-2 vocab.bpe
    * (openai/gpt-2, Radford et al. 2019) — a 5× extension of
    * Round19's 7-merge prefix. Offline methodology: the prefix is
    * reconstructed from the published file and CROSS-VALIDATED by
    * four independently-attested encoder.json ids that the 256+rank
    * convention must reproduce — ' to' = 284 (rank 28), ' of' = 286
    * (rank 30), ' in' = 287 (rank 31), ' and' = 290 (rank 34) — on
    * top of Round19's ' the' = 262 (rank 6). Any missing, extra or
    * misplaced merge before rank 34 shifts at least one anchor. The
    * fixture deliberately stops where independent anchors stop: an
    * unvalidated deeper prefix would pin "parity" against data the
    * build cannot verify offline. */
  private val Gpt2First35 = Seq(
    ("Ġ", "t"), ("Ġ", "a"), ("h", "e"), ("i", "n"),
    ("r", "e"), ("o", "n"), ("Ġt", "he"), ("e", "r"),
    ("Ġ", "s"), ("a", "t"), ("Ġ", "w"), ("Ġ", "o"),
    ("e", "n"), ("Ġ", "c"), ("i", "t"), ("i", "s"),
    ("a", "n"), ("o", "r"), ("e", "s"), ("Ġ", "b"),
    ("e", "d"), ("Ġ", "f"), ("in", "g"), ("Ġ", "p"),
    ("o", "u"), ("Ġa", "n"), ("a", "l"), ("a", "r"),
    ("Ġt", "o"), ("Ġ", "m"), ("Ġo", "f"), ("Ġ", "in"),
    ("Ġ", "d"), ("Ġ", "h"), ("Ġan", "d"))

  test("gpt2Encoder reproduces the published ids at depth 35 (four independent anchors)") {
    import graft.sources.Tokenizers
    val enc = Tokenizers.gpt2Encoder(Gpt2First35)
    // Round19's anchors still hold under the extended prefix
    assert(enc("Ġ") == 220 && enc("Ġthe") == 262)
    // the four NEW published-id anchors, each 256 + its merge rank
    assert(enc("Ġto") == 284)
    assert(enc("Ġof") == 286)
    assert(enc("Ġin") == 287)
    assert(enc("Ġand") == 290)
    // intermediate outputs the anchors lock in place
    assert(enc("er") == 263 && enc("ing") == 278 && enc("ou") == 280)
  }

  test("encode parity at depth 35: whole-word tokens come out as ONE published id") {
    import graft.ops.TextOps
    import graft.sources.Tokenizers
    import spark.implicits._
    val enc = Tokenizers.gpt2Encoder(Gpt2First35)
    val out = Seq(" to the", " in and of", "bring")
      .toDF("text")
      .select(TextOps.bpeEncodeByteLevel(col("text"), Gpt2First35).as("t"))
      .collect().map(_.getSeq[String](0).toVector)
    // each function word is a single published token id now — at
    // depth 7 ' to' / ' of' / ' in' / ' and' all still split
    assert(out(0) == Vector("Ġto", "Ġthe"))
    assert(out(0).map(enc) == Vector(284, 262))
    assert(out(1) == Vector("Ġin", "Ġand", "Ġof"))
    assert(out(1).map(enc) == Vector(287, 290, 286))
    // merge chain inside a content word: in + g fires at rank 22
    assert(out(2) == Vector("b", "r", "ing"))
    assert(out(2).map(enc) == Vector(65, 81, 278))
  }

  test("tokenizer.json round-trip preserves the depth-35 published numbering") {
    import graft.sources.Tokenizers
    val dir = tmpDir("hf35")
    try {
      val enc = Tokenizers.gpt2Encoder(Gpt2First35)
      Tokenizers.writeHfTokenizer(spark, s"$dir/tokenizer.json",
        Gpt2First35, enc)
      val (m2, v2) = Tokenizers.readHfTokenizer(spark, s"$dir/tokenizer.json")
      assert(m2 == Gpt2First35)
      assert(v2("Ġand") == 290 && v2("Ġto") == 284 && v2("Ġthe") == 262)
      assert(v2 == enc)
    } finally rm(dir)
  }

  // ---- incremental PageRank (verdict #6) ----

  /** Deterministic weighted digraph: node space 0..22, two halves that
    * only the delta bridges. */
  private def prEdges(rows: Seq[(Long, Long, Long)]) = {
    val s = spark; import s.implicits._
    rows.toDF("src", "dst", "w")
  }

  test("pageRankWeightedDelta == full recompute on the grown graph, bit-exact") {
    val old = prEdges((0 until 60).map { i =>
      (i.toLong % 11, (i.toLong * 7 + 3) % 11, i.toLong % 5 + 1)
    })
    val delta = prEdges(Seq(
      (1L, 12L, 2L),   // edge into a brand-new node
      (12L, 13L, 1L),  // new source chain
      (13L, 3L, 4L),   // back into the old graph
      (0L, 5L, 9L),    // parallel row to a possibly-existing (src,dst)
      (14L, 14L, 1L))) // new self-loop island
    val hist = graft.ops.Graph.pageRankWeightedHistory(old, iters = 5)
    val viaDelta = graft.ops.Graph
      .pageRankWeightedDelta(old, hist, delta, iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = graft.ops.Graph
      .pageRankWeighted(old.unionByName(delta), iters = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaDelta == full)
    assert(full.nonEmpty)
  }

  test("pageRankWeightedDelta is actually incremental: nodes outside the delta's reach come from the stored history, not a recompute") {
    // component A (0..4 ring) and component B (100..104 ring), no
    // cross edges; the delta touches only A.
    def ring(base: Long) = (0 until 5).map { i =>
      (base + i, base + (i + 1) % 5, 1L)
    }
    val old = prEdges(ring(0) ++ ring(100))
    val delta = prEdges(Seq((2L, 3L, 5L)))
    val hist = graft.ops.Graph.pageRankWeightedHistory(old, iters = 3)
    // poison B's FINAL history ranks: if the delta path recomputed B it
    // would heal the poison; reading the store it must carry it through
    val poisoned = hist.withColumn("r",
      when(col("iter") === 3 && col("node") >= 100L, lit(-777L))
        .otherwise(col("r")))
    val out = graft.ops.Graph
      .pageRankWeightedDelta(old, poisoned, delta, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (100L to 104L).foreach { n => assert(out(n) == -777L, s"node $n") }
    // ...while A (inside the reach) matches the true full recompute
    val full = graft.ops.Graph
      .pageRankWeighted(old.unionByName(delta), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0L to 4L).foreach { n => assert(out(n) == full(n), s"node $n") }
  }

  // ---- label propagation ----

  test("labelPropagation: two bridged triangles split into two communities (hand-traced sync/min-tie trace)") {
    val s = spark; import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
      .toDF("id1", "id2")
    val out = graft.ops.Graph.labelPropagation(pairs, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // synchronous updates with min-label ties, traced by hand:
    // iter3 settles the left triangle on 1 and the right on 3
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L))
  }

  // ---- special-token-aware encode ----

  test("bpeEncodeWithSpecials: specials come out whole, BPE never merges across them, ids follow the production numbering") {
    import graft.ops.TextOps
    val s = spark; import s.implicits._
    val eot = "<|endoftext|>"
    val out = Seq(
        s"the${eot}the",
        s"$eot$eot",            // adjacent specials, empty segments drop
        " to the")               // no special at all
      .toDF("text")
      .select(
        TextOps.bpeEncodeWithSpecials(col("text"), Gpt2First35, Seq(eot))
          .as("t"),
        TextOps.bpeEncodeToIdsWithSpecials(col("text"), Gpt2First35, Seq(eot))
          .as("ids"))
      .collect()
      .map(r => (r.getSeq[String](0).toVector, r.getSeq[Int](1).toVector))
    // 'the' without leading space: t + he (rank-2 merge); the special is
    // ONE token and its id sits after the merges: 256 + 35 = 291.
    // Base-unit ids are the byteLevelVocab BYTE-order convention
    // ('t' = 116), matching bpeEncodeToIds — not gpt2Encoder's
    // published printable-first order.
    assert(out(0)._1 == Vector("t", "he", eot, "t", "he"))
    assert(out(0)._2 == Vector(116, 258, 291, 116, 258))
    assert(out(1)._1 == Vector(eot, eot))
    assert(out(1)._2 == Vector(291, 291))
    assert(out(2)._1 == Vector("Ġto", "Ġthe"))
    assert(out(2)._2 == Vector(284, 262))
    // the published GPT-2 sizing drops out of the numbering formula:
    // 256 base units + 50 000 merges -> <|endoftext|> = 50 256
    val synth = (0 until 50000).map { i =>
      (graft.functions.ByteLevelUnits.byteToChar(i / 256).toString,
        graft.functions.ByteLevelUnits.byteToChar(i % 256).toString)
    }
    assert(TextOps.byteLevelVocabWithSpecials(synth, Seq(eot))(eot) == 50256)
  }

  // ---- personalized PageRank ----

  test("pageRankPersonalized: teleport lands only on seeds; hand-computed exact values; unreachable components get no rank") {
    val s = spark; import s.implicits._
    // seed A=1 links to B=2; C=100→D=101 is a separate component with
    // no seed — it must be absent entirely
    val edges = Seq((1L, 2L, 1L), (100L, 101L, 3L)).toDF("src", "dst", "w")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val out = graft.ops.Graph.pageRankPersonalized(edges, seeds, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // iter1: A = teleport 150000; B = (1e6*17*1) div (20*1) = 850000
    // iter2: A = 150000; B = (150000*17) div 20 = 127500
    assert(out == Map(1L -> 150000L, 2L -> 127500L))
  }

  // ---- incremental Naive Bayes (count-form sufficient statistics) ----

  test("naiveBayesCounts merge: any batch order == batch retrain, integer-exact") {
    import graft.ops.TextOps
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog ran"),
      (3L, "es", "el gato duerme"),
      (4L, "es", "el perro corre y corre"),
      (5L, "fr", "le chat dort"),
      (6L, "en", "a cat and a dog")).toDF("doc_id", "lang", "text")
    def model(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSet
    val batch = model(TextOps.trainNaiveBayes(docs, "lang", "text"))
    val slice = (p: Int) => TextOps.naiveBayesCounts(
      docs.filter(col("doc_id") % 3 === p), "lang", "text")
    // three slices, merged in two DIFFERENT association orders
    val m1 = TextOps.naiveBayesFromCounts(TextOps.mergeNaiveBayesCounts(
      TextOps.mergeNaiveBayesCounts(slice(0), slice(1)), slice(2)))
    val m2 = TextOps.naiveBayesFromCounts(TextOps.mergeNaiveBayesCounts(
      slice(2), TextOps.mergeNaiveBayesCounts(slice(1), slice(0))))
    assert(model(m1) == batch)
    assert(model(m2) == batch)
  }

  // ---- persisted rank store + streaming maintenance ----

  test("RankStore: deltas chain through the persisted history; replayed batchIds are no-ops") {
    import graft.sources.RankStore
    val dir = tmpDir("rankstore")
    try {
      val a = prEdges((0 until 40).map { i =>
        (i.toLong % 9, (i.toLong * 5 + 2) % 9, i.toLong % 3 + 1) })
      val b = prEdges(Seq((2L, 20L, 3L), (20L, 21L, 1L), (21L, 0L, 2L)))
      val c = prEdges(Seq((7L, 30L, 4L), (30L, 2L, 1L)))
      RankStore.init(spark, dir.toString, a, iters = 4)
      def stored = RankStore.ranks(spark, dir.toString)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def full(e: org.apache.spark.sql.DataFrame) =
        graft.ops.Graph.pageRankWeighted(e, iters = 4)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(stored == full(a))
      assert(RankStore.appendDelta(spark, dir.toString, b, batchId = 0L))
      assert(stored == full(a.unionByName(b)))
      assert(RankStore.appendDelta(spark, dir.toString, c, batchId = 1L))
      val afterC = stored
      assert(afterC == full(a.unionByName(b).unionByName(c)))
      // restart-replay guard: an already-applied batchId is a no-op
      assert(!RankStore.appendDelta(spark, dir.toString, c, batchId = 1L))
      assert(stored == afterC)
      // the covered edge set is exactly the three batches
      assert(RankStore.edges(spark, dir.toString).count() == 40 + 3 + 2)
    } finally rm(dir)
  }

  test("pageRankMaintainStream: live edge batches maintain the store across a kill-and-restart; final == full recompute") {
    import graft.sources.RankStore
    val s = spark
    import s.implicits._
    val dir = tmpDir("rankstream")
    try {
      val store = s"$dir/store"
      val inDir = s"$dir/in"
      val ckpt = s"$dir/ckpt"
      val base = prEdges((0 until 30).map { i =>
        (i.toLong % 7, (i.toLong * 3 + 1) % 7, i.toLong % 4 + 1) })
      RankStore.init(spark, store, base, iters = 3)
      val d1 = Seq((3L, 50L, 2L), (50L, 51L, 1L))
      val d2 = Seq((51L, 3L, 4L), (1L, 60L, 1L))
      d1.toDF("src", "dst", "w").coalesce(1).write.mode("append").parquet(inDir)
      def startQuery() = {
        val stream = s.readStream
          .schema(d1.toDF("src", "dst", "w").schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir)
        graft.streaming.EventStreams.pageRankMaintainStream(stream, store)
          .option("checkpointLocation", ckpt).start()
      }
      val q1 = startQuery()
      try q1.processAllAvailable() finally q1.stop()
      // batch 1 applied; the store now serves base+d1 ranks
      def stored = RankStore.ranks(spark, store)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def full(rows: Seq[(Long, Long, Long)]) =
        graft.ops.Graph.pageRankWeighted(
          base.unionByName(prEdges(rows)), iters = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(stored == full(d1))
      // kill; second delta arrives while the query is down
      d2.toDF("src", "dst", "w").coalesce(1).write.mode("append").parquet(inDir)
      val q2 = startQuery()
      try q2.processAllAvailable() finally q2.stop()
      assert(stored == full(d1 ++ d2))
      // the applied-batch high-water mark survived the checkpoint: a
      // manual replay of an old streaming batchId cannot double-apply
      assert(!RankStore.appendDelta(spark, store,
        d2.toDF("src", "dst", "w"), batchId = 0L))
      assert(stored == full(d1 ++ d2))
    } finally rm(dir)
  }
}
