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
}
