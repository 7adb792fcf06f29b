package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-19 work (driver round 17): the r16 verdict's consumer-side
  * and maintenance gaps — tar-shard ingest, tokenizer artifact
  * persistence + published-vocab parity, the WARC link graph, and
  * automated IVF retrain-and-swap — plus pins for the round's ADVICE
  * fixes (streaming WARC parse, crash-safe cell removal). */
class Round19OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmpDir(prefix: String): java.io.File =
    java.nio.file.Files.createTempDirectory(prefix).toFile
  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
  }

  // ---- TarShards.read: the WebDataset round-trip consumer side ----

  test("TarShards.read: write→read round-trip through the public APIs") {
    import graft.sources.TarShards
    import spark.implicits._
    val dir = tmpDir("tar-read")
    try {
      val rows = ((0 until 12).map { i =>
        (f"sample-$i%04d", s"payload $i content".getBytes("UTF-8"), i % 2)
      } :+ (("dotted.key-x", "dot payload".getBytes("UTF-8"), 0)))
        .toDF("key", "payload", "shard")
      TarShards.write(rows, dir.getAbsolutePath, "key", "payload", "shard",
        nShards = 2, ext = "txt")
      val back = TarShards.read(spark, dir.getAbsolutePath + "/*.tar")
        .select("key", "ext", "payload", "n_bytes")
        .collect()
      assert(back.length == 13)
      assert(back.map(_.getString(1)).toSet == Set("txt"),
        "ext must come from the LAST dot, so dotted keys survive")
      val byKey = back.map(r => r.getString(0) ->
        new String(r.getAs[Array[Byte]]("payload"), "UTF-8")).toMap
      assert(byKey("dotted.key-x") == "dot payload")
      (0 until 12).foreach { i =>
        assert(byKey(f"sample-$i%04d") == s"payload $i content")
      }
      back.foreach(r => assert(r.getInt(3) ==
        r.getAs[Array[Byte]]("payload").length))
    } finally rm(dir)
  }

  test("TarShards.read: a truncated shard fails loudly, not silently short") {
    import graft.sources.TarShards
    import spark.implicits._
    val dir = tmpDir("tar-trunc")
    try {
      val rows = Seq(("k1", ("x" * 600).getBytes("UTF-8"), 0),
        ("k2", "second".getBytes("UTF-8"), 0)).toDF("key", "payload", "shard")
      TarShards.write(rows, dir.getAbsolutePath, "key", "payload", "shard",
        nShards = 1)
      val shard = new java.io.File(dir, "shard-00000.tar")
      val whole = java.nio.file.Files.readAllBytes(shard.toPath)
      // keep the first header (size 600) but cut into its data region
      java.nio.file.Files.write(shard.toPath, whole.take(612))
      // drop the local-FS checksum sidecar so the re-read isn't rejected
      // by Hadoop's CRC before our parser even sees the bytes
      new java.io.File(dir, ".shard-00000.tar.crc").delete()
      val e = intercept[org.apache.spark.SparkException] {
        TarShards.read(spark, shard.getAbsolutePath).count()
      }
      assert(e.getMessage.contains("truncated") ||
        Option(e.getCause).exists(_.getMessage.contains("truncated")))
    } finally rm(dir)
  }

  // ---- tokenizer artifact persistence + PUBLISHED-vocab parity ----

  // The first 7 merges of the published GPT-2 vocab.bpe (openai/gpt-2;
  // Radford et al. 2019). Rank 6 producing 'Ġthe' pins ' the' = 262
  // under the 256+rank convention — the single best-attested GPT-2
  // token id.
  private val Gpt2First7 = Seq(
    ("Ġ", "t"), ("Ġ", "a"), ("h", "e"), ("i", "n"),
    ("r", "e"), ("o", "n"), ("Ġt", "he"))

  test("gpt2Encoder reproduces the PUBLISHED GPT-2 id numbering") {
    import graft.sources.Tokenizers
    val enc = Tokenizers.gpt2Encoder(Gpt2First7)
    // base-unit anchors of the published encoder.json: printables
    // '!'..'~' are 0..93, '¡' starts the second kept range at 94,
    // remapped control bytes start at 188 ('Ā' = byte 0), and space
    // ('Ġ' = byte 32, the 33rd remapped byte) is 220
    assert(enc("!") == 0)
    assert(enc("~") == 93)
    assert(enc("¡") == 94)
    assert(enc("ÿ") == 187)
    assert(enc("Ā") == 188)
    assert(enc("Ġ") == 220)
    // merge outputs are 256+rank: ' the' is the published 262
    assert(enc("Ġthe") == 262)
    assert(enc("Ġt") == 256 && enc("he") == 258)
  }

  test("encode parity against the published merges prefix (contraction + non-ASCII)") {
    import graft.ops.TextOps
    import graft.sources.Tokenizers
    import spark.implicits._
    val enc = Tokenizers.gpt2Encoder(Gpt2First7)
    val out = Seq(" the theatre", "don't", "café")
      .toDF("text")
      .select(TextOps.bpeEncodeByteLevel(col("text"), Gpt2First7).as("t"))
      .collect().map(_.getSeq[String](0).toVector)
    assert(out(0) == Vector("Ġthe", "Ġthe", "a", "t", "re"))
    assert(out(0).map(enc) == Vector(262, 262, 64, 83, 260))
    // 'don't': the contraction alternative emits "'t" whole; its units
    // have no merge in the prefix, so ' and t stay base ids
    assert(out(1) == Vector("d", "on", "'", "t"))
    assert(out(1).map(enc) == Vector(67, 261, 6, 83))
    // café: é is bytes 0xC3 0xA9 → units Ã © (both kept printables)
    assert(out(2) == Vector("c", "a", "f", "Ã", "©"))
    assert(out(2).map(enc) == Vector(66, 64, 69, 127, 102))
  }

  test("tokenizer artifact: write→read round-trip in the GPT-2 layout") {
    import graft.ops.TextOps
    import graft.sources.Tokenizers
    import spark.implicits._
    val dir = tmpDir("tok-artifact")
    try {
      val corpus = Seq(
        "the theatre held the other theory",
        "the weathered leather tethered there",
        "don't gather feathers, the heathen said").toDF("text")
      val trained = TextOps.bpeTrainByteLevel(corpus, "text", nMerges = 12)
      val merges = Tokenizers.mergesFrom(trained)
      assert(merges.size == 12)
      Tokenizers.writeGpt2Tokenizer(spark, dir.getAbsolutePath, merges)
      val (m2, e2) = Tokenizers.readGpt2Tokenizer(spark, dir.getAbsolutePath)
      assert(m2 == merges, "merges must survive the vocab.bpe round-trip")
      assert(e2 == Tokenizers.gpt2Encoder(merges),
        "encoder.json must survive the JSON round-trip (incl. \\u escapes)")
      // the reloaded artifact encodes identically to the in-memory one
      val probe = Seq("the weather there, don't gather").toDF("text")
      val a = probe.select(TextOps.bpeEncodeByteLevel(col("text"), merges))
        .collect().map(_.getSeq[String](0)).head
      val b = probe.select(TextOps.bpeEncodeByteLevel(col("text"), m2))
        .collect().map(_.getSeq[String](0)).head
      assert(a == b)
      // internal byte-order numbering persists too when passed explicitly
      Tokenizers.writeGpt2Tokenizer(spark, dir.getAbsolutePath + "/alt",
        merges, TextOps.byteLevelVocab(merges))
      val (_, eAlt) =
        Tokenizers.readGpt2Tokenizer(spark, dir.getAbsolutePath + "/alt")
      assert(eAlt == TextOps.byteLevelVocab(merges))
    } finally rm(dir)
  }

  test("tokenizer artifact: mismatched pair and malformed files fail loudly") {
    import graft.sources.Tokenizers
    val dir = tmpDir("tok-bad")
    try {
      Tokenizers.writeGpt2Tokenizer(spark, dir.getAbsolutePath, Gpt2First7)
      // corrupt the encoder: drop the 'Ġthe' entry
      val encPath = new java.io.File(dir, "encoder.json").toPath
      val enc = new String(java.nio.file.Files.readAllBytes(encPath), "UTF-8")
      assert(enc.contains(", \"\\u0120the\": 262"), "probe entry must exist")
      java.nio.file.Files.write(encPath, enc
        .replace(", \"\\u0120the\": 262", "").getBytes("UTF-8"))
      // drop the local-FS checksum sidecar the out-of-band rewrite broke
      new java.io.File(dir, ".encoder.json.crc").delete()
      val e = intercept[IllegalArgumentException] {
        Tokenizers.readGpt2Tokenizer(spark, dir.getAbsolutePath)
      }
      assert(e.getMessage.contains("mismatched"))
      // malformed JSON is rejected, not half-parsed
      java.nio.file.Files.write(encPath, "{\"a\": }".getBytes("UTF-8"))
      new java.io.File(dir, ".encoder.json.crc").delete()
      intercept[IllegalArgumentException] {
        Tokenizers.readGpt2Tokenizer(spark, dir.getAbsolutePath)
      }
    } finally rm(dir)
  }
}
