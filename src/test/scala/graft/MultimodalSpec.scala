package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{MediaRecord, Multimodal}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq((1L, "hello multimodal world"), (2L, "another payload")).toDF("doc_id", "text")

  test("declarative and mapPartitions paths agree on the stub decode") {
    implicit val s = spark
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val declarative = Multimodal.featureColumns(media)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(3), r.getInt(4), r.getString(5)))).toMap
    val typed = Multimodal.extractFeatures(media.as[MediaRecord])
      .collect().map(f => f.doc_id -> ((f.n_bytes, f.width, f.height, f.content_hash))).toMap
    assert(declarative == typed)
    assert(declarative(1L)._1 == "hello multimodal world".getBytes("UTF-8").length.toLong)
    val (_, w, h, hash) = declarative(1L)
    assert(w >= 1 && w <= 1024 && h >= 1 && h <= 1024)
    assert(hash.length == 32)
  }

  test("media payload column prunes away when only features are selected") {
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val plan = media.select("doc_id").queryExecution.optimizedPlan.toString
    assert(!plan.contains("payload"))
  }

  test("frameSample: contiguous cover, last frame takes remainder, hashes differ") {
    import spark.implicits._
    val media = Multimodal.asMediaTable(
      Seq((1L, "abcdefghij"), (2L, "xy")).toDF("doc_id", "text"), "doc_id", "text")
    val rows = Multimodal.frameSample(media, 4)
      .orderBy($"doc_id", $"frame_idx").collect()
    val d1 = rows.filter(_.getLong(0) == 1L)
    assert(d1.map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1, 0L, 2L), (2, 2L, 3L), (3, 5L, 2L), (4, 7L, 3L))) // covers 10 bytes
    assert(d1.map(_.getString(4)).distinct.length == 4)
    // 2-byte payload: frames 2 and 4 carry the bytes, empties dropped
    val d2 = rows.filter(_.getLong(0) == 2L)
    assert(d2.map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((2, 0L, 1L), (4, 1L, 1L)))
  }

  test("codec seam: an alternate codec flows through the same plumbing as the stub") {
    implicit val s = spark
    val media = Multimodal.asMediaTable(docs, "doc_id", "text").as[MediaRecord]
    // a fake "real" codec with different decode logic and a lifecycle
    // counter proving open() runs per-partition, not per-row
    val opens = spark.sparkContext.longAccumulator("codec-opens")
    val alt = new Multimodal.MediaCodec {
      def open(): Multimodal.MediaCodec.Session = {
        opens.add(1L)
        new Multimodal.MediaCodec.Session {
          def decode(mediaType: String, payload: Array[Byte]) =
            Multimodal.MediaCodec.Decoded(
              payload.length, payload.headOption.map(_.toInt & 0xff).getOrElse(0),
              s"alt-${payload.length}")
        }
      }
    }
    val out = Multimodal.extractFeatures(media.repartition(2), alt)
      .collect().map(f => f.doc_id -> ((f.n_bytes, f.width, f.height, f.content_hash))).toMap
    // same schema/row flow, alternate per-row metadata
    assert(out(1L) == (("hello multimodal world".length.toLong,
      "hello multimodal world".length, 'h'.toInt, s"alt-${"hello multimodal world".length}")))
    assert(out.keySet == Set(1L, 2L))
    assert(opens.value == 2L, s"open() once per partition, got ${opens.value}")
    // and the default codec is the stub: identical to the declarative path
    val stub = Multimodal.extractFeatures(media)
      .collect().map(f => f.doc_id -> ((f.width, f.height, f.content_hash))).toMap
    val declarative = Multimodal.featureColumns(media.toDF())
      .collect().map(r => r.getLong(0) -> ((r.getInt(3), r.getInt(4), r.getString(5)))).toMap
    assert(stub == declarative)
  }

  /** Encode a real wxh image as `fmt` ("png"/"bmp") bytes via ImageIO —
    * pixels seeded from (doc_id, x, y) so every image is distinct. */
  private def imageBytes(id: Long, w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((id * 2654435761L + x * 31 + y) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no JDK writer for $fmt")
    bos.toByteArray
  }

  test("ImageIo codec decodes REAL png/bmp bytes through the seam") {
    implicit val s = spark
    // real images, varied dims and formats, across multiple partitions
    val records = (1L to 12L).map { id =>
      val (w, h) = (3 + (id % 5).toInt * 7, 2 + (id % 3).toInt * 11)
      val fmt = if (id % 2 == 0) "png" else "bmp"
      (MediaRecord(id, s"image/$fmt", imageBytes(id, w, h, fmt)), w, h)
    }
    val expected = records.map { case (r, w, h) => r.doc_id -> ((w, h)) }.toMap
    val md5s = records.map { case (r, _, _) =>
      r.doc_id -> java.security.MessageDigest.getInstance("MD5")
        .digest(r.payload).map("%02x".format(_)).mkString
    }.toMap
    val media = spark.createDataset(records.map(_._1)).repartition(3)
    val out = Multimodal.extractFeatures(media, Multimodal.MediaCodec.ImageIo)
    // identical schema to the stub path — nothing downstream can tell
    // which codec produced the features
    assert(out.schema == Multimodal.extractFeatures(media).schema)
    val feats = out.collect().map(f => f.doc_id -> f).toMap
    assert(feats.keySet == expected.keySet)
    expected.foreach { case (id, (w, h)) =>
      assert(feats(id).width == w && feats(id).height == h,
        s"doc $id: decoded ${feats(id).width}x${feats(id).height}, wrote ${w}x$h")
      assert(feats(id).content_hash == md5s(id))
      assert(feats(id).n_bytes > 0L && feats(id).media_type.startsWith("image/"))
    }
    // and the codec rejects garbage instead of fabricating dimensions
    val bad = spark.createDataset(Seq(MediaRecord(99L, "image/png",
      "definitely not an image".getBytes("UTF-8"))))
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(bad, Multimodal.MediaCodec.ImageIo).collect()
    }
    assert(err.getMessage != null)
  }

  test("ImageIo and stub agree on content identity for the same bytes") {
    implicit val s = spark
    val recs = Seq(MediaRecord(1L, "image/png", imageBytes(1L, 8, 6, "png")))
    val media = spark.createDataset(recs)
    val real = Multimodal.extractFeatures(media, Multimodal.MediaCodec.ImageIo).head()
    val stub = Multimodal.extractFeatures(media).head()
    // byte identity is codec-independent; dimensions are codec-truth
    assert(real.content_hash == stub.content_hash)
    assert(real.width == 8 && real.height == 6)
  }

  /** 16x16 block image: an 8x8 grid of 2x2 cells, each fully black or
    * white per the `cells` bitmask (row-major, bit 63 = top-left). */
  private def blockImage(cells: Long, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (cy <- 0 until 8; cx <- 0 until 8) {
      val on = (cells >> (63 - (cy * 8 + cx))) & 1L
      val rgb = if (on == 1L) 0xffffff else 0x000000
      for (dy <- 0 until 2; dx <- 0 until 2)
        img.setRGB(cx * 2 + dx, cy * 2 + dy, rgb)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos))
    bos.toByteArray
  }

  test("perceptualDedup: real aHash pairs cross-format and near-identical images") {
    implicit val s = spark
    // left-half white, right-half black, as PNG (1) and BMP (2) — same
    // pixels, DIFFERENT bytes; (3) = one flipped cell (Hamming 1);
    // (4) = inverted pattern (Hamming 64: never a candidate)
    val half = (0 until 64).map(i => if (i % 8 < 4) 1L << (63 - i) else 0L)
      .reduce(_ | _)
    val recs = Seq(
      MediaRecord(1L, "image/png", blockImage(half, "png")),
      MediaRecord(2L, "image/bmp", blockImage(half, "bmp")),
      MediaRecord(3L, "image/png", blockImage(half ^ (1L << 63), "png")),
      MediaRecord(4L, "image/png", blockImage(~half, "png")))
    // byte hashes all differ — exact-dup joins see nothing here
    assert(recs.map(r => java.security.MessageDigest.getInstance("MD5")
      .digest(r.payload).toSeq).distinct.size == 4)
    val media = spark.createDataset(recs).repartition(2)
    val pairs = Multimodal.perceptualDedup(
        media, Multimodal.MediaCodec.ImageIo, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs == Map((1L, 2L) -> 0L, (1L, 3L) -> 1L, (2L, 3L) -> 1L),
      pairs.toString)
    // stub path: signatures derive from byte identity — distinct bytes,
    // no pairs (the engine-replayable oracle contract)
    assert(Multimodal.perceptualDedup(media, Multimodal.MediaCodec.Stub)
      .count() == 0L)
  }

  /** Encode interleaved samples in [-1, 1] as a real WAV byte stream via
    * javax.sound — 8-bit PCM_UNSIGNED or 16-bit PCM_SIGNED (LE). */
  private def wavBytes(samples: Array[Double], bits: Int,
      channels: Int): Array[Byte] = {
    import javax.sound.sampled._
    val enc = if (bits == 8) AudioFormat.Encoding.PCM_UNSIGNED
      else AudioFormat.Encoding.PCM_SIGNED
    val fmt = new AudioFormat(enc, 8000f, bits, channels,
      channels * bits / 8, 8000f, false)
    val bytes = new Array[Byte](samples.length * bits / 8)
    var i = 0
    while (i < samples.length) {
      if (bits == 8) {
        bytes(i) = (math.round(samples(i) * 127).toInt + 128).toByte
      } else {
        val v = math.round(samples(i) * 32767).toInt
        bytes(2 * i) = (v & 0xff).toByte
        bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt,
      (samples.length / channels).toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WavAudio codec decodes REAL wav bytes through the seam") {
    implicit val s = spark
    // varied frame counts / channels / bit depths, across partitions
    val records = (1L to 9L).map { id =>
      val frames = 64 + (id % 4).toInt * 100
      val channels = 1 + (id % 2).toInt
      val bits = if (id % 3 == 0) 8 else 16
      val samples = Array.tabulate(frames * channels)(i =>
        math.sin(2 * math.Pi * (id + 1) * i / 64.0) * 0.8)
      (MediaRecord(id, "audio/wav", wavBytes(samples, bits, channels)),
        frames, channels)
    }
    val media = spark.createDataset(records.map(_._1)).repartition(3)
    val out = Multimodal.extractFeatures(media, Multimodal.MediaCodec.WavAudio)
    assert(out.schema == Multimodal.extractFeatures(media).schema)
    val feats = out.collect().map(f => f.doc_id -> f).toMap
    records.foreach { case (r, frames, channels) =>
      val f = feats(r.doc_id)
      assert(f.width == frames && f.height == channels,
        s"doc ${r.doc_id}: decoded ${f.width}x${f.height}, wrote ${frames}ch$channels")
      assert(f.content_hash == java.security.MessageDigest.getInstance("MD5")
        .digest(r.payload).map("%02x".format(_)).mkString)
    }
    // garbage is rejected, never silently zero-dimensioned
    val bad = spark.createDataset(Seq(MediaRecord(99L, "audio/wav",
      "definitely not audio".getBytes("UTF-8"))))
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(bad, Multimodal.MediaCodec.WavAudio).collect()
    }
    assert(err.getMessage != null)
  }

  test("WavAudio decodes AIFF too: same waveform cross-CONTAINER pairs at Hamming 0") {
    implicit val s = spark
    import javax.sound.sampled._
    // the same 16-bit waveform written as WAV (little-endian) and AIFF
    // (big-endian): different containers, different byte order, same
    // samples — the audio analog of the PNG/BMP aHash collision, and
    // the big-endian decode arm's proof
    val frames = 64 * 4
    val samples = Array.tabulate(frames)(i =>
      if (i * 64 / frames >= 32) { if (i % 2 == 0) 0.9 else -0.9 } else 0.0)
    def encode(aiff: Boolean): Array[Byte] = {
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1,
        2, 8000f, aiff)
      val bytes = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (x, i) =>
        val v = math.round(x * 32767).toInt
        if (aiff) { bytes(2 * i) = ((v >> 8) & 0xff).toByte; bytes(2 * i + 1) = (v & 0xff).toByte }
        else { bytes(2 * i) = (v & 0xff).toByte; bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte }
      }
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais,
        if (aiff) AudioFileFormat.Type.AIFF else AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val recs = Seq(
      MediaRecord(1L, "audio/wav", encode(aiff = false)),
      MediaRecord(2L, "audio/aiff", encode(aiff = true)))
    assert(!java.util.Arrays.equals(recs(0).payload, recs(1).payload))
    val media = spark.createDataset(recs)
    // both decode through the same seam with identical frame counts
    val feats = Multimodal.extractFeatures(media, Multimodal.MediaCodec.WavAudio)
      .collect().map(f => f.doc_id -> ((f.width, f.height))).toMap
    assert(feats(1L) == ((frames, 1)) && feats(2L) == ((frames, 1)), feats.toString)
    val pairs = Multimodal.perceptualDedup(
        media, Multimodal.MediaCodec.WavAudio, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs == Map((1L, 2L) -> 0L), pairs.toString)
  }

  test("WavAudio perceptual hash: same waveform across bit depths pairs at Hamming 0") {
    implicit val s = spark
    val frames = 64 * 8
    // waveform A: silent first half, loud square second half; A' = one
    // leading block flipped loud (Hamming 1); B = A reversed (inverse
    // bands — never a candidate)
    def wave(blocks: Int => Boolean): Array[Double] =
      Array.tabulate(frames)(i =>
        if (blocks(i * 64 / frames)) { if (i % 2 == 0) 0.9 else -0.9 } else 0.0)
    val a = wave(b => b >= 32)
    val a1 = wave(b => b >= 32 || b == 0)
    val rev = wave(b => b < 32)
    val recs = Seq(
      MediaRecord(1L, "audio/wav", wavBytes(a, 16, 1)),
      MediaRecord(2L, "audio/wav", wavBytes(a, 8, 1)), // same wave, other depth
      MediaRecord(3L, "audio/wav", wavBytes(a1, 16, 1)),
      MediaRecord(4L, "audio/wav", wavBytes(rev, 16, 1)))
    // byte identities all differ — exact-dup joins see nothing
    assert(recs.map(r => java.security.MessageDigest.getInstance("MD5")
      .digest(r.payload).toSeq).distinct.size == 4)
    val media = spark.createDataset(recs).repartition(2)
    val pairs = Multimodal.perceptualDedup(
        media, Multimodal.MediaCodec.WavAudio, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs == Map((1L, 2L) -> 0L, (1L, 3L) -> 1L, (2L, 3L) -> 1L),
      pairs.toString)
  }

  test("MjpegAvi codec decodes a REAL MJPEG AVI; re-muxed footage collides " +
      "perceptually; garbage fails loudly") {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    // JDK-encoded JPEG frames: hard left/right halves survive the lossy
    // round trip with unambiguous 8x8 block means
    def jpegFrame(whiteRight: Boolean, w: Int = 32, h: Int = 24): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val white = if (whiteRight) x >= w / 2 else x < w / 2
        img.setRGB(x, y, if (white) 0xffffff else 0x000000)
      }
      val baos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def cc(s: String) = s.getBytes("US-ASCII")
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] =
      cc(fourcc) ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(subtype: String, inner: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(subtype) ++ inner)
    def avi(frames: Seq[Array[Byte]], junkChunk: Boolean): Array[Byte] = {
      val avih = new Array[Byte](56)
      le32(frames.length).copyToArray(avih, 16) // dwTotalFrames
      le32(32).copyToArray(avih, 32) // dwWidth
      le32(24).copyToArray(avih, 36) // dwHeight
      val hdrl = list("hdrl", chunk("avih", avih))
      val movi = list("movi", frames.map(f => chunk("00dc", f))
        .foldLeft(Array.emptyByteArray)(_ ++ _))
      val junk = if (junkChunk) chunk("JUNK", Array.fill[Byte](7)(42)) else Array.emptyByteArray
      val body = cc("AVI ") ++ hdrl ++ junk ++ movi
      cc("RIFF") ++ le32(body.length) ++ body
    }
    val f1 = jpegFrame(whiteRight = true)
    val f2 = jpegFrame(whiteRight = false)
    val a1 = avi(Seq(f1, f2), junkChunk = false)
    val a2 = avi(Seq(f1), junkChunk = true) // re-mux: same first frame, new bytes
    val a3 = avi(Seq(f2), junkChunk = false) // different footage
    val sess = Multimodal.MediaCodec.MjpegAvi.open()
    val d = sess.decode("video/avi", a1)
    assert(d.width == 32 && d.height == 24)
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(d.contentHash == md.digest(a1).map("%02x".format(_)).mkString,
      "content identity stays md5(payload)")
    // container parse: both frames extracted, each a decodable JPEG
    val parsed = Multimodal.MediaCodec.MjpegAvi.parseAvi(a1)
    assert(parsed.frames.length == 2)
    assert(ImageIO.read(new ByteArrayInputStream(parsed.frames(0))) != null)
    // perceptual: same first frame under different container bytes
    // collides exactly; different footage sits far away
    val (b1, b2, b3) = (sess.pHashBands("video/avi", a1),
      sess.pHashBands("video/avi", a2), sess.pHashBands("video/avi", a3))
    assert(b1.sameElements(b2),
      "re-muxed same footage must collide at Hamming 0 (md5s differ)")
    val ham = (0 until 4).map(i => Integer.bitCount((b1(i) ^ b3(i)) & 0xffff)).sum
    assert(ham > 20, s"inverted footage must be far in Hamming, got $ham")
    // garbage never silently decodes
    intercept[IllegalArgumentException] {
      sess.decode("video/avi", Array[Byte](1, 2, 3, 4))
    }
    // an H.264-style payload inside a valid container: the CONTAINER
    // parses but the frame is not a JPEG - pHash fails loudly
    val bogus = avi(Seq(Array.fill[Byte](64)(7)), junkChunk = false)
    intercept[IllegalArgumentException] {
      sess.pHashBands("video/avi", bogus)
    }
  }

  test("multi-frame video pHash pairs a TRIMMED clip (dropped first frame) " +
      "that the first-frame-only signature structurally misses") {
    implicit val s = spark
    import java.io.ByteArrayOutputStream
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def jpegPattern(pat: (Int, Int) => Boolean, w: Int = 32, h: Int = 24): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (pat(x, y)) 0xffffff else 0x000000)
      val baos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def cc(s: String) = s.getBytes("US-ASCII")
    def chunk(fourcc: String, data: Array[Byte]): Array[Byte] =
      cc(fourcc) ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(subtype: String, inner: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(subtype) ++ inner)
    def avi(frames: Seq[Array[Byte]]): Array[Byte] = {
      val avih = new Array[Byte](56)
      le32(frames.length).copyToArray(avih, 16)
      le32(32).copyToArray(avih, 32)
      le32(24).copyToArray(avih, 36)
      val hdrl = list("hdrl", chunk("avih", avih))
      val movi = list("movi", frames.map(f => chunk("00dc", f))
        .foldLeft(Array.emptyByteArray)(_ ++ _))
      val body = cc("AVI ") ++ hdrl ++ movi
      cc("RIFF") ++ le32(body.length) ++ body
    }
    val intro = jpegPattern((x, _) => x >= 16)        // right half white
    val fX = jpegPattern((x, _) => x < 16)            // left half white
    val fY = jpegPattern((_, y) => y >= 12)           // bottom half white
    val other = jpegPattern((x, y) => (x >= 16) != (y >= 12)) // diagonal
    val recs = Seq(
      MediaRecord(1L, "video/avi", avi(Seq(intro, fX, fY))), // full clip
      MediaRecord(2L, "video/avi", avi(Seq(fX, fY))),        // trimmed copy
      MediaRecord(3L, "video/avi", avi(Seq(other))))         // unrelated
    val media = spark.createDataset(recs).repartition(2)
    // frame signatures: one row per sampled frame
    val sigs = Multimodal.videoFrameSignatures(media, 4,
      Multimodal.MediaCodec.MjpegAvi).collect()
    assert(sigs.count(_.doc_id == 1L) == 3 && sigs.count(_.doc_id == 2L) == 2
      && sigs.count(_.doc_id == 3L) == 1)
    // the multi-frame dedup pairs the trimmed copy via its shared
    // interior frames; the unrelated clip pairs with nothing
    val pairs = Multimodal.videoPerceptualDedup(media, 4,
        Multimodal.MediaCodec.MjpegAvi, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(pairs.keySet == Set((1L, 2L)), pairs.toString)
    assert(pairs((1L, 2L)) == 0L, "shared frames re-encoded identically must collide at 0")
    // the FIRST-FRAME-ONLY signature misses exactly this pair
    val firstFrameOnly = Multimodal.perceptualDedup(media,
      Multimodal.MediaCodec.MjpegAvi, maxHamming = 3).collect()
    assert(firstFrameOnly.isEmpty,
      "first-frame signatures cannot see a trimmed copy - the r18 gap this closes")
  }
}
