package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: opaque media bytes + typed metadata. */
case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

/** Extracted features for one media payload. */
case class MediaFeatures(
    doc_id: Long, media_type: String, n_bytes: Long,
    width: Int, height: Int, content_hash: String)

/**
 * Multimodal (image/audio/video) column plumbing. Media travels as an
 * opaque `binary` column with typed metadata alongside — the schema,
 * partitioning and batch shape are real; only the byte-level decoder is a
 * STUB (this container has no image/audio codecs).
 *
 * Two execution paths:
 *  - declarative [[featureColumns]]: byte length + md5 + stub dimensions
 *    as pure codegen'd expressions (used by the oracle-checked query);
 *  - batched [[extractFeatures]]: `mapPartitions` over a typed Dataset —
 *    the shape a real decoder needs (per-partition codec init, batched
 *    I/O), mirroring Python's `mapInPandas` batch contract.
 *
 * At 100 TB the payload column dominates I/O: keep media in its own
 * parquet column (columnar pruning skips it unless projected), size
 * `spark.sql.files.maxPartitionBytes` for payload width, and never
 * shuffle payload bytes — join on doc_id and carry features only.
 */
object Multimodal {

  /** Wrap a text corpus as a fake media corpus (payload = utf-8 bytes):
    * the deterministic stand-in for real image bytes in tests. */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      lit("image/stub").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Declarative feature extraction: codegen'd, shuffle-free.
    * Stub dimensions are derived from the content hash so they are
    * deterministic and engine-reproducible. */
  def featureColumns(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("media_type"),
      length(col("payload")).cast("long").as("n_bytes"),
      (conv(substring(md5(col("payload")), 1, 4), 16, 10).cast("int") % 1024 + 1).as("width"),
      (conv(substring(md5(col("payload")), 5, 4), 16, 10).cast("int") % 1024 + 1).as("height"),
      md5(col("payload")).as("content_hash"))

  /** STUB decoder — a real deployment replaces this with an image/audio
    * codec call. Deterministic: dimensions derived from md5(payload). */
  private[ops] def decodeStub(payload: Array[Byte]): (Int, Int, String) = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    val w = Integer.parseInt(hex.substring(0, 4), 16) % 1024 + 1
    val h = Integer.parseInt(hex.substring(4, 8), 16) % 1024 + 1
    (w, h, hex)
  }

  /**
   * The pluggable decoder seam: a real deployment implements this with
   * its image/audio library and passes it to [[extractFeatures]] — the
   * Spark-side plumbing (typed Dataset, per-partition lifecycle, feature
   * schema) is identical for every codec. `open()` runs ONCE per
   * partition (where a real codec allocates its native context);
   * `Session.close()` runs when the partition's rows are exhausted.
   * Must be Serializable: the codec object ships to executors, the
   * session never leaves one.
   */
  trait MediaCodec extends Serializable {
    def open(): MediaCodec.Session
  }

  object MediaCodec {
    /** One partition's decoder context. */
    trait Session {
      /** payload bytes → (width, height, content identity). */
      def decode(mediaType: String, payload: Array[Byte]): Decoded
      def close(): Unit = ()
    }
    final case class Decoded(width: Int, height: Int, contentHash: String)

    /** The deterministic md5 stub — the oracle implementation: its output
      * is replayable by any engine, so the gate query can hash-compare it.
      * A real deployment swaps in a codec-backed implementation; nothing
      * else changes. */
    object Stub extends MediaCodec {
      def open(): Session = new Session {
        // a real codec initializes its native context here, once per
        // partition; the stub's "context" is a reusable digest instance
        private val md = MessageDigest.getInstance("MD5")
        def decode(mediaType: String, payload: Array[Byte]): Decoded = {
          md.reset()
          val hex = md.digest(payload).map("%02x".format(_)).mkString
          Decoded(
            Integer.parseInt(hex.substring(0, 4), 16) % 1024 + 1,
            Integer.parseInt(hex.substring(4, 8), 16) % 1024 + 1,
            hex)
        }
      }
    }

    /**
     * A REAL image codec through the same seam, JDK-only: `javax.imageio`
     * decodes PNG/BMP/GIF/JPEG bytes with the readers shipped in every
     * JRE — zero added dependency, headless-safe (`BufferedImage` never
     * touches a display). Dimensions are the decoded raster's actual
     * width/height; content identity stays md5(payload) (byte identity
     * is decode-independent, so downstream exact-dup joins behave the
     * same whichever codec produced the features). This is the
     * existence proof that the [[MediaCodec]] plumbing carries real
     * bytes, not just the stub's derived values; a deployment with
     * other formats (video frames, audio) plugs its own codec the same
     * way and nothing else in the pipeline changes.
     */
    object ImageIo extends MediaCodec {
      def open(): Session = new Session {
        // per-partition context: one digest instance reused across rows
        // (ImageIO.read allocates its reader per call — a codec with a
        // reusable native context would hold it here instead).
        // useCache=false: ImageIO's default wraps every stream in a
        // DISK-backed FileCacheImageInputStream — a scratch temp file
        // per decoded row on the executor; the payload is already fully
        // in memory, so force the memory-backed stream instead. (JVM-
        // global flag, but memory-caching is strictly what Spark
        // executors want for byte-array payloads.)
        javax.imageio.ImageIO.setUseCache(false)
        private val md = MessageDigest.getInstance("MD5")
        def decode(mediaType: String, payload: Array[Byte]): Decoded = {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          require(img != null,
            s"payload is not a decodable image (media_type=$mediaType, " +
              s"n_bytes=${payload.length})")
          md.reset()
          val hex = md.digest(payload).map("%02x".format(_)).mkString
          Decoded(img.getWidth, img.getHeight, hex)
        }
      }
    }
  }

  /**
   * Deterministic frame sampling — the video-frame / audio-chunk shape:
   * split each payload into `k` contiguous byte ranges (integer offset
   * arithmetic, last frame takes the remainder) and emit one row per
   * frame with its byte range and content hash. A real pipeline decodes
   * each range; the plumbing here (explode shape, integral offsets,
   * per-frame hashing for downstream frame-level dedup) is the real
   * thing and engine-replayable. Narrow — payload bytes never shuffle;
   * only (doc_id, frame_idx, offsets, hash) leave the scan stage.
   */
  def frameSample(media: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"frame count must be >= 1, got $k")
    // frame hashes are md5 over the HEX of the byte range: every engine
    // can hex a blob, not every engine can slice one (byte [a,b) ==
    // hex chars [2a+1, 2b]); hex is staged once per payload. floor of a
    // double division is exact here (offsets < 2^53 by construction).
    val staged = media.select(
      col("doc_id"),
      hex(col("payload")).as("hexp"),
      length(col("payload")).cast("long").as("n"))
    val frames = transform(sequence(lit(0), lit(k - 1)), i => {
      val off = floor(i.cast("long") * col("n") / k).cast("long")
      val end = when(i === k - 1, col("n"))
        .otherwise(floor((i.cast("long") + 1) * col("n") / k).cast("long"))
      struct(
        (i + 1).as("frame_idx"),
        off.as("off"),
        (end - off).as("flen"),
        md5(col("hexp").substr((off * 2 + 1).cast("int"), ((end - off) * 2).cast("int")))
          .as("frame_hash"))
    })
    staged
      .select(col("doc_id"), explode(frames).as("f"))
      .select(
        col("doc_id"), col("f.frame_idx").as("frame_idx"),
        col("f.off").as("off"), col("f.flen").as("flen"),
        col("f.frame_hash").as("frame_hash"))
      .filter(col("flen") > 0)
  }

  /**
   * Stub resize: maps each media row to target dimensions with a
   * deterministic derived content hash (a real pipeline decodes, scales
   * and re-encodes here — the metadata/schema flow, the narrow no-shuffle
   * shape, and the deterministic output identity are the real plumbing).
   * Output n_bytes models an RGB raster (w·h·3) so downstream size
   * accounting is realistic.
   */
  def resize(features: DataFrame, w: Int, h: Int): DataFrame = {
    require(w >= 1 && h >= 1, s"target dims must be >= 1, got ${w}x$h")
    features.select(
      col("doc_id"),
      col("media_type"),
      lit(w * h * 3L).as("n_bytes"),
      lit(w).as("width"),
      lit(h).as("height"),
      md5(concat(col("content_hash"), lit(s"_${w}x$h"))).as("content_hash"))
  }

  /** Batched per-partition feature extraction through the [[MediaCodec]]
    * seam — the real-decoder shape: one codec `open()` per partition,
    * a streamed decode pass over its rows, `close()` at exhaustion.
    * Defaults to the deterministic [[MediaCodec.Stub]] (the oracle
    * implementation). */
  def extractFeatures(media: Dataset[MediaRecord],
      codec: MediaCodec = MediaCodec.Stub)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      val session = codec.open()
      val out = rows.map { r =>
        val d = session.decode(r.media_type, r.payload)
        MediaFeatures(r.doc_id, r.media_type, r.payload.length.toLong,
          d.width, d.height, d.contentHash)
      }
      // close the codec context when the partition is exhausted, without
      // materializing the iterator
      new Iterator[MediaFeatures] {
        def hasNext: Boolean = {
          val h = out.hasNext
          if (!h) session.close()
          h
        }
        def next(): MediaFeatures = out.next()
      }
    }
  }
}
