package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for a training-data pipeline: image/audio/
  * video payloads ride through the engine as opaque `binary` columns with a
  * typed metadata struct; decode / feature-extraction / resize / frame-
  * sampling run as batched per-partition transforms.
  *
  * The Spark-side plumbing — schema contract, batch shape, partition sizing
  * — is real and tested; the codec calls themselves are STUBBED behind
  * [[MediaCodec]] with a deterministic fake (image/audio libraries are not
  * available in this environment). Swapping in a real codec changes ONE
  * object and nothing in the plan shape.
  *
  * Scale notes: media rows are orders of magnitude wider than text rows —
  * the repartitioning helper targets a byte budget per partition (not a row
  * count) so a 100 TB scan does not produce multi-GB tasks, and every
  * transform is a narrow mapPartitions (no shuffle) that streams one batch
  * at a time.
  */
object Multimodal {

  /** Canonical media schema: payload + typed metadata. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", MediaMetaType)))

  /** The codec seam. A production build replaces these bodies with real
    * decoders (JNI/FFI image+audio libs); the fakes are deterministic
    * functions of the payload bytes so tests pin exact values.
    */
  object MediaCodec {
    /** Decode probe: (width, height, nChannels). REAL header parsing for
      * PNG / GIF / JPEG payloads (magic bytes + dimension fields, pure
      * JVM — no codec library needed to read a header); every other
      * format falls back to the deterministic digest fake, which doubles
      * as the oracle-replayable path for text payloads (md5 bytes — the
      * q46 DuckDB oracle recomputes it hex-digit by hex-digit).
      */
    def probe(payload: Array[Byte]): (Int, Int, Int) =
      parseHeader(payload).getOrElse {
        val d = MessageDigest.getInstance("MD5").digest(payload)
        (64 + (d(0) & 0x7f), 64 + (d(1) & 0x7f), 3)
      }

    /** Header-only dimension probing from magic bytes:
      *  - PNG: 8-byte signature, then IHDR — width/height big-endian at
      *    offsets 16/20, channels from the color type at 25;
      *  - GIF87a/89a: logical screen width/height little-endian at 6/8;
      *  - JPEG: walk the FF-marker stream to the first SOF frame header
      *    (C0–CF except C4/C8/CC): height/width big-endian at +5/+7,
      *    component count at +9.
      * None for anything else (or a truncated/corrupt header) — the
      * caller decides the fallback.
      */
    def parseHeader(b: Array[Byte]): Option[(Int, Int, Int)] = {
      def u(i: Int): Int = b(i) & 0xff
      if (b.length >= 26 && u(0) == 0x89 && u(1) == 0x50 && u(2) == 0x4e &&
          u(3) == 0x47 && u(4) == 0x0d && u(5) == 0x0a && u(6) == 0x1a &&
          u(7) == 0x0a) {
        val w = (u(16) << 24) | (u(17) << 16) | (u(18) << 8) | u(19)
        val h = (u(20) << 24) | (u(21) << 16) | (u(22) << 8) | u(23)
        val ch = u(25) match {
          case 0 => 1 // greyscale
          case 2 => 3 // truecolor
          case 3 => 1 // palette
          case 4 => 2 // grey + alpha
          case 6 => 4 // truecolor + alpha
          case _ => 3
        }
        Some((w, h, ch))
      } else if (b.length >= 10 && u(0) == 'G' && u(1) == 'I' &&
          u(2) == 'F' && u(3) == '8' && (u(4) == '7' || u(4) == '9') &&
          u(5) == 'a') {
        Some((u(6) | (u(7) << 8), u(8) | (u(9) << 8), 3))
      } else if (b.length >= 4 && u(0) == 0xff && u(1) == 0xd8) {
        var i = 2
        while (i + 3 < b.length) {
          if (u(i) != 0xff) return None // corrupt marker stream
          val marker = u(i + 1)
          if (marker == 0xd8 || marker == 0x01 ||
              (marker >= 0xd0 && marker <= 0xd7)) i += 2 // standalone
          else {
            val len = (u(i + 2) << 8) | u(i + 3)
            if (len < 2) return None
            if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 &&
                marker != 0xc8 && marker != 0xcc) {
              if (i + 9 >= b.length) return None
              val h = (u(i + 5) << 8) | u(i + 6)
              val w = (u(i + 7) << 8) | u(i + 8)
              return Some((w, h, u(i + 9)))
            }
            i += 2 + len
          }
        }
        None
      } else None
    }

    /** STUB feature extraction: a production build decodes pixels and runs
      * a vision tower; the fake emits a deterministic `dim`-float vector.
      */
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val md = MessageDigest.getInstance("SHA-256")
      val out = new Array[Float](dim)
      var block = md.digest(payload)
      var i = 0
      while (i < dim) {
        if (i % 32 == 0 && i > 0) block = md.digest(block)
        out(i) = ((block(i % 32) & 0xff) - 128) / 128.0f
        i += 1
      }
      out
    }

    /** STUB resize: production re-encodes at (w, h); the fake tags the
      * payload so the transform is observable and idempotent-checkable.
      */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val tag = s"RSZ:${w}x$h:".getBytes
      tag ++ payload.take(math.max(0, payload.length - tag.length))
    }

    /** STUB frame sampling: production demuxes video and returns `n`
      * frames; the fake slices the payload into `n` deterministic chunks.
      */
    def sampleFrames(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
      val size = math.max(1, payload.length / math.max(1, n))
      (0 until n).map(i => payload.slice(i * size, (i + 1) * size))
    }
  }

  /** Size-aware repartition: media partitions are bounded by bytes, not row
    * count. `approxBytesPerRow` can come from a prior sample or catalog
    * stats.
    */
  def repartitionByBytes(df: DataFrame, totalBytes: Long,
                         targetPartitionBytes: Long = 128L << 20): DataFrame =
    df.repartition(math.max(1, (totalBytes / targetPartitionBytes).toInt))

  /** Decode/probe: adds width/height/channels from the payload header.
    * Narrow transform, no shuffle; batches stream through mapPartitions.
    */
  def probeMedia(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val schema = df.schema
      .add("probe_width", IntegerType)
      .add("probe_height", IntegerType)
      .add("probe_channels", IntegerType)
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val (w, h, c) =
          if (payload == null) (0, 0, 0) else MediaCodec.probe(payload)
        Row.fromSeq(r.toSeq ++ Seq(w, h, c))
      }
    }(Encoders.row(schema))
  }

  /** Feature extraction to an embedding column (`array<float>`), ready for
    * [[Similarity]] search / dedup.
    */
  def extractFeatures(df: DataFrame, dim: Int = 64,
                      payloadCol: String = "payload",
                      outCol: String = "embedding"): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(FloatType))
    val pIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val f = if (payload == null) null
          else MediaCodec.features(payload, dim).toSeq
        Row.fromSeq(r.toSeq :+ f)
      }
    }(Encoders.row(schema))
  }

  /** Resize in place, stamping the new dimensions into `meta`. */
  def resizeMedia(df: DataFrame, w: Int, h: Int,
                  payloadCol: String = "payload",
                  metaCol: String = "meta"): DataFrame = {
    val schema = StructType(df.schema.fields.map(f => f.copy(nullable = true)))
    val pIdx = df.schema.fieldIndex(payloadCol)
    val mIdx = df.schema.fieldIndex(metaCol)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        val vals = r.toSeq.toArray
        if (payload != null) {
          vals(pIdx) = MediaCodec.resize(payload, w, h)
          val m = r.getStruct(mIdx)
          vals(mIdx) = Row(
            if (m == null) null else m.getAs[String]("format"),
            w, h,
            if (m == null) null else m.getAs[Any]("duration_ms"),
            if (m == null) null else m.getAs[String]("codec"))
        }
        Row.fromSeq(vals.toSeq)
      }
    }(Encoders.row(schema))
  }

  /** Frame sampling: one output row per sampled frame (media_id, frame_no,
    * frame payload). A generator-shaped narrow transform.
    */
  def sampleFrames(df: DataFrame, framesPerItem: Int,
                   idCol: String = "media_id",
                   payloadCol: String = "payload"): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("frame_no", IntegerType),
      StructField("frame", BinaryType)))
    val pIdx = df.schema.fieldIndex(payloadCol)
    val iIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val payload = r.getAs[Array[Byte]](pIdx)
        if (payload == null) Iterator.empty
        else MediaCodec.sampleFrames(payload, framesPerItem).iterator
          .zipWithIndex.map { case (f, i) => Row(r.getLong(iIdx), i, f) }
      }
    }(Encoders.row(schema))
  }

  /** Media table derived from a REAL corpus: each document's UTF-8 bytes
    * become the opaque payload (standing in for image/audio bytes), so the
    * pipeline exercises the actual table read path and scales with the
    * input — unlike [[syntheticMedia]], which fabricates its own rows.
    */
  def fromDocuments(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast(LongType).as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("txt").as("format"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms"),
        lit(null).cast(StringType).as("codec")).as("meta"))

  /** Synthesize a deterministic media table (for tests/demo: payload bytes
    * derived from the id; binary + metadata plumbing end-to-end).
    */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession,
                     n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).select(
      col("id").as("media_id"),
      // payload: repeatable pseudo-random bytes from the id
      sha2(concat(lit("media"), col("id").cast("string")), 512)
        .cast("binary").as("payload"),
      struct(
        lit("png").as("format"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms"),
        lit(null).cast(StringType).as("codec")).as("meta"))
  }
}
