package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted in batches via `mapPartitions`.
  *
  * The DECODE step is a real container parser: PNG (IHDR), JPEG (SOF
  * marker scan) and GIF (logical screen descriptor) headers are parsed
  * byte-for-byte per their public specifications — no codec library
  * needed for dimensions/format, which is exactly the metadata a corpus
  * pipeline extracts before any pixel work. Payloads that are none of
  * the known containers fall back to deterministic pseudo-features so the
  * plumbing stays testable end-to-end over a text corpus (and the SQL
  * oracle can recompute them). Full pixel decode (which WOULD need a
  * codec) is out of scope by design — dimensions, format tag and byte
  * accounting are the real operator here.
  */
object Multimodal {

  /** Wrap a text corpus as binary payloads + typed metadata — the shape a
    * media table has at 100 TB: `(id, payload binary, meta struct)`,
    * payload never parsed by Catalyst, metadata columns prunable without
    * touching payload bytes.
    */
  def attachPayload(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col("text")).as("n_bytes"),
        col("lang").as("tag")).as("meta"))

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** PNG: 8-byte signature, then the IHDR chunk MUST come first — width
    * and height are the two big-endian u32s at offsets 16 and 20.
    */
  private def pngDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
      (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((be32(b, 16), be32(b, 20)))
    else None

  /** JPEG: SOI (FF D8), then a marker-segment walk — every segment is
    * `FF marker len(2, BE, incl. itself) payload` — until a
    * start-of-frame marker (C0–CF minus the non-frame C4/C8/CC), whose
    * payload is `precision(1) height(2 BE) width(2 BE)`.
    */
  private def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 3 < b.length && (b(i) & 0xff) == 0xff) {
      val marker = b(i + 1) & 0xff
      if (marker == 0xff) { i += 1 } // fill bytes before a marker
      else if (marker >= 0xd0 && marker <= 0xd9) { i += 2 } // standalone
      else {
        val len = be16(b, i + 2)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          return if (i + 8 < b.length)
            Some((be16(b, i + 7), be16(b, i + 5))) // (width, height)
          else None
        }
        i += 2 + len
      }
    }
    None
  }

  /** GIF87a/GIF89a: width/height are little-endian u16 at offsets 6/8 of
    * the logical screen descriptor.
    */
  private def gifDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some((le16(b, 6), le16(b, 8)))
    else None

  /** Decode one payload: `(format, checksum, width, height)`. Checksum is
    * the unsigned byte sum (real accounting, oracle-recomputable). For
    * payloads that are not a recognized media container the dimensions
    * fall back to deterministic pseudo-features of the bytes — the
    * documented offline stand-in that keeps a text corpus flowing through
    * the same plumbing.
    */
  private[ops] def decodePayload(bytes: Array[Byte]): (String, Long, Int, Int) = {
    var checksum = 0L
    var i = 0
    while (i < bytes.length) { checksum += bytes(i) & 0xff; i += 1 }
    pngDims(bytes) match {
      case Some((w, h)) => ("png", checksum, w, h)
      case None => jpegDims(bytes) match {
        case Some((w, h)) => ("jpeg", checksum, w, h)
        case None => gifDims(bytes) match {
          case Some((w, h)) => ("gif", checksum, w, h)
          case None =>
            ("raw", checksum,
              (bytes.length % 640) + 1, (checksum % 480).toInt + 1)
        }
      }
    }
  }

  /** Decode + feature-extract over partition batches of raw
    * `(id, payload, n_bytes)` rows. The Dataset `mapPartitions` is the
    * Scala analogue of `mapInPandas`: one iterator-in/iterator-out call
    * per partition — decoder state (here none; for pixel work a codec or
    * model handle) is allocated once outside the row loop.
    */
  def decodePayloads(payloads: DataFrame): DataFrame = {
    import payloads.sparkSession.implicits._
    payloads
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { rows =>
        rows.map { case (id, payload, nBytes) =>
          val (fmt, checksum, width, height) = decodePayload(payload)
          (id, nBytes, fmt, checksum, width, height)
        }
      }
      .toDF("doc_id", "n_bytes", "fmt", "checksum", "width", "height")
  }

  /** The registered corpus-level form: wrap the text corpus as binary and
    * decode. Text payloads are no known container → `fmt = 'raw'` with
    * the pseudo-dimension fallback (what the SQL oracle recomputes); real
    * PNG/JPEG/GIF bytes through the same path get true header dimensions
    * (spec-pinned on crafted payloads).
    */
  def decodeMeta(documents: DataFrame): DataFrame =
    decodePayloads(
      attachPayload(documents)
        .select(col("doc_id"), col("payload"), col("meta.n_bytes").as("n_bytes")))

  /** Frame sampling shape: emit every k-th "frame offset" of the payload
    * as its own row — the explode/generator pattern a video pipeline uses
    * (1 asset row → n frame rows), bounded and deterministic.
    */
  def frameSample(documents: DataFrame, every: Int): DataFrame =
    attachPayload(documents)
      .select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
        explode(sequence(lit(0), col("meta.n_bytes") - 1, lit(every)))
          .as("frame_offset"))
      .withColumn("frame_id",
        concat_ws(":", col("doc_id"), col("frame_offset")))
}
