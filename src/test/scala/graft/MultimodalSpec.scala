package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Multimodal plumbing: binary payload round-trip, partition-batched
  * decode parity with an independent column computation, frame explode.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "hello world", "en", "s1", 11L),
    (1L, "spark engine test data", "en", "s1", 22L),
    (2L, "a", "en", "s2", 1L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("attachPayload: binary bytes match UTF-8 encoding, metadata prunable") {
    val out = Multimodal.attachPayload(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[Array[Byte]]("payload").sameElements("hello world".getBytes("UTF-8")))
    assert(out(1).getStruct(2).getAs[Int]("n_bytes") == 22)
  }

  test("decodeMeta: mapPartitions checksum equals independent computation") {
    val out = Multimodal.decodeMeta(docs).orderBy("doc_id").collect()
    val expected = "hello world".getBytes("UTF-8").map(_.toLong & 0xff).sum
    assert(out(0).getAs[Long]("checksum") == expected)
    assert(out(0).getAs[Int]("n_bytes") == 11)
    assert(out(0).getAs[Int]("width") == 11 % 640 + 1)
    assert(out(0).getAs[Int]("height") == (expected % 480).toInt + 1)
  }

  test("decodePayloads: real PNG/JPEG/GIF header parsing on crafted bytes") {
    // PNG 640x480: signature + IHDR (width/height as big-endian u32)
    val png: Array[Byte] = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0x00, 0x00, 0x00, 0x0d, 'I', 'H', 'D', 'R',
      0x00, 0x00, 0x02, 0x80, // width  640
      0x00, 0x00, 0x01, 0xe0, // height 480
      0x08, 0x06, 0x00, 0x00, 0x00).map(_.toByte)
    // JPEG 640x480: SOI, an APP0 segment to skip, then SOF0 with
    // precision(1) height(2) width(2)
    val jpeg: Array[Byte] = (Array(0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x10) ++ Array.fill(14)(0x00) ++ Array(
      0xff, 0xc0, 0x00, 0x11, 0x08,
      0x01, 0xe0, // height 480
      0x02, 0x80, // width  640
      0x03, 0x01, 0x22, 0x00)).map(_.toByte)
    // GIF89a 320x200: width/height as little-endian u16 at offsets 6/8
    val gif: Array[Byte] = Array[Byte]('G', 'I', 'F', '8', '9', 'a',
      0x40, 0x01, // width  320
      0xc8.toByte, 0x00) // height 200
    val txt: Array[Byte] = "just text".getBytes("UTF-8")

    val payloads = Seq(
      (0L, png, png.length), (1L, jpeg, jpeg.length),
      (2L, gif, gif.length), (3L, txt, txt.length)
    ).toDF("doc_id", "payload", "n_bytes")
    val out = Multimodal.decodePayloads(payloads).orderBy("doc_id").collect()
      .map(r => (r.getString(2), r.getInt(4), r.getInt(5)))
    assert(out(0) == (("png", 640, 480)))
    assert(out(1) == (("jpeg", 640, 480)))
    assert(out(2) == (("gif", 320, 200)))
    assert(out(3)._1 == "raw") // unknown container -> pseudo-dims fallback
    // checksum is the plain byte sum regardless of format
    val pngSum = png.map(_.toLong & 0xff).sum
    assert(Multimodal.decodePayloads(payloads).orderBy("doc_id").collect()(0)
      .getAs[Long]("checksum") == pngSum)
  }

  test("frameSample: one row per stride offset") {
    val out = Multimodal.frameSample(docs, 10)
    // doc0: offsets 0,10 -> 2 rows; doc1: 0,10,20 -> 3; doc2: 0 -> 1
    assert(out.count() == 6)
    assert(out.filter($"doc_id" === 1L).select("frame_offset")
      .as[Int].collect().sorted.toSeq == Seq(0, 10, 20))
  }
}
