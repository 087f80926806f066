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

  test("frameSample: one row per stride offset") {
    val out = Multimodal.frameSample(docs, 10)
    // doc0: offsets 0,10 -> 2 rows; doc1: 0,10,20 -> 3; doc2: 0 -> 1
    assert(out.count() == 6)
    assert(out.filter($"doc_id" === 1L).select("frame_offset")
      .as[Int].collect().sorted.toSeq == Seq(0, 10, 20))
  }
}
