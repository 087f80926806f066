package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted in batches via `mapPartitions`.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB (`fakeDecode`) — what is real and
  * tested is everything Spark-side: the binary column representation, the
  * metadata struct schema, the partition-batched decode shape (state
  * initialized once per partition, exactly where a codec/model handle
  * would live at scale), and the checksum/byte accounting that an
  * independent SQL oracle can recompute.
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

  /** STUB decoder: a real implementation would hand `bytes` to an image/
    * audio library here (per partition, reusing one decoder instance).
    * This fake derives deterministic pseudo-features from the payload so
    * the plumbing is testable end-to-end offline.
    */
  private def fakeDecode(bytes: Array[Byte]): (Long, Int, Int) = {
    var checksum = 0L
    var i = 0
    while (i < bytes.length) { checksum += bytes(i) & 0xff; i += 1 }
    val width = (bytes.length % 640) + 1
    val height = (checksum % 480).toInt + 1
    (checksum, width, height)
  }

  /** Decode + feature-extract over partition batches. The Dataset
    * `mapPartitions` is the Scala analogue of `mapInPandas`: one
    * iterator-in/iterator-out call per partition, decoder state allocated
    * once outside the row loop.
    */
  def decodeMeta(documents: DataFrame): DataFrame = {
    val withPayload = attachPayload(documents)
    import withPayload.sparkSession.implicits._
    withPayload
      .select(col("doc_id"), col("payload"), col("meta.n_bytes").as("n_bytes"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions { rows =>
        // (decoder handle would be created HERE, once per partition)
        rows.map { case (id, payload, nBytes) =>
          val (checksum, width, height) = fakeDecode(payload)
          (id, nBytes, checksum, width, height)
        }
      }
      .toDF("doc_id", "n_bytes", "checksum", "width", "height")
  }

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
