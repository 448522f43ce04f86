package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/**
 * Multimodal columns: image/audio/video payloads ride as opaque `binary`
 * columns with a typed metadata struct beside them. The Spark-side
 * plumbing (schema, partition sizing, batch-shaped decode) is real; the
 * codec itself is STUBBED — this container has no image/audio libraries,
 * so `StubDecoder` produces deterministic fake metadata derived only
 * from payload length. Swap `decode` for a real codec (JNI/FFI) without
 * touching the pipeline shape.
 *
 * Scale notes: payload columns dominate row size — keep them OUT of
 * shuffles (project metadata first, join payloads back by id last), and
 * cap `spark.sql.files.maxPartitionBytes` so a partition of blobs fits
 * executor memory.
 */
object Multimodal {

  /** Canonical schema fragment: (content binary, media_type string). */
  def withPayload(df: DataFrame, textCol: String, mediaType: String = "image/fake"): DataFrame =
    df.withColumn("content", encode(col(textCol), "UTF-8"))
      .withColumn("media_type", lit(mediaType))

  // -- STUB decode (Column algebra: runs in codegen, zero-copy) -----------

  /** STUB: fake image dimensions derived from byte length only — replace
    * with a real decoder for production. Deterministic and engine-neutral
    * so results are oracle-checkable. */
  def imageMeta(content: Column): Column = {
    val len = length(content).cast("long")
    struct(
      len.as("byte_len"),
      (len % 241L + 16L).cast("int").as("width"),
      ((len * 7L) % 241L + 16L).cast("int").as("height"),
      lit(3).as("channels"))
  }

  /** STUB resize: recompute target dims preserving the fake aspect. */
  def resizeMeta(meta: Column, maxSide: Long): Column = {
    val w = meta.getField("width"); val h = meta.getField("height")
    val scaleDen = greatest(w, h)
    struct(
      meta.getField("byte_len").as("byte_len"),
      (w * maxSide / scaleDen).as("width"),
      (h * maxSide / scaleDen).as("height"),
      meta.getField("channels").as("channels"))
  }

  /** STUB frame sampling for "video" payloads: n_frames from length, and
    * the sampled frame offsets (every `stride`-th frame). */
  def frameOffsets(content: Column, stride: Int = 2): Column = {
    val n = (length(content).cast("long") % 7L + 1L).as("n")
    filter(sequence(lit(0L), n - 1L), i => i % stride === 0)
  }

  /** STUB feature extraction: dim-length embedding from payload hash —
    * keeps the (id, vector) shape real for downstream Similarity ops. */
  def fakeEmbedding(content: Column, dim: Int = 8): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => pmod(xxhash64(content, i), lit(1000L)).cast("double") / 1000.0)

  // -- batch-shaped decode (the real-codec integration point) -------------

  case class DecodedMeta(id: Long, byteLen: Long, width: Int, height: Int, channels: Int)

  /** The decoder contract a real codec must satisfy. */
  type Decoder = Array[Byte] => DecodedMeta

  /** STUB decoder instance — same arithmetic as [[imageMeta]]. */
  val StubDecoder: Array[Byte] => (Long, Int, Int, Int) = bytes => {
    val len = bytes.length.toLong
    (len, (len % 241 + 16).toInt, ((len * 7) % 241 + 16).toInt, 3)
  }

  /**
   * Partition-batched decode: the per-partition iterator shape a real
   * codec needs (amortized init, bounded memory). Input: (id, payload);
   * output: DecodedMeta. This is the `mapPartitions` integration point —
   * codec handles initialize once per partition, not once per row.
   */
  def decodePartitioned(ds: Dataset[(Long, Array[Byte])]): Dataset[DecodedMeta] = {
    implicit val enc: Encoder[DecodedMeta] = Encoders.product[DecodedMeta]
    ds.mapPartitions { it =>
      // real codec: open context here, close via iterator completion
      it.map { case (id, bytes) =>
        val (len, w, h, c) = StubDecoder(bytes)
        DecodedMeta(id, len, w, h, c)
      }
    }
  }
}
