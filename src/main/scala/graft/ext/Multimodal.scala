package graft.ext

import graft.Tables

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata, processed by per-partition batch
  * functions. The real decode/resample kernels need native media libraries
  * (absent in this container), so the kernel is a clearly-marked
  * deterministic STUB — but the Spark-side plumbing (schema, batching,
  * partition mapping, metadata extraction) is real and tested, and the stub
  * is swappable for a JNI/PIL-backed kernel without touching the plan shape.
  *
  * Scale notes: payloads never pass through a shuffle — metadata is derived
  * map-side, and `mapPartitions` keeps decode batched per-partition (the
  * Scala analogue of `mapInPandas`). Binary columns stay out of groupBy keys.
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      content_md5: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** STUB decode kernel: derives fake-but-deterministic image dimensions
    * from the payload hash. A real implementation would decode the codec
    * header here; everything around it (batch shape, schema) is production
    * plumbing.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(payload)
    val w = 160 + math.floorMod(h, 8) * 160 // 160..1280
    val ht = 90 + math.floorMod(h >> 3, 8) * 90 // 90..720
    val frames = 1 + math.floorMod(h >> 6, 240)
    (w, ht, frames)
  }

  /** Per-partition batched "decode": the mapPartitions boundary is where a
    * vectorized media library would process a whole batch at once.
    */
  def extractMeta(spark: SparkSession, payloads: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, f) = decodeStub(bytes)
          val md5hex = java.security.MessageDigest
            .getInstance("MD5").digest(bytes)
            .map("%02x".format(_)).mkString
          MediaMeta(id, bytes.length.toLong, md5hex, w, h, f)
        }
      }
  }

  /** Oracle-checkable slice of the multimodal path: treat document text
    * bytes as the opaque payload; byte length + content hash are computed
    * with native expressions (octet_length/md5 — identical in DuckDB).
    * The stub-decoded fields are covered by unit tests, not the oracle.
    */
  def qMultimodalMeta(t: Tables): DataFrame =
    t.documents
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("byte_len"),
        md5(col("payload")).as("content_md5"))
      .filter(pmod(col("doc_id"), lit(10)) === 0)
      .orderBy("doc_id")
}
