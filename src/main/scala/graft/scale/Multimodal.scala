package graft.scale

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal row: opaque media bytes + typed metadata (the 100 TB
  * contract: media as `binary` columns, metadata flat and prunable). */
case class MediaRow(doc_id: Long, media: Array[Byte],
                    width: Int, height: Int, format: String)

case class MediaFeatures(doc_id: Long, n_bytes: Int, mean_byte: Double,
                         byte_entropy: Double, histogram16: Array[Long],
                         width: Int, height: Int, format: String)

/** Multimodal-column plumbing: image/audio/video as opaque binary
  * columns with typed metadata, decoded/feature-extracted per partition.
  *
  * The container has no media libraries, so the DECODE step is a
  * deterministic fake over raw bytes (clearly marked below); everything
  * Spark-side — schema, binary column handling, partition-batched
  * processing, feature schema — is real and oracle/spec-tested. At scale
  * the same `mapPartitions` shape amortizes model/codec init per
  * partition (the reason it is not a per-row UDF).
  */
object Multimodal {

  /** Media table derived deterministically from documents: utf-8 bytes as
    * the opaque payload, metadata from doc_id. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("media"),
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height"),
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg").otherwise("webp").as("format"))
      .as[MediaRow]
  }

  // ---------------------------------------------------------------- stats
  /** Binary-column scan stats — byte length + content digest. Oracle-able
    * (DuckDB md5(text) hashes the same utf-8 bytes). */
  def blobStats(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).toDF()
      .select(
        col("doc_id"),
        length(col("media")).as("n_bytes"),
        md5(col("media")).as("digest"),
        col("width"), col("height"), col("format"))

  val blobStatsSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(text::BLOB) AS INT) AS n_bytes,
      |  md5(text) AS digest,
      |  CAST(doc_id % 640 + 64 AS INT) AS width,
      |  CAST(doc_id % 480 + 48 AS INT) AS height,
      |  CASE WHEN doc_id % 3 = 0 THEN 'png'
      |       WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'webp' END AS format
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- decode
  /** Per-partition decode + feature extraction. Real pipeline shape:
    * batch rows per partition, init the (stubbed) codec once, emit a
    * typed feature row per media blob. Driver check is rows-only
    * (mapPartitions is not SQL-expressible); the spec pins the math. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions { rows =>
        // Codec/model init would happen HERE, once per partition.
        // STUB: a real implementation would decode media bytes
        // (image/audio/video) with a codec library unavailable in this
        // container; the deterministic byte-level features below keep the
        // full pipeline testable.
        rows.map { r =>
          val bytes = r.media
          val hist = new Array[Long](16)
          var sum = 0.0
          bytes.foreach { b =>
            val u = b & 0xff
            sum += u
            hist(u >> 4) += 1
          }
          val n = bytes.length.max(1)
          val entropy = -hist.filter(_ > 0).map { c =>
            val p = c.toDouble / n; p * math.log(p)
          }.sum / math.log(2)
          MediaFeatures(r.doc_id, bytes.length, sum / n, entropy, hist,
            r.width, r.height, r.format)
        }
      }
      .toDF()
      .select(col("doc_id"), col("n_bytes"),
        round(col("mean_byte"), 6).as("mean_byte"),
        round(col("byte_entropy"), 6).as("byte_entropy"),
        concat_ws(",", col("histogram16")).as("histogram16"),
        col("width"), col("height"), col("format"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_blob_stats"      -> (blobStats _),
    "mm_decode_features" -> (decodeFeatures _))

  def oracles: Map[String, String] = Map(
    "mm_blob_stats" -> blobStatsSql)
}
