package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Hashing

/** Multimodal column plumbing — image/audio/video as opaque `binary`
  * columns with typed metadata, the schema pattern a training-data
  * pipeline uses for non-text modalities.
  *
  * No media decoders exist in this environment, so [[decodeStub]] is a
  * clearly-marked deterministic fake; everything around it — the binary
  * column, the metadata schema, the mapPartitions batch shape, the
  * partition-preserving decode pass — is real Spark plumbing and is
  * exercised by MultimodalSpec. Swapping in a real decoder changes only
  * the function body.
  *
  * Scale: decode is per-row map-side work behind `mapPartitions`
  * (amortizing codec/model init per partition, the same reason Python
  * pipelines batch through mapInPandas); no shuffle until the metadata
  * aggregation, which moves only the small typed struct.
  */
object Multimodal {

  /** The blobs table: text payloads cast to binary stand in for media
    * bytes (the testdata ships no binary column). */
  def blobs(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), col("source"),
        col("text").cast("binary").as("blob"))

  case class MediaMeta(
      docId: Long, nBytes: Long, contentHash: String,
      width: Int, height: Int, channels: Int)

  /** STUB decoder — deterministic fake "dimensions" derived from the
    * byte content so tests can assert exact values. A real
    * implementation would parse the container header / run the codec
    * here; the signature (bytes in, typed metadata out) is the real
    * contract. */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val hex = md.map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    MediaMeta(docId, bytes.length.toLong, hex,
      width = (h % 640L).toInt + 1,
      height = ((h / 640L) % 480L).toInt + 1,
      channels = (h % 3L).toInt + 1)
  }

  /** Partition-batched decode pass: one decoder "session" per
    * partition, rows streamed through it. */
  def decodeAll(s: SparkSession, d: String): Dataset[MediaMeta] = {
    import s.implicits._
    blobs(s, d).select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // decoder/codec init would happen once per partition here
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  case class Frame(docId: Long, frameIdx: Int, frameBytes: Array[Byte])

  /** Frame sampling — the video-modality plumbing: each blob ("video")
    * yields `nFrames` evenly-spaced "frames", emitted as rows so every
    * downstream op (dedup, feature extraction, similarity) applies
    * per-frame. STUB frame bytes (md5 of blob ++ index — deterministic,
    * testable); a real implementation seeks the container and decodes
    * the keyframe here. Fan-out is map-side (no shuffle): row count
    * multiplies by nFrames but bytes stay bounded by the frame size. */
  def sampleFrames(s: SparkSession, d: String, nFrames: Int)
  : Dataset[Frame] = {
    import s.implicits._
    blobs(s, d).select(col("doc_id"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          (0 until nFrames).iterator.map { i =>
            md.reset()
            md.update(bytes)
            // full 4-byte index: a single byte would collide frames
            // 256 apart
            md.update(java.nio.ByteBuffer.allocate(4).putInt(i).array())
            Frame(id, i, md.digest())
          }
        }
      }
  }

  /** Resize — frame bytes → fixed (w × h) byte buffer, the
    * normalization step between decode and feature extraction (every
    * vision pipeline resizes to the model's input dims before
    * inference). STUB pixel content (md5-DRBG expansion of the source
    * bytes — deterministic, length-exact); a real implementation
    * interpolates the decoded bitmap here with the same signature.
    * Map-side per-row work: output size is w·h regardless of input,
    * so the stage BOUNDS the bytes flowing downstream — at 100 TB this
    * is the step that makes frame volume predictable. */
  def resizeFrames(frames: Dataset[Frame], w: Int, h: Int)
  : Dataset[Frame] = {
    import frames.sparkSession.implicits._
    val target = w * h
    frames.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { f =>
        val out = new Array[Byte](target)
        var filled = 0
        var ctr = 0
        while (filled < target) {
          md.reset()
          md.update(f.frameBytes)
          md.update(java.nio.ByteBuffer.allocate(4).putInt(ctr).array())
          val block = md.digest()
          val n = math.min(block.length, target - filled)
          System.arraycopy(block, 0, out, filled, n)
          filled += n
          ctr += 1
        }
        f.copy(frameBytes = out)
      }
    }
  }

  /** Feature extraction — frame bytes → fixed-dim float vector, the
    * step before embedding-space dedup/ANN ([[graft.mining
    * .VectorSimilarity]] consumes exactly this shape). STUB features
    * (bytes folded into [0,1) floats); a real model inference call has
    * the same signature and the same per-partition init amortization. */
  val FeatureDim = 8

  def extractFeatures(frames: Dataset[Frame])
  : DataFrame = {
    import frames.sparkSession.implicits._
    frames.mapPartitions { it =>
      // model/session init would happen once per partition here
      it.map { f =>
        val v = (0 until FeatureDim).map { j =>
          ((f.frameBytes(2 * j) & 0xff) * 256 +
            (f.frameBytes(2 * j + 1) & 0xff)).toFloat / 65536.0f
        }.toArray
        (f.docId, f.frameIdx, v)
      }
    }.toDF("doc_id", "frame_idx", "features")
  }

  /** q42: blob metadata — byte length, content hash, and the stub
    * decoder's deterministic dimensions, expressed relationally so the
    * oracle can replay it (the mapPartitions path computes identical
    * values; MultimodalSpec asserts the two agree). */
  def blobMeta(s: SparkSession, d: String): DataFrame =
    blobs(s, d)
      .select(col("doc_id"),
        length(col("blob")).cast("long").as("n_bytes"),
        md5(col("blob")).as("content_hash"),
        expr(s"${Hashing.h60SparkSql("blob")} % 640 + 1").cast("int")
          .as("width"),
        expr(s"(${Hashing.h60SparkSql("blob")} div 640) % 480 + 1")
          .cast("int").as("height"),
        expr(s"${Hashing.h60SparkSql("blob")} % 3 + 1").cast("int")
          .as("channels"))
      .orderBy(col("doc_id"))

  val blobMetaSql: String = {
    val h = Hashing.h60Sql("text")
    s"""SELECT doc_id,
       |  octet_length(CAST(text AS BLOB)) AS n_bytes,
       |  md5(text) AS content_hash,
       |  CAST($h % 640 + 1 AS INT) AS width,
       |  CAST(($h // 640) % 480 + 1 AS INT) AS height,
       |  CAST($h % 3 + 1 AS INT) AS channels
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_blob_meta" -> (blobMeta _))

  val oracle: Map[String, String] = Map(
    "q42_blob_meta" -> blobMetaSql)
}
