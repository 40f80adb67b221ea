package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal record with an opaque binary payload + typed metadata —
  * the schema pattern for image/audio/video columns at 100 TB: payload
  * stays a parquet `binary`, metadata is a first-class struct the
  * optimizer can prune/filter on without touching bytes.
  */
case class MediaRecord(id: Long, kind: String, width: Int, height: Int, media: Array[Byte])

/** Extracted per-media features (deterministic fake kernel — see below). */
case class MediaFeature(id: Long, kind: String, width: Int, height: Int,
    n_bytes: Long, digest: String)

/** Multimodal column handling (SURVEY §2.12 #64). The Spark-side
  * plumbing is real: typed binary Dataset, partition-batched kernel
  * calls (the shape a native decoder / GPU feature extractor needs),
  * metadata carried alongside. The decode kernel itself is a
  * deterministic fake (md5 of the payload) because no image/audio codecs
  * exist in this container — swap `decodeBatch` for the real library
  * call; the batching, schema, and distribution do not change.
  */
object Multimodal {

  /** Batched "decode": processes fixed-size batches per partition so a
    * real kernel could amortize model/codec setup per batch (the
    * mapInPandas batch shape, in Scala).
    */
  def extractFeatures(records: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeature] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.grouped(batchSize).flatMap(decodeBatch)
    }
  }

  /** STUB KERNEL: deterministic md5 digest instead of a real decoder. */
  private def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeature] =
    batch.map { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val digest = md.digest(r.media).map("%02x".format(_)).mkString
      MediaFeature(r.id, r.kind, r.width, r.height, r.media.length.toLong, digest)
    }

  /** "Resize": metadata-level transform + deterministic-fake resample
    * digest (a real implementation swaps the digest for the codec's
    * resample; the schema contract — new dims + new payload — is what
    * downstream operators depend on).
    */
  def resize(records: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.map { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(r.media)
      md.update(s"${w}x$h".getBytes("UTF-8"))
      r.copy(width = w, height = h, media = md.digest())
    }
  }

  /** Frame sampling: treat the payload as consecutive `frameBytes`-byte
    * frames and emit every `everyN`-th one — the explode-shaped op a
    * video pipeline needs (one row per sampled frame, metadata carried).
    */
  def frameSample(records: Dataset[MediaRecord], frameBytes: Int, everyN: Int): DataFrame = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      val nFrames = math.max(1, r.media.length / frameBytes)
      (0 until nFrames by everyN).map { i =>
        val from = i * frameBytes
        val until = math.min(from + frameBytes, r.media.length)
        (r.id, r.kind, i, new String(r.media.slice(from, until), "UTF-8"))
      }
    }.toDF("id", "kind", "frame_idx", "frame")
  }

  /** 64-bit average-hash perceptual fingerprint over the decoded pixel
    * stream — the production image near-dup primitive (aHash; pHash/PDQ
    * differ only in the transform applied before thresholding). The
    * DECODE is this module's documented stub (the payload bytes ARE the
    * luminance stream); a real deployment swaps the byte source for the
    * codec's grayscale plane — the fingerprint law, the banding, and
    * the join shape downstream do not change. Law, exact integer end to
    * end so the whole family oracle-replays: resample the L-byte stream
    * to 64 pixels by nearest neighbor (pixel_j = byte[j·L div 64]),
    * threshold against the floor-mean of the 64 samples, bit j set iff
    * pixel_j > mean (bit 63 carries the sign — two's complement,
    * identical in both engines).
    */
  def aHash64(records: Dataset[MediaRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.map { r =>
      val L = r.media.length
      require(L >= 1, s"empty media payload for id ${r.id}")
      // Sample index in Long: j*L overflows Int for payloads past
      // ~34 MB (63*L > 2^31) and would throw on a negative index.
      val px = (0 until 64).map(j => (r.media(((j.toLong * L) / 64).toInt) & 0xff).toLong)
      val mean = px.sum / 64
      val h = px.zipWithIndex.foldLeft(0L) { case (acc, (p, j)) =>
        if (p > mean) acc | (1L << j) else acc
      }
      (r.id, h)
    }.toDF("id", "phash")
  }

  /** Build a media table from any (id, payload-string) source — payload
    * bytes are the UTF-8 of the string; metadata derived arithmetically.
    */
  def syntheticMedia(df: DataFrame, id: String, payload: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(
        col(id).cast("long").as("id"),
        lit("image").as("kind"),
        (col(id) % 64 + 16).cast("int").as("width"),
        (col(id) % 48 + 12).cast("int").as("height"),
        col(payload).cast("binary").as("media"))
      .as[MediaRecord]
  }
}
