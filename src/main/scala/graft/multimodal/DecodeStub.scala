package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus a batch decode/feature stage.
  *
  * Decode is REAL where the format permits a library-free decoder
  * ([[Codec]]: PNG pixels via JDK Inflater + the five filter
  * predictors, baseline-JPEG pixels via T.81 Huffman+IDCT,
  * uncompressed 24-bit BMP pixels, 16-bit PCM WAV samples; header
  * metadata via [[ImageMeta]]/[[AudioMeta]]) and STUBBED only where
  * an actual compressed codec would be required (MP3, non-baseline
  * JPEG — no image/audio libs in this environment): `decodeStub`
  * produces a deterministic fake feature from the payload bytes.
  * Everything around either path — schema, batch shape, partition-level
  * iteration, metadata columns — is the same plumbing.
  */
object DecodeStub {

  case class MediaRow(media_id: Long, modality: String, payload: Array[Byte])
  case class DecodedRow(media_id: Long, modality: String, n_bytes: Int,
                        content_md5: String, feature: Array[Float])

  val FeatureDim = 8

  /** STUB codec: replace with a real image/audio decoder. Deterministic:
    * feature[i] = byte histogram moment i, so tests are stable. */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      f(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    f
  }

  /** Partition-batched decode: mapPartitions so a real codec can amortize
    * per-batch init (model load, GPU context) across rows — the Scala
    * analogue of a pandas-UDF batch. No shuffle: decode is narrow. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here
      rows.map { r =>
        DecodedRow(
          r.media_id, r.modality, r.payload.length,
          java.security.MessageDigest.getInstance("MD5")
            .digest(r.payload).map("%02x".format(_)).mkString,
          Codec.decodeAny(r.payload))
      }
    }
  }

  /** One decoded row of EXACT integer aggregates — the oracle-checkable
    * face of a decode ([[Codec.PixelStats]]/[[Codec.AudioStats]]):
    * images carry (n_units = pixel count, s0/s1/s2 = raw B/G/R channel
    * sums in native sample units); PCM audio carries (n_units = sample
    * count, s0 = Σ sample², s1 = sign-change count, s2 = peak |sample|).
    * Unrecognized payloads → null aggregates (filter-don't-fail). */
  case class DecodedStatsRow(media_id: Long, modality: String, n_bytes: Int,
                             n_units: Option[Long], s0: Option[Long],
                             s1: Option[Long], s2: Option[Long])

  /** Integer-aggregate decode through the same partition-batched
    * plumbing as [[decodeFeatures]]; dispatch mirrors [[Codec.decodeAny]]
    * minus JPEG (lossy — no exact aggregate contract to expose). */
  def decodeStats(media: Dataset[MediaRow]): Dataset[DecodedStatsRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val p = r.payload
        val (n, a, b, c) =
          if (p == null) (None, None, None, None)
          else if (Codec.isBmp24(p) || Codec.isPng(p) || Codec.isGif(p)) {
            val st =
              if (Codec.isBmp24(p)) Codec.statsBmp24(p)
              else if (Codec.isGif(p)) Codec.statsGif(p)
              else Codec.statsPng(p)
            if (st == null) (None, None, None, None)
            else (Some(st.nPixels), Some(st.sumB), Some(st.sumG), Some(st.sumR))
          } else if (Codec.isPcm16(p)) {
            val st = Codec.statsPcm16(p)
            if (st == null) (None, None, None, None)
            else (Some(st.nSamples), Some(st.sumSq), Some(st.crossings),
              Some(st.peakRaw.toLong))
          } else (None, None, None, None)
        DecodedStatsRow(r.media_id, r.modality,
          if (p == null) 0 else p.length, n, a, b, c)
      }
    }
  }

  /** Video-style frame SUBSAMPLING plumbing: a payload holding
    * fixed-size frames explodes to every `every`-th frame as its own
    * (media_id, frame_idx, frame) row — the "sample 1 fps before the
    * expensive decode" stage. Pure expressions (sequence + substring on
    * binary), shuffle-free and codegen'd; a real container format would
    * swap the fixed stride for its frame index, the row shape stays.
    * Trailing partial frames are dropped (standard codec behavior). */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String,
                  frameBytes: Int, every: Int): DataFrame =
    df.select(col(idCol),
        (octet_length(col(payloadCol).cast("binary")) / frameBytes)
          .cast("int").as("__n"),
        col(payloadCol).cast("binary").as("__p"))
      .where(col("__n") > 0)
      .select(col(idCol), explode(expr(
        s"transform(filter(sequence(0, __n - 1), i -> i % $every = 0), " +
          s"i -> struct(i AS frame_idx, " +
          s"substring(__p, i * $frameBytes + 1, $frameBytes) AS frame))")).as("f"))
      .select(col(idCol), col("f.frame_idx").as("frame_idx"),
        col("f.frame").as("frame"))

  /** Declarative metadata extraction (no codec needed): byte length +
    * content hash + modality tag — pure codegen'd expressions. */
  def payloadMeta(df: DataFrame, idCol: String, payloadCol: String,
                  modality: String): DataFrame =
    df.select(
      col(idCol),
      lit(modality).as("modality"),
      octet_length(col(payloadCol).cast("binary")).as("n_bytes"),
      md5(col(payloadCol).cast("binary")).as("content_md5"))
}
