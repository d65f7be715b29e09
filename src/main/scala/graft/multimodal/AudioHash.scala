package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Perceptual audio fingerprinting — the audio sibling of
  * [[ImageHash]]: a 64-bit gradient hash over the clip's windowed
  * energy envelope. The PCM stream splits into 65 equal windows; bit w
  * says "window w is louder than window w+1" (mean |amplitude|,
  * channels mixed). Only the envelope SHAPE matters, so the hash is
  * invariant to volume scaling and robust to re-encoding noise —
  * near-duplicate clips (same recording, different gain/trim tail)
  * land within a few Hamming bits, and pair detection reuses the same
  * pigeonhole block equi-join ([[HammingPairs]]).
  *
  * Pixel-side counterpart decodes BMP24; here the sample source is the
  * repo's library-free PCM16 WAV layout ([[Codec.decodePcm16]]'s
  * acceptance). [[dHashFromEnergy]] is source-independent for
  * upstream-decoded envelopes. */
object AudioHash {

  /** 65 windows -> 64 gradient bits. */
  val Windows = 65

  private def u8(b: Array[Byte], i: Int): Int = Codec.u8(b, i)

  /** Mean-|amplitude| envelope over [[Windows]] equal windows of a
    * PCM16 WAV (channels mixed); null when the payload is not PCM16 or
    * is shorter than one frame per window. Chunk location shares
    * [[Codec.dataChunkBody]] with `decodePcm16` — one walk, one set of
    * bounds guards. */
  def energyGridPcm16(b: Array[Byte]): Array[Double] = {
    val meta = AudioMeta.parse(b)
    if (meta == null || meta.getInt(2) != 16) return null
    val channels = meta.getInt(0)
    val frames = meta.getLong(3)
    if (frames < Windows || channels <= 0) return null
    val body = Codec.dataChunkBody(b)
    if (body < 0) return null
    val usable = math.min(frames, (b.length - body).toLong / (2L * channels))
    if (usable < Windows) return null
    val sum = new Array[Double](Windows)
    val cnt = new Array[Long](Windows)
    var f = 0L
    while (f < usable) {
      val w = ((f * Windows) / usable).toInt
      var c = 0
      var acc = 0.0
      while (c < channels) {
        val o = body + (f * channels + c) * 2
        val s = ((b(o.toInt + 1) << 8) | u8(b, o.toInt)).toShort.toInt
        acc += math.abs(s / 32768.0)
        c += 1
      }
      sum(w) += acc / channels
      cnt(w) += 1
      f += 1
    }
    val out = new Array[Double](Windows)
    var k = 0
    while (k < Windows) { out(k) = sum(k) / cnt(k); k += 1 }
    out
  }

  /** dHash over any [[Windows]]-long energy envelope: bit w set when
    * window w is strictly louder than window w+1. Volume scaling is a
    * monotone map, so every comparison — and the hash — is invariant. */
  def dHashFromEnergy(e: Array[Double]): Long = {
    require(e != null && e.length == Windows, s"envelope must be $Windows long")
    var h = 0L
    var w = 0
    while (w < Windows - 1) {
      h = (h << 1) | (if (e(w) > e(w + 1)) 1L else 0L)
      w += 1
    }
    h
  }

  /** Boxed fingerprint of a PCM16 WAV payload; null for anything else
    * (filter-don't-fail). Static entry for the codegen expression. */
  def dHash64(b: Array[Byte]): java.lang.Long = {
    val e = energyGridPcm16(b)
    if (e == null) null else java.lang.Long.valueOf(dHashFromEnergy(e))
  }

  /** Column form: `graft_audio_dhash(binary) -> long`. */
  def dHash(c: Column): Column =
    GraftShims.column(AudioDHash(GraftShims.expression(c)))

  /** Near-duplicate clip pairs within `maxHamming` (<= 3): see
    * [[HammingPairs.pairs64]]. */
  def nearDupPairs(df: DataFrame, idCol: String, payloadCol: String,
                   maxHamming: Int = 3): DataFrame =
    HammingPairs.pairs64(
      df.select(col(idCol).as("id"), dHash(col(payloadCol)).as("h"))
        .where(col("h").isNotNull),
      maxHamming)
}

/** `graft_audio_dhash`: see [[AudioHash.dHash]]. */
case class AudioDHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_audio_dhash requires binary, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    AudioHash.dHash64(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val boxed = ctx.freshName("adh")
      s"""
         |java.lang.Long $boxed = graft.multimodal.AudioHash.dHash64($in);
         |${ev.isNull} = ($boxed == null);
         |${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AudioDHash =
    copy(child = newChild)
}

/** The shared 64-bit Hamming-block candidate join ([[ImageHash]] /
  * [[AudioHash]]): explode each hash into its 4 16-bit blocks,
  * self-equi-join on (block index, value), exact `bit_count` filter.
  * Pigeonhole: at Hamming <= 3 over 4 blocks at least one block is
  * identical, so recall is exact; shuffle volume is 4 rows per item,
  * candidates bounded by block-bucket sizes — never all-pairs. */
object HammingPairs {

  /** `hashed` must carry columns `id` (orderable AND unique — one row
    * per id: duplicate ids with different hashes would emit repeated
    * rows for the same pair, and id==id collisions between distinct
    * rows are dropped by the `a.id < b.id` predicate) and `h` (long).
    * Both `nearDupPairs` entry points satisfy this by hashing one row
    * per source id. */
  def pairs64(hashed: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "pigeonhole over 4 blocks guarantees recall only for maxHamming <= 3")
    val blocks = hashed.select(col("id"), col("h"),
      explode(expr(
        "transform(sequence(0, 3), i -> struct(i AS blk, " +
          "shiftright(h, i * 16) & 65535 AS bv))")).as("p"))
      .select(col("id"), col("h"), col("p.blk"), col("p.bv"))
    blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.bv") === col("b.bv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.h").as("ha"), col("b.h").as("hb"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS INT)"))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
