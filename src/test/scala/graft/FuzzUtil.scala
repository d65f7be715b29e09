package graft

import scala.util.Random

/** Shared byte-level fuzz case generator for the hand-rolled binary
  * readers (Codec/ImageMeta/AudioMeta/Wkb, SqliteFile/BiffReader/
  * OfficeCrypto). The reference gets this hardening for free from
  * GDAL/xlrd/Pillow (e.g. reference/.../built_up_areas.py:80 trusts
  * fiona); our readers must earn it: every case below must produce
  * null / a loud controlled exception — never a JVM Error (OOM,
  * StackOverflow), an unbounded allocation, or a hang.
  *
  * Deterministic by seed so a failure reproduces: every case is
  * derived from (seed, index) alone, and the failure message carries
  * both.
  */
object FuzzUtil {
  /** One mutated payload per index: cycles truncation (every prefix
    * length eventually), byte flips (1-4 positions), random garbage,
    * valid-header-plus-garbage-tail, and length-field-shaped extremes
    * (0x00/0xFF runs spliced in), seeded deterministically. */
  def mutate(valid: Array[Byte], seed: Long, idx: Int): Array[Byte] = {
    val r = new Random(seed * 1000003L + idx)
    (idx % 5) match {
      case 0 => // truncation — small prefixes first, then spread
        val n =
          if (idx / 5 < 64) math.min(idx / 5, valid.length)
          else r.nextInt(valid.length + 1)
        java.util.Arrays.copyOf(valid, n)
      case 1 => // 1-4 byte flips at random offsets
        val b = valid.clone()
        (0 until (1 + r.nextInt(4))).foreach { _ =>
          if (b.nonEmpty) b(r.nextInt(b.length)) = r.nextInt(256).toByte
        }
        b
      case 2 => // pure garbage, assorted lengths incl. 0
        val b = new Array[Byte](r.nextInt(300))
        r.nextBytes(b)
        b
      case 3 => // valid header, garbage tail
        val keep = math.min(valid.length, 4 + r.nextInt(28))
        val tail = new Array[Byte](r.nextInt(200))
        r.nextBytes(tail)
        java.util.Arrays.copyOf(valid, keep) ++ tail
      case _ => // splice a 0x00 or 0xFF run (length-field extremes)
        val b = valid.clone()
        if (b.nonEmpty) {
          val at = r.nextInt(b.length)
          val run = math.min(1 + r.nextInt(8), b.length - at)
          val v = if (r.nextBoolean()) 0.toByte else 0xFF.toByte
          java.util.Arrays.fill(b, at, at + run, v)
        }
        b
    }
  }

  /** Run `parse` over `cases` mutations of each valid fixture. The
    * contract is graded by `accept`: a thrown Exception not accepted
    * by it — or ANY JVM Error — fails with the reproducing (seed, idx).
    * `check` validates the shape of a non-null success. */
  def fuzz[T](name: String, fixtures: Seq[Array[Byte]], cases: Int,
              seed: Long)(parse: Array[Byte] => T)(
              accept: Throwable => Boolean = _ => false,
              check: T => Unit = (_: T) => ()): Unit = {
    fixtures.zipWithIndex.foreach { case (valid, f) =>
      var idx = 0
      while (idx < cases) {
        val payload = mutate(valid, seed + f, idx)
        try {
          val out = parse(payload)
          if (out != null) check(out)
        } catch {
          case e: Exception if accept(e) => () // loud controlled failure
          case e: Throwable =>
            throw new AssertionError(
              s"$name: fixture $f case $idx (seed ${seed + f}, " +
                s"len ${payload.length}) escaped the contract: $e", e)
        }
        idx += 1
      }
    }
  }
}
