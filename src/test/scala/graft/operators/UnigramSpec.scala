package graft.operators

import graft.SparkSpec
import graft.plans.{UnigramSegment, UnigramTable}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(20)

  /** Independent reference: EXHAUSTIVE enumeration of every segmentation
    * (words are short in these tests), ranked by the documented total
    * order — minimal total cost, then minimal boundary vector read RIGHT
    * to LEFT (the longest-final-piece rule the DP's smallest-back-pointer
    * choice realizes at every suffix). A completely different formulation
    * from the production DP, so agreement is evidence. */
  private def refSegment(t: UnigramTable, s: String): Seq[String] = {
    def cost(piece: String): Option[Long] = {
      val c = t.cost(piece)
      if (c != null) Some(c.longValue)
      else if (piece.length == 1) Some(t.unkCost.toLong)
      else None
    }
    def allSegs(from: Int): Seq[List[Int]] = // boundary lists from `from` to end
      if (from == s.length) Seq(List(s.length))
      else (from + 1 to math.min(s.length, from + t.maxLen)).toSeq
        .filter(end => cost(s.substring(from, end)).isDefined)
        .flatMap(end => allSegs(end).map(from :: _))
    val ranked = allSegs(0).map { bs =>
      val pieces = bs.sliding(2).map { case List(a, b) => s.substring(a, b) }.toSeq
      val total = pieces.map(p => cost(p).get).sum
      (total, bs.reverse, pieces) // right-to-left boundary comparison
    }
    // lexicographic on reversed boundaries needs element-wise compare
    // (string-join ordering would rank boundary 10 before 2)
    val ord2 = new Ordering[(Long, List[Int], Seq[String])] {
      def compare(x: (Long, List[Int], Seq[String]),
                  y: (Long, List[Int], Seq[String])): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c
        else {
          val (a, b) = (x._2, y._2)
          a.zip(b).map { case (u, v) => Integer.compare(u, v) }
            .find(_ != 0).getOrElse(Integer.compare(a.length, b.length))
        }
      }
    }
    ranked.min(ord2)._3
  }

  private def toksOf(t: UnigramTable, w: String): Seq[String] = {
    val arr = UnigramSegment.run(t, org.apache.spark.unsafe.types.UTF8String.fromString(w))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("property: Viterbi DP == exhaustive-enumeration reference (cost + tie order)") {
    val pieceGen = Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b")).map(_.mkString))
    val tableGen = for {
      n <- Gen.chooseNum(1, 8)
      ps <- Gen.listOfN(n, Gen.zip(pieceGen, Gen.chooseNum(1, 9)))
    } yield new UnigramTable(
      (ps.toMap ++ Map("a" -> 5, "b" -> 5)).toSeq.map { case (p, c) => (p, c * 100) }, 1000)
    val wordGen = Gen.chooseNum(0, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString)) // 'c' exercises UNK
    val prop = Prop.forAll(tableGen, Gen.listOfN(5, wordGen)) { (t, ws) =>
      ws.forall { w =>
        val got = toksOf(t, w)
        val want = if (w.isEmpty) Seq.empty else refSegment(t, w)
        got == want
      }
    }
    assert(check(params, prop).passed)
  }

  test("segment in a DataFrame (codegen path) == direct eval; lossless concat") {
    val t = new UnigramTable(Seq(("lo", 100), ("low", 90), ("w", 300),
      ("l", 400), ("o", 400), ("e", 400), ("r", 400)), 2000)
    val words = Seq("low", "lower", "lowest", "", "xyz", " naïve🙂")
    val got = words.toDF("w")
      .select(col("w"), UnigramSegment.segment(col("w"), t).as("p"))
      .as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      assert(got(w) == toksOf(t, w), s"codegen != eval for '$w'")
      assert(got(w).mkString == w, s"lossless concat of '$w'")
    }
    // "low" as one piece (90) beats lo+w (400) and l+o+w (1100)
    assert(got("low") == Seq("low"))
  }

  test("train: learns the dominant subword, deterministic, coverage floor kept") {
    // the emoji exercises the surrogate hygiene: char-based SQL substring
    // seeding yields split-emoji fragments that must be dropped, while
    // encode still round-trips the astral char via the UNK floor
    val docs = Seq.fill(16)("low low lower lowest slow 🙂").toDF("text")
    val t1 = Unigram.train(docs, col("text"), vocabSize = 8, rounds = 2)
    val t2 = Unigram.train(docs, col("text"), vocabSize = 8, rounds = 2)
    assert(t1.pieces == t2.pieces, "train must be deterministic")
    val pieceSet = t1.pieces.map(_._1).toSet
    assert(pieceSet.exists(p => p.contains("low") && p.length > 1),
      s"no low-ish multi piece learned in ${t1.pieces}")
    // coverage floor: every corpus character survives as a single piece
    "lowerstw ".foreach(c =>
      assert(pieceSet.contains(c.toString), s"single '$c' missing"))
    // encode round-trips arbitrary text over the trained table (UNK floor)
    val enc = Seq("slowest lower", "zebra!").toDF("text")
      .select(col("text"), Unigram.encodeText(col("text"), t1).as("e"))
      .as[(String, Seq[String])].collect().toMap
    enc.foreach { case (txt, pieces) =>
      assert(pieces.mkString == txt, s"encodeText lossless for '$txt'") }
    // no unpaired-surrogate junk pieces survive training
    t1.pieces.map(_._1).foreach { p =>
      assert(!p.exists(c => Character.isSurrogate(c)) ||
        p.codePointCount(0, p.length) < p.length,
        s"lone-surrogate piece '$p' in the table") }
  }

  test("savePieces/loadPieces round-trips nasty pieces; encodeIds deterministic layout") {
    val dir = java.nio.file.Files.createTempDirectory("uni-artifact")
    val path = dir.resolve("pieces.txt").toString
    // pieces with spaces (space-run pretokens), tabs, newlines, backslash
    val t = new UnigramTable(Seq((" ", 50), ("  ", 40), ("a\tb", 100),
      ("x\ny", 120), ("z\\w", 130), ("lo", 90), ("l", 400), ("o", 410)), 2000)
    Unigram.savePieces(path, t)
    val back = Unigram.loadPieces(path)
    assert(back.pieces == t.pieces && back.unkCost == t.unkCost,
      "piece artifact round-trip")
    // a loaded table drives the DP identically
    assert(toksOf(back, "lol") == toksOf(t, "lol"))
    // ids: sorted-piece layout, UNK -> -1
    val v = Unigram.vocab(t)
    assert(v.keys.toSeq.sorted.zipWithIndex.forall { case (p, i) => v(p) == i })
    val ids = Unigram.encodeIds(Seq("lo q").toDF("text"), col("text"), t)
      .select("piece_ids").as[Seq[Int]].collect().head
    assert(ids.length == 3 && ids(0) == v("lo") && ids(1) == v(" ") &&
      ids(2) == -1, s"ids: $ids") // 'q' is UNK
  }

  test("tie-break: equal-cost segmentations resolve to the longest final piece") {
    // "ab|c" vs "a|bc": equal totals; the DP must take the LONGER final
    // piece (smaller last split start) -> a|bc
    val t = new UnigramTable(Seq(("ab", 100), ("c", 100), ("a", 100),
      ("bc", 100), ("b", 500)), 2000)
    assert(toksOf(t, "abc") == Seq("a", "bc"))
  }
}
