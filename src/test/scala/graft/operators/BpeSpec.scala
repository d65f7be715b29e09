package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(12)

  test("train learns the frequency-ordered merges with deterministic ties") {
    // words: "aaab" x3, "ab" x2. Pair counts round 1: (a,a)=6, (a,b)=5
    // -> merge (a,a); round 2: (a,b)=5 beats (aa,a)=3 -> merge (a,b);
    // round 3: only (aa,ab)=3 and (aa,a)... aaab=[aa,ab] after round 2
    val df = Seq.fill(3)("aaab").mkString(" ").+(" ab ab").split(" ").toSeq
      .toDF("w").select(col("w").as("text"))
    val merges = Bpe.train(df, col("text"), 3)
    assert(merges === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("mergeFold greedy pass == the reference applyMerges pass") {
    val words = Seq("aaa", "abab", "aab", "b", "", "aaaa")
    val df = words.toDF("w")
      .select(col("w"),
        expr("CASE WHEN length(w) = 0 THEN array() " +
          "ELSE transform(sequence(1, length(w)), i -> substring(w, i, 1)) END").as("s"))
    val out = df.select(col("w"), Bpe.mergeFold(col("s"), "a", "a").as("m"))
      .as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      assert(out(w) === Bpe.applyMerges(w, Seq(("a", "a"))),
        s"fold diverged from reference on '$w'")
    }
  }

  test("applyMerges with trained merges tokenizes like classic BPE") {
    val corpus = Seq("low low low lower lowest").toDF("text")
    val merges = Bpe.train(corpus, col("text"), 4)
    // 'low' appears in every word: its pairs dominate, so after 4 merges
    // the whole word 'low' is a single symbol
    assert(Bpe.applyMerges("low", merges) === Seq("low"))
    // unseen characters survive as singletons
    assert(Bpe.applyMerges("xyz", merges) === Seq("x", "y", "z"))
  }

  test("property: encodeWord == applyMerges greedy reference on random words+merges") {
    // arbitrary space-free symbols, small alphabet to force overlaps and
    // prefix-symbol ambiguity (e.g. symbols "a" and "ab" coexisting)
    val symGen = Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b")).map(_.mkString))
    val mergesGen = Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.zip(symGen, symGen)))
    val wordsGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b")).map(_.mkString))))
    val prop = Prop.forAll(wordsGen, mergesGen) { (words, merges) =>
      val out = words.toDF("w")
        .select(col("w"), Bpe.encodeWord(col("w"), merges).as("e"))
        .as[(String, Seq[String])].collect().toMap
      words.forall(w => out(w) == Bpe.applyMerges(w, merges))
    }
    assert(check(params, prop).passed)
  }

  test("property: encodeWordBytes == serial byte reference on random multi-byte inputs") {
    // code points across ASCII, Latin-1, CJK, and astral planes: every
    // UTF-8 length 1-4 appears, so the LUT indexing and the no-UNK
    // closure are exercised on the full byte range
    val charGen = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const("é"), Gen.const("ß"),
      Gen.const("中"), Gen.const("文"), Gen.const("🙂"), Gen.const("€"))
    val wordGen = Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, charGen).map(_.mkString))
    val symGen = Gen.oneOf(
      Bpe.byteRender("e"), Bpe.byteRender("r"), Bpe.byteRender(" ").map(identity),
      Bpe.byteRender("é"), Bpe.byteRender("中")).flatMap(Gen.oneOf(_))
    val mergesGen = Gen.chooseNum(0, 5).flatMap(n =>
      Gen.listOfN(n, Gen.zip(symGen, symGen)))
    val prop = Prop.forAll(Gen.listOfN(6, wordGen), mergesGen) { (words, merges) =>
      val out = words.distinct.toDF("w")
        .select(col("w"), Bpe.encodeWordBytes(col("w"), merges).as("e"))
        .as[(String, Seq[String])].collect().toMap
      words.distinct.forall { w =>
        out(w) == Bpe.applyMergesSyms(Bpe.byteRender(w), merges)
      }
    }
    assert(check(params, prop).passed)
  }

  test("byte-level: no UNK — any UTF-8 input encodes into the closed byte vocab") {
    val merges = graft.SparkEntry.BpeByteMerges
    val vocab = Bpe.vocab(merges, Bpe.byteAlphabet)
    val nasty = Seq("hello world", "naïve café", "中文 文本", "🙂🙃",
      "tab\tand\nnewline", "mixed 中e🙂ß", "")
    val out = nasty.toDF("t")
      .select(col("t"), Bpe.encodeTextBytes(col("t"), merges).as("e"))
      .as[(String, Seq[String])].collect().toMap
    nasty.foreach { t =>
      out(t).foreach(tok => assert(vocab.contains(tok),
        s"token '$tok' of input '$t' not in the closed vocab"))
      // lossless: concatenated tokens re-render the exact input bytes
      val bytes = out(t).flatMap(tok => tok.map(c =>
        Bpe.byteAlphabet.indexOf(c.toString))).map(_.toByte).toArray
      assert(new String(bytes, "UTF-8") === t, s"byte round-trip of '$t'")
    }
  }

  test("pretokenize: covers every character (concatenation reconstructs), space attaches") {
    // "a <VT>!" pins the explicit whitespace class: Java's \s includes
    // vertical tab, RE2's does not — the literal [\t\n\x0B\f\r ] class
    // makes VT whitespace on BOTH engines (see Bpe.PretokenPattern)
    val texts = Seq("hello wörld  12 a-b\ntail", " lead", "a  b", "", "a \u000B!")
    val got = texts.toDF("t")
      .select(col("t"), Bpe.pretokenize(col("t")).as("p"))
      .as[(String, Seq[String])].collect().toMap
    texts.foreach(t => assert(got(t).mkString === t, s"coverage of '$t'"))
    assert(got("hello wörld  12 a-b\ntail") ===
      Seq("hello", " wörld", "  ", "12", " a", "-", "b", "\n", "tail"),
      "pretoken shape (single space attaches; runs stay whole)")
  }

  test("trainBytes learns space-prefixed merges (the Ġ tokens)") {
    val docs = Seq.fill(8)("low low lower lowest").toDF("text")
    val merges = Bpe.trainBytes(docs, col("text"), 6)
    assert(merges.nonEmpty)
    // the space byte is in play: some merge touches the Ġ remap
    val g = Bpe.byteAlphabet(' '.toInt)
    assert(merges.exists { case (a, b) => (a + b).contains(g) },
      s"no space-attached merge learned in $merges")
  }

  test("vocab/encodeIds: deterministic id layout, UNK for unseen, ids invert to tokens") {
    val merges = Seq(("l", "o"), ("lo", "w"))
    val alphabet = Seq("l", "o", "w", "e", "r")
    val v = Bpe.vocab(merges, alphabet)
    // sorted alphabet first, then merge products in rank order
    assert(v == Map("e" -> 0, "l" -> 1, "o" -> 2, "r" -> 3, "w" -> 4,
      "lo" -> 5, "low" -> 6))
    val df = Seq("low lower", "lox").toDF("text")
    val ids = Bpe.encodeIds(df, col("text"), merges, alphabet)
      .select("bpe_ids").as[Seq[Int]].collect()
    // "low" -> [low]; "lower" -> [low, e, r]
    assert(ids(0) === Seq(6, 6, 0, 3))
    // 'x' was never in the alphabet -> UNK (-1)
    assert(ids(1) === Seq(5, -1))
    // round trip: every non-UNK id inverts to the token encode emitted
    val inv = v.map(_.swap)
    assert(ids(0).map(inv) === Seq("low", "low", "e", "r"))
  }

  test("saveMerges/loadMerges round-trips rank order and escaped symbols") {
    val dir = java.nio.file.Files.createTempDirectory("bpe-artifact")
    val path = dir.resolve("merges.txt").toString
    // symbols may contain newlines/tabs/backslashes (tokens split on
    // ' ' only), the artifact must survive them
    val merges = Seq(("a", "b"), ("ab", "c"), ("x\ny", "z\t\\w"))
    Bpe.saveMerges(path, merges)
    assert(Bpe.loadMerges(path) === merges)
    // and a loaded table drives encode identically
    assert(Bpe.applyMerges("abc", Bpe.loadMerges(path)) === Seq("abc"))
  }

  test("encode applies trained merges corpus-wide == per-word applyMerges") {
    val corpus = Seq("low low low lower lowest", "slow lower  slowest")
      .toDF("text")
    val merges = Bpe.train(corpus, col("text"), 4)
    val rows = Bpe.encode(corpus, col("text"), merges)
      .select(col("text"), col("bpe_tokens"))
      .as[(String, Seq[String])].collect()
    rows.foreach { case (t, toks) =>
      val ref = t.split(" ").filter(_.nonEmpty).toSeq
        .flatMap(w => Bpe.applyMerges(w, merges))
      assert(toks === ref, s"corpus encode diverged on '$t'")
    }
  }
}
