package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurateSpec extends SparkSpec {
  import spark.implicits._

  // bench doc 10: trigrams {a b c, b c d, c d e}
  // bench doc 20: trigrams {p q r, q r s}
  private def bench = Seq(
    (10L, "a b c d e"),
    (20L, "p q r s")
  ).toDF("doc_id", "text")

  private def corpus = Seq(
    (1L, "a b c d e f"),   // shares {a b c, b c d, c d e} with 10
    (2L, "x a b c y"),     // shares {a b c} with 10 — below minShared 2
    (3L, "z z p q r s z")  // shares {p q r, q r s} with 20 — full coverage
  ).toDF("doc_id", "text")

  test("contamination finds pairs above minShared with exact ppm coverage") {
    val out = Curate.contamination(corpus, bench, "doc_id", "text", 3, 2)
      .select("doc_a", "doc_b", "n_shared", "n_bench_sh", "coverage_ppm")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out((1L, 10L)) === ((1L, 10L, 3L, 3L, 1000000L)))
    assert(out((3L, 20L)) === ((3L, 20L, 2L, 2L, 1000000L)))
    assert(!out.keySet.exists(_._1 == 2L)) // single shared trigram filtered
    assert(out.size === 2)
  }

  test("maxNgramDf drops benchmark boilerplate n-grams before the join") {
    // the trigram 'a b c' appears in BOTH bench docs -> df 2 > cap 1, so
    // it is removed from the benchmark universe and doc 2 finds nothing;
    // doc 10's remaining trigrams {b c d, c d e} still match doc 1
    val b2 = Seq((10L, "a b c d e"), (30L, "q a b c q")).toDF("doc_id", "text")
    val out = Curate.contamination(corpus, b2, "doc_id", "text", 3, 2,
        maxNgramDf = 1)
      .select("doc_a", "doc_b", "n_shared", "n_bench_sh")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 10L, 2L, 2L)))
  }

  test("boilerplateRemove drops cross-document hot lines, keeps order") {
    val docs = Seq(
      (1L, "FOOTER|alpha|FOOTER|beta"),   // FOOTER twice in one doc: df counts docs
      (2L, "gamma|FOOTER"),
      (3L, "FOOTER|delta"),
      (4L, "FOOTER")                       // only boilerplate -> 0 kept
    ).toDF("doc_id", "text")
    val out = Curate.boilerplateRemove(docs, "doc_id", "text", "\\|", maxLineDf = 2)
      .select("doc_id", "n_lines", "n_kept", "clean_md5")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // FOOTER is in 4 distinct docs (> 2) -> removed everywhere
    assert(out(1L) === ((4L, 2L, m("alpha\nbeta"))))
    assert(out(2L) === ((2L, 1L, m("gamma"))))
    assert(out(3L) === ((2L, 1L, m("delta"))))
    assert(out(4L) === ((1L, 0L, m(""))))
    // with a higher threshold nothing is hot
    val loose = Curate.boilerplateRemove(docs, "doc_id", "text", "\\|", 10)
      .select("n_kept").as[Long].collect().sum
    assert(loose === 9L) // all lines kept
  }

  test("balancedSample downsamples every stratum toward the smallest") {
    val df = ((1 to 4000).map(i => (i.toLong, "bulk")) ++
        (4001 to 4200).map(i => (i.toLong, "rare")))
      .toDF("id", "stratum")
    val out = Curate.balancedSample(df, "stratum", col("id"))
      .select("id", "stratum").as[(Long, String)].collect()
    val byStratum = out.groupBy(_._2).view.mapValues(_.length).toMap
    // rare keeps everything (rate 1e6 ppm = all 200 rows, exactly)
    assert(byStratum("rare") === 200)
    // bulk is hash-thresholded at 50000 ppm: ~200 of 4000 (md5-uniform)
    assert(byStratum("bulk") > 120 && byStratum("bulk") < 280,
      s"bulk kept ${byStratum("bulk")}")
    // deterministic on re-run
    val again = Curate.balancedSample(df, "stratum", col("id"))
      .select("id", "stratum").as[(Long, String)].collect()
    assert(out.toSet === again.toSet)
  }

  test("sourceShareCap: best-first prefix per source, no source over its share") {
    // source A: 10 docs of 10 tokens; source B: 2 docs of 10 tokens.
    // total = 120 tokens; 25% share = 30 tokens -> A keeps its best 3,
    // B keeps both (20 <= 30)
    val df = ((1 to 10).map(i => (i.toLong, "A", 100 - i)) ++
        Seq((11L, "B", 50), (12L, "B", 40)))
      .toDF("doc_id", "source", "quality")
    val out = Curate.sourceShareCap(df, "source",
        Seq(col("quality").desc, col("doc_id")), lit(10L), sharePpm = 250000L)
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
    // best-first = highest quality = lowest doc_id for A
    assert(out === Map(1L -> 10L, 2L -> 20L, 3L -> 30L,
      11L -> 10L, 12L -> 20L))
  }

  test("lmScore: hand-checked bigram conditional ppm means") {
    // corpus: "a b" x2 and "a c" -> c(a,b)=2, c(a,c)=1, c(a,.)=3
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "z")).toDF("doc_id", "text")
    val out = Curate.lmScore(df, "doc_id", "text")
      .select("doc_id", "n_bigrams", "lm_score_ppm")
      .as[(Long, Long, Long)].collect().toSet
    // p(b|a) = 2*1e6 DIV 3 = 666666 ppm; p(c|a) = 1e6 DIV 3 = 333333 ppm;
    // doc 4 has no bigram -> absent
    assert(out === Set((1L, 1L, 666666L), (2L, 1L, 666666L), (3L, 1L, 333333L)))
  }

  test("nbQualityScore: add-one-smoothed mean token posterior, hand-computed") {
    val df = Seq(
      (1L, "good good", "ref"),
      (2L, "good bad", "crawl"),
      (3L, "bad", "crawl")
    ).toDF("doc_id", "text", "source")
    val out = Curate.nbQualityScore(df, "doc_id", "text",
        col("source") === "ref")
      .select("doc_id", "n_tokens", "quality_ppm")
      .as[(Long, Long, Long)].collect().toSet
    // token "good": cPos=2 of 3 -> (2+1)*1e6 DIV (3+2) = 600000 ppm
    // token "bad":  cPos=0 of 2 -> (0+1)*1e6 DIV (2+2) = 250000 ppm
    // doc1 = 600000; doc2 = (600000+250000) DIV 2 = 425000; doc3 = 250000
    assert(out === Set((1L, 2L, 600000L), (2L, 2L, 425000L), (3L, 1L, 250000L)))
  }

  test("coverage_ppm is the exact integer ratio of the CAPPED bench universe") {
    // bench doc with 4 distinct trigrams, corpus doc sharing 3 of them
    val b = Seq((10L, "a b c d e f")).toDF("doc_id", "text")
    val c = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val row = Curate.contamination(c, b, "doc_id", "text", 3, 2)
      .select("n_shared", "n_bench_sh", "coverage_ppm")
      .as[(Long, Long, Long)].head()
    assert(row === ((3L, 4L, 750000L)))
  }

  test("sourceDrift: identical sources drift 0, hand-computed partial overlap") {
    val docs = Seq(
      ("s1", "a a b"), ("s2", "a a b"),  // identical distributions
      ("s3", "a c"))                     // half shared with s1/s2
    .toDF("source", "text")
    val got = Curate.sourceDrift(docs, "source", "text")
      .orderBy("src_a", "src_b").as[(String, String, Long)].collect().toSeq
    // s1: p(a)=666666, p(b)=333333 (ppm, DIV-truncated); s3: p(a)=p(c)=500000
    // L1(s1,s3) = |666666-500000| + (333333-unshared) + (500000)
    //           = 166666 + 333333 + 500000 = 999999
    assert(got == Seq(
      ("s1", "s2", 0L),
      ("s1", "s3", 999999L),
      ("s2", "s3", 999999L)))
  }

  test("trainer collects fail LOUDLY past their driver-size caps") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq((1L, "a b c d e f g"), (2L, "h i j k l m n"))
      .toDF("doc_id", "text")
    // benchmarkNgrams: 10 distinct trigrams > cap 4
    val e1 = intercept[IllegalArgumentException] {
      Curate.benchmarkNgrams(corpus, "doc_id", "text", 3, maxCollected = 4)
    }
    assert(e1.getMessage.contains("driver-collected"))
    // under the cap the set is complete and sorted
    val ng = Curate.benchmarkNgrams(corpus, "doc_id", "text", 3)
    assert(ng.length === 10 && ng.sorted.sameElements(ng))
    // lmModel: 12 distinct bigrams > cap 4
    val e2 = intercept[IllegalArgumentException] {
      Curate.lmModel(corpus, "doc_id", "text", maxCollected = 4)
    }
    assert(e2.getMessage.contains("broadcast-sized"))
    assert(Curate.lmModel(corpus, "doc_id", "text").size === 12)
  }
}
