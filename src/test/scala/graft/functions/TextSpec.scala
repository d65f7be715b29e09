package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(Tuple1(text)).toDF("text")

  test("tokens drops empties") {
    val t = one("the  quick brown ").select(Text.tokens(col("text"))).as[Seq[String]].head()
    assert(t === Seq("the", "quick", "brown"))
  }

  test("vocabHits counts stopwords") {
    val n = one("the cat and the dog").select(Text.vocabHits(Text.tokens(col("text")), Text.StopWords))
      .as[Int].head()
    assert(n === 3)
  }

  test("fingerprint is order-sensitive and deterministic") {
    def fp(s: String) = one(s).select(Text.fingerprint(Text.tokens(col("text")))).as[Long].head()
    assert(fp("a b c") === fp("a b c"))
    assert(fp("a b c") !== fp("c b a"))
    // manual fold: acc = (acc*31 + ascii*7 + len) mod P
    val manual = Seq("a", "b", "c").foldLeft(0L)((acc, t) =>
      (acc * 31 + t.head.toLong * 7 + t.length) % Text.FpMod)
    assert(fp("a b c") === manual)
  }

  test("langId picks profile with max hits, lexicographic ties") {
    def lid(s: String) = one(s).select(Text.langId(Text.tokens(col("text")))).as[String].head()
    assert(lid("the cat of a hat") === "en")
    assert(lid("table scan join hash") === "db")
    assert(lid("spark row data") === "sp")
    // 'the'(en) vs 'scan'(db): 1-1 tie -> 'db' first lexicographically
    assert(lid("the scan") === "db")
    // ZERO signal is undetermined, not the lexicographically first
    // profile: no vocab word hits at all
    assert(lid("bonjour le monde") === "und")
    assert(lid("") === "und")
  }

  test("regexTokens splits words and numbers") {
    val n = one("Hello world42 foo-bar 7")
      .select(size(Text.regexTokens(col("text")))).as[Int].head()
    assert(n === 6) // hello, world, 42, foo, bar, 7
  }

  test("dedupLinesOf keeps first occurrences in order") {
    val out = Seq(Seq("a", "b", "a", "c", "b", "a"), Seq("x"), Seq[String]())
      .toDF("lines")
      .select(Text.dedupLinesOf(col("lines")).as("kept"))
      .as[Seq[String]].collect().toSeq
    assert(out === Seq(Seq("a", "b", "c"), Seq("x"), Seq()))
  }

  test("winnowOf selects window minima; overlapping docs share fingerprints") {
    // hashes chosen so each 3-window has a clear min
    val out = Seq(Seq(50L, 10L, 40L, 30L, 20L), Seq(5L, 6L), Seq[Long]())
      .toDF("hs")
      .select(Text.winnowOf(col("hs"), 3).as("fp"))
      .as[Seq[Long]].collect().toSeq
    // windows: (50,10,40)->10 (10,40,30)->10 (40,30,20)->20 => {10,20}
    assert(out === Seq(Seq(10L, 20L), Seq(), Seq()))
    // guarantee: two docs overlapping in >= w+k-1 tokens share a fingerprint
    val doc1 = "p q r s t u v w x y z"
    val doc2 = "a b c p q r s t u v v2 w2" // shares 7 tokens: p..v
    val fps = Seq(doc1, doc2).toDF("text")
      .select(Text.tokens(col("text")).as("t"))
      .select(graft.plans.NGrams.ngrams(col("t"), 4).as("g"))
      .select(transform(col("g"), x => Text.md5Long(x)).as("hs"))
      .select(Text.winnowOf(col("hs"), 3).as("fp"))
      .as[Seq[Long]].collect()
    assert(fps(0).toSet.intersect(fps(1).toSet).nonEmpty)
  }

  test("piiScrub redacts urls, emails, phones in order; counts match") {
    val t = "see https://x.org/a?u=1 mail bob.smith+x@corp.co.uk " +
      "or +44 20 7946 0958 and a@b.io"
    val row = one(t).select(
      Text.piiScrub(col("text")).as("s"),
      Text.piiCount(col("text"), "url").as("u"),
      Text.piiCount(col("text"), "email").as("e"),
      Text.piiCount(col("text"), "phone").as("p"))
      .as[(String, Int, Int, Int)].head()
    assert(row._1 ===
      "see [URL] mail [EMAIL] or [PHONE] and [EMAIL]")
    assert((row._2, row._3, row._4) === (1, 2, 1))
    // clean text passes through untouched
    assert(one("no pii here").select(Text.piiScrub(col("text")))
      .as[String].head() === "no pii here")
  }
}
