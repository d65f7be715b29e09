package graft.operators

import graft.SparkSpec
import graft.functions.Text

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("topTerms ranks rare terms above common ones, hand-checked") {
    // "the" appears in all 4 docs (df=4), "spark" in 1 (df=1),
    // "data" in 2 (df=2)
    val docs = Seq(
      (1L, "the spark engine the"),
      (2L, "the data pipeline"),
      (3L, "the data lake"),
      (4L, "the boring doc")).toDF("doc_id", "text")
    val out = TfIdf.topTerms(docs, "doc_id", "text", Text.tokens, 2)
      .orderBy("doc_id", "rank_in_group")
      .select("doc_id", "term", "tf", "df", "score", "rank_in_group")
      .as[(Long, String, Long, Long, Long, Int)].collect().toSeq
    // doc 1: spark tf=1 df=1 -> score 4_000_000; engine same; "the" tf=2
    // df=4 -> 2_000_000; top-2 = engine, spark (score tie -> term asc)
    assert(out.filter(_._1 == 1L).map(r => (r._2, r._5)) ===
      Seq(("engine", 4000000L), ("spark", 4000000L)))
    // doc 2: data df=2 -> 2_000_000, pipeline df=1 -> 4_000_000
    assert(out.filter(_._1 == 2L).map(r => (r._2, r._5)) ===
      Seq(("pipeline", 4000000L), ("data", 2000000L)))
    // every doc got exactly k=2 rows, ranks 1..2
    assert(out.groupBy(_._1).forall(_._2.map(_._6).sorted == Seq(1, 2)))
  }

  test("tf counts repeats within a doc and k caps output") {
    val docs = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val out = TfIdf.topTerms(docs, "doc_id", "text", Text.tokens, 1)
      .as[(Long, String, Long, Long, Long, Int)].collect().toSeq
    // a: tf=3 df=1 score=3M*1; b: tf=1 df=1 score=1M -> only 'a' survives k=1
    assert(out === Seq((1L, "a", 3L, 1L, 3000000L, 1)))
  }
}
