package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curate, Dedup, Stats}

/** The training-data curation pipeline end to end, in one test:
  * raw corpus → quality gate → exact dedup → benchmark decontamination →
  * token-budget selection → mixture balancing. Each stage is one of the
  * §2.4/§2.4c operators; the assertions pin monotonicity (each stage only
  * removes rows), the specific removals, and full determinism on re-run —
  * the "a curation user could run their whole recipe on this engine"
  * claim, executed.
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("gate -> dedup -> decontaminate -> budget -> balance, deterministic") {
    val corpus = Seq(
      // good docs, two sources
      (1L, "srcA", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "srcA", "one two three four five six seven eight nine ten eleven"),
      (3L, "srcA", "red green blue cyan magenta yellow black white gray pink"),
      (4L, "srcB", "north south east west up down left right front back"),
      // exact duplicate of 1 (dedup removes the higher id)
      (5L, "srcB", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // contaminated: contains the benchmark trigrams
      (6L, "srcB", "prefix words then the secret benchmark passage appears here"),
      // low quality: too short
      (7L, "srcB", "tiny doc"),
      // low quality: repetitive
      (8L, "srcB", "spam spam spam spam spam spam spam spam spam spam spam spam")
    ).toDF("doc_id", "source", "text")
    val benchmark = Seq(
      (100L, "the secret benchmark passage appears in eval sets")
    ).toDF("doc_id", "text")

    def runPipeline() = {
      // 1. quality gate (stateless; same expressions as the stream twin)
      val gated = graft.streaming.EventStream
        .qualityScrubStream(corpus, "doc_id", "text", minTokens = 5,
          maxRepRatioPpm = 400000L)
        .select(col("doc_id"), col("scrubbed_text").as("text"), col("n_tokens"))
        .join(corpus.select("doc_id", "source"), Seq("doc_id"))
      // 2. exact dedup: keep each group's canonical (min) id
      val canon = Dedup.exactDupGroups(gated, "doc_id", "text")
        .select(col("canonical_id").as("doc_id"))
      val deduped = gated.join(canon, Seq("doc_id"), "left_semi")
      // 3. benchmark decontamination
      val contaminated = Curate.contamination(deduped, benchmark,
          "doc_id", "text", n = 3, minShared = 2)
        .select(col("doc_a").as("doc_id")).distinct()
      val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
      // 4. token-budget selection, best (longest) first
      val budgeted = Curate.tokenBudgetSelect(clean,
        Seq(col("n_tokens").desc, col("doc_id")), col("n_tokens"), 40L)
      // 5. mixture balancing across sources
      Curate.balancedSample(budgeted, "source", col("doc_id"))
        .select("doc_id").as[Long].collect().toSet
    }

    val out = runPipeline()
    // gate removed 7 (short) and 8 (repetitive); dedup removed 5 (copy of
    // 1); decontamination removed 6; budget keeps the 10/11-token docs
    // while the cumulative count fits 40 tokens
    assert(out.subsetOf(Set(1L, 2L, 3L, 4L)))
    assert(out.contains(2L)) // 11 tokens, longest -> first pick
    assert(!out.contains(5L) && !out.contains(6L) && !out.contains(7L) && !out.contains(8L))
    // deterministic end to end (hash sampling, no rand() anywhere)
    assert(runPipeline() === out)
  }
}
