package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TF-IDF salient-term extraction over a document corpus — the classic
  * training-data "what is this document about / is it boilerplate"
  * primitive alongside the quality/lang-id scores (functions.Text).
  *
  * Engine-grade determinism: idf is the EXACT integer ratio
  * `(scale * nDocs) div df` (parts-per-`scale`), not `ln(N/df)` — natural
  * logs are libm calls whose last-bit rounding differs across engines,
  * which would break cell-exact oracle parity for no analytical gain:
  * within one corpus the integer ratio induces the same "rarer term =
  * larger idf" ordering the log form exists for. Same design as the
  * deci-point impact weights (ImpactScore).
  *
  * Shape at 100 TB: tf is one (doc, term) groupBy; df reuses tf (a
  * groupBy on term, co-partitioned with the join-back on term); the
  * top-k per doc is a partitioned window — no global sort, no collect.
  * The tf relation is persisted: it feeds both df and the join-back.
  */
object TfIdf {

  /** Top-`k` terms per document by tf-idf score, deterministic tie-break
    * on the term. `tokens` maps the text column to an array of terms
    * (e.g. `Text.tokens`). Output: (doc_id, term, tf, df, score,
    * rank_in_group). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               tokens: Column => Column, k: Int,
               scale: Long = 1000000L): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist()
    val nDocs = docs.select(col(idCol)).count()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // scale*nDocs precomputed as ONE long literal: an INT*INT product in
    // the SQL text would overflow silently in non-ANSI mode
    val scored = tf.join(dfreq, "term")
      .withColumn("score", expr(s"tf * (${scale * nDocs}L DIV df)"))
    Relational.topKPerGroup(scored, Seq("doc_id"),
        Seq(col("score").desc, col("term")), k)
      .select("doc_id", "term", "tf", "df", "score", "rank_in_group")
  }
}
