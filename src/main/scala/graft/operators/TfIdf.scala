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
               scale: Long = 1000000L,
               scope: graft.PersistScope = graft.PersistScope()): DataFrame = {
    val tf = scope.cache(docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val nDocs = docs.select(col(idCol)).count()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    Relational.topKPerGroup(scoreTfIdf(tf.join(dfreq, "term"), scale, nDocs),
        Seq("doc_id"), Seq(col("score").desc, col("term")), k)
      .select("doc_id", "term", "tf", "df", "score", "rank_in_group")
  }

  /** tf * floor((scale * nDocs) / df) with every step carried in
    * decimal: at the design scale (tens of billions of docs) the BIGINT
    * product would wrap silently in non-ANSI Spark and invert the
    * ranking. The quotient is NOT `DIV` — Spark's IntegralDivide returns
    * LongType even for decimal operands, so `(scale*nDocs) DIV df` would
    * Long-cap (null) at nDocs > ~9.2e12 for df=1. Instead the exact
    * integer floor is `(a - a % b) / b`: decimal `%` is exact at scale 0
    * and the division of the exactly-divisible remainder-free value is
    * representable in the result's 6-digit fraction, so no rounding can
    * perturb the floor. Only the FINAL score cast can overflow BIGINT,
    * degrading to null (sorted last) — the oracle mirrors with HUGEINT
    * `//` and TRY_CAST for the same null-on-overflow boundary. */
  private def scoreTfIdf(scored: DataFrame, scale: Long, nDocs: Long): DataFrame = {
    val a = s"CAST('${BigInt(scale) * nDocs}' AS DECIMAL(38,0))"
    val b = "CAST(df AS DECIMAL(19,0))"
    scored.withColumn("score", expr(
      s"CAST(CAST(tf AS DECIMAL(38,0)) * " +
        s"CAST(($a - $a % $b) / $b AS DECIMAL(38,0)) AS BIGINT)"))
  }

  /** BM25-shaped top-k retrieval for a literal query, in EXACT integer
    * arithmetic (the repo's ppm discipline — libm-free, so the whole
    * ranking is cell-exact cross-engine): per query term
    * `idf_ppm = (N - df + 1) * 1e6 DIV (df + 1)` (the classic idf's
    * monotone rational surrogate) and the Robertson tf saturation with
    * k1 = 1.2, b = 0.8 carried as x10 integers:
    * `ts = idf_ppm * (tf*22) DIV (tf*10 + (12 * (10-8 + (8*dl*10) DIV avgdl_x10)) DIV 10)`.
    * Scale shape: tokenize once, df/tf only for the query's terms (the
    * candidate relation is corpus-linear in MATCHING tokens only), the
    * tiny per-term df table broadcasts, doc-length join co-partitions on
    * the doc, and top-k is TakeOrderedAndProject — never a global sort.
    * N and sum(dl) are the two collected scalars (same legitimacy as the
    * IVF centroid collect). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               query: Seq[String], topK: Int,
               scope: graft.PersistScope = graft.PersistScope()): DataFrame = {
    // dl (doc length) is size(tokens): computed MAP-SIDE inside one
    // codegen stage, and only query-term hits ever reach a shuffle.
    // The previous shape exploded the full corpus token stream and
    // grouped it just to count per-doc lengths — at scale that is
    // shuffling every token vs shuffling ~|query| rows per doc.
    val base = scope.cache(docs
      .select(col(idCol).as("doc_id"),
        graft.functions.Text.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"),
        greatest(coalesce(size(col("toks")), lit(0)), lit(0)).cast("long").as("dl0"),
        filter(col("toks"), t => t.isInCollection(query)).as("hits0"))
      // duplicate doc_id rows are ONE document (the oracle counts length
      // per doc_id, not per row): doc-keyed fold of lengths + hits —
      // still shuffling only per-doc longs and query-term arrays, never
      // the corpus token stream
      .groupBy("doc_id")
      .agg(sum(col("dl0")).as("dl"),
        flatten(collect_list(col("hits0"))).as("hits")))
    val st = base.agg(
      count(when(col("dl") > 0, 1)).as("n"), sum("dl").as("sl")).head()
    val n = st.getLong(0)
    if (n == 0L) // empty / all-empty corpus: empty result, right schema
      return docs.sparkSession.range(0)
        .select(col("id").cast(docs.schema(idCol).dataType).as("doc_id"),
          col("id").as("score_ppm"))
    val avgdlX10 = st.getLong(1) * 10L / n
    // dl rides the grouping key (functionally dependent on doc_id):
    // no post-hoc length join. (R10 A/B note: a map-side HOF tf —
    // counting each term inside the per-doc hits array — was measured
    // 19% SLOWER at sf0.5 and a wash at sf1.5: Spark never codegens
    // higher-order functions, so the interpreted per-doc fold costs
    // more than this codegen'd hash-agg over query-term hits only.
    // The shuffle here is ~|query terms| rows per matching doc, not
    // the corpus.)
    val tf = base.select(col("doc_id"), col("dl"), explode(col("hits")).as("tok"))
      .groupBy("doc_id", "tok", "dl").agg(count(lit(1)).as("tf"))
    // df falls out of tf (already one row per (doc, term)): no second
    // scan of the hits, no count_distinct expand
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    // the idf_ppm * (tf*22) product rides DECIMAL like scoreTfIdf: at
    // the design scale (N ~ 1e10 docs, df = 1) idf_ppm is ~5e15 and a
    // BIGINT product wraps at tf >= 84, inverting the ranking (non-ANSI)
    // or killing the job (ANSI). The exact integer floor of a decimal
    // quotient is (a - a % b) / b — Spark's DIV is Long-typed even on
    // decimals (see scoreTfIdf). Per-term ts <= idf_ppm * 2.2, so the
    // final BIGINT cast is safe where the intermediate was not.
    def floorDiv(a: String, b: String): String =
      s"CAST(($a - $a % $b) / $b AS DECIMAL(38,0))"
    val idf = floorDiv(
      s"(CAST(${n}L - df + 1 AS DECIMAL(38,0)) * 1000000)",
      "CAST(df + 1 AS DECIMAL(19,0))")
    val denom = s"CAST(tf * 10 + (12 * (2 + (8 * dl * 10) DIV ${avgdlX10}L))" +
      s" DIV 10 AS DECIMAL(19,0))"
    tf.join(broadcast(dfreq), "tok")
      .withColumn("ts", expr(
        s"CAST(${floorDiv(s"($idf * CAST(tf * 22 AS DECIMAL(19,0)))",
          denom)} AS BIGINT)"))
      .groupBy("doc_id").agg(sum("ts").as("score_ppm"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .limit(topK)
  }

  // ---- incremental maintenance ---------------------------------------
  //
  // The reference's corpora grow by scheduled appends (monthly loads);
  // re-reading 100 TB of old text per batch is the thing to avoid. The
  // store is three batch_id-PARTITIONED parquet relations — tf
  // (doc,term,tf), df_delta (term,df), meta (n_docs) — all written with
  // dynamic partition overwrite, so EVERY write of a batch is
  // idempotent under foreachBatch's at-least-once replay: a crash at
  // any point mid-ingest just re-overwrites that batch's partitions
  // (no append to double, no read-modify-write merge to double-apply;
  // the r3 self-review killed an earlier append+merge design exactly
  // because a crash between its writes double-counted on replay). The
  // meta partition lands last and doubles as the committed-batch
  // ledger. Read-side: df = sum of the per-batch deltas — vocabulary x
  // batches rows, not corpus rows.

  private def exists(spark: org.apache.spark.sql.SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
  }

  private def writeBatchPartition(df: DataFrame, path: String, batchId: Long): Unit =
    df.withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("batch_id")
      .parquet(path)

  /** Ingest one document batch into the store. foreachBatch-shaped;
    * replaying a committed batchId is a no-op, and replaying a batch
    * that crashed mid-ingest simply overwrites its own partitions. */
  def ingestBatch(storeDir: String, idCol: String, textCol: String,
                  tokens: Column => Column)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // A first-ever batch that crashed after creating meta/ but before a
    // parquet footer committed leaves a directory spark.read throws on
    // (only _temporary inside). Treat unreadable meta as "nothing
    // committed" — the replay then re-overwrites its own partitions —
    // instead of wedging every subsequent ingest on the same error.
    val committed = exists(spark, s"$storeDir/meta") &&
      scala.util.Try(!spark.read.parquet(s"$storeDir/meta")
        .where(col("batch_id") === batchId).isEmpty).getOrElse(false)
    if (committed) return
    // one projected+tokenized pass feeds tf, df, AND the row count — the
    // batch source itself is read once
    val proj = batch
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .persist()
    try {
      val tfNew = proj
        .select(col("doc_id"), explode(col("__toks")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .persist()
      try {
        writeBatchPartition(tfNew, s"$storeDir/tf", batchId)
        writeBatchPartition(tfNew.groupBy("term").agg(count(lit(1)).as("df")),
          s"$storeDir/df_delta", batchId)
        import spark.implicits._
        // committed-batch marker lands LAST
        writeBatchPartition(
          Seq(proj.count()).toDF("n_docs"),
          s"$storeDir/meta", batchId)
      } finally tfNew.unpersist()
    } finally proj.unpersist()
  }

  /** Top-k per doc over the maintained store — identical output contract
    * (and, for the same corpus, identical cells) to [[topTerms]], without
    * touching the document text again. */
  def topTermsFromStore(spark: org.apache.spark.sql.SparkSession, storeDir: String,
                        k: Int, scale: Long = 1000000L): org.apache.spark.sql.DataFrame = {
    // meta lands LAST per batch and is the committed-batch ledger — the
    // read side must ENFORCE it: a crash after tf/df_delta landed but
    // before meta leaves orphan partitions whose rows would deflate
    // every idf (df summed over a batch whose docs n_docs excludes)
    // until the stream replays. Batch-id partition pruning makes the
    // semi-join a directory filter, not a data join.
    val meta = spark.read.parquet(s"$storeDir/meta")
    val committed = meta.select("batch_id").distinct()
    val nDocs = meta.agg(sum("n_docs")).head.getLong(0)
    val dfAll = spark.read.parquet(s"$storeDir/df_delta")
      .join(committed, Seq("batch_id"), "left_semi")
      .groupBy("term").agg(sum("df").as("df"))
    val scored = scoreTfIdf(
      spark.read.parquet(s"$storeDir/tf")
        .join(committed, Seq("batch_id"), "left_semi")
        .drop("batch_id").join(dfAll, "term"),
      scale, nDocs)
    Relational.topKPerGroup(scored, Seq("doc_id"),
        Seq(col("score").desc, col("term")), k)
      .select("doc_id", "term", "tf", "df", "score", "rank_in_group")
  }
}
