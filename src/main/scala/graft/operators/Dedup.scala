package graft.operators

import graft.PersistScope
import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash.
  *
  * Scale shape: every near-dup variant generates candidates with an
  * EQUI-join (inverted index on shingle / band signature / hamming block),
  * never an all-pairs comparison; shuffles are hash-partitioned on those
  * keys and benefit from map-side partial aggregation.
  */
object Dedup {

  /** Exact duplicate groups by content hash: md5 groupBy — one shuffle on
    * the 128-bit digest, uniform by construction (no skew).
    *
    * NULL text pools into ONE group (content_md5 NULL): groupBy treats
    * NULL as a value, and the SQL oracle's GROUP BY does the same, so
    * the two engines agree — but "missing text" is unknown content, not
    * equal content. A keep-canonical consumer must pre-filter NULL/empty
    * text (the curation recipes do, via the token floor) or it will drop
    * every text-less doc but one as a "duplicate". */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("content_md5"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("canonical_id"))

  /** Distinct n-token shingles over a token-array column, via the native
    * codegen'd [[graft.plans.NGrams]] expression (single tight loop per
    * row; short docs yield []). */
  def shinglesOf(toks: Column, n: Int): Column =
    array_distinct(graft.plans.NGrams.ngrams(toks, n))

  /** Interpreted higher-order-function formulation of [[shinglesOf]] —
    * kept as the executable specification the DuckDB oracle mirrors
    * (list_transform over range) and as the equivalence baseline for the
    * native expression. The tokens must be a plain column reference:
    * inlining the tokenizer here would copy it into every `element_at`.
    * (Guarded: Spark's `sequence(1, 0)` would count DOWN, so short docs
    * get []). */
  def shinglesOfHof(toks: Column, n: Int): Column = {
    val cnt = size(toks) - (n - 1)
    // NULL input -> NULL, matching the native expression's null-intolerant
    // eval exactly (size(NULL) is NULL, so the bare when/otherwise would
    // silently turn NULL into [] and the two forms would diverge on the
    // one input class the equivalence spec's =!= filter cannot see)
    when(toks.isNull, lit(null).cast("array<string>"))
      .when(cnt >= 1,
        array_distinct(
          transform(
            sequence(lit(1), cnt),
            i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Convenience: text column -> shingles (tokenizes in a separate
    * projection step so the array is computed once per row). */
  def shingleRows(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("doc"), Text.tokens(col(textCol)).as("__toks"))
      .select(col("doc"), explode(shinglesOf(col("__toks"), n)).as("sh"))

  /** The inverted-index fan-out cap shared by all four pair generators:
    * drop every row whose `keys` value occurs more than `cap` times in
    * `rel` (`rel` is pre-cached by the caller — both passes below read
    * the cache, not the explode).
    *
    * Shape: the HOT key set is a map-side-combinable groupBy (one row
    * per key per mapper reaches the shuffle) anti-joined back under a
    * broadcast hint, so the data relation itself never shuffles for the
    * cap and — the part that matters at 100 TB — a hot key's
    * occurrences never serialize through one task. The previous
    * count-over-window form hash-partitioned the relation on the very
    * key whose skew the cap exists to defuse: a stop-word shingle in
    * 100M docs became one straggling, spilling WindowExec task. The hot
    * set is small by construction (a key is hot only above `cap`
    * occurrences, so |hot| < rows/cap, and zipf reality makes it a
    * handful of stop-grams). |hot| < rows/cap is a LOOSE bound, though —
    * 1e12 rows at cap=64 still permits ~1.5e10 hot keys on a flat
    * distribution — so the hot set is counted (a limit-probe on the
    * cached aggregate, one cheap job) BEFORE the broadcast and a
    * misconfigured cap fails with an actionable message instead of a
    * driver OOM mid-broadcast. */
  private[graft] def capByFreq(rel: DataFrame, keys: Seq[String], cap: Int,
                        keep: Seq[String],
                        scope: PersistScope = PersistScope(),
                        maxHotKeys: Long = 4L << 20): DataFrame =
    if (cap == Int.MaxValue) rel
    else {
      val hot = scope.cache(rel.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__n")).where(col("__n") > cap)
        .select(keys.map(col): _*))
      // limit-probe, not count(): on a pathological key universe the
      // probe stops scanning at maxHotKeys + 1 rows; clamp BEFORE the
      // increment — maxHotKeys == Long.MaxValue would wrap the +1 to
      // Long.MinValue, whose .toInt is 0, making the probe limit(0) and
      // the guard vacuous (the exact hazard this clamp exists to stop)
      val probe = (math.min(maxHotKeys, Int.MaxValue.toLong - 1) + 1).toInt
      val nHot = hot.limit(probe).count()
      require(nHot <= maxHotKeys,
        s"capByFreq: more than $maxHotKeys keys exceed cap=$cap on " +
          s"(${keys.mkString(", ")}) — the hot set no longer fits a " +
          "broadcast. Raise the frequency cap (fewer keys qualify as " +
          "hot) or pre-filter the key universe; a broadcast this size " +
          "would OOM the driver instead of failing here.")
      rel.join(broadcast(hot), keys, "left_anti")
        .select(keep.map(col): _*)
    }

  /** Near-dup pairs with n-gram Jaccard >= tau.
    *
    * Inverted-index plan: explode shingles -> self-equi-join on shingle ->
    * count per (a,b) = |intersection| (map-side combinable) -> join back the
    * per-doc shingle counts -> Jaccard filter. No cartesian product.
    *
    * `maxShingleDf` caps the inverted-index fan-out: shingles appearing in
    * more than that many documents (stop-word boilerplate) are removed from
    * the shingle universe BEFORE the self-join — a single hot shingle would
    * otherwise produce a quadratic bucket at 100 TB. The Jaccard is then
    * computed over the capped universe on both engines identically, so the
    * result stays oracle-exact (recall-bounded by construction: only pairs
    * whose entire overlap is boilerplate are lost).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, tau: Double,
                   maxShingleDf: Int = Int.MaxValue,
                   scope: PersistScope = PersistScope()): DataFrame = {
    // The exploded shingle relation is consumed 4x (both join sides + the
    // per-doc counts); shingling is a heavy interpreted HOF chain, so
    // materialize it once instead of recomputing per consumer.
    //
    // The shingle STRING never outlives the map stage: every downstream
    // step (df window, cache, self-equi-join) keys on its xxhash64 — an
    // 8-byte sort/shuffle/compare key instead of a ~40-byte string. The
    // per-doc distinct already happened on the strings (array_distinct in
    // shinglesOf), so hashing preserves all set cardinalities exactly
    // modulo 64-bit collisions (~n²/2⁶⁴ — no observable effect at any
    // tested SF; the string-keyed DuckDB oracle stays bit-identical).
    val all = shingleRows(df, idCol, textCol, n)
      .select(col("doc"), xxhash64(col("sh")).as("sh"))
    // doc frequency per shingle == row count (shingles are distinct per
    // doc); the cache is on the UNCAPPED explode so both capByFreq passes
    // read it, never the interpreted shingling
    val sh = capByFreq(scope.cache(all), Seq("sh"), maxShingleDf,
      Seq("doc", "sh"), scope)
    val counts = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"), col("a.sh") === col("b.sh"))
      .where(col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(counts.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(counts.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .where(col("jaccard") >= tau)
      .select("doc_a", "doc_b", "n_inter", "n_a", "n_b", "jaccard")
  }

  /** Winnowing-fingerprint pair detection (the MOSS cross-document step):
    * pairs of documents sharing at least `minShared` winnowed fingerprints
    * ([[graft.functions.Text.winnowOf]] over md5 k-gram hashes — any
    * >= w+k-1-token overlap is guaranteed to surface at least one shared
    * fingerprint). Same scale discipline as [[jaccardPairs]]: an
    * inverted-index self-equi-join on the fingerprint, with `maxFpDf`
    * dropping fingerprints present in more than that many documents
    * (shared boilerplate k-grams) BEFORE the join — candidate volume is
    * linear in the fingerprint relation no matter how hot a phrase is;
    * the cap is mirrored in the oracle so results stay cell-exact. */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
                  k: Int, w: Int, minShared: Int,
                  maxFpDf: Int = Int.MaxValue,
                  scope: PersistScope = PersistScope()): DataFrame = {
    val all = df
      .select(col(idCol).as("doc"), Text.tokens(col(textCol)).as("__toks"))
      .select(col("doc"), graft.plans.NGrams.ngrams(col("__toks"), k).as("__gk"))
      .select(col("doc"), transform(col("__gk"), g => Text.md5Long(g)).as("__hs"))
      .select(col("doc"), explode(Text.winnowOf(col("__hs"), w)).as("fp"))
    // fingerprints are distinct per doc, so the row count per fp IS the
    // document frequency
    val fps = capByFreq(scope.cache(all), Seq("fp"), maxFpDf,
      Seq("doc", "fp"), scope)
    fps.select(col("doc").as("doc_a"), col("fp"))
      .join(fps.select(col("doc").as("doc_b"), col("fp")), Seq("fp"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** MinHash signature columns: k permutations h_i(x) = (a_i*x + b_i) mod P
    * over md5-derived 60-bit token hashes reduced mod P. Deterministic and
    * reproducible in ANSI SQL (oracle-verifiable). */
  val MinhashMod = 1000000007L
  def minhashPerm(i: Int) = (2L * i + 3L, 5L * i + 7L)

  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int): DataFrame = {
    require(k >= 1, s"minhash needs k >= 1 (got $k)")
    // Materialize the md5-derived token hash ONCE per token row: inlining
    // it would duplicate the md5+conv tree into all k aggregates.
    val hashed = df.select(
        col(idCol).as("doc"),
        explode(array_distinct(Text.tokens(col(textCol)))).as("tok"))
      .select(col("doc"), pmod(Text.md5Long(col("tok")), lit(MinhashMod)).as("hv"))
    val mins = (0 until k).map { i =>
      val (a, b) = minhashPerm(i)
      min(pmod(col("hv") * a + b, lit(MinhashMod))).as(s"mh$i")
    }
    hashed.groupBy("doc").agg(mins.head, mins.tail: _*)
  }

  /** LSH candidate pairs: band the k-signature into `bands` groups of
    * k/bands rows; docs sharing any band signature are candidates.
    * Banding turns near-dup detection into an equi-join on (band, sig).
    *
    * `maxBucket` drops buckets with more than that many docs before the
    * self-join (standard LSH practice): pair count is quadratic in bucket
    * size, so one degenerate signature ("the empty doc bucket") otherwise
    * dominates the whole job at scale. Dropped buckets are the least
    * discriminative signatures; recall loss is bounded and the oracle
    * applies the identical cap. The pair dedup is a groupBy-min (map-side
    * combinable partial agg collapses the up-to-`bands` duplicates of each
    * pair before the shuffle). */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                            k: Int, bands: Int,
                            maxBucket: Int = Int.MaxValue,
                            scope: PersistScope = PersistScope()): DataFrame =
    candidatePairsFromSigs(minhashSignatures(df, idCol, textCol, k),
      k, bands, maxBucket, scope)

  /** (doc, band, sig) banding of a minhash signature frame — THE one
    * banding expression (pairs path, star path, and the streaming
    * filter all share it, so the LSH scheme cannot drift between them).
    * Fails fast on a k/bands mismatch: bands > k would band on EMPTY
    * signatures (every doc lands in one bucket — the doc x doc explosion
    * this file's design forbids) and a remainder would silently drop
    * trailing signature coordinates (a lower-recall scheme than asked). */
  private[graft] def bandedSigs(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    // k >= 1 matters too: k=0, bands=1 would pass the divisibility check,
    // band every doc on the empty-concat signature "" and put the whole
    // corpus in ONE bucket — the exact explosion this guard forbids
    require(k >= 1 && bands >= 1 && k % bands == 0,
      s"minhash k=$k must be >= 1 and divide into bands=$bands")
    val rows = k / bands
    sigs.select(
      col("doc"),
      posexplode(array((0 until bands).map { b =>
        concat_ws("_", (0 until rows).map(r => col(s"mh${b * rows + r}")): _*)
      }: _*)).as(Seq("band", "sig")))
  }

  /** [[minhashCandidatePairs]] from a PRE-COMPUTED signature relation —
    * callers that also consume the signatures (e.g. [[verifyPairs]])
    * cache them once instead of hashing the corpus twice. */
  def candidatePairsFromSigs(sigs: DataFrame, k: Int, bands: Int,
                             maxBucket: Int = Int.MaxValue,
                             scope: PersistScope = PersistScope()): DataFrame = {
    // sized + filtered + both self-join sides consume the banded relation:
    // materialize once
    val all = bandedSigs(sigs, k, bands)
    val banded = capByFreq(scope.cache(all), Seq("band", "sig"), maxBucket,
      Seq("doc", "band", "sig"), scope)
    banded.as("a").join(banded.as("b"), Seq("band", "sig"))
      .where(col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(min(col("band")).as("__first_band"))
      .select("doc_a", "doc_b")
  }

  /** Pairwise verification of LSH candidates (the stage after candidate
    * generation in every production dedup pipeline): each pair gets the
    * minhash ESTIMATE of its Jaccard (fraction of agreeing signature
    * coordinates) next to the EXACT Jaccard of the distinct-token sets,
    * plus the absolute estimation error — all in exact integer ppm, so the
    * sketch-accuracy audit itself is engine-portable.
    *
    * Scale shape: the candidate-pair set is the (LSH-capped, linear)
    * output of [[minhashCandidatePairs]]; the signature and token-set
    * relations join back to it on doc id — per-pair work only, never
    * all-pairs. */
  def verifyPairs(df: DataFrame, idCol: String, textCol: String,
                  k: Int, bands: Int,
                  maxBucket: Int = Int.MaxValue,
                  scope: PersistScope = PersistScope()): DataFrame = {
    // signatures cached ONCE and shared: candidate generation and the
    // per-pair estimate both read them — the corpus is hashed one time
    val sigs = scope.cache(minhashSignatures(df, idCol, textCol, k))
    val pairs = candidatePairsFromSigs(sigs, k, bands, maxBucket, scope)
    // consumed by BOTH pair sides: cache, or the corpus is re-tokenized
    // and re-distincted once per side
    val tokSets = scope.cache(df.select(col(idCol).as("doc"),
      array_distinct(Text.tokens(col(textCol))).as("ts")))
    def side(p: String) =
      sigs.select(col("doc").as(s"doc_$p") +:
        (0 until k).map(i => col(s"mh$i").as(s"${p}_mh$i")): _*)
    val nMatch = (0 until k)
      .map(i => when(col(s"a_mh$i") === col(s"b_mh$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    pairs
      .join(side("a"), Seq("doc_a")).join(side("b"), Seq("doc_b"))
      .withColumn("__nm", nMatch)
      .join(tokSets.select(col("doc").as("doc_a"), col("ts").as("__ta")), Seq("doc_a"))
      .join(tokSets.select(col("doc").as("doc_b"), col("ts").as("__tb")), Seq("doc_b"))
      .withColumn("__inter", size(array_intersect(col("__ta"), col("__tb"))).cast("long"))
      .withColumn("__union",
        size(col("__ta")).cast("long") + size(col("__tb")) - col("__inter"))
      .select(col("doc_a"), col("doc_b"),
        expr(s"(__nm * 1000000) DIV $k").as("est_jaccard_ppm"),
        expr("(__inter * 1000000) DIV __union").as("exact_jaccard_ppm"),
        abs(expr(s"(__nm * 1000000) DIV $k") - expr("(__inter * 1000000) DIV __union"))
          .as("abs_err_ppm"))
  }

  /** Star edges for duplicate CLUSTERING: each LSH bucket (band, sig)
    * with k docs is a clique; for connectivity purposes a star to the
    * bucket's min doc carries the same components with k-1 edges instead
    * of k(k-1)/2 pairs. Feed these to [[DupClusters.clusters]] — never
    * materialize the quadratic candidate-pair set just to cluster it. */
  def minhashBucketStars(df: DataFrame, idCol: String, textCol: String,
                         k: Int, bands: Int,
                         scope: PersistScope = PersistScope()): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, k)
    // hub aggregation + the star join both consume the banded relation:
    // materialize once (the minhash pipeline above it is the heavy part)
    val banded = scope.cache(bandedSigs(sigs, k, bands))
    val hubs = banded.groupBy("band", "sig").agg(min(col("doc")).as("hub"))
    banded.join(hubs, Seq("band", "sig"))
      .where(col("doc") =!= col("hub"))
      .select(col("hub").as("doc_a"), col("doc").as("doc_b"))
      .distinct()
  }

  /** 64-bit SimHash: per-token md5-derived 60-bit hash -> +-1 per bit ->
    * per-doc bit-wise sum via a zip_with fold (no explode, no shuffle:
    * the whole fingerprint is a per-row expression chain). */
  val SimhashBits = 60

  /** Majority fold over an array of 60-bit token hashes — the native
    * codegen expression ([[graft.plans.SimhashFold]]); one primitive
    * int[60] accumulator per row instead of the interpreted ±1-vector
    * HOF chain (r21; DedupSpec pins it bit-identical to
    * [[simhashOfHashesHof]] including empty/null-element inputs). The
    * native fold evaluates its child ONCE, so callers no longer need the
    * two-projection split that protected the HOF form from re-hashing
    * each token per bit term. */
  def simhashOfHashes(hs: Column): Column =
    graft.plans.SimhashFold.simhashFold(hs, SimhashBits)

  /** Portable HOF formulation of the same fold — interpreted (slow);
    * kept as the cross-check reference for the native expression (the
    * DotProduct/dotHof discipline). `hs` must be a plain column
    * reference: interpreted HOFs copy the argument expression into every
    * use site, so an inlined md5 tree here would hash each token 60x
    * (once per bit term). */
  def simhashOfHashesHof(hs: Column): Column = {
    val bitVecs = transform(hs, h =>
      array((0 until SimhashBits).map(b =>
        when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1)): _*))
    val sums = aggregate(
      bitVecs,
      array((0 until SimhashBits).map(_ => lit(0)): _*),
      (acc, v) => zip_with(acc, v, (x, y) => x + y))
    val powers = array((0 until SimhashBits).map(b => lit(1L << b)): _*)
    aggregate(
      zip_with(sums, powers, (s, p) => when(s > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Two-projection simhash: token hashes computed ONCE per token in their
    * own select, then the bit-majority fold. ~60x less md5 work than
    * inlining the hash into the fold (interpreted-HOF expression copies). */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              outCol: String = "simhash"): DataFrame =
    df.select(col(idCol),
        transform(array_distinct(Text.tokens(col(textCol))),
          t => Text.md5Long(t)).as("__hs"))
      .select(col(idCol), simhashOfHashes(col("__hs")).as(outCol))

  /** Single-expression form: the hash array is built by an inner transform
    * whose elements the fold references as lambda VARIABLES (one md5 per
    * token), so this composes to the same work as [[simhash]]. */
  def simhash64(textCol: String): Column = {
    val toks = array_distinct(Text.tokens(col(textCol)))
    simhashOfHashes(transform(toks, t => Text.md5Long(t)))
  }

  /** SimHash near-dup PAIRS by Hamming-block candidates (the Manku/WWW'07
    * web-dedup scheme): split the 60-bit fingerprint into `SimhashBlocks`
    * 15-bit blocks — by pigeonhole, any pair within Hamming distance
    * `SimhashBlocks - 1` shares at least one EXACT block — so candidates
    * come from an equi-join on (block index, block value) and the exact
    * `bit_count(xor)` distance then verifies each candidate. Recall is
    * therefore EXACT (not probabilistic) for `maxHamming <=
    * SimhashBlocks - 1`, which the require enforces.
    *
    * `maxBucket` drops degenerate blocks (e.g. the all-zeros block of
    * empty-ish docs) before the self-join, same cap-in-oracle contract as
    * the minhash LSH pairs. */
  val SimhashBlocks = 4
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3,
                   maxBucket: Int = Int.MaxValue,
                   scope: PersistScope = PersistScope()): DataFrame = {
    require(maxHamming <= SimhashBlocks - 1,
      s"pigeonhole guarantee needs maxHamming <= ${SimhashBlocks - 1}")
    val sh = simhash(df, idCol, textCol, "sh")
    val all = sh.select(col(idCol).as("doc"), col("sh"),
      posexplode(array((0 until SimhashBlocks).map(b =>
        shiftright(col("sh"), b * 15).bitwiseAND(0x7FFF)): _*))
        .as(Seq("blk", "bv")))
    val banded = capByFreq(scope.cache(all), Seq("blk", "bv"), maxBucket,
      Seq("doc", "sh", "blk", "bv"), scope)
    val a = banded.select(col("doc").as("doc_a"), col("sh").as("__sha"),
      col("blk"), col("bv"))
    val b = banded.select(col("doc").as("doc_b"), col("sh").as("__shb"),
      col("blk"), col("bv"))
    a.join(b, Seq("blk", "bv"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(min(col("__sha")).as("__ha"), min(col("__shb")).as("__hb")) // sh is per-doc constant
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(__ha ^ __hb)").cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Exact repeated n-gram SPAN detection — the distributed approximation
    * of suffix-array substring dedup (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better"): a suffix array finds
    * every maximal substring repeated across the corpus; at cluster scale
    * the equivalent join-shaped formulation is "every n-token window whose
    * gram text occurs in >= `minDocs` DISTINCT documents is duplicated",
    * with overlapping/adjacent duplicated windows merged into maximal
    * spans per document (the byte ranges a substring-level dedup pass
    * would cut, vs the whole-document verdicts of the minhash family).
    *
    * Shape: one positional gram explode (the native [[graft.plans.NGrams]]
    * loop; array index IS the token position), a gram-frequency pass
    * (partial-agg-friendly groupBy on [[Text.md5Long]] of the gram — a
    * 60-bit md5 TRUNCATION, the 8-byte-key shuffle trade jaccardPairs
    * documents for xxhash64: uniform so no skew, with ~G²/2⁶¹ expected
    * colliding gram pairs at G distinct grams — at 1e12 grams that is
    * a ~1e-7 fraction of grams spuriously marked duplicated, each
    * costing at most one n-token span; the DuckDB oracle truncates
    * identically so parity holds), an equi-join back on that hash, and ONE
    * per-document window to merge islands (windows p, p' belong to the
    * same maximal span iff p' - p <= n — touching or overlapping coverage
    * of [p, p+n-1] and [p', p'+n-1]). Never doc x doc; the inverted
    * index is linear in corpus tokens exactly like the shingle family. */
  def dupSpans(df: DataFrame, idCol: String, textCol: String,
               n: Int, minDocs: Int = 2,
               scope: PersistScope = PersistScope()): DataFrame = {
    val pos = scope.cache(
      df.select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("__t"))
        .select(col("doc_id"),
          posexplode(graft.plans.NGrams.ngrams(col("__t"), n)).as(Seq("pos", "__g")))
        .select(col("doc_id"), col("pos"),
          Text.md5Long(col("__g")).as("g"))) // long key: 8-byte shuffle rows
    val dup = dupGrams(pos, minDocs)
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    pos.join(dup, Seq("g"))
      .select("doc_id", "pos")
      .withColumn("__brk",
        when(lag(col("pos"), 1).over(wDoc).isNull
          .or(col("pos") - lag(col("pos"), 1).over(wDoc) > n), 1).otherwise(0))
      .withColumn("__span", sum(col("__brk")).over(wDoc))
      .groupBy(col("doc_id"), col("__span"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + lit(n - 1)).cast("long").as("span_end"),
        count(lit(1)).cast("long").as("n_windows"))
      .select("doc_id", "span_start", "span_end", "n_windows")
  }

  /** Grams present in >= minDocs DISTINCT documents. For the common
    * minDocs=2 the distinct test is `min(doc) != max(doc)` — a
    * single-phase aggregate whose partials combine map-side, vs
    * count_distinct's per-(gram, doc) expansion; the oracle keeps the
    * COUNT(DISTINCT) formulation as the independent mirror. */
  private def dupGrams(pos: DataFrame, minDocs: Int): DataFrame =
    if (minDocs == 2)
      pos.groupBy("g")
        .agg(min(col("doc_id")).as("__mn"), max(col("doc_id")).as("__mx"))
        .where(col("__mn") =!= col("__mx"))
        .select("g")
    else
      pos.groupBy("g")
        .agg(count_distinct(col("doc_id")).as("__df"))
        .where(col("__df") >= minDocs)
        .select("g")

  /** Substring-dedup MATERIALIZATION — the corpus with every duplicated
    * span's tokens REMOVED (the cut step after [[dupSpans]] detection;
    * this is the aggressive every-occurrence cut — a keep-one-canonical
    * variant is a doc_id predicate on the same covered set). Docs whose
    * every token is cut, and empty docs, drop out entirely — the same
    * contract as a length-0 filter downstream.
    *
    * Shape: the same positional-gram inverted index as [[dupSpans]],
    * covered token positions by exploding each duplicated window's
    * [p, p+n-1] range, then a LEFT ANTI equi-join on (doc, pos) —
    * co-partitioned with the token relation — and one groupBy(doc) to
    * reassemble the kept text in position order. Never doc x doc. */
  def cutSpans(df: DataFrame, idCol: String, textCol: String,
               n: Int, minDocs: Int = 2, keepCanonical: Boolean = false,
               scope: PersistScope = PersistScope()): DataFrame = {
    // tokenize the corpus ONCE: both the token relation and the n-gram
    // relation derive from the same cached (doc_id, tokens) base — the
    // tokenizer chain is the heaviest map stage in the operator and
    // would otherwise run twice over the full corpus
    val base = scope.cache(
      df.select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("__t")))
    // the heaviest chain in the operator (tokenize -> n-grams -> md5),
    // consumed by the dupCols aggregate AND the hits join: cache like
    // dupSpans does for the identical relation
    val pos = scope.cache(
      base.select(col("doc_id"),
          posexplode(graft.plans.NGrams.ngrams(col("__t"), n)).as(Seq("pos", "__g")))
        .select(col("doc_id"), col("pos"), Text.md5Long(col("__g")).as("g")))
    // keepCanonical = the Lee-et-al. keep-one policy: each duplicated
    // gram's min-doc occurrence survives, every other doc's is cut —
    // one per-window predicate on the same join, zero extra shuffles
    val dupCols =
      if (keepCanonical && minDocs == 2)
        pos.groupBy("g")
          .agg(min(col("doc_id")).as("__canon"), max(col("doc_id")).as("__mx"))
          .where(col("__canon") =!= col("__mx"))
          .select(col("g"), col("__canon"))
      else if (keepCanonical)
        pos.groupBy("g")
          .agg(count_distinct(col("doc_id")).as("__df"),
            min(col("doc_id")).as("__canon"))
          .where(col("__df") >= minDocs)
          .select(col("g"), col("__canon"))
      else dupGrams(pos, minDocs)
    val hits =
      if (keepCanonical)
        pos.join(dupCols, Seq("g")).where(col("doc_id") =!= col("__canon"))
      else pos.join(dupCols, Seq("g"))
    // Cut with merged INTERVALS at doc grain, not exploded positions:
    // the position form generated n rows per hit window (135M at sf6),
    // deduped them through two aggregation passes, and handed AQE a
    // CORPUS-SIZED relation as the anti-join's small side — at sf6 it
    // broadcast 16M covered positions (~0.5 GB of driver hash table, an
    // OOM in waiting at any larger SF), then collected every surviving
    // token through an ObjectHashAggregate sort. The window-start merge
    // below is exactly [[dupSpans]]'s (gap > n breaks; gap <= n unions
    // contiguously, so merged intervals ARE the covered-position set),
    // producing a FEW DISJOINT SPANS per document; the reassembly then
    // filters the already-cached per-doc token ARRAY against them with
    // a higher-order function — no token explode, no corpus-sized join
    // side, no collect_list re-sort, and the only shuffles left are the
    // hit index's (the part measured at dupSpans speed). Per-token cost
    // is O(spans-in-doc); spans are disjoint and merged, so the worst
    // case (everything duplicated) collapses to ONE span per doc.
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val spans = hits
      .select(col("doc_id"), col("pos"))
      .withColumn("__brk",
        when(lag(col("pos"), 1).over(wDoc).isNull
          .or(col("pos") - lag(col("pos"), 1).over(wDoc) > n), 1).otherwise(0))
      .withColumn("__span", sum(col("__brk")).over(wDoc))
      .groupBy(col("doc_id"), col("__span"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + lit(n - 1)).as("e"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("s"), col("e"))))
        .as("__cuts"))
    base.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), expr(
        "filter(__t, (tok, i) -> __cuts IS NULL OR " +
          "NOT exists(__cuts, c -> i >= c.s AND i <= c.e))").as("__kept"))
      // a document whose every token is cut (or that had no tokens)
      // emitted no surviving rows under the anti-join form — keep that
      // contract: it is absent from the output, not an empty row
      .where(size(col("__kept")) > 0)
      .select(col("doc_id"),
        size(col("__kept")).cast("long").as("n_kept"),
        md5(concat_ws(" ", col("__kept")).cast("binary")).as("kept_md5"))
  }
}
