package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns._

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline surface the reference lacks (its only string
  * ops are upper/replace, `s2g/vendas.py:126-130`) but a 100 TB corpus
  * engine needs: token counting, quality scoring, language ID,
  * fingerprinting, and corpus term statistics.
  *
  * Scale design:
  *   - every query is one narrow projection + (at most) one shuffle on
  *     an aggregation key; all string work is per-row, codegen'd, and
  *     runs map-side — no UDFs, no collect;
  *   - the only explode is in term-frequency, where the following
  *     groupBy benefits from partial aggregation (map-side combine
  *     collapses the 31-word vocab before the shuffle);
  *   - fingerprinting reduces each doc to one int64 min-hash — the
  *     standard content-defined fingerprint that downstream exact-dedup
  *     can group on with a 8-byte shuffle key instead of the full text.
  */
object TextAnalysis {

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "for")

  private def toksCol: Column = tokens(col("text"))

  /** Token counting: whitespace tokens and a BPE-ish regex
    * segmentation (letter runs | digit runs | single other glyph) —
    * the usual pre-tokenizer shape. Pure per-row map work.
    */
  def tokenCounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        col("n_chars"),
        length(col("text")).as("n_chars_actual"),
        size(toksCol).as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
          .as("n_bpe_tokens"))

  /** Quality scoring from length / punctuation / stopword signals —
    * the heuristics corpus filters (C4, Gopher rules) apply before
    * training. All ratios are per-row arithmetic; the score is a
    * deterministic blend so the oracle can reproduce it exactly.
    */
  /** Pure per-row scoring projection over any frame with (doc_id,
    * text) — batch AND streaming-safe (no shuffle, no state), which
    * is why the ingest-time quality gate costs zero extra I/O.
    */
  def qualityScoreOf(docs: DataFrame): DataFrame = {
    val nTok = size(toksCol).cast("double")
    val stopTok = size(filter(toksCol,
      t => array_contains(array(Stopwords.map(lit): _*), t))).cast("double")
    val punct = length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double")
    val textLen = greatest(length(col("text")).cast("double"), lit(1.0))
    val stopRatio = stopTok / greatest(nTok, lit(1.0))
    val punctRatio = punct / textLen
    val score =
      lit(0.4) * least(lit(1.0), nTok / lit(50.0)) +
        lit(0.4) * (lit(1.0) - punctRatio) +
        lit(0.2) * least(lit(1.0), stopRatio * lit(10.0))
    docs.select(
      col("doc_id"),
      nTok.cast("int").as("n_tokens"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(punctRatio, 4).as("punct_ratio"),
      round(score, 4).as("quality_score"))
  }

  def qualityScore(spark: SparkSession, sfDir: String): DataFrame =
    qualityScoreOf(Tables.documents(spark, sfDir))

  /** Per-language CHARACTER-n-gram profiles — the fastText/CLD-family
    * heuristic: score each language by the per-character rate of its
    * characteristic char n-grams (substring matches, not word-boundary
    * tokens, so inflected forms hit too). Chinese is special-cased as
    * a SCRIPT profile — the ratio of Han-block codepoints
    * (U+4E00–U+9FFF) — because zh text is unspaced and shares no
    * alphabet with the latin profiles: no word-stopword list can ever
    * fire on it, which is exactly why the earlier word-level profile
    * answered 'und' for every zh document.
    *
    * NOTE on the synthetic corpus: the driver's `documents.lang`
    * column is a label with ZERO textual signal — all five labels
    * draw from one identical 31-token ASCII vocabulary (0 non-ASCII
    * chars at every SF), so no content-based detector can recover it
    * and `agrees` is meaningful only for 'en'. The zh path is proven
    * on real multilingual fixtures in OperatorSpec instead.
    */
  val LangCharProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", " and ", "ing "),
    "fr" -> Seq(" le ", " et ", "ent "),
    "de" -> Seq("der ", " und ", "sch"),
    "es" -> Seq(" el ", " de ", "ción"))

  /** Han unified-ideograph block bounds, as a regex char class shared
    * with the oracle (literal codepoints — valid in both Java regex
    * and DuckDB's RE2).
    */
  val NonHanClass = "[^一-鿿]"

  /** Minimum per-character profile-gram rate to call a language; below
    * it the guess is 'und'. English prose runs ~0.01–0.08 on these
    * grams; 0.002 keeps short/degenerate docs honest.
    */
  val LangThreshold = 0.002

  /** Language ID: per-character profile-gram rate for each latin
    * profile (substring occurrences via the length-difference trick —
    * `(len(t) - len(replace(t, g))) / len(g)`, all codegen'd string
    * ops), Han-script codepoint ratio for zh; emit the argmax (below
    * threshold → 'und'; ties resolve in profile order). A per-row
    * scoring pass with zero shuffles — at 100 TB it fuses into the
    * ingest scan.
    */
  def langIdOf(docs: DataFrame): DataFrame = {
    val textLen = greatest(length(col("text")).cast("double"), lit(1.0))
    def occ(g: String): Column =
      (length(col("text")) - length(replace(col("text"), lit(g), lit(""))))
        .cast("double") / lit(g.codePointCount(0, g.length).toDouble)
    val latin = LangCharProfiles.map { case (l, grams) =>
      l -> (grams.map(occ).reduce(_ + _) / textLen)
    }
    val zh = "zh" ->
      (length(regexp_replace(col("text"), NonHanClass, "")).cast("double") / textLen)
    val ratios = latin :+ zh
    val best = greatest(ratios.map(_._2): _*)
    // First profile (in declaration order) hitting the max wins ties.
    val argmax = ratios.foldRight(lit("und"): Column) { case ((l, r), acc) =>
      when(r === best, lit(l)).otherwise(acc)
    }
    val guess = when(best >= LangThreshold, argmax).otherwise(lit("und"))
    docs
      .select(Seq(col("doc_id"), col("lang")) ++
        ratios.map { case (l, r) => round(r, 4).as(s"${l}_ratio") } ++
        Seq(guess.as("lang_guess"), (col("lang") === guess).as("agrees")): _*)
  }

  def langId(spark: SparkSession, sfDir: String): DataFrame =
    langIdOf(Tables.documents(spark, sfDir))

  /** Content fingerprint: min over the 60-bit hashes of all character
    * 8-grams (a 1-permutation MinHash — the winnowing/rolling-hash
    * family). Each doc collapses to one int64; duplicate detection
    * then groups on 8 bytes instead of full text.
    */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    // One-pass native kernel (CharNgramFingerprint): the HOF pair
    // (array_min∘transform∘charShingles + size∘array_distinct∘
    // charShingles) built the gram array twice and md5'd every gram
    // position interpreted — ~9 s at sf0.1 for the same answer.
    import org.apache.spark.sql.graft.ColumnShim
    val fp = ColumnShim.column(graft.expressions.CharNgramFingerprint(
      ColumnShim.expression(col("text")), 8))
    Tables.documents(spark, sfDir)
      .withColumn("f", fp)
      .select(col("doc_id"), col("f.fp60").as("fp60"),
        col("f.n_distinct").as("n_distinct_8grams"))
  }

  /** Corpus term statistics: term frequency + document frequency +
    * idf. One explode, one shuffle on the term; map-side combine
    * collapses per-partition counts first, so shuffle volume is
    * O(vocab × partitions), not O(tokens).
    */
  def termFreq(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.select(countDistinct("doc_id").as("n_docs"))
    docs.select(col("doc_id"), explode(toksCol).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("tf"), countDistinct("doc_id").as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("term"), col("tf"), col("df"),
        round(log(col("n_docs").cast("double") / col("df")), 4).as("idf"))
      .orderBy(col("tf").desc, col("term"))
      .limit(50)
  }

  /** Intra-document repetition — the Gopher "fraction of duplicated
    * n-grams" filter signal, WITHIN one document (the cross-document
    * twin is [[boilerplate]]): total vs distinct 3-gram occurrences
    * and the duplicated fraction. A repetitive doc (boilerplate loops,
    * degenerate generation) scores high and gets filtered before
    * training. Pure per-row array arithmetic — no shuffle, fuses into
    * the ingest scan like the other quality signals.
    */
  def repetition(spark: SparkSession, sfDir: String): DataFrame = {
    // Total sliding 3-grams is ARITHMETIC on the token count —
    // max(tokens - 2, 0) — so only the distinct set pays a gram pass;
    // materializing the non-distinct gram list just to take its size
    // would double the per-row text work.
    val total = greatest(size(toksCol) - lit(2), lit(0))
    val distinct = size(shingleSet(col("text"), 3))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        total.as("n_grams_total"),
        distinct.as("n_grams_distinct"),
        round(when(total > 0,
            lit(1.0) - distinct.cast("double") / total.cast("double"))
          .otherwise(lit(0.0)), 4).as("rep_ratio"))
  }

  /** BPE merge-candidate induction — the first iteration of byte-pair
    * vocabulary training: count every adjacent character pair inside
    * whitespace tokens (occurrence-weighted, not per-type) and emit
    * the top candidates; the highest-count pair is the first merge a
    * BPE trainer would perform. Shape: the native
    * [[graft.functions.TextFns.charPairCounts]] kernel pre-aggregates
    * occurrence counts per DOCUMENT in one text pass (the two-explode
    * chain it replaces pushed one row per character position through
    * two Generate stages for identical totals — measured 39 s at
    * sf10), then one pair-keyed sum of the per-doc partials — the pair
    * vocabulary is tiny, so map-side combine collapses counts before
    * the shuffle and the shuffle carries O(|pairs| × partitions) rows
    * regardless of corpus size. Iterating BPE (re-segment, recount)
    * repeats this same plan per merge step.
    */
  def bpeMerges(spark: SparkSession, sfDir: String, topK: Int = 20): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(graft.functions.TextFns.charPairCounts(col("text")))
        .as(Seq("pair", "n0")))
      .groupBy("pair")
      .agg(sum(col("n0")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)

  /** Corpus filtering by quality score — the C4/Gopher-style "keep
    * documents above the bar" step downstream of [[qualityScore]].
    * Emits survivors with their scores; the filter is the same scoring
    * expression, so this fuses score+filter into one scan pass (no
    * intermediate materialization of scores).
    */
  def qualityFilter(spark: SparkSession, sfDir: String): DataFrame =
    qualityScore(spark, sfDir)
      .filter(col("quality_score") >= 0.7 && col("punct_ratio") <= 0.3)

  /** Token-bigram corpus statistics (the n-gram LM building block):
    * top bigrams with document frequency. Same map-side-combine shape
    * as [[termFreq]], over the 2-gram shingle set.
    */
  def bigramStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(shingleSet(col("text"), 2)).as("bigram"))
      .groupBy("bigram")
      // (doc_id, bigram) is DISTINCT by construction (shingleSet
      // dedups per doc), so a plain count IS the document frequency —
      // countDistinct here only bought the distinct-aggregate rewrite
      // (Expand + two-phase agg) for values already unique.
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("bigram"))
      .limit(40)

  /** Deterministic hash-based corpus split (train/val/test 90/5/5 by
    * content hash): reproducible across runs, engines, and cluster
    * sizes because the split key is `hash60(text) mod 100` — no RNG,
    * no partition-order dependence (the failure mode of
    * `randomSplit` at scale). Emits per-split×lang counts as the
    * audit view; the assignment itself is a pure projection any
    * downstream job recomputes for free.
    */
  def corpusSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = hash60(col("text")) % 100
    val split = when(bucket < 90, "train")
      .when(bucket < 95, "val")
      .otherwise("test")
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), split.as("split"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("split", "lang")
  }

  /** Number of independent packing shards. At test scale 8 keeps packs
    * non-trivial; at 100 TB this becomes O(cluster cores) — the shard
    * count only changes pack boundaries, never correctness.
    */
  val PackShards = 8

  /** Sequence packing: assign documents to fixed-token-budget packs
    * (the pretraining batch-assembly step). Docs are sharded by
    * `doc_id % PackShards` and each shard packs independently in
    * doc_id order — pack id = (shard, floor(running token total /
    * budget)); emits per-pack fill statistics.
    *
    * The running sum is a window PARTITIONED by shard: the plan
    * hash-partitions on `shard` and every shard packs in parallel. A
    * global `Window.orderBy` would plan an `Exchange SinglePartition`
    * — the whole corpus through one task — which is why packing at
    * scale is always per-shard (ExplainSpec pins the no-single-
    * partition shape).
    */
  def sequencePackOf(docs: DataFrame, budget: Int = 2048): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), (col("doc_id") % PackShards).as("shard"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("before", coalesce(sum("n_tok").over(w), lit(0L)))
      // `div`, not `/`+cast: the float division round-trips through a
      // double, which loses exactness past 2^53 — reachable for a
      // per-shard running token sum at corpus scale.
      .withColumn("pack_id", expr(s"before div $budget"))
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("pack_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
  }

  def sequencePack(spark: SparkSession, sfDir: String, budget: Int = 2048): DataFrame =
    sequencePackOf(Tables.documents(spark, sfDir), budget)

  /** THE capstone composition — the full corpus-preparation pipeline
    * as one declarative query: near+exact dedup survivors → quality
    * gate (score ≥ 0.7 on the rounded [[qualityScoreOf]] output) →
    * per-shard sequence packing of what remains. Every stage is the
    * already-verified operator (survivor semi-join over the memoized
    * cluster index, scoring fused into the scan, partitioned packing
    * window); composing them adds two semi-joins and nothing else —
    * the plan a production corpus build would actually run.
    */
  def corpusPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val surviving = Dedup.survivors(spark, sfDir).select("doc_id")
    val quality = qualityScoreOf(docs)
      .filter(col("quality_score") >= 0.7)
      .select("doc_id")
    sequencePackOf(docs
      .join(surviving, Seq("doc_id"), "left_semi")
      .join(quality, Seq("doc_id"), "left_semi"))
  }

  /** Language-mix sampling: cap each language at a quota, keeping the
    * deterministically-ranked first `quota` docs per language
    * (hash-ranked — reproducible, unbiased by doc_id order). The data
    * mixing step that rebalances a multilingual corpus. One window
    * per language partition; emits the per-language kept counts.
    */
  def langMix(spark: SparkSession, sfDir: String, quota: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy(hash60(col("text")), col("doc_id"))
    Tables.documents(spark, sfDir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= quota)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), round(avg("n_chars"), 4).as("avg_chars"))
      .orderBy("lang")
  }

  /** Redaction denylist + patterns — the PII/content-scrub pass every
    * training corpus gets before release. Email pattern included for
    * the real-world shape (zero hits on the synthetic corpus — the
    * count column proves it ran); digit runs and denylisted terms do
    * hit. Replacement ORDER is part of the semantics (email → term →
    * digits) and mirrored exactly in the oracle.
    */
  val RedactTerms: Seq[String] = Seq("customer", "vector")
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val DigitPattern = "[0-9]+"
  private val termPattern = s"\\b(${RedactTerms.mkString("|")})\\b"

  /** PII / denylist redaction: count and replace emails, denylisted
    * terms, and digit runs. Pure per-row regex map work (codegen'd
    * `regexp_replace`/`regexp_extract_all`) — fuses into the ingest
    * scan at 100 TB; emits the redacted-text md5 so the oracle checks
    * the actual rewritten bytes, not just the counts.
    */
  def redact(spark: SparkSession, sfDir: String): DataFrame = {
    val t0 = col("text")
    val t1 = regexp_replace(t0, EmailPattern, "<email>")
    val t2 = regexp_replace(t1, termPattern, "<redacted>")
    val t3 = regexp_replace(t2, DigitPattern, "<num>")
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        size(regexp_extract_all(t0, lit(EmailPattern), lit(0))).as("n_emails"),
        size(regexp_extract_all(t0, lit(termPattern), lit(0))).as("n_terms"),
        size(regexp_extract_all(t0, lit(DigitPattern), lit(0))).as("n_digit_runs"),
        md5(t3).as("redacted_md5"))
  }

  /** Duplicated-n-gram (boilerplate) coverage — the Gopher-family
    * "fraction of the document covered by corpus-repeated n-grams"
    * filter signal: per doc, the share of its distinct 3-gram shingles
    * whose corpus document frequency ≥ `minDf`. Shape: one explode,
    * one df aggregate (map-side combine), one gram-keyed join back —
    * the same inverted-index pattern as Jaccard, but aggregated per
    * doc instead of per pair, so it stays O(grams), never O(docs²).
    */
  def boilerplate(spark: SparkSession, sfDir: String, minDf: Int = 3): DataFrame = {
    val ex = Dedup.shingleIndex(spark, sfDir)
      .select(col("doc_id"), col("g60").as("g"))
    // One row per (doc, gram) by index construction — count ≡
    // countDistinct(doc_id), without the distinct-aggregate Expand.
    val df = ex.groupBy("g").agg(count(lit(1)).as("df"))
    ex.join(df, Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_ratio",
        round(col("n_boiler").cast("double") / col("n_grams"), 4))
  }

  /** Train/test decontamination check — the eval-integrity step every
    * LLM data pipeline runs: for each test-split document (the
    * [[corpusSplit]] hash buckets), how many train-split documents
    * share a 5-gram with it, and how many of its distinct 5-grams are
    * contaminated. Shape: gram-keyed equi-join of the test inverted
    * index (5% of the corpus) against the train index — bounded by
    * gram-bucket occupancy exactly like the dedup joins; at 100 TB the
    * train side is the persisted shingle index, only the (small) eval
    * side is hashed fresh. Skew note: stopword-like 5-grams with huge
    * train df are the hot-bucket risk — production decontamination
    * caps gram document frequency (a gram in >10⁴ train docs carries
    * no contamination signal) before the join, the same df-prefilter
    * lever as [[graft.operators.Dedup.ngramJaccard]]; unnecessary at
    * test scale, so not applied here.
    */
  def contamination(spark: SparkSession, sfDir: String, n: Int = 5): DataFrame = {
    val bucket = hash60(col("text")) % 100
    val split = when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    // Grams join/count as 60-bit fingerprints (the shingle-index
    // discipline): the cross-split equi-join shuffles 16 B keys, never
    // 5-gram text; both engines hash identically so the oracle stays
    // in lockstep.
    val ex = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split.as("split"),
        explode(shingleSetHashed(col("text"), n)).as("g"))
    val test = ex.filter(col("split") === "test").select(col("doc_id"), col("g"))
    val train = ex.filter(col("split") === "train")
      .select(col("doc_id").as("train_id"), col("g"))
    test.join(train, Seq("g"))
      .groupBy("doc_id")
      .agg(countDistinct("train_id").as("n_train_docs"),
        countDistinct("g").as("n_shared_grams"))
  }

  /** Per-language epoch weights for mixture upsampling. Fractional
    * parts are exact binary doubles (.0 / .5) so the hash-threshold
    * comparison is bit-identical across engines.
    */
  val EpochWeights: Seq[(String, Double)] = Seq(
    "de" -> 2.5, "en" -> 1.0, "es" -> 2.0, "fr" -> 3.0, "zh" -> 1.5)

  /** Epoch-weighted corpus upsampling — the data-mixing repetition
    * step: language `l` with weight `w` contributes `floor(w)` copies
    * of every doc plus one extra copy for the deterministic
    * `hash60(text) mod 1000 < frac(w)·1000` subset — exact expected
    * epoch counts with zero RNG (reproducible across runs, engines,
    * and cluster sizes). The replication is a per-row
    * `explode(sequence(1, n_copies))` — map-side work, no shuffle
    * until the audit aggregation; at 100 TB the exploded stream feeds
    * the pack/shuffle stage directly and is never materialized.
    */
  def upsample(spark: SparkSession, sfDir: String): DataFrame = {
    val w = EpochWeights.foldRight(lit(1.0): Column) { case ((l, wt), acc) =>
      when(col("lang") === l, lit(wt)).otherwise(acc)
    }
    val frac = w - floor(w)
    val extra = when((hash60(col("text")) % 1000).cast("double") < frac * 1000, 1L)
      .otherwise(0L)
    val copies = floor(w).cast("long") + extra
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tok"),
        copies.as("n_copies"))
      .select(col("doc_id"), col("lang"), col("n_tok"),
        explode(when(col("n_copies") >= 1, sequence(lit(1L), col("n_copies")))
          .otherwise(array().cast("array<bigint>"))).as("epoch"))
      .groupBy("lang")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_rows_postmix"),
        sum("n_tok").as("n_tokens_postmix"))
      .orderBy("lang")
  }

  /** Chunking geometry: 64-token windows with 16-token overlap
    * (stride 48) — the context-window preparation step.
    */
  val ChunkSize = 64
  val ChunkOverlap = 16
  val ChunkStride: Int = ChunkSize - ChunkOverlap

  /** Document chunking audit: fixed-size token windows with overlap.
    * `n_chunks = 1 + ceil((n_tok - size) / stride)` for docs longer
    * than one window; the final chunk carries the remainder. Pure
    * per-row integer arithmetic (the actual chunk explode at
    * production scale is `explode(sequence(0, n_chunks-1))` feeding
    * the tokenizer — same shape as [[upsample]]'s repetition).
    */
  def chunk(spark: SparkSession, sfDir: String): DataFrame = {
    val nTok = size(toksCol).cast("long")
    val over = greatest(nTok - ChunkSize, lit(0L))
    val nChunks = when(nTok === 0, 0L)
      .otherwise(lit(1L) + (over + ChunkStride - 1) / ChunkStride)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), nTok.as("n_tok"),
        nChunks.cast("long").as("n_chunks"))
      .withColumn("last_chunk_tokens",
        when(col("n_chunks") <= 1, col("n_tok"))
          .otherwise(col("n_tok") - lit(ChunkStride.toLong) * (col("n_chunks") - 1)))
  }

  /** Bigram-LM quality scoring — the CCNet-family "score documents by
    * a language model trained on clean data" filter: add-one-smoothed
    * bigram probabilities estimated on the TRAIN split ([[corpusSplit]]
    * buckets), every doc scored by its mean ln P(w2|w1). Shape: two
    * train-side count aggregates (map-side combine), the model joins
    * back by bigram/prefix key — the model IS a DataFrame, broadcast
    * or shuffled by vocabulary key, never collected to the driver.
    */
  def lmScore(spark: SparkSession, sfDir: String): DataFrame = {
    val isTrain = (hash60(col("text")) % 100) < 90
    val docs = Tables.documents(spark, sfDir).withColumn("is_train", isTrain)
    val bi = docs.select(col("doc_id"), col("is_train"),
        explode(shingleList(col("text"), 2)).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val trainToks = docs.filter(col("is_train"))
      .select(explode(toksCol).as("w1"))
    val biC = bi.filter(col("is_train")).groupBy("bg").agg(count(lit(1)).as("cbg"))
    val uniC = trainToks.groupBy("w1").agg(count(lit(1)).as("cw"))
    val vocab = trainToks.agg(countDistinct("w1").as("v"))
    bi.join(biC, Seq("bg"), "left")
      .join(uniC, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lnp", log((coalesce(col("cbg"), lit(0L)) + 1).cast("double") /
        (coalesce(col("cw"), lit(0L)) + col("v")).cast("double")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), round(avg("lnp"), 4).as("avg_ln_p"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_corpus" -> (corpusPipeline _),
    "q_corpus_chunk" -> (chunk _),
    "q_text_lm_score" -> (lmScore _),
    "q_corpus_upsample" -> (upsample _),
    "q_text_redact" -> (redact _),
    "q_text_boilerplate" -> ((s: SparkSession, d: String) => boilerplate(s, d)),
    "q_corpus_contam" -> ((s: SparkSession, d: String) => contamination(s, d)),
    "q_corpus_split" -> (corpusSplit _),
    "q_corpus_pack" -> ((s: SparkSession, d: String) => sequencePack(s, d)),
    "q_corpus_mix" -> ((s: SparkSession, d: String) => langMix(s, d)),
    "q_text_tokens" -> (tokenCounts _),
    "q_text_quality" -> (qualityScore _),
    "q_text_quality_filter" -> (qualityFilter _),
    "q_text_langid" -> (langId _),
    "q_text_fingerprint" -> (fingerprint _),
    "q_text_term_freq" -> (termFreq _),
    "q_text_bigrams" -> (bigramStats _),
    "q_text_bpe_merges" -> ((s: SparkSession, d: String) => bpeMerges(s, d)),
    "q_text_repetition" -> (repetition _))

  private val stopList = Stopwords.map(w => s"'$w'").mkString(", ")

  /** Quality-score SQL body sans ORDER BY — shared by the score and
    * filter oracles (the filter applies to the ROUNDED outputs, same
    * as the Spark side filtering qualityScore's result columns).
    */
  private[operators] lazy val qualitySqlBody: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         list_filter(string_split(text, ' '), t -> t != '') AS toks,
       |         length(text) AS tl,
       |         length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS np
       |  FROM documents),
       |m AS (
       |  SELECT doc_id,
       |         CAST(len(toks) AS DOUBLE) AS ntok,
       |         CAST(np AS DOUBLE) / greatest(CAST(tl AS DOUBLE), 1.0) AS punct_ratio,
       |         CAST(len(list_filter(toks, t -> t IN ($stopList))) AS DOUBLE)
       |           / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS stop_ratio
       |  FROM t)
       |SELECT doc_id,
       |       CAST(ntok AS INT) AS n_tokens,
       |       round(stop_ratio, 4) AS stopword_ratio,
       |       round(punct_ratio, 4) AS punct_ratio,
       |       round(0.4 * least(1.0, ntok / 50.0)
       |             + 0.4 * (1.0 - punct_ratio)
       |             + 0.2 * least(1.0, stop_ratio * 10.0), 4) AS quality_score
       |FROM m""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_pipeline_corpus" ->
      s"""WITH RECURSIVE ${Dedup.minhashPairCtes},
         |bi AS (
         |  SELECT a_id AS src, b_id AS dst FROM mh_pairs
         |  UNION ALL SELECT b_id, a_id FROM mh_pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM bi),
         |reach(id, label) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT bi.dst, r0.label FROM reach r0 JOIN bi ON bi.src = r0.id),
         |lab AS (SELECT id, min(label) AS cluster FROM reach GROUP BY id),
         |exact_keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
         |non_canon AS (SELECT id AS doc_id FROM lab WHERE id <> cluster),
         |q AS ($qualitySqlBody),
         |kept AS (
         |  SELECT d.doc_id, d.text FROM documents d
         |  JOIN q ON q.doc_id = d.doc_id
         |  WHERE d.doc_id IN (SELECT doc_id FROM exact_keep)
         |    AND d.doc_id NOT IN (SELECT doc_id FROM non_canon)
         |    AND q.quality_score >= 0.7),
         |kt AS (
         |  SELECT doc_id, doc_id % $PackShards AS shard,
         |         CAST(len(list_filter(string_split(text, ' '), x -> x != '')) AS BIGINT) AS n_tok
         |  FROM kept),
         |rr AS (
         |  SELECT doc_id, shard, n_tok,
         |         coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
         |  FROM kt)
         |SELECT shard, CAST(before // 2048 AS BIGINT) AS pack_id,
         |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
         |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM rr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_corpus_chunk" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS BIGINT) AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, n_tok,
         |         CAST(CASE WHEN n_tok = 0 THEN 0
         |              ELSE 1 + (greatest(n_tok - $ChunkSize, 0) + ${ChunkStride - 1}) // $ChunkStride
         |              END AS BIGINT) AS n_chunks
         |  FROM t)
         |SELECT doc_id, n_tok, n_chunks,
         |       CAST(CASE WHEN n_chunks <= 1 THEN n_tok
         |            ELSE n_tok - $ChunkStride * (n_chunks - 1) END AS BIGINT) AS last_chunk_tokens
         |FROM c ORDER BY doc_id""".stripMargin,
    "q_text_lm_score" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % 100 < 90 AS is_train,
        |         list_filter(string_split(text, ' '), t -> t != '') AS tk
        |  FROM documents),
        |bgp AS (
        |  SELECT doc_id, is_train, bg, string_split(bg, ' ')[1] AS w1 FROM (
        |    SELECT doc_id, is_train,
        |           unnest(CASE WHEN len(tk) >= 2
        |                  THEN list_transform(range(1, len(tk)),
        |                       i -> array_to_string(list_slice(tk, i, i + 1), ' '))
        |                  ELSE [] END) AS bg
        |    FROM d)),
        |bic AS (SELECT bg, count(*) AS cbg FROM bgp WHERE is_train GROUP BY bg),
        |uc AS (SELECT w1, count(*) AS cw FROM (
        |         SELECT unnest(tk) AS w1 FROM d WHERE is_train) GROUP BY w1),
        |v AS (SELECT count(DISTINCT w1) AS vv FROM (
        |         SELECT unnest(tk) AS w1 FROM d WHERE is_train))
        |SELECT b.doc_id, count(*) AS n_bigrams,
        |       round(avg(ln((coalesce(bic.cbg, 0) + 1) * 1.0
        |                 / (coalesce(uc.cw, 0) + (SELECT vv FROM v)))), 4) AS avg_ln_p
        |FROM bgp b
        |LEFT JOIN bic USING (bg)
        |LEFT JOIN uc USING (w1)
        |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin,
    "q_corpus_upsample" -> {
      val wCase = EpochWeights
        .map { case (l, wt) => s"WHEN '$l' THEN $wt" }.mkString(" ")
      s"""WITH w AS (
         |  SELECT doc_id, lang,
         |         CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS BIGINT) AS n_tok,
         |         CASE lang $wCase ELSE 1.0 END AS wt,
         |         CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % 1000 AS h
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, lang, n_tok,
         |         CAST(floor(wt) AS BIGINT)
         |           + (CASE WHEN h < (wt - floor(wt)) * 1000 THEN 1 ELSE 0 END) AS n_copies
         |  FROM w),
         |e AS (
         |  SELECT doc_id, lang, n_tok, unnest(range(1, n_copies + 1)) AS epoch FROM c)
         |SELECT lang, count(DISTINCT doc_id) AS n_docs,
         |       count(*) AS n_rows_postmix,
         |       CAST(sum(n_tok) AS BIGINT) AS n_tokens_postmix
         |FROM e GROUP BY lang ORDER BY lang""".stripMargin
    },
    "q_text_redact" ->
      s"""SELECT doc_id,
         |       CAST(len(regexp_extract_all(text, '$EmailPattern')) AS INT) AS n_emails,
         |       CAST(len(regexp_extract_all(text, '$termPattern')) AS INT) AS n_terms,
         |       CAST(len(regexp_extract_all(text, '$DigitPattern')) AS INT) AS n_digit_runs,
         |       md5(regexp_replace(regexp_replace(regexp_replace(text,
         |           '$EmailPattern', '<email>', 'g'),
         |           '$termPattern', '<redacted>', 'g'),
         |           '$DigitPattern', '<num>', 'g')) AS redacted_md5
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_boilerplate" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS tk
        |  FROM documents),
        |ex0 AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(CASE WHEN len(tk) >= 3
        |                THEN list_transform(range(1, len(tk) - 1),
        |                     i -> array_to_string(list_slice(tk, i, i + 2), ' '))
        |                ELSE [] END) AS g
        |  FROM toks),
        |ex AS (
        |  SELECT doc_id, CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) AS g
        |  FROM ex0),
        |d AS (SELECT g, count(DISTINCT doc_id) AS df FROM ex GROUP BY g)
        |SELECT ex.doc_id, count(*) AS n_grams,
        |       CAST(sum(CASE WHEN d.df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |       round(CAST(sum(CASE WHEN d.df >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
        |             / count(*), 4) AS boiler_ratio
        |FROM ex JOIN d USING (g)
        |GROUP BY ex.doc_id ORDER BY ex.doc_id""".stripMargin,
    "q_corpus_contam" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CASE WHEN CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % 100 < 90 THEN 'train'
        |              WHEN CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % 100 < 95 THEN 'val'
        |              ELSE 'test' END AS split,
        |         list_filter(string_split(text, ' '), x -> x != '') AS tk
        |  FROM documents),
        |ex0 AS (
        |  SELECT DISTINCT doc_id, split,
        |         unnest(CASE WHEN len(tk) >= 5
        |                THEN list_transform(range(1, len(tk) - 3),
        |                     i -> array_to_string(list_slice(tk, i, i + 4), ' '))
        |                ELSE [] END) AS g
        |  FROM t),
        |ex AS (
        |  SELECT doc_id, split, CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) AS g
        |  FROM ex0)
        |SELECT te.doc_id,
        |       count(DISTINCT tr.doc_id) AS n_train_docs,
        |       count(DISTINCT te.g) AS n_shared_grams
        |FROM ex te JOIN ex tr ON te.g = tr.g AND te.split = 'test' AND tr.split = 'train'
        |GROUP BY te.doc_id ORDER BY te.doc_id""".stripMargin,
    "q_corpus_split" ->
      """WITH s AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % 100 < 90 THEN 'train'
        |              WHEN CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % 100 < 95 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, lang, count(*) AS n_docs
        |FROM s GROUP BY split, lang ORDER BY split, lang""".stripMargin,
    // NB: DuckDB widens sum(BIGINT) and `//` to HUGEINT — every such
    // column is CAST back to BIGINT so the driver's type-sensitive
    // hash compare sees the same schema Spark writes.
    "q_corpus_pack" ->
      s"""WITH t AS (
        |  SELECT doc_id, doc_id % $PackShards AS shard,
        |         CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS BIGINT) AS n_tok
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, shard, n_tok,
        |         coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        |  FROM t)
        |SELECT shard, CAST(before // 2048 AS BIGINT) AS pack_id,
        |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
        |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_corpus_mix" ->
      """WITH r AS (
        |  SELECT lang, n_chars,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY CAST('0x' || substr(md5(text), 1, 15) AS BIGINT), doc_id) AS rnk
        |  FROM documents)
        |SELECT lang, count(*) AS n_kept, round(avg(n_chars), 4) AS avg_chars
        |FROM r WHERE rnk <= 60 GROUP BY lang ORDER BY lang""".stripMargin,
    "q_text_quality_filter" ->
      s"""SELECT * FROM ($qualitySqlBody)
         |WHERE quality_score >= 0.7 AND punct_ratio <= 0.3
         |ORDER BY doc_id""".stripMargin,
    "q_text_bigrams" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS tk
        |  FROM documents),
        |ex AS (
        |  SELECT DISTINCT doc_id,
        |         unnest(CASE WHEN len(tk) >= 2
        |                THEN list_transform(range(1, len(tk)),
        |                     i -> array_to_string(list_slice(tk, i, i + 1), ' '))
        |                ELSE [] END) AS bigram
        |  FROM toks)
        |SELECT bigram, count(DISTINCT doc_id) AS df
        |FROM ex GROUP BY bigram
        |ORDER BY df DESC, bigram LIMIT 40""".stripMargin,
    "q_text_tokens" ->
      """SELECT doc_id, n_chars,
        |       CAST(length(text) AS INT) AS n_chars_actual,
        |       CAST(len(list_filter(string_split(text, ' '), t -> t != '')) AS INT) AS n_ws_tokens,
        |       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      s"""SELECT * FROM ($qualitySqlBody) ORDER BY doc_id""".stripMargin,
    "q_text_langid" -> {
      // Same formula, same evaluation order as langIdOf: per-gram
      // occurrence counts via the length-difference trick, summed then
      // divided by the char count; zh = Han-codepoint ratio.
      val ratioExprs = LangCharProfiles.map { case (l, grams) =>
        val occ = grams
          .map(g => s"(length(text) - length(replace(text, '$g', ''))) * 1.0 / ${g.codePointCount(0, g.length)}")
          .mkString("(", "\n            + ", ")")
        s"$occ\n           / greatest(CAST(length(text) AS DOUBLE), 1.0) AS $l"
      }.mkString(",\n         ") +
        s""",
           |         length(regexp_replace(text, '$NonHanClass', '', 'g')) * 1.0
           |           / greatest(CAST(length(text) AS DOUBLE), 1.0) AS zh""".stripMargin
      val langs = LangCharProfiles.map(_._1) :+ "zh"
      val best = s"greatest(${langs.mkString(", ")})"
      val argmax = langs.reverse.foldLeft("'und'") { (acc, l) =>
        s"CASE WHEN $l = $best THEN '$l' ELSE $acc END"
      }
      val guess = s"CASE WHEN $best >= $LangThreshold THEN $argmax ELSE 'und' END"
      s"""WITH m AS (
         |  SELECT doc_id, lang,
         |         $ratioExprs
         |  FROM documents)
         |SELECT doc_id, lang,
         |       ${langs.map(l => s"round($l, 4) AS ${l}_ratio").mkString(",\n       ")},
         |       $guess AS lang_guess,
         |       (lang = $guess) AS agrees
         |FROM m ORDER BY doc_id""".stripMargin
    },
    "q_text_fingerprint" ->
      """WITH g AS (
        |  SELECT doc_id,
        |         CASE WHEN length(text) >= 8
        |              THEN list_transform(range(1, length(text) - 6), i -> substr(text, i, 8))
        |              ELSE [text] END AS grams
        |  FROM documents)
        |SELECT doc_id,
        |       list_min(list_transform(grams,
        |         g -> CAST('0x' || substr(md5(g), 1, 15) AS BIGINT))) AS fp60,
        |       CAST(len(list_distinct(grams)) AS INT) AS n_distinct_8grams
        |FROM g ORDER BY doc_id""".stripMargin,
    "q_text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS tk
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |         CAST(greatest(len(tk) - 2, 0) AS INT) AS nt,
        |         CASE WHEN len(tk) >= 3
        |              THEN len(list_distinct(list_transform(range(1, len(tk) - 1),
        |                   i -> array_to_string(list_slice(tk, i, i + 2), ' '))))
        |              ELSE 0 END AS nd
        |  FROM t)
        |SELECT doc_id,
        |       nt AS n_grams_total,
        |       CAST(nd AS INT) AS n_grams_distinct,
        |       round(CASE WHEN nt > 0
        |             THEN 1.0 - nd * 1.0 / nt
        |             ELSE 0.0 END, 4) AS rep_ratio
        |FROM g ORDER BY doc_id""".stripMargin,
    "q_text_bpe_merges" ->
      """WITH tok AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), t -> t != '')) AS t
        |  FROM documents),
        |pairs AS (
        |  SELECT unnest(list_transform(range(1, length(t)), i -> substr(t, i, 2))) AS pair
        |  FROM tok WHERE length(t) >= 2)
        |SELECT pair, count(*) AS n FROM pairs
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin,
    "q_text_term_freq" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t != '')) AS term
        |  FROM documents),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
        |SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df,
        |       round(ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / count(DISTINCT doc_id)), 4) AS idf
        |FROM tok GROUP BY term
        |ORDER BY tf DESC, term LIMIT 50""".stripMargin)
}
