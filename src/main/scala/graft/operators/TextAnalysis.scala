package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * language identification, quality scoring, token counting, document
  * fingerprinting. Everything is built from codegen'd column expressions
  * (no UDFs), so the operators scan-parallelize trivially: each is a pure
  * per-row projection — no shuffle, no state — and whole-stage codegen keeps
  * them in one pass over the text column.
  */
object TextAnalysis {

  /** Whitespace tokenizer (lowercased). */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** BPE-ish subword-boundary tokenizer: letters runs, digit runs, and single
    * punctuation marks each count as a token (the usual pre-tokenization
    * regex shape). The keep-filter strips ALL whitespace, not just spaces
    * (`trim` only removes 0x20, so a lone tab token would survive it).
    */
  def bpeTokens(text: Column): Column =
    filter(split(text,
      "(?<=\\s)|(?=\\s)|(?<=[^\\p{L}\\p{N}])|(?=[^\\p{L}\\p{N}])" +
        "|(?<=\\p{L})(?=\\p{N})|(?<=\\p{N})(?=\\p{L})"),
      t => regexp_replace(t, "\\s", "") =!= "")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic (single source of truth lives beside the fused counting
    * expression; re-exported here for the single-list consumers that
    * still broadcast words as literals).
    */
  private val stopwords: Seq[(String, Seq[String])] =
    graft.plans.StopwordLangCounts.languages

  /** Heuristic language ID: CJK-character ratio decides `zh`; otherwise the
    * language whose stopword list matches the most tokens wins (ties broken
    * alphabetically). Adds `lang_pred` and `lang_score` columns.
    *
    * Counting goes through the fused `stopword_lang_counts` expression —
    * ONE pass over the word-hash array against a static 60-entry hash
    * table — instead of five interpreted `filter(isInCollection)` lambdas
    * (each a languages × words × tokens string scan; q40 measured ~3-5×
    * its sibling projections on that shape). Scores and tie-breaks are
    * value-identical to the string form modulo 64-bit hash collisions.
    */
  def languageId(df: DataFrame, textCol: String,
                 outCol: String = "lang_pred"): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    // token array bound ONCE as a projection attribute (HOF lambdas run
    // interpreted with no CSE; CollapseProject keeps non-cheap multi-use
    // aliases apart), hashed once, counted once
    val toks = col("_lid_toks")
    val cnts = col("_lid_cnts")
    val nToks = greatest(size(toks), lit(1)).cast("double")
    // (-score, lang) structs: array_min picks highest score, then
    // alphabetically-first language on ties.
    val scored = array(stopwords.zipWithIndex.map { case ((lang, _), i) =>
      struct(
        (-element_at(cnts, i + 1).cast("double") / nToks).as("neg"),
        lit(lang).as("lang"))
    }: _*)
    val best = array_min(scored)
    // fused byte-scan CJK count — the regex-replace form pushed every
    // document through the regex engine and allocated the stripped copy
    val cjk = call_function("cjk_count", col(textCol))
    df.withColumn("_lid_toks", tokens(col(textCol)))
      .withColumn("_lid_cnts", call_function("stopword_lang_counts",
        transform(toks, t => xxhash64(t))))
      .withColumn(outCol,
        when(cjk.cast("double") / greatest(length(col(textCol)), lit(1)) > 0.2,
          lit("zh"))
          .otherwise(best.getField("lang")))
      .withColumn("lang_score", -best.getField("neg"))
      .drop("_lid_toks", "_lid_cnts")
  }

  /** Quality-scoring columns: token count, alphabetic-character ratio,
    * stopword ratio, mean token length — the standard cheap quality filters
    * for pretraining corpora.
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    // token array bound once (non-cheap multi-use alias stays a separate
    // projection) instead of re-splitting per derived column
    val toks = col("_qs_toks")
    val en = stopwords.toMap.apply("en")
    val nToks = greatest(size(toks), lit(1))
    df.withColumn("_qs_toks", tokens(t))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("alpha_ratio",
        length(regexp_replace(t, "[^a-zA-Z]", "")).cast("double")
          / greatest(length(t), lit(1)))
      .withColumn("stopword_ratio",
        size(filter(toks, x => x.isInCollection(en))).cast("double") / nToks)
      .withColumn("mean_tok_len",
        aggregate(toks, lit(0L), (acc, x) => acc + length(x)).cast("double") / nToks)
      .drop("_qs_toks")
  }

  /** Fixed-weight logistic quality classifier — the model-based filter
    * stage of a pretraining curation pipeline (the FineWeb-Edu / DCLM
    * pattern: a cheap linear scorer, trained offline, applied to every
    * document at ingest). [[qualityScore]] exposes the raw features; this
    * operator collapses them through a frozen linear model into one
    * probability and a keep/drop verdict, so downstream stages filter on a
    * single calibrated column instead of hand-tuned per-feature cutoffs.
    *
    * score = σ(bias + w·[alpha_ratio, stopword_ratio, mean_tok_len,
    * ln(1+n_tokens)]); keep = score ≥ threshold. The default weights are
    * illustrative frozen coefficients, not a shipped model — real
    * deployments pass their own.
    *
    * Scale shape: ONE codegen projection over the text column — no
    * shuffle, no UDF, no state; the token array is bound once and every
    * feature derives from it inside the same whole-stage-codegen pass.
    * Tokenization is case-sensitive raw-whitespace (the q37 feature
    * convention), so stopword hits count lowercase forms only.
    *
    * @return input plus (`quality_score` double in (0,1), `keep` boolean).
    */
  def qualityClassifier(df: DataFrame, textCol: String,
                        bias: Double = -6.0, wAlpha: Double = 5.0,
                        wStopword: Double = 4.0, wMeanTokLen: Double = 0.25,
                        wLogTokens: Double = 0.6,
                        threshold: Double = 0.5): DataFrame = {
    val t = col(textCol)
    val toks = col("_qc_toks")
    val en = stopwords.toMap.apply("en")
    val nToks = greatest(size(toks), lit(1))
    val z = lit(bias) +
      lit(wAlpha) * (length(regexp_replace(t, "[^a-zA-Z]", "")).cast("double")
        / greatest(length(t), lit(1))) +
      lit(wStopword) * (size(filter(toks, x => x.isInCollection(en)))
        .cast("double") / nToks) +
      lit(wMeanTokLen) * ((length(t) - size(toks) + lit(1)).cast("double")
        / nToks) +
      lit(wLogTokens) * log(lit(1.0) + size(toks).cast("double"))
    df.withColumn("_qc_toks", split(trim(t), "\\s+"))
      .withColumn("quality_score", lit(1.0) / (lit(1.0) + exp(-z)))
      .withColumn("keep", col("quality_score") >= lit(threshold))
      .drop("_qc_toks")
  }

  /** CCNet-style per-group score terciles (Wenzek et al. 2020: bucket each
    * source's documents into head/middle/tail by LM perplexity; train on
    * head+middle, drop or downweight tail). Generic over any score column;
    * `head` is the HIGHEST-score third (pass a log-probability, where
    * higher = more fluent).
    *
    * Scale shape — the q66 lesson applied to quantiles: the ranking window
    * never sees document rows. Docs collapse to a (group, score) census
    * first (map-side partial agg; the caller's score must already be
    * grid-rounded, e.g. the 1e-4 `fr` convention, which BOUNDS the
    * distinct-value count per group), the cumulative rank runs over that
    * bounded census, and buckets join back on (group, score) — one
    * equi-join, no per-doc window, no single-task-per-group sort.
    *
    * Ties share a score row in the census, so every doc at the same
    * (group, score) lands in the same bucket — the bucket of the tied
    * run's first rank: `least(floor(3·prev/n), 2)`, integer-exact in IEEE
    * doubles on both engines.
    *
    * @return the input plus `ppl_bucket` ∈ {head, middle, tail}.
    */
  def scoreTerciles(df: DataFrame, groupCol: String, scoreCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("_cum", sum(col("_c")).over(w))
      .withColumn("_prev", col("_cum") - col("_c"))
    val tot = counts.groupBy(col(groupCol)).agg(sum(col("_c")).as("_n"))
    val buckets = cum.join(tot, Seq(groupCol))
      .withColumn("_b",
        least(floor(lit(3.0) * col("_prev") / col("_n")).cast("int"), lit(2)))
      .withColumn("ppl_bucket",
        element_at(array(lit("head"), lit("middle"), lit("tail")),
          col("_b") + 1))
      .select(col(groupCol), col(scoreCol), col("ppl_bucket"))
    df.join(buckets, Seq(groupCol, scoreCol))
  }

  /** Character-level Shannon entropy (nats) of each document's codepoint
    * distribution — low entropy flags repetitive/degenerate text, high
    * entropy flags random noise; a standard cheap quality signal alongside
    * the ratio features of [[qualityScore]].
    *
    * One fused codegen pass per row ([[graft.plans.CharEntropy]]): the
    * per-document character census never leaves the row, so this is a pure
    * projection — no explode, no shuffle, scan-parallel at any corpus size.
    */
  def charEntropy(df: DataFrame, textCol: String): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    df.withColumn("char_entropy",
      call_function("char_entropy", col(textCol)))
  }

  /** Exact per-group percentiles of an integer-valued metric via a census
    * rank — the [[scoreTerciles]] shape pointed at quantiles. Docs collapse
    * to a (group, value) census first (map-side partial agg; the census is
    * bounded by the DISTINCT value count per group, not the row count), the
    * cumulative rank runs over that census, and each requested percentile
    * is the smallest value whose cumulative count reaches ceil(p·n) — the
    * classic type-1 quantile, computed in INTEGER arithmetic only
    * (`cum·den ≥ num·n`), so engines can't disagree on a boundary.
    *
    * No per-group sort task ever sees document rows (the q66 lesson): a
    * group with billions of docs but thousands of distinct values ranks
    * thousands of census rows.
    *
    * @param percentiles (outputName, numerator, denominator) fractions,
    *                    e.g. ("p50", 1, 2).
    * @return one row per group: (groupCol, n_rows, <one column per
    *         percentile>).
    */
  def percentileCensus(df: DataFrame, groupCol: String, valueCol: String,
                       percentiles: Seq[(String, Int, Int)] =
                         Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
      : DataFrame = {
    require(percentiles.nonEmpty, "need at least one percentile")
    percentiles.foreach { case (nm, num, den) =>
      require(num > 0 && den > 0 && num <= den,
        s"percentile $nm=$num/$den must satisfy 0 < num <= den")
    }
    val census = df.groupBy(col(groupCol), col(valueCol).cast("long").as("_v"))
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = census.withColumn("_cum", sum(col("_c")).over(w))
    val tot = census.groupBy(col(groupCol)).agg(sum(col("_c")).as("_n"))
    val aggs = percentiles.map { case (nm, num, den) =>
      // _cum >= ceil(num*n/den)  <=>  _cum*den >= num*n  (integers)
      min(when(col("_cum") * lit(den.toLong) >= lit(num.toLong) * col("_n"),
        col("_v"))).as(nm)
    }
    cum.join(tot, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(max(col("_n")).as("n_rows"), aggs: _*)
  }

  /** Normalized content fingerprint (md5 over whitespace-collapsed lowercase
    * text) — exact-dedup key robust to whitespace variation.
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Polynomial rolling hash (Rabin–Karp, base 31 mod 2^31-1) over the
    * document's tokens — an order-sensitive fingerprint, unlike the
    * set-semantics minhash.
    */
  def rollingHash(text: Column): Column = {
    val p = 2147483647L
    aggregate(tokens(text), lit(7L),
      (acc, t) => pmod(acc * 31L + pmod(xxhash64(t), lit(p)), lit(p)))
  }

  /** Corpus vocabulary census: one row per distinct token with its global
    * count. Shape: explode + ONE hash-keyed count — partial aggregation
    * collapses hot tokens ("the") inside each scan task, so the shuffle
    * carries at most one row per (task, distinct token), not one per token
    * occurrence; top-k consumers (`orderBy(cnt).limit(k)`) then plan as
    * TakeOrderedAndProject, never a full sort.
    */
  def vocabulary(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))

  /** Benchmark-contamination score — the eval-leakage check every training
    * corpus needs: for each corpus document, the fraction of its DISTINCT
    * word n-gram shingles that also occur anywhere in the benchmark set.
    *
    * Scale shape: the benchmark shingle set is small by definition (eval
    * suites, not corpora) — broadcast it; the corpus side is one explode +
    * one broadcast left-join + one keyed count, no corpus-vs-corpus
    * shuffle. Shingling matches `Dedup.shingles` exactly (shorter-than-n
    * documents collapse to one whole-text shingle).
    *
    * @return one row per corpus document: (`idCol`, `contamination` ∈ [0,1])
    */
  def contaminationScore(corpus: DataFrame, bench: DataFrame, idCol: String,
                         textCol: String, n: Int = 3): DataFrame = {
    graft.plans.GraftExtensions.register(corpus.sparkSession)
    // fused 64-bit shingle hashing (plans.ShingleHashes): overlap counts
    // are identical to the string form — equal n-grams hash equal — while
    // the 100 TB corpus side never materializes n-gram strings
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val sh = explode(call_function("shingle_hashes",
      transform(toks, t => xxhash64(t)), lit(n)))
    val benchSet = bench.select(sh.as("g")).distinct()
      .withColumn("hit", lit(1))
    corpus
      .select(col(idCol), sh.as("g"))
      .join(broadcast(benchSet), Seq("g"), "left")
      .groupBy(idCol)
      .agg((sum(coalesce(col("hit"), lit(0))).cast("double") / count(lit(1)))
        .as("contamination"))
  }

  /** Deterministic stratified downsampling: keep a row iff the first 16
    * bits of `md5(text)` fall under its stratum's rate threshold
    * (quantized to 1/65536). Content-hash selection makes the sample a
    * pure, shuffle-free filter that is reproducible across runs, engines,
    * and partitionings — and stable under corpus re-sharding, which a
    * `rand()`-based sample is not. Duplicate texts always land on the same
    * side of the cut (a feature: dedup before or after sampling commutes).
    */
  def stratifiedSample(df: DataFrame, textCol: String, stratumCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val hv = conv(substring(md5(col(textCol)), 1, 4), 16, 10).cast("int")
    val thr = rates.toSeq.sortBy(_._1).foldLeft(
      lit((defaultRate * 65536).toInt)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit((v * 65536).toInt)).otherwise(acc)
    }
    df.filter(hv < thr)
  }

  /** Sequence packing (concat-and-chunk): lay documents head-to-tail into
    * fixed-`budget` token windows — the standard pretraining batch layout
    * where sequence k of a shard is tokens [k·budget, (k+1)·budget) of the
    * shard's concatenated stream. Emits each document's placement:
    * (`shard`, `start_off`, `bin_first`, `bin_last`) — a doc spans bins
    * when its tokens straddle a boundary, exactly like the training-time
    * layout it mirrors.
    *
    * Determinism and scale come from the same choice: documents are
    * assigned round-robin to `shards` streams by id and laid out in id
    * order, so placement is a pure function of (ids, token counts) —
    * independent of partitioning, reproducible across engines. Each
    * shard's running offset is one window cumsum; shards are the
    * parallelism unit (size `shards` ≥ cluster cores at scale — the
    * per-shard scan is inherently sequential, as any packing is).
    * Token counts use the q35 whitespace tokenizer.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    shards: Int, budget: Int): DataFrame = {
    val ntok = size(split(trim(col(textCol)), "\\s+")).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    df.select(col(idCol),
        pmod(col(idCol), lit(shards.toLong)).cast("int").as("shard"),
        ntok.as("n_tokens"))
      .withColumn("end_off", sum(col("n_tokens")).over(w))
      .select(col(idCol), col("shard"), col("n_tokens"),
        (col("end_off") - col("n_tokens")).as("start_off"),
        floor((col("end_off") - col("n_tokens")) / lit(budget.toDouble))
          .as("bin_first"),
        floor((col("end_off") - 1) / lit(budget.toDouble)).as("bin_last"))
  }

  /** TF-IDF top-k terms per document — the classic salient-term extractor
    * (keyword tagging, near-dup explanation, topic drill-down). Score =
    * tf × ln(N / df).
    *
    * Shape: explode → (doc, term) counts (partial-agg collapses repeats
    * map-side), term document-frequency as a second aggregation over the
    * FIRST one's output (never re-touches the corpus), the one-row corpus
    * count broadcast in, and a per-doc top-k window partitioned by
    * document. Shuffles are keyed on (doc, term) then term then doc —
    * all equi-keys, no all-pairs, nothing driver-side.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("_df_docs"))
    val total = df.agg(count(lit(1)).as("_n_docs"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(total))
      .withColumn("tfidf",
        col("tf") * log(col("_n_docs").cast("double") / col("_df_docs")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(idCol), col("rn"), col("term"), col("tfidf"))
  }

  /** Gopher-style composite quality rules (Rae et al. 2021 §A1.1, the
    * shapes every pretraining pipeline reuses): a document passes iff
    *  - token count in [minTokens, maxTokens],
    *  - mean token length in [3, 10] characters,
    *  - alphabetic-character ratio ≥ 0.6 (symbol/markup junk), and
    *  - stopword hits ≥ 2 (natural-language-ness probe; English list).
    *
    * Emits the boolean plus each rule's verdict so downstream can audit
    * WHY a document dropped (rejection-reason histograms are the first
    * thing a data-quality review asks for). Pure per-row projection over
    * one bound token array — no shuffle, no UDF, stays in codegen except
    * the two stopword/length lambdas.
    */
  def gopherRules(df: DataFrame, textCol: String,
                  minTokens: Int = 5, maxTokens: Int = 100000): DataFrame = {
    val t = col(textCol)
    val toks = col("_gr_toks")
    val en = stopwords.toMap.apply("en")
    val nToks = size(toks).cast("long")
    val meanLen = aggregate(toks, lit(0L), (acc, x) => acc + length(x))
      .cast("double") / greatest(nToks, lit(1L))
    df.withColumn("_gr_toks", tokens(t))
      .withColumn("rule_tokens",
        nToks >= minTokens && nToks <= maxTokens)
      .withColumn("rule_mean_len", meanLen >= 3.0 && meanLen <= 10.0)
      .withColumn("rule_alpha",
        length(regexp_replace(t, "[^a-zA-Z]", "")).cast("double")
          / greatest(length(t), lit(1)) >= 0.6)
      .withColumn("rule_stopwords",
        size(filter(toks, x => x.isInCollection(en))) >= 2)
      .withColumn("quality_pass",
        col("rule_tokens") && col("rule_mean_len") &&
          col("rule_alpha") && col("rule_stopwords"))
      .drop("_gr_toks")
  }

  /** Corpus-unigram log-probability per document — the cheap stand-in for
    * the perplexity quality filter (CCNet-style): documents whose tokens
    * are improbable under the corpus's own unigram distribution (garbled
    * text, wrong-language fragments, encoding noise) score low; fluent
    * in-distribution text scores high. score = mean over token
    * OCCURRENCES of ln(count(term) / total_tokens).
    *
    * Shape (the q64/TF-IDF budget class): ONE explode collapsed map-side
    * to `(doc, term, tf)` before anything joins — the join probe side is
    * the distinct doc-term aggregate (~10× smaller than the occurrence
    * stream at typical repetition, and far less skewed: "the" appears
    * once per document, not once per occurrence). Term counts are a
    * second aggregation over the FIRST one's output (`sum(tf)` — never
    * re-touching the explode), the corpus total derives from the counts
    * aggregate itself, and the occurrence-mean is recovered exactly as
    * the tf-weighted mean: avg over occurrences of ln(c/t)
    * = sum(tf·ln(c/t)) / sum(tf). Nothing row-shaped leaves executors.
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("_tf"))
    val counts = tf.groupBy(col("term")).agg(sum(col("_tf")).as("_c"))
    val total = counts.agg(sum(col("_c")).as("_t"))
    tf.join(counts, Seq("term"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg((sum(col("_tf") * log(col("_c").cast("double") / col("_t")))
        / sum(col("_tf"))).as("logprob"))
  }

  /** Deterministic global training-order shuffle: every row gets a stable
    * position `shuffle_pos` = its rank under `md5(seed || id)` — the
    * reproducible corpus permutation a training run reads in order. Same
    * seed → same permutation, on any engine, any partitioning, any day.
    *
    * The naive form (`row_number` over a global ORDER BY) collapses into
    * ONE task at scale — the keyless-window trap. This instead decomposes
    * the global rank: the first `hexDigits` of the key split rows into
    * 16^hexDigits buckets, and because the bucket IS the key's prefix,
    * bucket-major + within-bucket key order equals the global key order.
    * So: within-bucket ranks come from a properly PARTITIONED window
    * (bucket-parallel), bucket offsets from a 16^hexDigits-row aggregate
    * (the only single-partition step — a few KB), broadcast back. Every
    * stage is distributed; nothing row-shaped leaves the executors.
    *
    * Size buckets to the corpus: each bucket sorts in one task, so pick
    * `hexDigits` with corpus / 16^hexDigits well under task memory —
    * 3 (4096 buckets) to ~100 GB, 4 (65536) for the 100 TB tier (~1.5 GB
    * per bucket; md5 uniformity keeps them even).
    *
    * @return input plus `shuffle_pos` (0-based long).
    */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: String,
                           hexDigits: Int = 3): DataFrame = {
    require(hexDigits >= 1 && hexDigits <= 7, "1..7 hex digits")
    val key = md5(concat(lit(seed + ":"), col(idCol).cast("string")))
    val keyed = df.withColumn("_key", key)
      .withColumn("_bkt",
        conv(substring(col("_key"), 1, hexDigits), 16, 10).cast("int"))
    val rw = Window.partitionBy(col("_bkt"))
      .orderBy(col("_key"), col(idCol))
    // bucket sizes -> exclusive prefix offsets. The cumsum runs DRIVER-side
    // over the fixed-size (≤16^hexDigits-row) count aggregate — same
    // budget class as a k-means codebook — rather than through a keyless
    // window (which would be the single-partition trap this operator
    // exists to avoid, however small its input)
    val spark = df.sparkSession
    val counts = keyed.groupBy(col("_bkt")).agg(count(lit(1)).as("_n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offs = counts.scanLeft((0, 0L)) { case ((_, acc), (b, n)) =>
      (b, acc + n)
    }
    val offsets = spark.createDataFrame(
      counts.map(_._1).zip(offs.map(_._2)).toSeq).toDF("_bkt", "_off")
    keyed
      .withColumn("_rn", row_number().over(rw).cast("long"))
      .join(broadcast(offsets), Seq("_bkt"))
      .withColumn("shuffle_pos", col("_off") + col("_rn") - 1)
      .drop("_key", "_bkt", "_rn", "_off")
  }

  /** Fixed-budget stratified sampling: EXACTLY min(K, n_g) rows per
    * stratum — eval-set construction, label-balanced probes — chosen as
    * the K smallest content hashes per stratum. Rate-based sampling
    * ([[stratifiedSample]], [[dampedMixtureSample]]) can't hit an exact
    * count; hash-order selection can, and stays deterministic across
    * runs, engines, and re-sharding (and under corpus growth, the kept
    * set changes minimally: only documents hashing below the K-th kept
    * hash displace one).
    *
    * Shape: two-phase top-K. A single `row_number` window partitioned by
    * the stratum alone would send an ENTIRE stratum through one task —
    * with 5 language strata at 100 TB that is five tasks sorting ~20 TB
    * each, the classic skewed-window scale-killer (invisible at gate
    * scale). Instead the first window partitions by
    * (stratum, hash-sub-bucket) — `subBuckets`-way parallel regardless of
    * stratum skew — keeping k per sub-bucket; the global k smallest of a
    * stratum are necessarily each among their own sub-bucket's k
    * smallest, so the final per-stratum window ranks ≤ subBuckets·k
    * survivors, a bounded input no matter how dominant a stratum is.
    * The sub-bucket derives from the SAME md5 already computed for
    * ordering (bits 17-32), so selection order is untouched.
    */
  def stratifiedTopK(df: DataFrame, idCol: String, textCol: String,
                     stratumCol: String, k: Int,
                     subBuckets: Int = 64): DataFrame = {
    require(subBuckets >= 1, "subBuckets >= 1")
    val pre = Window.partitionBy(col(stratumCol), col("_skb"))
      .orderBy(col("_skh"), col(idCol)) // unique id breaks dup-text ties
    val fin = Window.partitionBy(col(stratumCol))
      .orderBy(col("_skh"), col(idCol))
    df.withColumn("_skh", md5(col(textCol)))
      .withColumn("_skb",
        pmod(conv(substring(col("_skh"), 5, 4), 16, 10).cast("int"),
          lit(subBuckets)))
      .withColumn("_prn", row_number().over(pre))
      .filter(col("_prn") <= k)
      .withColumn("_rn", row_number().over(fin))
      .filter(col("_rn") <= k)
      .drop("_skh", "_skb", "_prn", "_rn")
  }

  /** Train/validation/test split assignment by content hash: the same
    * 16-bit md5 threshold scheme as [[stratifiedSample]], but labeling
    * instead of filtering — every row lands in exactly one split, stably
    * under re-sharding and re-runs, and duplicate texts land in the SAME
    * split (no train/test leakage through exact dups). Fractions quantize
    * to 1/65536.
    */
  def assignSplit(textCol: Column, trainFrac: Double, valFrac: Double): Column = {
    val hv = conv(substring(md5(textCol), 1, 4), 16, 10).cast("int")
    val tTrain = (trainFrac * 65536).toInt
    val tVal = ((trainFrac + valFrac) * 65536).toInt
    when(hv < tTrain, lit("train"))
      .when(hv < tVal, lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic weighted sampling without replacement (Efraimidis &
    * Spirakis 2006): each row draws an exponential key `-ln(u) / w` from
    * a content-seeded uniform `u` and its weight `w`; the global k
    * SMALLEST keys are the sample, which selects each row with
    * probability proportional to its weight — quality-weighted corpus
    * downsampling, where a high-quality document is k× more likely in
    * the training mix than a k×-lighter one.
    *
    * Determinism: `u` is the first 16 bits of `md5(seed : id)` (the q53
    * threshold scheme), so the draw is a pure function of (seed, id) —
    * reproducible across runs, engines, and re-sharding, and a new seed
    * is a fresh independent sample. Keys are snapped to the 1e-12 grid
    * before ranking (`floor(key·1e12 + 0.5)/1e12`, exact in doubles up
    * to ~9e3) with id as tiebreak, so an engine's last-ulp `ln` cannot
    * reorder the selection boundary.
    *
    * Scale shape: the key is a shuffle-free projection and the global
    * top-k is `ORDER BY … LIMIT k` — Spark plans TakeOrderedAndProject
    * (per-partition top-k, driver merges k·partitions rows), never a
    * global sort. Nothing else moves.
    *
    * @return the k sampled input rows plus their `es_key`.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: String): DataFrame = {
    val u = (conv(substring(md5(concat(lit(seed + ":"),
      col(idCol).cast("string"))), 1, 4), 16, 10).cast("double") + 0.5) / 65536.0
    val key = -log(u) / greatest(col(weightCol).cast("double"), lit(1.0))
    df.withColumn("es_key",
        floor(key * 1e12 + lit(0.5)) / 1e12)
      .orderBy(col("es_key"), col(idCol))
      .limit(k)
  }

  /** Token-budget curriculum selection: per `groupCol` (source, domain,
    * language…), take documents in deterministic content-hash order
    * until the group's cumulative token count reaches `budget` — "give
    * me ~N tokens per source" — including the document that crosses the
    * boundary (every group lands in [budget, budget + max_doc_tokens)).
    * Hash order makes the selection a stable pseudo-random subset:
    * re-runs, engine swaps, and corpus re-sharding pick the same
    * documents, and corpus growth only displaces documents hashing
    * after the old boundary.
    *
    * Scale shape: the running total is a PREFIX SUM in hash order, and
    * the naive window (partition by group alone) serializes each group
    * through one task — the q62 keyless-window trap, group-shaped. Same
    * cure: the first hex digit of the ordering hash splits each group
    * into 16 sub-buckets; bucket-major + within-bucket hash order IS
    * the global hash order (the bucket is the key's prefix), so
    * within-bucket cumsums come from a properly partitioned window
    * (16-way parallel per group, more digits if groups outgrow task
    * memory) and cross-bucket offsets from a ≤16·|groups|-row aggregate
    * — the only driver-side step, the q62 budget class.
    *
    * @return selected rows: (`groupCol`, `idCol`, `n_tokens`,
    *         `tok_before` — the group's token total before this doc).
    */
  def tokenBudgetSelect(df: DataFrame, idCol: String, textCol: String,
                        groupCol: String, budget: Long): DataFrame = {
    val spark = df.sparkSession
    val keyed = df.select(col(groupCol), col(idCol),
        tokenCount(col(textCol)).as("n_tokens"),
        md5(col(textCol)).as("_key"))
      .withColumn("_bkt",
        conv(substring(col("_key"), 1, 1), 16, 10).cast("int"))
    val w = Window.partitionBy(col(groupCol), col("_bkt"))
      .orderBy(col("_key"), col(idCol))
    // per-(group, bucket) token sums -> exclusive prefix offsets in
    // bucket order, computed driver-side over the fixed-size aggregate
    // (16 rows per group) rather than through a group-keyed window
    val sums = keyed.groupBy(col(groupCol), col("_bkt"))
      .agg(sum(col("n_tokens")).as("_n"))
      .collect()
      .map(r => (r.get(0).toString, r.getInt(1), r.getLong(2)))
      .toSeq
      .groupBy(_._1)
      .toSeq
      .flatMap { case (g, rows) =>
        val sorted = rows.sortBy(_._2)
        sorted.map(_._2).zip(
          sorted.map(_._3).scanLeft(0L)(_ + _)).map {
          case (b, off) => (g, b, off)
        }
      }
    val offsets = spark.createDataFrame(sums)
      .toDF(groupCol, "_bkt", "_off")
    keyed
      .withColumn("_cum", sum(col("n_tokens")).over(w))
      .join(broadcast(offsets), Seq(groupCol, "_bkt"))
      .withColumn("tok_before", col("_off") + col("_cum") - col("n_tokens"))
      .filter(col("tok_before") < budget)
      .select(col(groupCol), col(idCol), col("n_tokens"), col("tok_before"))
  }

  /** Overlapping token-window chunking — the RAG / context-window layout
    * op: document k's chunk c covers tokens [c·stride, c·stride + size),
    * chunks emitted until the last window reaches the document's tail
    * (count = 1 + ceil(max(n − size, 0) / stride)), so every token is
    * covered, short docs yield exactly one chunk, and no fully-contained
    * trailing fragment is emitted. Whitespace inside a chunk is
    * re-normalized to single spaces by the join (both engines replay it
    * identically).
    *
    * Scale shape: a pure projection + explode — tokens never leave the
    * row, the chunk count derives from all-positive integer math (no
    * floor-vs-trunc division ambiguity across engines), and there is no
    * shuffle anywhere: chunking 100 TB is exactly one scan.
    *
    * @return one row per chunk: (`idCol`, `chunk_id`, `chunk_text`,
    *         `n_chunk_tokens`).
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     size: Int, stride: Int): DataFrame = {
    require(size >= 1 && stride >= 1 && stride <= size,
      "need 1 <= stride <= size")
    val toks = split(trim(col(textCol)), "\\s+")
    val n = org.apache.spark.sql.functions.size(toks)
    // floor of a double ratio of small nonnegative ints — exact, and the
    // all-positive operands sidestep floor-vs-trunc divergence
    val nChunks = lit(1) +
      floor((greatest(n - size, lit(0)) + lit(stride - 1))
        / lit(stride.toDouble))
    df.select(col(idCol), toks.as("_toks"),
        explode(sequence(lit(0), nChunks.cast("int") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        array_join(slice(col("_toks"),
          col("chunk_id") * stride + 1, lit(size)), " ").as("chunk_text"),
        org.apache.spark.sql.functions.size(slice(col("_toks"),
          col("chunk_id") * stride + 1, lit(size))).cast("long")
          .as("n_chunk_tokens"))
  }

  /** N-gram novelty: per document, the fraction of its DISTINCT word
    * n-gram shingles that occur in at least one other document — the
    * corpus-level duplication score used to find boilerplate-heavy and
    * template-generated documents that per-document signals (repetition
    * ratio) can't see. 0 = fully novel text, 1 = every shingle appears
    * elsewhere.
    *
    * Shape: shingles hash to 64-bit keys INSIDE the row (xxhash64 in the
    * same projection that builds them — only transient strings, never a
    * string exchange: 8-byte shuffle keys instead of ~40-byte n-grams,
    * the q41 lesson), per-doc distinct before the explode, ONE shuffle
    * keyed on the hash to count document frequency (partial-agg collapses
    * hot boilerplate shingles map-side), frequency joined back, per-doc
    * mean. No all-pairs comparison anywhere: cost is O(total distinct
    * shingles), the same budget the MinHash signature pass already pays.
    * Exact modulo 64-bit shingle-hash collisions (~1e-7 at 2.5M distinct
    * shingles — the q31 content-hash caveat at n-gram granularity).
    */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val ex = df.select(col(idCol),
      explode(call_function("shingle_hashes",
        transform(toks, t => xxhash64(t)), lit(n))).as("_g"))
    val docFreq = ex.groupBy(col("_g")).agg(count(lit(1)).as("_df"))
    ex.join(docFreq, Seq("_g"))
      .groupBy(col(idCol))
      .agg(avg((col("_df") > 1).cast("double")).as("dup_fraction"))
  }

  /** Temperature-style mixture rebalancing: downsample over-represented
    * groups (language, source domain, …) toward a flatter mixture. Each
    * group keeps rate min(1, sqrt(nRef / n_g)) — the α = 0.5 "temperature"
    * damping of multilingual-sampling fame — so a group at the reference
    * count passes untouched and a 100× over-represented one keeps 10%.
    *
    * The rate depends ONLY on the group's own count (no global
    * normalizer), which keeps the math a pure per-group expression:
    * correctly-rounded sqrt + one IEEE division, bit-identical across
    * engines and runs — no cross-partition float summation whose order
    * could flip a threshold. Row selection reuses the q53 content-hash
    * scheme (first 16 bits of md5(text) vs the group threshold quantized
    * to 1/65536), so the sample is shuffle-free given the rates, stable
    * under re-sharding, and dedup-commuting.
    *
    * Shape: one count aggregation (partial-agg collapses map-side), rates
    * broadcast back, codegen filter. With group cardinality beyond
    * broadcast range (tens of millions of domains) drop the hint and the
    * same plan runs as a shuffled equi-join — rates stay a tiny side.
    */
  def dampedMixtureSample(df: DataFrame, textCol: String, groupCol: String,
                          nRef: Long): DataFrame = {
    val rates = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"))
      .select(col(groupCol),
        floor(least(lit(1.0), sqrt(lit(nRef.toDouble) / col("_n"))) * 65536)
          .cast("int").as("_thr"))
    val hv = conv(substring(md5(col(textCol)), 1, 4), 16, 10).cast("int")
    df.join(broadcast(rates), Seq(groupCol))
      .filter(hv < col("_thr"))
      .drop("_thr")
  }

  /** PII redaction for training corpora: emails, IPv4 addresses, and
    * phone-shaped digit runs become typed placeholder tokens. A pure
    * codegen regexp_replace chain (no UDF), ordered so earlier rewrites
    * cannot manufacture later matches' inputs (emails first — their local
    * part may contain digit runs; IPs before phones — dotted quads would
    * otherwise phone-match). Patterns are deliberately RE2-compatible
    * (no lookaround/backrefs), so other engines replay them verbatim —
    * the q55 oracle runs the same three in DuckDB.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    val ip = regexp_replace(email,
      "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "[IP]")
    regexp_replace(ip, "\\+?[0-9][0-9() .-]{7,}[0-9]", "[PHONE]")
  }

  /** Extended Gopher rules — the repetition block of Rae et al. 2021
    * §A1.1 that [[gopherRules]]'s length/ratio checks don't cover:
    *  - duplicate-line fraction ≤ 0.30 (templated/boilerplate pages),
    *  - ellipsis-line fraction ≤ 0.30 (truncated "read more" scrapes),
    *  - bullet-line fraction ≤ 0.90 (list-only pages),
    *  - top-2-gram character coverage ≤ 0.20 (fraction of the document's
    *    characters attributable to its single most frequent word bigram —
    *    looping generations and repeated headers score high; ties break
    *    to the lexicographically smallest gram so the verdict is
    *    deterministic).
    *
    * Shape: the three line rules are pure codegen projections over ONE
    * bound line array (the HOF-CSE lesson — an inlined split would
    * re-split per rule). Top-2-gram coverage is the q64 budget class:
    * explode bigrams → (doc, gram) counts (partial-agg collapses repeats
    * map-side) → per-doc `min_by` top-1 (a second aggregation, never a
    * window over the raw grams) → one doc-keyed join back. Nothing
    * row-shaped reaches the driver; the gram shuffle carries distinct
    * (doc, gram) pairs only.
    */
  def gopherExtendedRules(df: DataFrame, idCol: String, textCol: String,
                          maxDupLineFrac: Double = 0.30,
                          maxEllipsisLineFrac: Double = 0.30,
                          maxBulletLineFrac: Double = 0.90,
                          maxTop2GramFrac: Double = 0.20): DataFrame = {
    val lines = col("_ge_lines")
    val nL = greatest(size(lines), lit(1)).cast("double")
    def isBullet(l: Column): Column = {
      val t = trim(l)
      t.startsWith("- ") || t.startsWith("* ") || t.startsWith("• ")
    }
    val base = df
      .withColumn("_ge_lines",
        filter(split(col(textCol), "\n"), l => trim(l) =!= ""))
      .withColumn("dup_line_frac",
        lit(1.0) - size(array_distinct(lines)).cast("double") / nL)
      .withColumn("ellipsis_line_frac",
        size(filter(lines, l => trim(l).endsWith("..."))).cast("double") / nL)
      .withColumn("bullet_line_frac",
        size(filter(lines, isBullet(_))).cast("double") / nL)
      .drop("_ge_lines")

    // top-2-gram coverage: bigram strings built by zipping the token
    // array with its own tail (both are per-row ARGUMENTS, evaluated
    // once — only the cheap concat lambda runs per element)
    val t = col("_ge_toks")
    val grams = df
      .select(col(idCol), tokens(col(textCol)).as("_ge_toks"))
      .select(col(idCol), explode(filter(
        zip_with(t, slice(t, lit(2), greatest(size(t) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b)),
        g => g.isNotNull)).as("_g"))
    val counts = grams.groupBy(col(idCol), col("_g"))
      .agg(count(lit(1)).as("_c"))
    val top = counts.groupBy(col(idCol))
      .agg(min_by(struct(col("_c"), col("_g")),
        struct((-col("_c")).as("nc"), col("_g"))).as("_t2"))
      .select(col(idCol),
        (col("_t2._c") * length(col("_t2._g"))).cast("double").as("_ge_cov"))

    base.join(top, Seq(idCol), "left")
      .withColumn("top2gram_frac",
        coalesce(col("_ge_cov") / greatest(length(col(textCol)), lit(1)),
          lit(0.0)))
      .drop("_ge_cov")
      .withColumn("rule_dup_lines", col("dup_line_frac") <= maxDupLineFrac)
      .withColumn("rule_ellipsis_lines",
        col("ellipsis_line_frac") <= maxEllipsisLineFrac)
      .withColumn("rule_bullet_lines",
        col("bullet_line_frac") <= maxBulletLineFrac)
      .withColumn("rule_top2gram", col("top2gram_frac") <= maxTop2GramFrac)
      .withColumn("ext_pass",
        col("rule_dup_lines") && col("rule_ellipsis_lines") &&
          col("rule_bullet_lines") && col("rule_top2gram"))
  }

  /** Encoding-noise quality probe — the mojibake filter every scraped
    * corpus needs: documents carrying U+FFFD replacement characters (a
    * decoder already gave up on their bytes) or C0/DEL control characters
    * (binary junk, terminal escapes) are flagged before they poison
    * tokenization downstream.
    *
    * Counts go through `translate` + `length` — codegen'd single-pass
    * string ops, no regex engine, no per-char lambda (the q40 lesson
    * twice over). Tab/newline/carriage-return are NOT counted as control
    * noise (they are legitimate document structure). `enc_pass` = zero
    * replacement chars and control ratio ≤ `maxCtrlRatio`.
    */
  def encodingQuality(df: DataFrame, textCol: String,
                      maxCtrlRatio: Double = 0.001): DataFrame = {
    val t = col(textCol)
    // C0 minus \t\n\r, plus DEL — as one translate alphabet
    val ctrlChars = ((1 to 31).filterNot(Seq(9, 10, 13).contains) :+ 127)
      .map(_.toChar).mkString
    val fffd = (length(t) - length(translate(t, "\uFFFD", ""))).cast("long")
    val ctrl = (length(t) - length(translate(t, ctrlChars, ""))).cast("long")
    df.withColumn("fffd_count", fffd)
      .withColumn("ctrl_count", ctrl)
      .withColumn("ctrl_ratio",
        ctrl.cast("double") / greatest(length(t), lit(1)))
      .withColumn("enc_pass",
        col("fffd_count") === 0 && col("ctrl_ratio") <= maxCtrlRatio)
  }

  /** Repeated-n-gram fraction (default bigrams): 1 − distinct/total grams —
    * the standard repetition quality signal for pretraining corpora
    * (boilerplate and looping generations score high). Pure per-row
    * projection; null for documents with fewer than `n` tokens.
    *
    * Distinct-gram counting goes through the fused
    * [[graft.plans.ShingleHashes]] loop (the gram-string form evaluated
    * `element_at(split(...))` per gram inside an interpreted lambda —
    * quadratic per document); values are identical modulo 64-bit gram-hash
    * collisions. Requires `GraftExtensions.register` on the session.
    */
  def repetitionRatio(text: Column, n: Int = 2): Column = {
    val toks = tokens(text)
    val nGrams = size(toks) - (n - 1)
    val distinct = size(call_function("shingle_hashes",
      transform(toks, t => xxhash64(t)), lit(n)))
    when(size(toks) < n, lit(null).cast("double"))
      .otherwise(lit(1.0) - distinct.cast("double") / nGrams)
  }

  /** EXACT corpus heavy hitters — every token with frequency ≥ total/k —
    * without ever shuffling the full token stream (vocabulary census for
    * tokenizer training, stopword discovery, boilerplate-term detection).
    *
    * The naive `explode → groupBy(term)` shuffles one row per occurrence
    * (~10¹³ at 100 TB) with hot-term key skew ("the" ≈ 5% of the corpus on
    * one reducer). Two passes instead:
    *
    *  1. candidate pass: a `capacity`-counter [[graft.plans.MisraGriesKeys]]
    *     sketch over per-row word-hash arrays — map-side partial sketches
    *     merge to ONE ≤ `capacity`-entry summary (no occurrence shuffle;
    *     the driver sees ≤ `capacity` longs, a fixed-size collect). The MG
    *     bound guarantees the sketch keys are a superset of the true ≥ n/k
    *     items whenever `capacity ≥ k`.
    *  2. exact pass: re-scan with a broadcast `isin` on the candidate
    *     hashes (Catalyst converts to an O(1) InSet inside codegen) and
    *     exact-count only surviving occurrences — the groupBy shuffle
    *     carries occurrences of ≤ `capacity` terms instead of all of them.
    *
    * The threshold compare is integer-exact (`cnt·k ≥ total`), so results
    * are deterministic and engine-portable even though sketch contents
    * depend on partition merge order. Total token count rides the sketch
    * aggregation (same job, no extra scan).
    *
    * @return (`term`, `cnt`) for every term with cnt·k ≥ total tokens.
    */
  def heavyHitters(df: DataFrame, textCol: String, k: Int,
                   capacity: Int = 2048): DataFrame = {
    require(capacity >= k,
      s"capacity $capacity < k $k voids the MG superset guarantee")
    graft.plans.GraftExtensions.register(df.sparkSession)
    val toks = tokens(col(textCol))
    val sketchRow = df
      .select(transform(toks, t => xxhash64(t)).as("_wh"))
      .agg(call_function("misra_gries_keys", col("_wh"), lit(capacity))
             .as("_cand"),
           sum(size(col("_wh")).cast("long")).as("_total"))
      .collect()(0)
    val cand = sketchRow.getSeq[Long](0)
    val total = if (sketchRow.isNullAt(1)) 0L else sketchRow.getLong(1)
    df.select(explode(toks).as("term"))
      .filter(xxhash64(col("term")).isin(cand: _*))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(k.toLong) >= lit(total))
  }

  /** Per-group vocabulary drift: KL divergence of each group's unigram
    * distribution from the corpus distribution, restricted to the EXACT
    * heavy-hitter vocabulary (frequency ≥ total/k) — the standard corpus
    * health monitor (a crawl source gone boilerplate, a mixture slice
    * drifting from the blend) with a sketch-bounded term set, so nothing
    * about the computation grows with the long-tail vocabulary.
    *
    * Shape: one [[graft.plans.MisraGriesKeys]] candidate pass (the
    * [[heavyHitters]] contract), then ONE re-scan whose explode is
    * filtered to candidates before its (group, term) aggregation — term
    * totals, the exact vocabulary cut, per-group totals, and the KL sum
    * are all computed over that aggregate, never re-touching the corpus.
    * KL terms where a group lacks a vocab term contribute 0 (the p·ln p
    * limit), so the join stays inner.
    *
    * @return one row per group: (`groupCol`, `kl`, `n_terms` — vocab terms
    *         the group actually uses).
    */
  def vocabularyDrift(df: DataFrame, groupCol: String, textCol: String,
                      k: Int = 500, capacity: Int = 2048): DataFrame = {
    require(capacity >= k,
      s"capacity $capacity < k $k voids the MG superset guarantee")
    graft.plans.GraftExtensions.register(df.sparkSession)
    val toks = tokens(col(textCol))
    val sketchRow = df
      .select(transform(toks, t => xxhash64(t)).as("_wh"))
      .agg(call_function("misra_gries_keys", col("_wh"), lit(capacity))
             .as("_cand"),
           sum(size(col("_wh")).cast("long")).as("_total"))
      .collect()(0)
    val cand = sketchRow.getSeq[Long](0)
    val total = if (sketchRow.isNullAt(1)) 0L else sketchRow.getLong(1)
    val srcCounts = df
      .select(col(groupCol), explode(toks).as("_term"))
      .filter(xxhash64(col("_term")).isin(cand: _*))
      .groupBy(col(groupCol), col("_term")).agg(count(lit(1)).as("_scnt"))
    val vocab = srcCounts.groupBy(col("_term"))
      .agg(sum(col("_scnt")).as("_cnt"))
      .filter(col("_cnt") * lit(k.toLong) >= lit(total))
    val vtot = vocab.agg(sum(col("_cnt")).as("_vtot"))
    val stot = srcCounts.join(vocab, Seq("_term"))
      .groupBy(col(groupCol)).agg(sum(col("_scnt")).as("_stot"))
    val pSrc = col("_scnt").cast("double") / col("_stot")
    val pCorpus = col("_cnt").cast("double") / col("_vtot")
    srcCounts.join(vocab, Seq("_term"))
      .join(stot, Seq(groupCol))
      .crossJoin(broadcast(vtot))
      .groupBy(col(groupCol))
      .agg(sum(pSrc * log(pSrc / pCorpus)).as("kl"),
           count(lit(1)).as("n_terms"))
  }

  /** Per-document bigram language-model score: the tf-weighted mean
    * conditional log-probability ln(c(w₁w₂)/c(w₁·)) over the document's
    * bigram occurrences — a sharper fluency/perplexity signal than the
    * unigram form (q68): word-salad text scores low even when its unigrams
    * are common.
    *
    * Same scale shape as [[unigramLogProb]] after its round-7 restructure:
    * collapse to (doc, bigram, tf) FIRST (map-side partial agg), compute
    * corpus bigram counts over that aggregate, and left-context counts
    * c(w₁·) by re-aggregating the BIGRAM count table on its first word —
    * the corpus explode is scanned once; every downstream join probes
    * aggregates. Documents with fewer than 2 tokens get no row (no bigrams
    * exist — callers left-join if they need nulls).
    */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val bigrams = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat_ws(" ", a, b))
    val tf = df.filter(size(toks) >= 2)
      .select(col(idCol), explode(bigrams).as("_bg"))
      .groupBy(col(idCol), col("_bg")).agg(count(lit(1)).as("_tf"))
    val cb = tf.groupBy(col("_bg")).agg(sum(col("_tf")).as("_cb"))
      .withColumn("_w1", substring_index(col("_bg"), " ", 1))
    val cw = cb.groupBy(col("_w1")).agg(sum(col("_cb")).as("_cw"))
    tf.join(cb, Seq("_bg")).join(cw, Seq("_w1"))
      .groupBy(col(idCol))
      .agg((sum(col("_tf") * log(col("_cb").cast("double") / col("_cw")))
        / sum(col("_tf"))).as("logprob"))
  }

  /** PMI collocation mining: the corpus's top-k adjacent word pairs by
    * pointwise mutual information ln(p(w₁w₂) / (p(w₁)·p(w₂))) — the
    * classic "New York"/"machine learning" detector, and the standard
    * phrase-vocabulary builder for tokenizer/embedding pipelines.
    * `minCount` floors the bigram count first: PMI's known pathology is
    * that hapax pairs of hapax words score ln(N) — rarity, not
    * association.
    *
    * Shape: unigram and bigram corpus counts are two partial-aggregated
    * explodes (hot tokens collapse map-side, as [[vocabulary]]); the
    * count-floor prunes the bigram table BEFORE both term-keyed count
    * joins (at minCount ≥ 2 that drops the hapax long tail — typically
    * most of the table); corpus totals derive from the two count
    * aggregates themselves (no re-scan of either explode) and ride in as
    * one broadcast scalar row. PMI itself is ln() over a single double
    * division of exact integer products — same-operand-order replayable —
    * snapped to the 1e-6 grid BEFORE ranking (the suite's k-means/q84
    * convention: engine ln() ulps must not reorder the top-k), and the
    * top-k is `TakeOrderedAndProject` — no global sort materializes.
    */
  def pmiCollocations(df: DataFrame, textCol: String,
                      minCount: Long = 5L, k: Int = 50): DataFrame = {
    val toks = tokens(col(textCol))
    val bigrams = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat_ws(" ", a, b))
    val cw = df.select(explode(toks).as("_w"))
      .filter(col("_w") =!= "")
      .groupBy(col("_w")).agg(count(lit(1)).as("_cw"))
    val cbAll = df.filter(size(toks) >= 2)
      .select(explode(bigrams).as("_bg"))
      .groupBy(col("_bg")).agg(count(lit(1)).as("_cb"))
    val cb = cbAll.filter(col("_cb") >= minCount)
      .withColumn("w1", substring_index(col("_bg"), " ", 1))
      .withColumn("w2", substring_index(col("_bg"), " ", -1))
    val totals = broadcast(cw.agg(sum(col("_cw")).as("_n"))
      .crossJoin(cbAll.agg(sum(col("_cb")).as("_nb"))))
    val pmi = log((col("_cb").cast("double") * col("_n") * col("_n")) /
      (col("_nb").cast("double") * col("_c1") * col("_c2")))
    cb.join(cw.withColumnRenamed("_w", "w1")
        .withColumnRenamed("_cw", "_c1"), Seq("w1"))
      .join(cw.withColumnRenamed("_w", "w2")
        .withColumnRenamed("_cw", "_c2"), Seq("w2"))
      .crossJoin(totals)
      .select(col("w1"), col("w2"), col("_cb").as("pair_count"),
        graft.queries.QueryUtils.fr(pmi, 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Byte-pair-encoding merge induction — the first `nMerges` merges a
    * BPE tokenizer trainer would learn from this corpus: repeatedly count
    * adjacent symbol pairs across the (word, frequency) vocabulary and
    * fuse the most frequent (ties: lexicographically smallest pair), the
    * actual Sennrich et al. algorithm, not a proxy. Fixed merge count
    * keeps it oracle-replayable (the kmeans unroll pattern).
    *
    * Symbols live as space-joined strings with sentinel spaces, so a
    * merge is ONE `replace(" l r " -> " lr ")` — left-to-right
    * non-overlapping, which is BPE's merge order ("a a a" fuses to
    * "aa a", not "a aa") and is implemented identically by Java
    * `replaceAll` and DuckDB `replace`. One divergence from scan-merge
    * BPE, shared by both engines so parity holds: in runs of ≥4 equal
    * symbols the consumed separator shifts WHICH occurrences fuse
    * ("a a a a" → "aa a aa"-style) — a degenerate-run boundary case
    * that does not change learned merges on natural text.
    * Shape: the corpus explodes ONCE into a (word, freq) vocabulary
    * (map-side collapse); each round is one pair-count aggregate over
    * the vocabulary — rows bounded by distinct words, not tokens — and a
    * driver collect of a single winner row (the codebook pattern).
    */
  def bpeMerges(df: DataFrame, textCol: String,
                nMerges: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    var vocab = df.select(explode(tokens(col(textCol))).as("_w"))
      .filter(col("_w") =!= "")
      .groupBy(col("_w")).agg(count(lit(1)).as("_f"))
      .select(concat(lit(" "),
        array_join(split(col("_w"), ""), " "), lit(" ")).as("_s"), col("_f"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    vocab.count()
    val merges = (1 to nMerges).map { rank =>
      val syms = split(trim(col("_s")), " ")
      val pairs = vocab
        .select(col("_f"), explode(zip_with(
          slice(syms, lit(1), size(syms) - 1),
          slice(syms, lit(2), size(syms) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("_p"))
        .groupBy(col("_p.l").as("l"), col("_p.r").as("r"))
        .agg(sum(col("_f")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      require(pairs.nonEmpty, s"corpus exhausted before merge $rank")
      val (l, r, n) = (pairs(0).getString(0), pairs(0).getString(1),
        pairs(0).getLong(2))
      val next = vocab.withColumn("_s",
        regexp_replace(col("_s"),
          java.util.regex.Pattern.quote(s" $l $r "),
          java.util.regex.Matcher.quoteReplacement(s" $l$r ")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count()
      vocab.unpersist(false)
      vocab = next
      (rank.toLong, l, r, s"$l$r", n)
    }
    vocab.unpersist(false)
    merges.toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** Capped inverted index: (term, document frequency, postings) rows for
    * every term appearing in at most `maxDf` documents — the retrieval /
    * contamination-lookup side table. Postings are the ascending doc-id
    * list rendered as a comma-joined string: portable across engines (no
    * array-hash ambiguity) and bounded by `maxDf` by construction.
    *
    * The df cap is the scale design, not a convenience: high-df terms
    * (stopwords) are exactly the postings a relational index stores worst
    * (one giant hot row) and query planners use least (no selectivity) —
    * production systems move them to bitmap/skip-list encodings. Capping
    * makes the collect_list provably bounded: the (term, doc) DISTINCT
    * aggregate collapses repeats map-side, df comes from one more partial
    * agg over it, and only cap-survivors reach the list aggregation.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    maxDf: Long = 100L): DataFrame = {
    val termDoc = df
      .select(col(idCol).cast("long").as("_doc"),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("_doc")).agg(count(lit(1)).as("_tf"))
    val dfCounts = termDoc.groupBy(col("term"))
      .agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") <= maxDf)
    termDoc.join(dfCounts, Seq("term"))
      .groupBy(col("term"), col("doc_freq"))
      .agg(concat_ws(",",
        transform(array_sort(collect_list(col("_doc"))),
          _.cast("string"))).as("postings"))
      .select(col("term"), col("doc_freq"), col("postings"))
  }
}
