package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators: exact (content-hash groupBy), MinHash+LSH
  * (shingle → minhash signature → banded bucket-join → verify), SimHash
  * (64-bit bit-vote fingerprint), and n-gram Jaccard verification.
  *
  * Scale design: every stage is a projection or an equi-key shuffle —
  * candidate generation never compares all pairs. At 100 TB the band
  * bucket-join is the only shuffle (keyed on (band, band_hash)); skewed
  * buckets (boilerplate text) are handled by capping bucket size before the
  * pair explosion (`maxBucketSize`).
  *
  * All hashing is seed-fixed and driver-deterministic, so signatures are
  * reproducible across runs and engines.
  */
object Dedup {

  private val P: Long = 2147483647L // 2^31 - 1, Mersenne prime

  private def ccTimed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    if (sys.env.get("GRAFT_TIMING").contains("1"))
      System.err.println(f"[graft-timing]   $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }


  /** Exact dedup: keep the smallest `idCol` row per distinct content hash.
    *
    * Shape: ONE hash-keyed aggregation with `min_by` carrying the kept
    * row. Partial aggregation collapses duplicates map-side, so the
    * shuffle moves at most one row per (task, distinct hash) — a viral
    * document duplicated millions of times reduces inside each scan task
    * instead of serializing its copies through one reducer (the window/
    * row_number form shuffles EVERY row and sorts the hot hash's copies
    * in a single task's partition).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cols = df.columns.toSeq
    df.groupBy(md5(col(textCol).cast("string")).as("_h"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("_row"))
      .select(col("_row.*"))
  }

  /** Word n-gram shingles (lowercased) of the text column. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(1), size(toks) - n + 1),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** MinHash signatures via explode + partial aggregation: one row per
    * (doc, shingle), then a single groupBy computing all `numHashes` mins at
    * once. For each universal hash h_i(x) = (a_i x + b_i) mod P the
    * arithmetic stays below 2^62 — safe under ANSI overflow checking.
    *
    * Shape notes (each measured to matter):
    *  - shingles are hashed NUMERICALLY — hash each word once, combine each
    *    n-window with a rolling polynomial mod P; building n-gram STRINGS
    *    first materializes gigabytes of transient text at corpus scale;
    *  - the word-hash array is materialized ONCE per document in a
    *    projection below the explode. Referencing the `transform(...)`
    *    expression n times (one per element_at of the unrolled polynomial)
    *    re-evaluates the whole word-hash pipeline per reference after
    *    Catalyst collapses projections — keeping it as a bound attribute of
    *    the Generate's child makes element_at O(1);
    *  - shingle INDICES are exploded and the polynomial unrolls to flat
    *    element_at arithmetic (n is a plan-time constant) — a
    *    slice+aggregate per shingle allocates a sub-array and runs a lambda
    *    fold per shingle, which dominated the signature stage;
    *  - no distinct pass: duplicate shingles cannot change a min-aggregate.
    *
    * Returns (`id`, `minhash` array).
    */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int, shingleSize: Int,
                        carry: Seq[String] = Nil): DataFrame = {
    // One fused codegen loop per document (plans.MinHashSignature): word
    // hashes → rolling-polynomial shingle hashes → all `numHashes` mins,
    // NARROW (no shingle explosion, no groupBy shuffle). Signatures are
    // bit-identical to the explode + min-aggregate formulation this
    // replaced — same seed-fixed family (MinHashSignature.params), same
    // per-step mod — whose
    // shape notes live in git history; at corpus scale the explode form
    // shuffled ~tokens×docs rows where this streams one row per doc.
    graft.plans.GraftExtensions.register(df.sparkSession)
    val toks = split(trim(lower(col(textCol))), "\\s+")
    df.select((col(idCol).as("id") +:
      call_function("minhash_sig",
        transform(toks, t => pmod(xxhash64(t), lit(P))),
        lit(numHashes), lit(shingleSize)).as("minhash") +:
      carry.map(col)): _*)
  }

  /** Signatures plus banded bucket hashes: (`id`, `minhash`, `bands`)
    * plus any `carry` columns passed through untouched (e.g. an event-time
    * column for the streaming form).
    */
  def withMinHash(df: DataFrame, idCol: String, textCol: String, numHashes: Int,
                  bands: Int, shingleSize: Int,
                  carry: Seq[String] = Nil): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val rows = numHashes / bands
    val bandHashes = array((0 until bands).map { b =>
      xxhash64(concat_ws(",",
        slice(col("minhash"), b * rows + 1, rows)), lit(b))
    }: _*)
    minHashSignatures(df, idCol, textCol, numHashes, shingleSize, carry)
      .withColumn("bands", bandHashes)
  }

  /** LSH candidate pairs with estimated Jaccard (fraction of agreeing
    * signature positions), filtered at `threshold`. Shuffles only on band
    * hashes; `maxBucketSize` caps degenerate buckets before the pairwise
    * explosion (boilerplate-skew guard for 100 TB corpora).
    */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 64, bands: Int = 16,
                      shingleSize: Int = 5, threshold: Double = 0.5,
                      maxBucketSize: Int = 1000): DataFrame = {
    val sigs = withMinHash(df.select(col(idCol), col(textCol)), idCol, textCol,
        numHashes, bands, shingleSize)
      .select(col("id"), col("minhash"),
        posexplode(col("bands")).as(Seq("band", "bh")))
    val bw = Window.partitionBy("band", "bh").orderBy("id")
    val capped = sigs
      .withColumn("_bn", row_number().over(bw))
      .filter(col("_bn") <= maxBucketSize)
      .drop("_bn")
    val a = capped.select(col("band"), col("bh"),
      col("id").as("id_a"), col("minhash").as("ma"))
    val b = capped.select(col("band"), col("bh"),
      col("id").as("id_b"), col("minhash").as("mb"))
    // est_jaccard is computed IMMEDIATELY after the band join and the
    // signature arrays dropped, so the dedup exchange — the stage with the
    // most rows (every band collision, duplicated per matching band) —
    // shuffles bare (id_a, id_b, est) rows, and sub-threshold pairs are
    // filtered before that shuffle rather than after it. The band join's
    // two inputs are identical subplans, so Catalyst's exchange reuse
    // computes the signature aggregation once.
    a.join(b, Seq("band", "bh")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(size(filter(zip_with(col("ma"), col("mb"),
          (x, y) => when(x === y, 1).otherwise(0)), v => v === 1))
          .cast("double") / numHashes, 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b", "est_jaccard")
  }

  /** Persist the banded MinHash index of a corpus as a BUCKETED managed
    * table — the persisted-index form of near-dup dedup, the q54 / edge-
    * table build/probe shape applied to the dedup family. At 100 TB the
    * MinHash signature pass is the expensive corpus scan (tokenize +
    * shingle + `numHashes` mins per document); every incremental dedup
    * run re-pays it unless the banded signatures are a stored table
    * written ONCE at corpus-build time and probed by each incoming batch.
    *
    * Layout: one row per (document, band) — (`id`, `minhash`, `band`,
    * `bh`) — bucketed by the FULL band-join key pair (`band`, `bh`), so a
    * probe batch's band join shuffles ONLY the batch side: the corpus
    * side's scan partitioning equals the join's required clustering
    * exactly and reads its buckets in place. (Bucketing by `bh` alone is
    * semantically sufficient but Spark's conservative co-partition
    * default — requireAllClusterKeysForCoPartition — would re-shuffle
    * it.) Degenerate buckets (boilerplate text shared by millions
    * of documents) are capped at `maxBucketSize` rows at build time, the
    * same skew guard as [[minHashLshPairs]] — a deployment dedups the
    * corpus FIRST (q41/q75) and indexes the kept documents, so verbatim
    * groups don't exist on the index side by construction.
    *
    * Returns the number of indexed documents. Freshness is the caller's
    * contract (probe answers are about the indexed snapshot); rebuild =
    * call again (drop-and-replace, `Exporter.writeBucketed` semantics,
    * non-atomic).
    */
  def buildLshIndex(docs: DataFrame, table: String, idCol: String,
                    textCol: String, numHashes: Int = 64, bands: Int = 16,
                    shingleSize: Int = 5, numBuckets: Int = 32,
                    maxBucketSize: Int = 100000): Long = {
    val sigs = withMinHash(docs.select(col(idCol), col(textCol)), idCol,
        textCol, numHashes, bands, shingleSize)
      .select(col("id"), col("minhash"),
        posexplode(col("bands")).as(Seq("band", "bh")))
    val bw = Window.partitionBy("band", "bh").orderBy("id")
    val capped = sigs
      .withColumn("_bn", row_number().over(bw))
      .filter(col("_bn") <= maxBucketSize)
      .drop("_bn")
    Exporter.writeBucketed(capped, table, Seq("band", "bh"), numBuckets,
      sortCols = Seq("band", "bh", "id"))
    docs.sparkSession.table(table).select(col("id")).distinct().count()
  }

  /** Probe a new batch of documents against a persisted LSH index (built
    * by [[buildLshIndex]] with the SAME (numHashes, bands, shingleSize) —
    * signatures are parameter-specific): returns candidate near-dup pairs
    * (`probe_id`, `index_id`, `est_jaccard`) at or above `threshold`,
    * deduplicated across bands. The batch side is signature-hashed here
    * (one narrow codegen pass, linear in the batch); the corpus side is
    * ONLY the index table scan — no corpus text is touched, no corpus
    * shuffle happens (see the bucketing contract on [[buildLshIndex]]).
    * Callers wanting exact Jaccard verify the candidates against the
    * stored documents afterwards (q347's shape, mirroring q41's
    * estimate-prefilter-then-exact-verify contract).
    */
  def lshIndexProbe(spark: org.apache.spark.sql.SparkSession, table: String,
                    batch: DataFrame, idCol: String, textCol: String,
                    numHashes: Int = 64, bands: Int = 16,
                    shingleSize: Int = 5,
                    threshold: Double = 0.5): DataFrame = {
    val idx = spark.table(table)
    val probe = withMinHash(batch.select(col(idCol), col(textCol)), idCol,
        textCol, numHashes, bands, shingleSize)
      .select(col("id").as("probe_id"), col("minhash").as("_pm"),
        posexplode(col("bands")).as(Seq("band", "bh")))
    // estimate immediately after the band join, signature arrays dropped
    // before the cross-band dedup shuffle (minHashLshPairs' ordering)
    idx.join(probe, Seq("band", "bh"))
      .filter(col("probe_id") =!= col("id"))
      .select(col("probe_id"), col("id").as("index_id"),
        round(size(filter(zip_with(col("_pm"), col("minhash"),
          (x, y) => when(x === y, 1).otherwise(0)), v => v === 1))
          .cast("double") / numHashes, 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .dropDuplicates("probe_id", "index_id")
  }

  /** The full incoming-batch near-dup SCREEN against a persisted LSH
    * index (q347's gate shape, shared with the scale probe): LSH
    * candidates from [[lshIndexProbe]] at `estThreshold`, exact-verified
    * at `jacThreshold` over fused 64-bit shingle hashes (intersection /
    * union sizes match string shingles — q41's verify contract), reduced
    * to each batch document's BEST corpus match (max exact jaccard, ties
    * to the smallest corpus id). Output is linear in the batch — the
    * keep/drop decision a crawl-ingest pipeline wants — never a
    * quadratic pair list. `docs` must carry text for BOTH sides'
    * candidate ids.
    *
    * Two q41 devices keep every stage sized by DISTINCT texts, not rows:
    *  - the batch decomposes over exact-duplicate text groups —
    *    signatures, band collisions, and exact jaccard are functions of
    *    the text alone, so ONE representative per distinct batch text is
    *    screened and its answer copied to its group (a verbatim-heavy
    *    re-crawl feed collapses before it touches the index);
    *  - the candidate list is materialized as LOCAL rows and broadcast:
    *    it feeds the id restriction AND both verify joins, so it must
    *    compute exactly once, and shingles are computed ONLY for
    *    candidate documents — shingling the full corpus for a candidate
    *    list orders of magnitude smaller was q41's dominant stage.
    * Index the corpus DEDUPED (see q347: `Dedup.exact` before
    * [[buildLshIndex]] — value-neutral, since the (max jac, min id) best
    * match is always an exact-dedup representative) and the local
    * candidate rows are (distinct batch texts × matching distinct corpus
    * texts) — linear in distinct batch texts at any corpus scale.
    */
  def nearDupScreen(spark: org.apache.spark.sql.SparkSession, table: String,
                    batch: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, numHashes: Int = 64, bands: Int = 16,
                    shingleSize: Int = 5, estThreshold: Double = 0.35,
                    jacThreshold: Double = 0.5): DataFrame = {
    graft.plans.GraftExtensions.register(spark)
    // group key is (length, xxhash64), q41's collision guard: a bare
    // 64-bit collision between distinct texts would silently merge groups
    val withH = batch.select(col(idCol), col(textCol),
      xxhash64(col(textCol)).as("_h"), length(col(textCol)).as("_hl"))
    val groups = withH.groupBy(col("_h"), col("_hl"))
      .agg(min(col(idCol)).as("_rep"))
    val members = withH.join(broadcast(groups), Seq("_h", "_hl"))
      .select(col(idCol).as("_member"), col("_rep"))
    val repBatch = withH
      .join(broadcast(groups.select(col("_rep").as(idCol))), idCol)
      .select(col(idCol), col(textCol))
    val candRaw = lshIndexProbe(spark, table, repBatch, idCol, textCol,
        numHashes, bands, shingleSize, estThreshold)
      .select(col("probe_id"), col("index_id"))
    val cand = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(candRaw.collect().toIndexedSeq, 1),
      candRaw.schema))
    val candIds = cand.select(col("probe_id").as("_vid"))
      .union(cand.select(col("index_id").as("_vid"))).distinct()
    val vtoks = split(trim(lower(col(textCol))), "\\s+")
    val sh = docs.join(broadcast(candIds), col(idCol) === col("_vid"))
      .select(col("_vid"),
        call_function("shingle_hashes",
          transform(vtoks, t => xxhash64(t)), lit(shingleSize)).as("sh"))
    val jacRaw = size(array_intersect(col("_sa"), col("_sb"))).cast("double") /
      size(array_union(col("_sa"), col("_sb")))
    // portable floor rounding (QueryUtils.fr's formula): identical op
    // sequence on both engines at representation boundaries
    val jac = floor(jacRaw * lit(1e4) + lit(0.5)) / lit(1e4)
    val verified = cand
      .join(sh.select(col("_vid").as("probe_id"), col("sh").as("_sa")),
        "probe_id")
      .join(sh.select(col("_vid").as("index_id"), col("sh").as("_sb")),
        "index_id")
      .select(col("probe_id"), col("index_id"), jac.as("jac"))
      .filter(col("jac") >= jacThreshold)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("jac").desc, col("index_id"))
    val repBest = verified.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("probe_id").as("_rep"),
        col("index_id").as("dup_of"), col("jac"))
    // expansion: every member of a screened group inherits its rep's
    // best match — identical text, identical jaccard against everything
    members.join(repBest, "_rep")
      .select(col("_member").as("doc_id"), col("dup_of"), col("jac"))
  }

  /** 64-bit SimHash over whitespace tokens: per bit, tokens vote +1/-1 by
    * their hash bit; the sign of the vote total becomes the fingerprint bit.
    * Near-duplicates land within small Hamming distance.
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hs = transform(split(trim(lower(col(textCol))), "\\s+"), t => xxhash64(t))
    val fp = (0 until 64).map { i =>
      val vote = aggregate(hs, lit(0L), (acc, h) =>
        acc + (shiftrightunsigned(h, i).bitwiseAND(lit(1L)) * 2L - 1L))
      when(vote > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    df.select(col(idCol), fp.as("simhash"))
  }

  /** Oracle-parity SimHash variant: identical bit-vote semantics, but the
    * per-token 64-bit hash derives from md5's hex digits (bit i = bit
    * (i mod 4) of hex digit i/4), so an ANSI SQL engine can reproduce the
    * fingerprint exactly (no xxhash64 outside Spark). `simHash` stays the
    * scale default — one fused token hash versus 16 substring/conv
    * evaluations here — this form exists to make the fingerprint operator
    * hash-checkable against an external engine.
    */
  def simHashMd5(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hs = transform(split(trim(lower(col(textCol))), "\\s+"), t => md5(t))
    val fp = (0 until 64).map { i =>
      val vote = aggregate(hs, lit(0L), (acc, h) => {
        val d = conv(substring(h, 1 + i / 4, 1), 16, 10).cast("long")
        acc + (shiftright(d, i % 4).bitwiseAND(lit(1L)) * 2L - 1L)
      })
      when(vote > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    df.select(col(idCol), fp.as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-pairs within `maxHamming`, bucketed by 16-bit chunks
    * (pigeonhole: ≤3 differing bits ⇒ at least one of 4 chunks identical),
    * so candidate generation is an equi-join, not a cross join.
    */
  def simHashNearPairs(df: DataFrame, idCol: String, textCol: String,
                       maxHamming: Int = 3): DataFrame = {
    val sigs = simHash(df, idCol, textCol)
      .select(col(idCol).as("id"), col("simhash"))
    val chunked = sigs.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))
      ): _*)).as(Seq("chunk", "ch")))
    val a = chunked.select(col("chunk"), col("ch"),
      col("id").as("id_a"), col("simhash").as("sa"))
    val b = chunked.select(col("chunk"), col("ch"),
      col("id").as("id_b"), col("simhash").as("sb"))
    a.join(b, Seq("chunk", "ch")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDist(col("sa"), col("sb")).as("hamming"))
      .filter(col("hamming") <= maxHamming) // before the dedup shuffle
      .dropDuplicates("id_a", "id_b")
  }

  /** Exact n-gram Jaccard similarity for a pair of text columns (the verify
    * stage behind minhash candidates).
    */
  def ngramJaccard(a: Column, b: Column, n: Int): Column = {
    val sa = array_distinct(shingles(a, n))
    val sb = array_distinct(shingles(b, n))
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb))
  }

  /** Edit-distance verify stage for near-dup candidate pairs: annotates a
    * pair frame with the exact Levenshtein distance and a normalized
    * similarity `1 - dist / max(len)`. The DP is O(|a|·|b|) per pair, so
    * this belongs strictly AFTER a blocking stage ([[minHashLshPairs]],
    * [[simHashNearPairs]], or a cheap prefix block) has bounded the pair
    * set — never on a raw cross join. Pure codegen'd expressions
    * (`levenshtein` is a built-in), no shuffle of its own.
    */
  def editDistanceVerify(pairs: DataFrame, leftText: Column,
                         rightText: Column): DataFrame = {
    val dist = levenshtein(leftText, rightText).cast("long")
    pairs
      .withColumn("edit_dist", dist)
      .withColumn("edit_sim",
        lit(1.0) - col("edit_dist").cast("double") /
          greatest(length(leftText), length(rightText)).cast("double"))
  }

  /** C4-style PARAGRAPH-level dedup: every duplicate paragraph across the
    * corpus is removed, keeping its first occurrence in (document id,
    * position) order; documents are reassembled from their surviving
    * paragraphs (a document whose every paragraph was seen before drops
    * entirely — the C4 convention).
    *
    * Scale shape: the keeper choice is the same map-side `min_by` collapse
    * as [[exact]] — one hash-keyed partial aggregate, so a boilerplate
    * paragraph repeated a million times collapses inside scan tasks
    * instead of sorting a million copies through a window; reassembly is
    * one groupBy over the surviving (doc, pos) rows with an in-row
    * array_sort (never a cross-row ordered agg).
    */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
                     sep: String = "\n\n"): DataFrame = {
    val paras = df.select(col(idCol).cast("long").as("id"),
      posexplode(split(col(textCol),
        java.util.regex.Pattern.quote(sep))).as(Seq("pos", "para")))
    val keep = paras.groupBy(col("para"))
      .agg(min_by(struct(col("id"), col("pos")),
        struct(col("id"), col("pos"))).as("k"))
      .select(col("k.id").as("id"), col("k.pos").as("pos"))
    paras.join(keep, Seq("id", "pos"))
      .groupBy(col("id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("para")))),
          x => x.getField("para")), sep).as("_text"))
      .select(col("id").as(idCol), col("_text").as(textCol))
  }

  /** Corpus-frequency boilerplate line removal (the C4/CCNet "remove
    * lines repeated across many pages" pass): a LINE is boilerplate iff
    * it occurs in more than `maxDocFreq` distinct documents — cookie
    * banners, nav menus, copyright footers — and every occurrence of a
    * boilerplate line is stripped from every document. Differs from
    * [[paragraphDedup]] on both axes: the unit is the line, and the
    * verdict is frequency-based removal everywhere, not keep-first.
    *
    * Scale shape: lines hash to 64-bit keys in the same projection that
    * splits them (8-byte shuffle keys, never a line-string exchange —
    * the q41/q61 lesson). Document frequency needs per-doc distinct
    * first (a line repeated inside ONE page is not corpus boilerplate),
    * which is a (doc, hash) aggregate whose partial phase collapses
    * in-doc repeats map-side. The boilerplate set itself is tiny by
    * construction (lines with DF > threshold are precisely the ones a
    * few templates stamp everywhere), so the strip is an anti-join
    * against a small frame; reassembly is the [[paragraphDedup]]
    * groupBy + in-row array_sort, never a cross-row ordered agg.
    * Exact modulo 64-bit line-hash collisions (the q31 caveat).
    *
    * @return one row per input document: (`idCol`, `clean_text`,
    *         `n_lines`, `n_removed`); a fully-boilerplate document
    *         keeps an empty `clean_text`.
    */
  def boilerplateLines(df: DataFrame, idCol: String, textCol: String,
                       maxDocFreq: Long, sep: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol).cast("long").as("id"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(sep))).as(Seq("pos", "line")))
      .withColumn("_h", xxhash64(col("line")))
    val docFreq = lines.select(col("id"), col("_h")).distinct()
      .groupBy(col("_h")).agg(count(lit(1)).as("_df"))
    val hot = docFreq.filter(col("_df") > maxDocFreq).select(col("_h"))
    val kept = lines.join(hot, Seq("_h"), "left_anti")
      .groupBy(col("id"))
      .agg(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), sep).as("clean_text"),
        count(lit(1)).as("_n_kept"))
    df.select(col(idCol).cast("long").as("id"),
        size(split(col(textCol),
          java.util.regex.Pattern.quote(sep))).cast("long").as("n_lines"))
      .join(kept, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("_n_kept"), lit(0L))).as("n_removed"))
  }

  /** Incremental cross-corpus dedup: rows of `batch` whose `textCol` does
    * NOT already occur in the `seen` corpus — the every-crawl-refresh
    * operation of a training-data pipeline (dedup the new crawl against
    * everything already ingested, without re-shuffling the old corpus
    * alongside the new one).
    *
    * Shape: the seen corpus is summarized once into a fixed-size Bloom
    * sketch over `xxhash64(text)` (a distributed aggregate — rows never
    * leave the executors, the driver receives only the merged bitmap).
    * The batch is then split map-side by `bloom_might_contain`
    * (`plans.BloomMightContainExpr`, codegen'd):
    *
    *  - sketch says NO  → definitively unseen (Bloom has no false
    *    negatives): emitted with NO shuffle at all;
    *  - sketch says YES → possible duplicate (true dup or fpp collision):
    *    only this sliver pays the exact `left_anti` join on the text
    *    itself (which also makes the result exact under 64-bit hash
    *    collisions).
    *
    * At 100 TB the anti-join therefore shuffles ≈ (dup-rate + fpp) of the
    * batch instead of all of it, and the seen side of the join can prune
    * to the matched hash partitions. Size `expectedSeen` to the seen
    * corpus's distinct-count: the sketch is ~1.2 GB per 1e9 items at 1%
    * fpp — tune fpp up to trade join volume for sketch memory.
    *
    * @return `batch` rows not present in `seen`, original schema.
    */
  def notSeen(batch: DataFrame, seen: DataFrame, textCol: String,
              expectedSeen: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val spark = batch.sparkSession
    graft.plans.GraftExtensions.register(spark)
    val seenKeys = seen.select(col(textCol).as("_seen_text"))
    val bloom = seenKeys
      .select(xxhash64(col("_seen_text")).as("_h"))
      .stat.bloomFilter("_h", expectedSeen, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val maybeSeen =
      call_function("bloom_might_contain", lit(bytes), xxhash64(col(textCol)))
    val definitelyNew = batch.filter(!maybeSeen)
    val survivors = batch.filter(maybeSeen)
      .join(seenKeys.distinct(), col(textCol) === col("_seen_text"), "left_anti")
    definitelyNew.unionByName(survivors)
  }

  /** Corpus snapshot diff: classify every key across two corpus versions
    * as `added` / `removed` / `changed` / `unchanged` by comparing a
    * caller-supplied content fingerprint (md5 of the text, an etag, …) —
    * the delta feed of an incremental ingestion pipeline (only `added` +
    * `changed` need re-processing downstream; `removed` drives retention).
    *
    * Shape: ONE full-outer equi-join on the key, comparing fixed-width
    * fingerprints instead of document bodies — the shuffle moves two
    * narrow columns per side regardless of document size. At recurring
    * 100 TB scale, write both snapshots bucketed by the key
    * (`Exporter.writeBucketed`) and the join is co-located —
    * shuffle-free.
    *
    * @return one row per key in either version: (`keyCol`, `status`).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCol: String, fpCol: String): DataFrame = {
    val o = oldDf.select(col(keyCol).as("_k"), col(fpCol).as("_fp_old"))
    val n = newDf.select(col(keyCol).as("_k"), col(fpCol).as("_fp_new"))
    o.join(n, Seq("_k"), "full_outer")
      .select(col("_k").as(keyCol),
        when(col("_fp_old").isNull, lit("added"))
          .when(col("_fp_new").isNull, lit("removed"))
          .when(col("_fp_old") === col("_fp_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Connected components over a near-duplicate pair set — the FINAL stage
    * of a dedup pipeline (pairs alone don't dedup anything): transitively
    * linked documents form one cluster, labeled by the minimum document id
    * it contains, which doubles as the canonical representative
    * (`component == id` selects the keeper).
    *
    * Two algorithms behind one API, both O(log) rounds with fixed-size
    * convergence probes (nothing row-shaped reaches the driver):
    *
    *  - `"pointer-jumping"` (default): per-round min-label propagation
    *    (edges⋈labels + partial-aggregated min) followed by the jump
    *    `comp := comp(comp)` — the jump doubles effective hop distance per
    *    round, so rounds are O(log diameter). The per-round propagation
    *    join carries ALL edges every round, which a star-shaped hot
    *    cluster inflates.
    *  - `"star"`: alternating large-star/small-star edge rewriting
    *    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    *    SoCC'14). Each round REWRITES the edge set toward per-component
    *    stars, so hot-cluster edges collapse onto the component minimum as
    *    rounds progress — the per-round join volume shrinks instead of
    *    replaying, which is the right trade under adversarial skew
    *    (a 10k-leaf star converges in one round).
    *  - `"auto"`: one fixed-size max-degree probe over the pair set picks
    *    between them (hot degree ≥ 16384 → star).
    *
    * Throws if `maxIter` rounds don't converge (a silent partial clustering
    * would under-dedup downstream).
    *
    * @return one row per node: (`idCol`, `component`), both long.
    */
  def connectedComponents(nodes: DataFrame, idCol: String,
                          pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 25,
                          algorithm: String = "pointer-jumping"): DataFrame = {
    val ids = nodes.select(col(idCol).cast("long").as("id")).distinct()
    // materialize the caller's pair frame ONCE: it may be expensive to
    // produce (q75's cosine pair build), and both the auto skew probe and
    // the algorithms' initial edge materialization would otherwise each
    // replay it. Safe to release afterwards — both algorithms return
    // frames rooted in their own localCheckpoint snapshots.
    import org.apache.spark.storage.StorageLevel
    val pn = pairs
      .select(col(aCol).cast("long").as(aCol), col(bCol).cast("long").as(bCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val out = try {
      algorithm match {
        case "pointer-jumping" => ccPointerJumping(ids, pn, aCol, bCol, maxIter)
        case "star"            => ccStar(ids, pn, aCol, bCol, maxIter)
        case "auto" =>
          // one fixed-size skew probe: pointer jumping replays EVERY edge
          // through the propagation join each round, so a hot node (star-
          // shaped near-dup cluster: boilerplate, headers, license text)
          // makes each round pay the hot degree again; the star rewrite
          // contracts it instead. Low-skew graphs keep pointer jumping
          // (fewer, cheaper jobs per round).
          val maxDeg = pn
            .select(col(aCol).as("n"))
            .unionByName(pn.select(col(bCol).as("n")))
            .groupBy(col("n")).agg(count(lit(1)).as("d"))
            .agg(coalesce(max(col("d")), lit(0L))).collect()(0).getLong(0)
          if (maxDeg >= 16384) ccStar(ids, pn, aCol, bCol, maxIter)
          else ccPointerJumping(ids, pn, aCol, bCol, maxIter)
        case other => throw new IllegalArgumentException(
          s"unknown connectedComponents algorithm '$other' " +
            "(expected pointer-jumping, star, or auto)")
      }
    } finally pn.unpersist(false)
    out.select(col("id").as(idCol), col("comp").as("component"))
  }

  /** The local-checkpoint block handle of a checkpointed frame: its
    * analyzed plan is a LogicalRDD over the persisted RDD. Unpersisting
    * the PREVIOUS round's handle after the next round materializes keeps
    * exactly one round snapshot alive instead of `maxIter` of them.
    */
  private[operators] def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  private def ccPointerJumping(ids: DataFrame, pairs: DataFrame,
                               aCol: String, bCol: String,
                               maxIter: Int): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val edges = pairs
      .select(col(aCol).cast("long").as("s"), col(bCol).cast("long").as("d"))
      .unionByName(pairs
        .select(col(bCol).cast("long").as("s"), col(aCol).cast("long").as("d")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // each round references `labels` twice (propagation join + merge join),
    // so a persist-only chain DOUBLES the logical plan per round —
    // localCheckpoint materializes the round AND truncates lineage to a
    // LogicalRDD (a fault-tolerant deployment swaps in reliable
    // checkpointing via sparkContext.setCheckpointDir; same shape)
    // lazy checkpoint: the null-safe convergence probe is the materializing
    // action (coalesce also covers the empty-node-set case — sum() over
    // zero rows is null, and the loop then converges on 0 == 0)
    var labels = ids.withColumn("comp", col("id")).localCheckpoint(false)
    var prevCkpt = checkpointRdd(labels)
    var prevSum = labels.agg(coalesce(sum("comp"), lit(0L)))
      .collect()(0).getLong(0)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val prop = edges.join(labels, col("s") === col("id"))
        .groupBy(col("d"))
        .agg(min(col("comp")).as("pcomp"))
      val merged = labels.join(prop, col("id") === col("d"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("pcomp"), col("comp"))).as("comp"))
      // pointer jumping: comp := comp(comp). Labels are node ids (mins over
      // ids), so the mapping is total and the inner join loses no rows.
      val jump = merged.select(col("id").as("jid"), col("comp").as("jcomp"))
      // lazy checkpoint: the convergence probe below is the materializing
      // action, so each round runs ONE job, not checkpoint + probe
      val next = merged.join(jump, col("comp") === col("jid"))
        .select(col("id"), col("jcomp").as("comp"))
        .localCheckpoint(false)
      val newSum = ccTimed(s"cc-pj round $iter") {
        next.agg(coalesce(sum("comp"), lit(0L))).collect()(0).getLong(0)
      }
      // `next` is materialized and lineage-truncated now — the previous
      // round's snapshot can go (the FINAL round's snapshot backs the
      // returned frame and stays)
      prevCkpt.foreach(_.unpersist(false))
      prevCkpt = checkpointRdd(next)
      labels = next
      converged = newSum == prevSum
      prevSum = newSum
      iter += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "raise maxIter (cluster diameter exceeds the bound)")
    labels
  }

  /** Alternating large-star/small-star rounds (Kiveris et al., SoCC'14).
    * Edge set is kept oriented large→small; a round rewrites every edge
    * toward the neighborhood minimum (large-star hangs big neighbors onto
    * it, small-star contracts the small ones), and at the fixpoint the
    * edges ARE the labeling: one (node, component-min) edge per non-min
    * node. Convergence = the (count, endpoint-sum, xxhash64-sum) probe of
    * the edge set repeating — a fixed-size aggregate; a false positive
    * needs a 64-bit hash-sum collision between consecutive rounds on top
    * of equal counts and sums.
    */
  private def ccStar(ids: DataFrame, pairs: DataFrame,
                     aCol: String, bCol: String, maxIter: Int): DataFrame = {
    var edges = pairs
      .select(greatest(col(aCol), col(bCol)).cast("long").as("s"),
        least(col(aCol), col(bCol)).cast("long").as("d"))
      .filter(col("s") =!= col("d"))
      .distinct()
      .localCheckpoint(false) // the initial probe below materializes it
    var prevCkpt = checkpointRdd(edges)
    // xxhash64 spans the full long range, so its sum accumulates in
    // decimal — a long sum would hit ANSI ARITHMETIC_OVERFLOW
    def probe(e: DataFrame): Seq[Any] = e.agg(count(lit(1)),
      coalesce(sum(col("s") + col("d")), lit(0L)),
      coalesce(sum(xxhash64(col("s"), col("d")).cast("decimal(20,0)")),
        lit(0).cast("decimal(30,0)"))).collect()(0).toSeq
    var prev = probe(edges)
    var iter = 0
    var converged = prev.head == 0L // no edges at all: nothing to contract
    while (!converged && iter < maxIter) {
      // large-star: for every node u, neighbors v > u re-link to
      // m = min(Γ(u) ∪ {u}); output stays oriented v > u >= m
      val sym = edges.select(col("s").as("u"), col("d").as("v"))
        .unionByName(edges.select(col("d").as("u"), col("s").as("v")))
      val lm = sym.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val large = sym.join(lm, "u").filter(col("v") > col("u"))
        .select(col("v").as("s"), col("m").as("d"))
        .distinct()
      // small-star: for every node u, its smaller neighbors (plus u) hang
      // off m = min of them; d >= m always, so orientation is preserved
      val sm = large.groupBy(col("s")).agg(min(col("d")).as("m"))
      val next = large.join(sm, "s")
        .filter(col("d") =!= col("m"))
        .select(col("d").as("s"), col("m").as("d"))
        .unionByName(sm.select(col("s"), col("m").as("d")))
        .distinct()
        .localCheckpoint(false) // the probe below materializes it
      val cur = ccTimed(s"cc-star round $iter")(probe(next))
      prevCkpt.foreach(_.unpersist(false))
      prevCkpt = checkpointRdd(next)
      edges = next
      converged = cur == prev
      prev = cur
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents(star) did not converge in $maxIter rounds — " +
          "raise maxIter")
    // star fixpoint: every non-min node carries exactly one edge to its
    // component min; isolated nodes label themselves
    val lab = edges.groupBy(col("s")).agg(min(col("d")).as("comp"))
      .select(col("s").as("lid"), col("comp"))
    ids.join(lab, col("id") === col("lid"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** End-to-end embedding-cosine near-duplicate dedup: semantic duplicates
    * (translations re-crawled, templated rewrites, boilerplate with token
    * edits) that survive MinHash because their TOKEN overlap is low while
    * their embedding cosine is high.
    *
    * Chain (each stage an existing scale-shaped operator):
    *  1. candidate pairs at `cosine ≥ threshold` — hyperplane-LSH bucketed
    *     (`Similarity.nearDuplicates`: equi-join on (band, bits), never
    *     all-pairs) unless the caller passes a pre-built pair frame with
    *     (`id_a`, `id_b`) columns (exact bounded pairs in the gate query;
    *     an IVF-bucketed pair set at production scale);
    *  2. transitive closure via [[connectedComponents]] (auto-picks the
    *     large-star/small-star rewrite under hot-cluster skew);
    *  3. keeper = the component minimum id (the CC label), every other
    *     member flagged `is_dup` — the same canonical-keeper rule as
    *     [[exact]], so downstream anti-joins compose across dedup stages.
    *
    * @return one row per input id: (`idCol`, `component`, `is_dup`).
    */
  /** Span-level exact substring dedup (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): remove every token
    * covered by a length-`n` token window whose text occurs ≥ 2 times in
    * the corpus — boilerplate headers, license blocks, and quoted reposts
    * vanish from otherwise-unique documents, which document-level dedup
    * (exact/MinHash) cannot do.
    *
    * The paper builds a corpus suffix array; the Spark-native equivalent
    * is relational, all equi-keyed shuffles, nothing driver-side:
    *
    *  1. positional gram hashes per doc — [[graft.plans.ShingleHashesPos]],
    *     one fused codegen loop, 8-byte keys (hash collisions merge grams
    *     with p ≈ 2⁻⁶⁴ — the q31/q61 content-hash caveat);
    *  2. corpus gram counts with map-side partial agg; only grams with
    *     count ≥ 2 survive (the duplicated-span set, ~0.1-5% of grams);
    *  3. join back on the gram hash to recover (doc, start) of every
    *     duplicated occurrence, explode each to its n covered positions
    *     (O(n · duplicated occurrences) rows, not O(corpus));
    *  4. anti-join the positioned token stream against covered positions
    *     and reassemble the survivors in position order (the q56
    *     paragraph-dedup reassembly shape).
    *
    * Documents shorter than `n` tokens carry no spans and pass through
    * unchanged (their duplication is exact dedup's job).
    *
    * @return one row per doc: (`idCol`, `clean_text`, `n_tokens`,
    *         `n_removed`), where `clean_text` is the kept tokens joined by
    *         single spaces (lowercased — span identity is case-folded).
    */
  def spanDedup(df: DataFrame, idCol: String, textCol: String,
                n: Int = 15): DataFrame = {
    require(n >= 2, s"span length n=$n must be at least 2")
    graft.plans.GraftExtensions.register(df.sparkSession)
    val base = df.select(col(idCol),
      split(trim(lower(col(textCol))), "\\s+").as("_toks"))
    val grams = base.select(col(idCol),
      posexplode(call_function("shingle_hashes_pos",
        transform(col("_toks"), t => xxhash64(t)), lit(n)))
        .as(Seq("_j", "_g")))
    val dup = grams.groupBy(col("_g")).agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= 2).select(col("_g"))
    val covered = grams.join(dup, Seq("_g"))
      .select(col(idCol),
        explode(sequence(col("_j"), col("_j") + lit(n - 1))).as("_pos"))
      .distinct()
    val kept = base
      .select(col(idCol), posexplode(col("_toks")).as(Seq("_pos", "_tok")))
      .join(covered, Seq(idCol, "_pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("_pos"), col("_tok")))),
          s => s.getField("_tok")), " ").as("clean_text"),
        count(lit(1)).as("_n_kept"))
    base.select(col(idCol), size(col("_toks")).cast("long").as("n_tokens"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("_n_kept"), lit(0L))).as("n_removed"))
  }

  /** SemDedup-style semantic pruning (Abbas et al. 2023, "SemDedup: Data-
    * efficient learning at web-scale through semantic deduplication"):
    * cluster the corpus with deterministic k-means, then mark a vector a
    * duplicate iff a SMALLER-id vector in the SAME cluster sits at cosine
    * ≥ `threshold`. Greedy id-ordered pruning, deliberately not transitive
    * closure — the chain a~b~c with a≁c keeps a and c here, which is the
    * SemDedup semantics (CC-based clustering is [[embeddingDedup]]'s job).
    *
    * This is the production-scale path for embedding dedup: candidate
    * pairs are generated per k-means cell via an equi-join on the cluster
    * id — never all-pairs — so pair volume is Σ|cell|², bounded by the
    * clustering instead of the corpus square. Cosines are rounded to the
    * 1e-4 grid BEFORE the threshold compare (the q75 convention), so an
    * engine's last-ulp cosine can't flip a keep/drop verdict.
    *
    * Scale notes: the dup check is one aggregate over within-cell pairs
    * (`min(id) over cell-mates at sim ≥ τ`), re-joined to the assignment —
    * both shuffles keyed on (cluster) then (id). A pathological cell (k
    * too small for the corpus) shows up as a hot cluster key; the fix is
    * more clusters, which is also what recall wants.
    *
    * @return one row per vector: (`idCol`, `cluster`, `is_dup`).
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, threshold: Double, iterations: Int = 2): DataFrame = {
    val s = df.sparkSession
    graft.plans.GraftExtensions.register(s)
    val sim4 = (a: Column, b: Column) =>
      floor(call_function("cosine_sim", a, b) * 10000.0 + 0.5) / 10000.0
    val assigned = Similarity.kmeansCluster(df, idCol, vecCol, k, iterations)
    val withVec = df
      .select(col(idCol).cast("long").as(idCol),
        col(vecCol).cast("array<double>").as("_v"))
      .join(assigned, Seq(idCol))
    val a = withVec.select(col("cluster"), col(idCol).as("_ida"),
      col("_v").as("_va"))
    val b = withVec.select(col("cluster"), col(idCol).as("_idb"),
      col("_v").as("_vb"))
    val dups = a.join(b, Seq("cluster"))
      .filter(col("_ida") < col("_idb") &&
        sim4(col("_va"), col("_vb")) >= lit(threshold))
      .select(col("_idb").as(idCol)).distinct()
    withVec.join(dups.withColumn("_dup", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(col("_dup"), lit(false)).as("is_dup"))
  }

  def embeddingDedup(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, pairs: Option[DataFrame] = None,
                     algorithm: String = "auto"): DataFrame = {
    val p = pairs.getOrElse(
      Similarity.nearDuplicates(df, idCol, vecCol, threshold))
    connectedComponents(df.select(col(idCol)), idCol,
        p.select(col("id_a"), col("id_b")), "id_a", "id_b",
        algorithm = algorithm)
      .withColumn("is_dup", col(idCol) =!= col("component"))
  }
}
