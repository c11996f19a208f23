package graft.operators

import graft.{Det, QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.11 (text half) — LLM-corpus text analysis and deduplication over the
  * `documents` fixture: corpus stats, language ID (stopword-profile
  * heuristic), quality scoring, tokenize, tf-idf, n-grams, rolling-hash
  * fingerprinting, and the dedup ladder (exact hash → exact Jaccard →
  * SimHash buckets; MinHash-LSH lives in LlmVector with the other MLlib
  * ops).
  *
  * Scale notes (100 TB posture): everything tokenizes map-side and
  * aggregates with partial combine; the pairwise Jaccard join is blocked
  * on a deterministic candidate sample (doc_id % 10 = 0) because an
  * unblocked token-inverted-index self-join is quadratic in document
  * frequency — at corpus scale the MinHash-LSH variant is the real path
  * and this exact twin is its verification oracle.
  */
object LlmText {

  private def toks(c: Column): Column = split(c, " ")

  private def textStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), col("source"), col("n_chars"),
        size(toks(col("text"))).as("n_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        Det.davg(col("n_tokens")).as("avg_tokens"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("lang"))

  /** Stopword-profile language ID: score each language by its stopword
    * hits in the document, argmax with alphabetical tiebreak. (The
    * heuristic mechanism is the operator; the fixture's lang labels are
    * random, so accuracy is not the point.)
    */
  private val langStops: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de", "y"),
    "fr" -> Seq("le", "la", "et", "est"),
    "zh" -> Seq("de", "le", "shi", "he"),
  )

  private def textLangid(s: SparkSession, dir: String): DataFrame = {
    val scored = langStops.foldLeft(
      Tables.documents(s, dir).withColumn("arr", toks(col("text")))) {
      case (df, (lang, stops)) =>
        df.withColumn(s"hits_$lang",
          size(filter(col("arr"), x => x.isin(stops.map(lit): _*))))
    }
    val hits = array(langStops.map { case (lang, _) =>
      struct(col(s"hits_$lang").as("hits"), lit(lang).as("lang"))
    }: _*)
    // argmax by (hits, lang): max hits, ties to the alphabetically-LAST
    // language (array_max on the struct compares lang ascending; the
    // oracle's ORDER BY hits DESC, cand DESC matches)
    scored
      .withColumn("best", array_max(hits))
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        col("best.lang").as("predicted_lang"), col("best.hits").as("hits"))
      .orderBy(col("doc_id"))
  }

  /** text_quality's stopword list and blended score, over a token
    * array — ONE definition shared with DedupGraph.dedupCanonical (its
    * survivor choice is spec'd as "text_quality's score", so the two
    * must not be able to drift; both DuckDB twins restate this exact
    * formula).
    */
  private[operators] val enStopwords = Seq("the", "a", "of", "and", "to", "in")
  private[operators] def qualityScore(arr: Column): Column =
    round(
      (size(filter(arr, x => x.isin(enStopwords.map(lit): _*))).cast("double")
        / size(arr)) * 0.5 +
        (size(array_distinct(arr)).cast("double") / size(arr)) * 0.5, 6)

  private def textQuality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("arr", toks(col("text")))
      .select(
        col("doc_id"),
        size(col("arr")).as("n_tokens"),
        (col("n_chars").cast("double") / size(col("arr"))).as("chars_per_token"),
        (size(filter(col("arr"), x => x.isin(enStopwords.map(lit): _*)))
          .cast("double") / size(col("arr"))).as("stopword_ratio"),
        (size(array_distinct(col("arr"))).cast("double") / size(col("arr")))
          .as("ttr"),
        qualityScore(col("arr")).as("quality"))
      .orderBy(col("doc_id"))

  private def textTokenize(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("token"))

  /** Shared tf/df/tfidf frame — (doc_id, token, tf, df, tfidf@6dp)
    * over the whole corpus; consumed by text_tf_idf AND text_keywords
    * so the scoring formula lives ONCE (the jaccardPairCounts rule —
    * a fix here reaches both keys, and both oracles share tfidfCte).
    */
  private def tfidfScores(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val nDocs = docs.select(countDistinct(col("doc_id")).as("n_total"))
    val tf = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"))
    tf.join(df_, "token").crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_total").cast("double") / col("df")), 6))
  }

  /** The oracle twin of [[tfidfScores]]: CTEs ending in `sc` with
    * (doc_id, token, tf, df, tfidf). */
  private val tfidfCte: String =
    """t AS (SELECT doc_id, unnest(string_split(text,' ')) AS token
                FROM documents),
              tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM t
                GROUP BY doc_id, token),
              df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf
                GROUP BY token),
              n AS (SELECT COUNT(DISTINCT doc_id) AS n_total FROM documents),
              sc AS (SELECT doc_id, token, tf, df,
                round(tf * ln(CAST(n_total AS DOUBLE) / df), 6) AS tfidf
                FROM tf JOIN df USING (token) CROSS JOIN n)"""

  private def textTfIdf(s: SparkSession, dir: String): DataFrame =
    tfidfScores(s, dir)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        col("tfidf"))
      .orderBy(col("doc_id"), col("token"))

  /** Unigram corpus language-model score (the KenLM-perplexity quality
    * signal of CCNet/RedPajama, reduced to its deterministic unigram
    * core): per-token log-probability ln(count/total) under the corpus's
    * own unigram distribution, averaged per document. Low scorers are
    * rare-token-heavy (gibberish/OCR noise); high scorers are stopword
    * soup — both tails are what a quality cut removes.
    *
    * Scale notes: vocab (token→count) is one map-side-combined shuffle
    * and is tiny relative to the corpus, so it joins back BROADCAST —
    * the token stream itself never shuffles for the probability lookup;
    * the per-doc average is a second map-side-combined agg on doc_id.
    * Per-token ln terms sum exactly in decimal so the per-doc fold is
    * partition-order-independent.
    */
  private def textLmScore(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("token"))
    val vocab = tok.groupBy(col("token")).agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).as("total"))
    tok.join(broadcast(vocab), "token")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        // UNROUNDED decimal-sum/count quotient: both engines divide the
        // identical operands, while a 6dp edge round is the midpoint
        // split OBSERVED on text_lm_bigram (class 3)
        Det.davg(log(col("c").cast("double") / col("total")))
          .as("lm_score"))
      .orderBy(col("doc_id"))
  }

  private def textNgram(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("arr", toks(col("text")))
      // slice(arr, 1, 0) is the TYPED empty array: a <2-token doc must
      // yield no bigrams, while sequence(0, -1) would DESCEND to [0, -1]
      // and element_at(arr, 0) throws (the descending-sequence class the
      // sibling shingle ops already guard)
      .select(explode(expr(
        """CASE WHEN size(arr) < 2 THEN slice(arr, 1, 0)
             ELSE transform(sequence(0, size(arr) - 2),
               i -> concat(element_at(arr, i + 1), ' ', element_at(arr, i + 2)))
             END"""))
        .as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(50)

  /** Rolling polynomial fingerprint over (len·256 + first-codepoint) token
    * codes, mod 1e9+7 — stays in bigint range so Spark and DuckDB fold
    * identically (no overflow wrap, which DuckDB would reject).
    */
  private def textFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("arr", toks(col("text")))
      .select(col("doc_id"),
        // empty tokens (split artifacts of irregular spacing) are
        // dropped on BOTH engines: Spark ascii('') = 0 but DuckDB
        // unicode('') = -1, so an unfiltered empty token splits the fold
        expr("""aggregate(
                  transform(filter(arr, x -> x != ''),
                    x -> length(x) * 256L + ascii(x)),
                  0L, (acc, v) -> (acc * 131 + v) % 1000000007)""")
          .as("fingerprint"))
      .orderBy(col("doc_id"))

  /** Token counting two ways (the LLM-pipeline budgeting step):
    * whitespace tokens vs a BPE-ish regex lexer (letter runs / digit runs
    * / single other chars), plus chars-per-token compression ratio.
    */
  private def textTokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"),
        size(toks(col("text"))).as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .as("re_tokens"))
      .withColumn("chars_per_ws_token",
        round(col("n_chars").cast("double") / col("ws_tokens"), 6))
      .orderBy(col("doc_id"))

  /** Canonical text normalization (the step every corpus pipeline runs
    * before dedup/quality): lowercase, strip non-alphanumerics to space,
    * collapse whitespace, trim. All map-side codegen'd regexps — no
    * shuffle, no UDF.
    */
  private def textNormalize(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("norm", trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")))
      .select(col("doc_id"),
        col("norm"),
        length(col("norm")).as("norm_chars"),
        sha2(col("norm"), 256).as("norm_digest"))
      .orderBy(col("doc_id"))

  /** PII redaction (training-data compliance step): emails and phone-ish
    * digit groups masked with typed placeholders, plus per-doc match
    * counts for the audit trail. The fixture text carries no PII, so a
    * deterministic contact line is appended per doc first — the operator
    * under test is the masking, which is pure map-side regexp codegen.
    */
  private def textPiiMask(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("raw", concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com tel 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .select(col("doc_id"),
        size(expr("regexp_extract_all(raw, '[a-z0-9]+@[a-z0-9.]+[a-z]', 0)"))
          .as("n_emails"),
        size(expr("regexp_extract_all(raw, '[0-9]{3}-[0-9]{4}', 0)"))
          .as("n_phones"),
        regexp_replace(
          regexp_replace(col("raw"), "[a-z0-9]+@[a-z0-9.]+[a-z]", "<EMAIL>"),
          "[0-9]{3}-[0-9]{4}", "<PHONE>").as("masked"))
      .orderBy(col("doc_id"))

  /** Exact dedup by normalized-text hash: keep the lowest doc_id per
    * digest (the canonical LLM-corpus exact-dedup step).
    */
  private def dedupExactHash(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("digest")).orderBy(col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("digest", sha2(lower(trim(col("text"))), 256))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_copies", count(lit(1)).over(Window.partitionBy(col("digest"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("digest"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  /** Blocked inverted-index Jaccard pair counts — THE shared pair plan
    * (previously copy-pasted at four sites: dedup_jaccard,
    * dedup_pipeline, dedup_ngram_jaccard and DedupGraph.edges). Input:
    * (doc_id, <setCol> array); output one row per candidate pair with
    * (id_a, id_b, n_inter, sz_a, sz_b) — each caller applies its own
    * threshold/rounding so the keys' intentional differences stay
    * explicit and in ONE place each.
    */
  private[operators] def jaccardPairCounts(cand0: DataFrame,
      setCol: String): DataFrame = {
    // cand is consumed THREE times (sizes + both sides of the inverted
    // self-join) and every caller builds it with a string-heavy
    // tokenize over documents; checkpoint the bounded candidate block
    // once here so all four call sites tokenize once, not 3x
    val cand = cand0.localCheckpoint()
    val sizes = cand.select(col("doc_id"), size(col(setCol)).as("sz"))
    val inv = cand.select(col("doc_id"), explode(col(setCol)).as("elem"))
    inv.as("a")
      .join(inv.as("b"),
        col("a.elem") === col("b.elem") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("sz", "sz_b"), "id_b")
  }

  /** Exact token-set Jaccard near-dup pairs over a deterministic candidate
    * block (doc_id % 10 = 0): inverted-index self-join → intersection
    * counts → J = |∩| / |∪|. Serves as the recall oracle for MinHash-LSH.
    */
  private def dedupJaccard(s: SparkSession, dir: String): DataFrame = {
    val cand = Tables.documents(s, dir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), array_distinct(toks(col("text"))).as("tokset"))
    jaccardPairCounts(cand, "tokset")
      .withColumn("jaccard", round(
        col("n_inter").cast("double")
          / (col("sz_a") + col("sz_b") - col("n_inter")), 6))
      .filter(col("jaccard") >= 0.5)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** The production corpus-dedup chain END-TO-END on one deterministic
    * candidate block (doc_id % 10 = 0): (1) exact dedup — keep the
    * lowest doc_id per normalized sha2 digest; (2) near-dup removal
    * among the exact survivors — drop any doc with an exact-Jaccard
    * ≥ 0.5 pair against a LOWER-id survivor (greedy keep-lowest;
    * transitive union-find clustering is deliberately out of scope so
    * the chain stays oracle-able). At 100 TB stage (2)'s pair source
    * swaps to the MinHash-LSH candidate join (dedup_minhash) with
    * identical downstream algebra — the exact inverted-index pair
    * source here doubles as its verification oracle.
    */
  private def dedupPipeline(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("digest")).orderBy(col("doc_id"))
    val exact = Tables.documents(s, dir)
      .filter(col("doc_id") % 10 === 0)
      .withColumn("digest", sha2(lower(trim(col("text"))), 256))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_copies",
        count(lit(1)).over(Window.partitionBy(col("digest"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("text"), col("n_copies"))
      // two consumers (the near-dup candidate chain + the final
      // anti-join): checkpoint so the sha2 + two dedup windows over
      // documents run once, not per consumer
      .localCheckpoint()
    val cand = exact
      .select(col("doc_id"), array_distinct(toks(col("text"))).as("tokset"))
    val drops = jaccardPairCounts(cand, "tokset")
      .filter(round(col("n_inter").cast("double")
        / (col("sz_a") + col("sz_b") - col("n_inter")), 6) >= 0.5)
      .select(col("id_b")).distinct()
    exact.join(drops, exact("doc_id") === drops("id_b"), "left_anti")
      .select(col("doc_id"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  /** Paragraph-level corpus dedup (the CCNet/RefinedWeb stage between
    * document-exact and near-dup: boilerplate paragraphs repeat across
    * documents that are NOT duplicates of each other): each document
    * splits into fixed 10-token "paragraphs", the corpus keeps only the
    * FIRST occurrence of every paragraph (lowest (doc_id, pos)), and
    * each document is reassembled from its surviving paragraphs in
    * original order. Output: per-doc paragraph/survivor counts and the
    * cleaned text (null when every paragraph was seen earlier — the
    * fully-boilerplate doc the pipeline would drop).
    *
    * Scale notes: the only shuffle key is the paragraph string itself
    * (at 100 TB: its xxhash digest — same algebra, 8-byte key); the
    * first-occurrence window partitions BY PARAGRAPH, so the state per
    * group is the duplicate count of one paragraph, never the corpus.
    * Reassembly is a per-doc hash aggregate over surviving (pos, para)
    * pairs — O(doc) state, order restored by an in-group array_sort,
    * no global sort anywhere.
    */
  private def dedupParagraph(s: SparkSession, dir: String): DataFrame = {
    val paras = Tables.documents(s, dir)
      .withColumn("toksArr", split(col("text"), " "))
      .select(col("doc_id"),
        posexplode(expr(
          """transform(
               sequence(0, cast(ceil(size(toksArr) / 10.0) as int) - 1),
               i -> array_join(slice(toksArr, i * 10 + 1, 10), ' '))"""))
          .as(Seq("pos", "para")))
    val w = Window.partitionBy(col("para")).orderBy(col("doc_id"), col("pos"))
    paras
      .withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"),
        count(when(col("rn") === 1, 1)).as("n_kept"),
        array_join(expr(
          """transform(
               array_sort(collect_list(
                 CASE WHEN rn = 1 THEN struct(pos, para) END)),
               x -> x.para)"""), " ").as("joined"))
      .select(col("doc_id"), col("n_paras"), col("n_kept"),
        when(col("n_kept") > 0, col("joined")).as("cleaned"))
      .orderBy(col("doc_id"))
  }

  /** Importance resampling by a per-document quality weight (the
    * data-mixing step after ml_quality_filter scores a corpus: keep doc
    * i with probability w_i / w_max) — decided by deterministic hash
    * acceptance, NOT seeded RNG: accept when the doc's Knuth-hash bucket
    * (0..1e6) falls under its weight share, compared in PURE int64
    * cross-multiplication (bucket·w_max < w_i·1e6 — no double ever
    * enters the accept decision, so the sample is bit-stable at any
    * parallelism on any engine). Weight = n_chars (the length prior);
    * the per-source report shows the selection lift — kept docs' mean
    * length over the stratum mean — exact integer sums, one double
    * division rounded at the edge.
    *
    * Scale notes: w_max is a 1-row broadcast; acceptance is map-side
    * codegen'd arithmetic; only O(sources) rows reach the final
    * aggregate. The 100 TB posture of every sample_* key: no RNG, no
    * global sort, one partial-agg shuffle on the stratum key.
    */
  private def sampleImportance(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val wmax = docs.agg(max(col("n_chars")).as("wmax"))
    docs.crossJoin(broadcast(wmax))
      .withColumn("bucket",
        ((col("doc_id") % lit(2147483648L)) * lit(2654435761L)) % 4294967296L % 1000000L)
      .withColumn("keep",
        col("bucket") * col("wmax") < col("n_chars") * lit(1000000L))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("keep"), 1)).as("n_kept"),
        sum(col("n_chars")).as("chars_all"),
        sum(when(col("keep"), col("n_chars"))).as("chars_kept"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        when(col("n_kept") > 0,
          round(col("chars_kept").cast("double") * col("n_docs")
            / (col("chars_all").cast("double") * col("n_kept")), 6))
          .as("length_lift"))
      .orderBy(col("source"))
  }

  /** Deterministic hash-based corpus split (ClickHouse `SAMPLE` /
    * training-data holdout): Knuth multiplicative hash of the doc id →
    * bucket 0..99 → train/val/test at 80/10/10. Hash-based, NOT seeded
    * RNG: the same doc lands in the same split on every run, any engine,
    * any partitioning — the property a held-out set actually requires.
    * Pure map-side arithmetic (exact in int64 on both engines), then one
    * partial-agg shuffle on the 3-row split key.
    */
  private def sampleHashSplit(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("bucket",
        ((col("doc_id") % lit(2147483648L)) * lit(2654435761L)) % 4294967296L % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(toks(col("text")))).as("n_tokens"))
      .orderBy(col("split"))

  /** Corpus-mixture resampling (training-mix domain weighting): each
    * language stratum keeps a different target fraction — en 90%,
    * zh 30%, everything else 60% — selected by the SAME multiplicative
    * hash as sample_hash_split, so membership is deterministic across
    * engines/partitionings AND consistent with the train/val/test split
    * (a doc's hash decides both). Map-side filter + one partial-agg
    * shuffle on the 5-row language key; reweighting 100 TB never
    * shuffles the corpus.
    */
  private def sampleMixture(s: SparkSession, dir: String): DataFrame = {
    val bucket = ((col("doc_id") % lit(2147483648L)) * lit(2654435761L)) % 4294967296L % 100
    val rate = when(col("lang") === "en", 90)
      .when(col("lang") === "zh", 30).otherwise(60)
    Tables.documents(s, dir)
      .withColumn("kept", bucket < rate)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        count(when(col("kept"), 1)).as("n_kept"),
        sum(when(col("kept"), size(toks(col("text"))))
          .otherwise(0)).as("kept_tokens"))
      .orderBy(col("lang"))
  }

  /** Context-window chunking (the RAG/pretraining doc-splitter): each
    * document becomes overlapping 64-token windows on a 48-token stride
    * (16-token overlap), each chunk carrying its token offset so spans
    * map back to the source. Pure map-side Generate — sequence() builds
    * the stride starts, slice() cuts each window; no shuffle except the
    * presentation sort, so 100 TB chunks at scan speed with output
    * parallelism = input parallelism.
    */
  private def docChunk(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), size(col("t")) - 1, lit(48))).as("start"))
      .select(
        col("doc_id"),
        expr("start div 48").cast("long").as("chunk_id"),
        col("start").cast("long").as("start_tok"),
        size(slice(col("t"), col("start") + 1, lit(64))).cast("long")
          .as("chunk_len"),
        array_join(slice(col("t"), col("start") + 1, lit(64)), " ")
          .as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))

  /** Deterministic stratified downsampling: exactly min(n, 20) docs per
    * language stratum, selected by md5(doc_id) order — a content-blind,
    * engine-independent "random" order that is reproducible across runs,
    * engines, and partitionings (the property an eval-set draw needs;
    * seeded RNG sampling is partitioning-dependent in any distributed
    * engine). One shuffle on the stratum key; the per-group sort is
    * bounded by stratum size. When quotas needn't be exact, the
    * shuffle-free hash-threshold filter (sample_mixture) is the 100 TB
    * path — this operator is for exact per-stratum draws.
    */
  private def sampleStratified(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 20)
      .orderBy(col("lang"), col("rk"))
  }

  /** Neyman-allocation stratified sampling (the variance-optimal
    * upgrade of sample_stratified's equal quotas): each source stratum
    * gets budget ∝ N_h·S_h — big AND noisy strata deserve more sample —
    * with S_h from EXACT integer moments (decimal N·Σx²−(Σx)², one
    * double sqrt rounded 6dp), stratum weights re-summed decimal-exact
    * (a double Σ would be order-dependent), and the selection itself the
    * deterministic hash-rank draw. Emits the selected docs with their
    * stratum's diagnostics.
    *
    * Scale notes: moments are map-side partials onto the O(strata)
    * domain; the only row-scale work is the per-stratum rank (same
    * shuffle as sample_stratified); allocations ride a broadcast.
    */
  private def sampleNeyman(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val nD = col("n_h").cast("decimal(38,0)")
    val sv = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_h"),
        sum(col("n_chars").cast("decimal(38,0)")).as("sx"),
        sum((col("n_chars") * col("n_chars")).cast("decimal(38,0)"))
          .as("sxx"))
      .select(col("source"), col("n_h"),
        round(sqrt((nD * col("sxx") - col("sx") * col("sx")).cast("double")
          / (col("n_h") * col("n_h")).cast("double")), 6).as("s_h"))
      .withColumn("w", round(col("n_h") * col("s_h"), 6))
    val tot = sv.agg(
      sum(col("w").cast("decimal(38,6)")).cast("double").as("tw"))
    val alloc = sv.crossJoin(broadcast(tot))
      .select(col("source"), col("n_h"), col("s_h"),
        floor(lit(100.0) * col("w") / col("tw")).cast("long").as("alloc"))
    val rk = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.select(col("source"), col("doc_id"))
      .withColumn("rk", row_number().over(rk))
      .join(broadcast(alloc), "source")
      .filter(col("rk") <= col("alloc"))
      .select(col("source"), col("doc_id"), col("rk"), col("n_h"),
        col("s_h"), col("alloc"))
      .orderBy(col("source"), col("rk"))
  }

  /** GPT-style sequence packing (concat-and-chunk): within each shard
    * (doc_id % 8 — the parallel unit), documents are concatenated in
    * doc_id order and chunked into fixed 512-token context windows; each
    * doc's pack is its starting token offset div 512. One window per
    * shard — shards are independent, so at 100 TB parallelism is
    * O(shards) and no shard ever sees another's offsets (the same layout
    * a distributed tokenizer-packer job uses).
    */
  private def packSequences(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
        size(toks(col("text"))).as("n_tokens"))
      .withColumn("start_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", (col("start_offset") / 512).cast("long"))
      .select(col("shard"), col("doc_id"), col("n_tokens"),
        col("start_offset"), col("pack_id"))
      .orderBy(col("shard"), col("doc_id"))
  }

  /** Deterministic training-order shuffle + shard assignment (the
    * epoch-order step every trainer runs before reading a corpus): each
    * doc hashes to a shard and to a position WITHIN that shard, both
    * pure functions of content-free ids — reproducible on any engine,
    * any partitioning, any rerun, with no RNG state (the
    * sample_hash_split discipline applied to ordering). Readers stream
    * shard files independently; the global order is the (pos, shard)
    * interleave.
    *
    * Scale notes: no global sort — position is a row_number clustered
    * per shard (N independent sorts of corpus/N), which is the whole
    * point vs. ORDER BY rand(): the one shuffle is the shard
    * partitioning itself.
    */
  private def shuffleShard(s: SparkSession, dir: String): DataFrame = {
    val n = 8
    val w = Window.partitionBy(col("shard")).orderBy(col("rk"), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(concat(lit("epoch1-"), col("doc_id").cast("string"))).as("rk"))
      .withColumn("shard",
        pmod(conv(substring(col("rk"), 1, 8), 16, 10).cast("long"), lit(n)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  /** Best-fit-decreasing sequence packing — the padding-waste
    * minimizer `pack_sequences`' concatenate-and-split can't be when
    * documents must stay WHOLE (no mid-doc truncation into a
    * neighboring sequence): docs sort by token count descending and
    * each goes to the FULLEST bin that still fits, opening a new bin
    * only when none does. Classic BFD guarantees ≤ 11/9·OPT + 1 bins
    * (Johnson 1973); the ScalaTest asserts no-overflow, ≤ first-fit
    * bin counts, and determinism. Docs longer than the 512 capacity
    * are clamped (doc_chunk is the splitting path). Fully oracled: the
    * greedy is ALL-INTEGER (loads, capacities, tie-breaks), so the
    * DuckDB twin replays it exactly as a recursive CTE carrying the
    * bin-load list across steps — no float hazard anywhere.
    *
    * Scale notes: packing is inherently sequential WITHIN a bin set,
    * so the corpus shards first (the same shard key pack_sequences
    * uses) and each shard packs independently in one mapGroups pass —
    * parallelism O(shards), per-shard state O(bins), no global
    * coordination. This is the one deliberate typed-imperative operator
    * class (per-partition sequential logic Catalyst cannot express);
    * everything around it stays relational.
    */
  private def packBestfit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cap = 512
    // the BFD order (size desc, id asc) is delivered by Spark's own
    // EXTERNAL sort (repartition on shard + sortWithinPartitions), so
    // the per-partition fold holds ONLY the bin-load array — genuinely
    // O(bins) state. The former flatMapGroups buffered the whole shard
    // via it.toSeq before sorting, which contradicted the documented
    // posture (corpus/shards rows in one executor's heap at 100 TB).
    // Hash repartition puts each shard wholly in one partition; a
    // partition holding several shards resets its loads at every shard
    // boundary (rows arrive sorted by shard first).
    Tables.documents(s, dir)
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
        least(size(toks(col("text"))), lit(cap)).cast("int").as("n_tokens"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("n_tokens").desc, col("doc_id"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        var curShard = Long.MinValue
        var loads = scala.collection.mutable.ArrayBuffer.empty[Int]
        it.map { case (id, shard, n) =>
          if (shard != curShard) {
            curShard = shard
            loads = scala.collection.mutable.ArrayBuffer.empty[Int]
          }
          var best = -1
          var bestLoad = -1
          var i = 0
          while (i < loads.length) {
            if (loads(i) + n <= cap && loads(i) > bestLoad) {
              best = i; bestLoad = loads(i)
            }
            i += 1
          }
          val bin = if (best < 0) { loads += 0; loads.length - 1 } else best
          loads(bin) += n
          (shard, id, n, bin)
        }
      }.toDF("shard", "doc_id", "n_tokens", "bin_id")
      .orderBy(col("shard"), col("doc_id"))
  }

  /** n-gram (shingle) Jaccard near-dup pairs — word-ORDER-sensitive
    * where the unigram twin is bag-of-words: 3-token shingles make
    * reordered copies dissimilar and phrase-level copies similar, the
    * standard shingling step under MinHash (Broder '97). Same
    * inverted-index-within-block shape as dedup_jaccard; at 100 TB the
    * shingle sets feed the banded-MinHash path unchanged. The fixture
    * texts are independent word draws, so shingle similarity tops out
    * near 0.02 where the unigram twin sees 0.5+ on the same pairs —
    * exactly the order-sensitivity the shingling exists to add; the
    * threshold is set at the fixture's phrase-overlap ceiling.
    */
  private def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val cand = Tables.documents(s, dir)
      .filter(col("doc_id") % 10 === 0)
      .withColumn("t", toks(col("text")))
      // floor at 1: sequence(1, 0) would generate DESCENDING [1, 0] and
      // slice(_, 0, _) throws; a <3-token doc yields its whole text as
      // the single shingle (same on the DuckDB side)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(1, greatest(size(t) - 2, 1)), i -> array_join(slice(t, i, 3), ' '))"))
        .as("shingles"))
    jaccardPairCounts(cand, "shingles")
      .withColumn("jaccard", round(col("n_inter").cast("double")
        / (col("sz_a") + col("sz_b") - col("n_inter")), 6))
      .filter(col("jaccard") >= 0.02)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Train/eval decontamination — the corpus-hygiene step every LLM
    * training pipeline runs before a benchmark is trusted: flag training
    * documents that share any 3-token shingle with a held-out evaluation
    * set (the GPT-3-style n-gram decontamination protocol). The split is
    * deterministic (doc_id % 97 = 0 → eval, ~1%). Output: each
    * contaminated train doc with how many distinct shingles it shares and
    * how many eval docs it collides with.
    *
    * Scale notes: the eval side is a fixed benchmark — O(benchmark), not
    * O(corpus) — so its shingle set is broadcast and the 100 TB train side
    * is probed map-side with a partial-agg count on top: the corpus never
    * shuffles. (The broadcast is explicit; at fixture scale Catalyst
    * would pick it anyway, at real scale the eval set still fits.)
    */
  private def decontamNgram(s: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(s, dir)
      .withColumn("t", toks(col("text")))
      // same shingling (and same <3-token floor) as dedup_ngram_jaccard;
      // persisted: the train and eval branches would otherwise both
      // re-tokenize the full corpus
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(1, greatest(size(t) - 2, 1)), i -> array_join(slice(t, i, 3), ' '))"))
        .as("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val train = sh.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
    val ev = sh.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("eval_id"), explode(col("shingles")).as("sh"))
    train.join(broadcast(ev), "sh")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("sh")).as("n_shared"),
        countDistinct(col("eval_id")).as("n_eval_hit"))
      .orderBy(col("doc_id"))
  }

  /** Exact-substring decontamination (the GPT-2/OpenWebText protocol,
    * complementing decontam_ngram's shingle overlap): each held-out eval
    * doc contributes its leading 3-token string as a needle; any train
    * doc CONTAINING that needle verbatim is contamination. Per eval
    * needle: how many train docs it taints (0 = clean).
    *
    * Scale notes: the needle set is the eval benchmark — thousands of
    * rows, KBs — so it broadcasts and the contains() probe is a
    * map-side scan of the corpus (one pass, zero shuffle of train
    * text); the per-eval tallies shuffle only eval-set-sized counts.
    */
  private def decontamExact(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val ev = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("eval_id"),
        array_join(slice(toks(col("text")), 1, 3), " ").as("needle"))
    val hits = docs.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(ev), col("text").contains(col("needle")))
      .groupBy(col("eval_id")).agg(count(lit(1)).as("n"))
    ev.join(hits, Seq("eval_id"), "left")
      .select(col("eval_id"), col("needle"),
        coalesce(col("n"), lit(0L)).as("n_train_hits"))
      .orderBy(col("eval_id"))
  }

  /** Temperature-scaled mixture resampling (multilingual-LM sampling,
    * α = 0.5): per-source target share ∝ √count renormalized — upsamples
    * the tail, downsamples the head relative to natural frequency. The
    * overall budget is 20% of the corpus; each source keeps
    * min(n, ⌊share·budget⌋) docs. √ is IEEE-correctly-rounded (unlike
    * pow), each √n is 6dp-rounded into an exact decimal sum, and shares
    * are 6dp-rounded before the floor, so both engines floor the same
    * value (boundary risk only if share·budget lands exactly on an
    * integer at 6dp — not the case for these fixtures, same residual
    * class as Det.dsum).
    *
    * Scale notes: one count-by-source shuffle (O(sources) rows); the
    * actual document draw (not materialized here) is the
    * sample_stratified md5-rank filter with these quotas — map-side.
    */
  private def sampleTemperature(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(s, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val tot = per.agg(
      sum(sqrt(col("n")).cast(org.apache.spark.sql.types.DecimalType(30, 6)))
        .cast("double").as("sw"),
      sum(col("n")).as("nt"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n").as("n_docs"),
        round(sqrt(col("n")) / col("sw"), 6).as("share"),
        least(col("n"),
          floor(round(sqrt(col("n")) / col("sw"), 6)
            * floor(col("nt") * 0.2)).cast("long")).as("n_kept"))
      .orderBy(col("source"))
  }

  /** One BPE training step (Sennrich et al. 2016): count adjacent
    * character pairs across the corpus vocabulary, weighted by word
    * frequency — the argmax pair is the next merge a byte-pair-encoding
    * tokenizer would learn. The full train loop is this step iterated
    * driver-side with the merged symbol substituted; the heavy lifting
    * (the corpus-wide pair count) is what has to scale, and it is the
    * classic two-level rollup: word frequencies first (map-side
    * combined), then pairs exploded from the DISTINCT vocab — O(vocab)
    * rows, not O(corpus) — so 100 TB of text reduces to a vocabulary
    * before any per-character work happens.
    */
  private def tokBpeStep(s: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(s, dir)
      .select(explode(toks(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    vocab
      // single-char words carry no pair; the filter also guards Spark's
      // sequence(1, 0), which counts DOWN rather than returning empty
      .filter(length(col("word")) >= 2)
      .select(col("freq"), explode(expr(
        """transform(sequence(1, length(word) - 1),
             i -> substring(word, i, 2))"""))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)
  }

  /** The full BPE merge-table TRAINING loop (tok_bpe_step iterated to a
    * 12-rule table — Sennrich et al. 2016): each round counts adjacent
    * SYMBOL pairs over the frequency-weighted vocabulary (symbols start
    * as characters + a `</w>` end marker and grow as merges land),
    * collects the single argmax pair (ties: count DESC, left ASC,
    * right ASC — the merge sequence is a pure function of the corpus),
    * and applies the merge as a leftmost-first fold over the collected
    * vocabulary. Iterated fixpoint → not SQL-expressible → rows-only;
    * VectorTextSpec pins the whole merge table against an independent
    * reimplementation at sf0.001.
    *
    * Scale notes: the 100 TB pass is the ONE word-frequency rollup
    * (map-side combined); every training round then touches only the
    * compressed word DOMAIN (vocab-capped at 3000 rows by the limit —
    * bounded driver metadata, the same class as the trained-codebook
    * collects), never the corpus — the SentencePiece discipline. The
    * 12 merge rounds run driver-side over that bounded domain: the
    * prior shape re-planned, re-codegen'd and localCheckpoint'd a
    * 12-round Spark loop over ≤3000 rows, paying ~13 s of pure
    * scheduling/compilation overhead for work that is O(vocab × len)
    * integers (optimization guide §1.2: fix the algorithm's shape —
    * cluster passes for corpus-scale work, driver arithmetic for
    * bounded domains).
    */
  private def tokBpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the one corpus-scale pass (unchanged): word-frequency rollup,
    // vocab-capped ordered by (freq DESC, word ASC) — Spark-side so the
    // heavy explode/agg stays distributed and map-side combined
    val vocab: Array[(String, Long)] = Tables.documents(s, dir)
      .select(explode(toks(lower(col("text")))).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(3000)
      .as[(String, Long)].collect()
    // symbol sequences start as characters + the </w> end marker
    var seqs: Array[(Array[String], Long)] = vocab.map { case (w, f) =>
      (w.map(_.toString).toArray :+ "</w>", f)
    }
    val merges =
      scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var step = 1
    while (step <= 12) {
      // corpus-weighted adjacent-pair counts over the domain
      val pc = scala.collection.mutable.HashMap[(String, String), Long]()
      seqs.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (pc.nonEmpty) {
        // ties: count DESC, left ASC, right ASC — the corpus is ASCII,
        // where Scala string order equals Spark's UTF8 binary order
        val ((a, b), cnt) = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((step, a, b, a + b, cnt))
        // leftmost-first greedy application, spelled as the trailing
        // fold the HOF version used (equivalent to the scan-skip form:
        // a merged symbol a+b can never itself equal `a`, so a fresh
        // merge never immediately re-merges; "aaa" + (a,a) → ["aa","a"])
        seqs = seqs.map { case (syms, f) =>
          val acc = scala.collection.mutable.ArrayBuffer[String]()
          syms.foreach { x =>
            if (acc.nonEmpty && acc.last == a && x == b)
              acc(acc.length - 1) = a + b
            else acc += x
          }
          (acc.toArray, f)
        }
      }
      step += 1
    }
    merges.toSeq
      .toDF("step", "left", "right", "merged", "pair_freq")
      .orderBy(col("step"))
  }

  /** Content-addressed dataset fingerprint (the reproducibility primitive
    * a training-data pipeline version-pins mixtures with): per source,
    * an ORDER-INDEPENDENT digest = exact decimal sum of each doc's
    * 60-bit sha256 prefix. Any added/removed/edited doc changes the
    * fingerprint; partition order, shuffle plan, and engine cannot.
    * Map-side hash + one O(sources) shuffle — fingerprinting is scan
    * speed at any scale, and per-source digests compose into a manifest
    * (sink_atomic_swap's natural companion).
    *
    * The digest sum exceeds 2^63 (sums of 60-bit prefixes), so it is
    * emitted as a canonical digit STRING: >64-bit DECIMAL value
    * representations diverge between engines at the comparison edge
    * even when the integers are bit-identical.
    */
  private def datasetFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"),
        conv(substring(sha2(col("text").cast("binary"), 256), 1, 15), 16, 10)
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("h")).cast("string").as("fingerprint"))
      .orderBy(col("source"))

  /** Prefix-duplicate detection (the URL/boilerplate-header dup shape:
    * crawls re-serve the same page with a mutated tail): docs sharing an
    * identical 8-token prefix collapse to the lowest doc_id. Same
    * digest-groupBy-keep-first shape as dedup_exact_hash — one shuffle
    * on the prefix digest, map-side combined; at 100 TB the digest is
    * the shuffle key so payload text never moves twice.
    */
  private def dedupPrefix(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("digest")).orderBy(col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        sha2(array_join(slice(toks(col("text")), 1, 8), " "), 256)
          .as("digest"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_copies", count(lit(1)).over(
        Window.partitionBy(col("digest"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("digest"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  /** TOKEN-budget mixture sampling (how training mixtures are actually
    * specified — The Pile / Dolma quotas are token counts, not document
    * counts; a doc-count quota over-weights sources with long
    * documents): each source gets a budget of 30% of its own token
    * mass, docs are ranked by a deterministic content-free hash (stable
    * under reruns, engines, partitionings — the sample_hash_split
    * discipline), and docs are taken while the running token total fits
    * the budget. Per-source admission stats come back for the mixture
    * manifest.
    *
    * Scale notes: one cumulative-sum window clustered per source (the
    * same one shuffle a per-source sort costs) + an O(sources) budget
    * aggregate joined back broadcast. No RNG state, no global sort; the
    * admitted set is reproducible on any engine from the data alone.
    */
  private def sampleTokenBudget(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_toks"),
        md5(col("doc_id").cast("string")).as("rk"))
    val budgets = t.groupBy(col("source"))
      .agg(floor(sum(col("n_toks")) * 0.3).as("budget_tokens"))
    val w = Window.partitionBy(col("source")).orderBy(col("rk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum", sum(col("n_toks")).over(w))
      .join(broadcast(budgets), "source")
      .filter(col("cum") <= col("budget_tokens"))
      .groupBy(col("source"), col("budget_tokens"))
      .agg(count(lit(1)).as("n_docs_taken"),
        sum(col("n_toks")).as("tokens_taken"))
      .select(col("source"), col("n_docs_taken"), col("tokens_taken"),
        col("budget_tokens"))
      .orderBy(col("source"))
  }

  /** Corpus-wide repeated-substring self-dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" — the
    * suffix-array ExactSubstr step, re-expressed relationally): every
    * k-token gram that occurs ≥ 2 times ANYWHERE in the corpus marks its
    * positions, and runs of adjacent repeated positions merge into
    * maximal spans per document — the spans ExactSubstr would cut before
    * training. Per doc: repeated-gram count, span count, covered tokens
    * and coverage fraction.
    *
    * Scale notes: this is the suffix-array formulation without the
    * suffix array — the ONE data shuffle is on the gram digest (window
    * count partitioned by digest ≡ sort/group of grams, the relational
    * twin of suffix-array construction); corpus text never moves as
    * pairs and nothing is broadcast, unlike decontam_exact's
    * needle-probe shape. Island-merge is a second window clustered on
    * doc_id (the partitioning the digest shuffle's output reuses for
    * its groupBys). O(corpus × k) gram records, linear; at 100 TB pick
    * k≈50 and hash grams to 8-byte digests so the shuffle payload is
    * (digest, doc, pos) triples, never text.
    */
  private def dedupSubstring(s: SparkSession, dir: String): DataFrame = {
    val k = 5
    val byDigest = Window.partitionBy(col("digest"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val grams = Tables.documents(s, dir)
      .withColumn("arr", toks(col("text")))
      .select(col("doc_id"), size(col("arr")).cast("long").as("n_tokens"),
        posexplode(expr(
          s"""if(size(arr) < $k, array(),
                transform(sequence(1, size(arr) - ${k - 1}),
                  i -> sha2(array_join(slice(arr, i, $k), ' '), 256)))""")))
      .select(col("doc_id"), col("n_tokens"),
        (col("pos") + 1).as("pos"), col("col").as("digest"))
    val spans = grams
      .withColumn("cnt", count(lit(1)).over(byDigest))
      .filter(col("cnt") >= 2)
      // spans must merge whenever their k-token RANGES overlap (start
      // positions within k-1), not only when positions are adjacent —
      // otherwise covered_tokens double-counts the overlap and the
      // coverage fraction can exceed 1 on heavily repetitive docs
      .withColumn("new_span",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= k - 1, 0)
          .otherwise(1))
      .withColumn("island", sum(col("new_span")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("n_tokens"), col("island"))
      .agg(count(lit(1)).as("n_grams"), min(col("pos")).as("spos"),
        (max(col("pos")) + lit(k - 1)).as("epos"))
    spans.groupBy(col("doc_id"), col("n_tokens"))
      .agg(sum(col("n_grams")).as("n_rep_grams"),
        count(lit(1)).as("n_spans"),
        sum(col("epos") - col("spos") + 1).as("covered_tokens"),
        max(col("epos") - col("spos") + 1).as("max_span_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_rep_grams"),
        col("n_spans"), col("covered_tokens"), col("max_span_tokens"),
        round(col("covered_tokens").cast("double") / col("n_tokens"), 6)
          .as("rep_frac"))
      .orderBy(col("doc_id"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1): the
    * quality-filter family that catches degenerate/boilerplate text by
    * how much of it repeats — fraction of duplicate bigrams/trigrams and
    * the share of the doc taken by its single most frequent token. The
    * flag thresholds are the published Gopher cuts (dup n-gram > 0.2,
    * top token > 0.3).
    *
    * Scale notes: the n-gram duplicate fractions are pure per-row HOF
    * expressions (zero shuffle); the top-token share is the canonical
    * explode → partial-agg tf → per-doc max, one shuffle on
    * (doc_id, token) with map-side combine, re-joined on doc_id. All
    * ratios are single IEEE divisions of exact integer counts — identical
    * bits in both engines, no rounding needed at the edge.
    */
  private def textRepetition(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).withColumn("arr", toks(col("text")))
    val grams = docs.select(
      col("doc_id"),
      expr("""transform(sequence(1, greatest(size(arr) - 1, 1)),
                i -> array_join(slice(arr, i, 2), ' '))""").as("g2"),
      expr("""transform(sequence(1, greatest(size(arr) - 2, 1)),
                i -> array_join(slice(arr, i, 3), ' '))""").as("g3"))
      .select(col("doc_id"),
        (lit(1.0) - size(array_distinct(col("g2"))).cast("double")
          / size(col("g2"))).as("dup_bigram_frac"),
        (lit(1.0) - size(array_distinct(col("g3"))).cast("double")
          / size(col("g3"))).as("dup_trigram_frac"))
    val topTok = docs
      .select(col("doc_id"), explode(col("arr")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      .groupBy(col("doc_id"))
      .agg((max(col("tf")).cast("double") / sum(col("tf")))
        .as("top_token_frac"))
    grams.join(topTok, "doc_id")
      .withColumn("is_repetitive",
        col("dup_bigram_frac") > 0.2 || col("top_token_frac") > 0.3)
      .orderBy(col("doc_id"))
  }

  /** Corpus-frequency boilerplate detection (the RefinedWeb / CCNet
    * line-dedup step, shingle-shaped because the fixture text has no line
    * structure): a 3-token shingle appearing in ≥ 5 distinct documents is
    * boilerplate; each document reports how much of it is boilerplate and
    * is flagged when the ratio passes 0.1 (a tunable cut; the synthetic
    * corpus tops out at ~0.27, real crawls run far higher) — the
    * "mostly template" docs a crawl pipeline drops before training.
    *
    * Scale notes: shingle document-frequency is one explode +
    * partial-agg shuffle (the same inverted index dedup_ngram_jaccard
    * builds, aggregated instead of self-joined — never pairwise). The
    * boilerplate set is then broadcast back against the per-doc shingle
    * lists: the corpus-side probe is map-side, and the final per-doc
    * ratio is a groupBy on doc_id that AQE coalesces. At 100 TB the
    * boilerplate set is df-bounded (high-df shingles are by construction
    * few relative to the corpus) — if it outgrew broadcast, the same plan
    * degrades gracefully to a shuffle join on the shingle key.
    */
  private def textBoilerplate(s: SparkSession, dir: String): DataFrame = {
    // identical shingle plan to decontam_ngram → CacheManager shares the
    // persisted data between the two operators (keyed on canonical plan)
    val sh = Tables.documents(s, dir)
      .withColumn("t", toks(col("text")))
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(1, greatest(size(t) - 2, 1)), i -> array_join(slice(t, i, 3), ' '))"))
        .as("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val inv = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val boiler = inv.groupBy(col("sh"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 5)
      .select(col("sh"))
    inv.join(broadcast(boiler), Seq("sh"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_boiler"))
      .join(sh.select(col("doc_id"), size(col("shingles")).as("n_shingles")),
        Seq("doc_id"), "right_outer")
      .na.fill(0L, Seq("n_boiler"))
      .withColumn("boiler_ratio",
        col("n_boiler").cast("double") / col("n_shingles"))
      .withColumn("is_boilerplate", col("boiler_ratio") > 0.1)
      .select(col("doc_id"), col("n_shingles"), col("n_boiler"),
        col("boiler_ratio"), col("is_boilerplate"))
      .orderBy(col("doc_id"))
  }

  /** 64-bit SimHash: per-token xxhash64, each bit votes ±1 weighted by tf,
    * sign of the vote → bit. Near-dups share high-bit buckets. xxhash64
    * has no DuckDB twin → rows-only here, golden-value ScalaTest.
    */
  private def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("token"))
      .select(col("doc_id"), xxhash64(col("token")).as("h"),
        explode(expr("sequence(0, 63)")).as("bit"))
      .withColumn("vote",
        when(expr("(h >> bit) & 1") === 1, 1).otherwise(-1))
      .groupBy(col("doc_id"), col("bit"))
      .agg(sum(col("vote")).as("votes"))
      .withColumn("bitval",
        when(col("votes") > 0, expr("CAST(1 AS BIGINT) << bit")).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(sum(col("bitval")).as("simhash"))
      .withColumn("bucket", expr("simhash >> 48"))
      .orderBy(col("doc_id"))

  /** Cross-batch bloom dedup — the incremental-ingest complement of
    * dedup_exact_hash: yesterday's content hashes fold into ONE mergeable
    * bloom filter (Spark's own runtime-filter aggregate, exposed via the
    * graft registry) and today's batch probes it as a scalar subquery —
    * a broadcast-sized membership oracle instead of a join against
    * yesterday's corpus. Bit-OR merge makes the filter deterministic
    * under any partitioning; sized at 2^20 bits for ~10⁵ items the
    * false-positive rate is ≈1e-19 at fixture scale, so the exact
    * semi-join oracle holds.
    *
    * Scale notes: THIS is how 100 TB pipelines dedup against history —
    * the historical corpus is never re-scanned (its bloom is a few MB of
    * state, merged incrementally per batch), and the probe is map-side.
    * False positives only ever drop a duplicate-looking NEW doc (tunable
    * via bits/item); false negatives cannot happen.
    */
  private def dedupBloom(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.documents(s, dir).createOrReplaceTempView("docs_bloom")
    s.sql("""
      SELECT doc_id,
        bloom_contains(
          (SELECT bloom_agg(xxhash64(text), 100000L, 1048576L)
           FROM docs_bloom WHERE doc_id % 2 = 0),
          xxhash64(text)) AS seen
      FROM docs_bloom WHERE doc_id % 2 <> 0 ORDER BY doc_id""")
  }

  /** Deterministic reservoir sample: rank every doc by a cryptographic
    * hash of its id and keep the k smallest — uniform over any input
    * order/partitioning, REPRODUCIBLE across engines and reruns (the
    * property `rand()`-based reservoirs lose the moment parallelism or
    * retry enters). Spark plans the hash-order LIMIT as
    * TakeOrderedAndProject — distributed top-k, never a global sort; the
    * final rank attaches on the k-row result, not the corpus.
    */
  private def sampleReservoir(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(col("doc_id").cast("string").cast("binary")).as("tag"))
      .orderBy(col("tag"), col("doc_id"))
      .limit(100)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("tag"), col("doc_id"))))
      .orderBy(col("rank"))

  /** ClickHouse `topKWeighted` — exact formulation: top tokens by a
    * per-occurrence weight (here the host document's size, so tokens from
    * heavyweight docs rank up even at equal frequency). This is the
    * oracle-able twin of the SpaceSaving sketch (udaf_sketch_topk): at
    * 100 TB the sketch's mergeable O(k) partials are the real path and
    * this exact two-phase agg verifies it at test scale.
    */
  private def topkWeighted(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("n_chars"), explode(toks(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(sum(col("n_chars")).as("w"), count(lit(1)).as("n_occ"))
      .orderBy(col("w").desc, col("tok"))
      .limit(10)

  /** Zipf's-law fit over the token frequency spectrum: regress
    * ln(freq) on ln(rank) for the top 100 tokens — the standard corpus
    * health check (natural text ⇒ slope ≈ −1; word-soup/generated text
    * drifts off). Per-point ln values round to 6dp (doubles never sit on
    * a decimal midpoint, so both engines round identically), moments are
    * exact decimal sums, the closed form runs in double with one
    * operation order — the agg_regression determinism recipe.
    *
    * Scale notes: frequency = one partial-agg shuffle over tokens; the
    * top-100 rank window runs on the aggregated spectrum (O(vocab), not
    * O(corpus)); the 100-point regression is a broadcastable scalar agg.
    */
  private def textZipfFit(s: SparkSession, dir: String): DataFrame = {
    val ranked = Tables.documents(s, dir)
      .select(explode(toks(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
      .withColumn("r", row_number().over(
        Window.orderBy(col("f").desc, col("tok"))))
      .filter(col("r") <= 100)
      .select(round(log(col("r").cast("double")), 6).as("lx"),
        round(log(col("f").cast("double")), 6).as("ly"))
    ranked
      .agg(count(lit(1)).cast("double").as("n"),
        Det.dsum(col("lx")).as("sx"), Det.dsum(col("ly")).as("sy"),
        Det.dsum(col("lx") * col("ly")).as("sxy"),
        Det.dsum(col("lx") * col("lx")).as("sxx"))
      .select(col("n").cast("long").as("n_points"),
        round((col("n") * col("sxy") - col("sx") * col("sy"))
          / (col("n") * col("sxx") - col("sx") * col("sx")), 6)
          .as("zipf_slope"),
        round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy"))
          / (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx"))
          / col("n"), 6).as("intercept"))
  }

  /** Keyword extraction — top-3 terms per doc by tf-idf (deterministic
    * tiebreak on the rounded score, then token): the retrieval-index /
    * tagging primitive one window pass above text_tf_idf. The rank runs
    * over the aggregated (doc, token) table clustered by doc — never the
    * token stream — and keywords leave as one canonical CSV per doc.
    */
  /** Curriculum ordering (easy→hard training schedule): each document
    * is assigned a difficulty STAGE from broadcast decile cutpoints of
    * n_chars — `1 + Σ(n_chars > cᵢ)` over the 9 interpolated deciles, a
    * codegen'd array HOF — then a deterministic hash-rank position
    * within its stage. The cutpoint rule (not a global ntile) is the
    * scale story: no global sort ever runs; stage assignment is
    * map-side against 9 broadcast doubles, mirroring how shuffle_shard
    * derives order from hashes rather than RNG.
    *
    * Scale notes: one scalar percentile agg broadcast back; the only
    * shuffle is the per-stage rank (10 partitions — salt the rank key
    * to (stage, hash-prefix) at real scale, positions then compose as
    * prefix-sums per salt, same as shuffle_shard's (shard, pos) pair).
    */
  private def sampleCurriculum(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // Cutpoints are rounded to 4dp on BOTH engines: percentile()
    // (Spark: lo*(hi-pos)+hi*(pos-lo)) and quantile_cont (DuckDB:
    // lo+(hi-lo)*frac) differ in the last ulp, and when the true
    // cutpoint is integer-valued (tied neighbors) one engine can land
    // an ulp BELOW the integer — flipping `n_chars > c` for every doc
    // at that value and cascading through pos_in_stage. True cutpoints
    // are tenth-fractions, so 4dp is far from any rounding boundary.
    val cuts = docs.agg(expr(
      """transform(
           percentile(n_chars, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9)),
           c -> round(c, 4))""")
      .as("cs"))
    val inStage = Window.partitionBy(col("stage"))
      .orderBy(md5(concat(lit("curr-"), col("doc_id"))), col("doc_id"))
    docs.crossJoin(broadcast(cuts))
      .withColumn("stage",
        expr("1 + aggregate(cs, 0, (a, c) -> a + IF(n_chars > c, 1, 0))"))
      .withColumn("pos_in_stage", row_number().over(inStage))
      .select(col("stage"), col("pos_in_stage"), col("doc_id"),
        col("n_chars"))
      .orderBy(col("stage"), col("pos_in_stage"))
  }

  /** Token co-occurrence with PMI-style lift (word2vec-era corpus
    * statistics, the collocation signal behind phrase mining): for the
    * top-100 document-frequency tokens (len ≥ 3), count docs where a
    * pair co-occurs and score lift = P(w1,w2)/(P(w1)P(w2)) =
    * n_pair·N/(n1·n2). The score is emitted in integer MICRO-units via
    * integer division (all-positive, so floor = truncate on both
    * engines) instead of log-PMI — same ranking, zero libm.
    *
    * Scale notes: the vocabulary cap is the scale story — pairs are
    * generated per doc over ≤100 broadcast-filtered tokens (≤4950 pairs
    * per doc, independent of doc length), then one hash-agg. The
    * all-pairs domain is the capped vocab², never tokens². df counts
    * ride along the broadcast join so the pair agg needs no second join.
    */
  private def textPmiCooccur(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val t = docs
      .select(col("doc_id"), explode(toks(col("text"))).as("w"))
      .filter(length(col("w")) >= 3)
      .distinct()
    val top = t.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("w")).limit(100)
    val tt = t.join(broadcast(top), "w")
    val nDocs = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    tt.as("a")
      .join(tt.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.w") < col("b.w"))
      .groupBy(col("a.w").as("w1"), col("b.w").as("w2"),
        col("a.df").as("n1"), col("b.df").as("n2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= 5)
      .crossJoin(broadcast(nDocs))
      .select(col("w1"), col("w2"), col("n_pair"), col("n1"), col("n2"),
        expr("n_pair * n_docs * 1000000 div (n1 * n2)").as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("w1"), col("w2"))
      .limit(50)
  }

  private def textKeywords(s: SparkSession, dir: String): DataFrame = {
    val byScore = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("token"))
    tfidfScores(s, dir)
      .withColumn("rk", row_number().over(byScore))
      .filter(col("rk") <= 3)
      .groupBy(col("doc_id"))
      .agg(expr("""array_join(transform(
             array_sort(collect_list(struct(rk, token))),
             x -> x.token), ',')""").as("keywords"))
      .orderBy(col("doc_id"))
  }

  /** Interpolated bigram language-model score — the perplexity-filter
    * upgrade over text_lm_score's unigram model: per token,
    * p = 0.7·C(prev,cur)/C(prev,·) + 0.3·C(cur)/N, per-doc mean of
    * ln p. Counts are exact corpus aggregates; each term runs the same
    * double expression on both engines, rounds to 6dp, and decimal-sums
    * per doc (order-free). Self-scored on the corpus itself, so docs
    * whose transitions are corpus-typical score high — the
    * KenLM-style quality signal with zero model dependency.
    *
    * Scale notes: the LM tables (bigram, prefix, unigram counts) are
    * vocab-sized — they broadcast, so the token stream is scored
    * map-side after ONE shuffle to build the counts; per-doc reduction
    * is a partial agg on doc_id.
    */
  private def textLmBigram(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("o", "tok")))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("o"))
    val bi = t.withColumn("prev", lag(col("tok"), 1).over(byDoc))
      .filter(col("prev").isNotNull)
    val cBi = bi.groupBy(col("prev"), col("tok"))
      .agg(count(lit(1)).as("c_bi"))
    val cPref = bi.groupBy(col("prev")).agg(count(lit(1)).as("c_pref"))
    val cUni = t.groupBy(col("tok")).agg(count(lit(1)).as("c_uni"))
    val nTot = t.agg(count(lit(1)).as("n_tot"))
    val p = lit(0.7) * (col("c_bi").cast("double") / col("c_pref").cast("double")) +
      lit(0.3) * (col("c_uni").cast("double") / col("n_tot").cast("double"))
    bi.join(broadcast(cBi), Seq("prev", "tok"))
      .join(broadcast(cPref), Seq("prev"))
      .join(broadcast(cUni), Seq("tok"))
      .crossJoin(broadcast(nTot))
      .select(col("doc_id"), round(log(p), 6).as("term"))
      .groupBy(col("doc_id"))
      // SUM, not mean: the decimal sum of 6dp terms is exact at 6dp,
      // while a sum/n division can land on a 6dp midpoint and round
      // differently across engines (observed at sf0.01, row 484)
      .agg(count(lit(1)).as("n_terms"),
        round(Det.dsum(col("term")), 6).as("sum_logprob"))
      .orderBy(col("doc_id"))
  }

  /** Corpus drift — Jensen-Shannon divergence between two source halves'
    * token distributions (src0-9 vs src10-19), in bits: THE monitoring
    * statistic for "did the mixture shift between snapshots". Per-token
    * contributions are doubles with one operation order (ln-parity
    * pattern, 6dp per-term round), decimal-summed so the reduction is
    * order-free; disjoint-support tokens contribute p·ln2 exactly.
    *
    * Scale notes: two partial-count shuffles collapse 100 TB of text to
    * O(vocab) rows; the A/B join is token-co-partitioned; totals ride a
    * broadcast 1-row cross join. JSD(bits) ∈ [0,1] regardless of corpus
    * size.
    */
  private def textCorpusDivergence(s: SparkSession, dir: String): DataFrame = {
    def freq(half: Column) = Tables.documents(s, dir)
      .filter(half)
      .select(explode(toks(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val srcNum = regexp_extract(col("source"), "([0-9]+)", 1).cast("int")
    val a = freq(srcNum < 10).withColumnRenamed("cnt", "ca")
    val b = freq(srcNum >= 10).withColumnRenamed("cnt", "cb")
    val joined = a.join(b, Seq("tok"), "full_outer")
      .select(col("tok"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = joined.agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"))
    val p = col("ca").cast("double") / col("ta").cast("double")
    val q = col("cb").cast("double") / col("tb").cast("double")
    val ln2 = lit(0.6931471805599453) // literal, not libm — no 1-ulp risk
    val term =
      when(col("ca") > 0 && col("cb") > 0,
        p * log(lit(2.0) * p / (p + q)) + q * log(lit(2.0) * q / (p + q)))
        .when(col("ca") > 0, p * ln2)
        .otherwise(q * ln2)
    joined.crossJoin(broadcast(tot))
      .select(round(term, 6).as("c"))
      .agg(count(lit(1)).as("vocab_union"),
        round(Det.dsum(col("c")) / lit(1.3862943611198906), 6)
          .as("jsd_bits"))
  }

  /** Compression-ratio quality signal (the Gopher/C4-family
    * repetitiveness proxy): deflate(text) length over raw length — near-
    * duplicate or templated text compresses far below natural prose.
    * DEFLATE level 6 is deterministic for fixed input, but no SQL engine
    * ships a zlib twin, so this is a rows-only key with golden + ordering
    * ScalaTests (CorpusQualitySpec). Runs as the canonical mapPartitions
    * batch shape: one Deflater per partition, reset per doc — exactly the
    * codec-amortization layout mm_decode documents.
    */
  private def textCompressRatio(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("raw_len", IntegerType),
      StructField("comp_len", IntegerType),
      StructField("ratio", DoubleType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        val deflater = new java.util.zip.Deflater(6)
        val buf = new Array[Byte](1 << 16)
        rows.map { r =>
          val bytes = r.getString(1).getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var n = 0
          while (!deflater.finished()) n += deflater.deflate(buf)
          Row(r.getLong(0), bytes.length, n,
            math.rint(n.toDouble / bytes.length * 1e6) / 1e6)
        }
      }(enc)
      .orderBy(col("doc_id"))
  }

  /** Heaps'-law vocabulary growth — |vocab| as the corpus grows, the
    * companion diagnostic to text_zipf_fit (natural text grows ∝ n^β,
    * β≈0.5; saturating growth flags templated/duplicated corpora). The
    * naive way is one distinct-count per prefix (k passes over 100 TB);
    * here each token contributes only its FIRST bucket (min over a
    * deciled corpus order) and the growth curve is a running sum over
    * the 10-row bucket histogram — ONE pass, one shuffle on token.
    */
  private def textVocabGrowth(s: SparkSession, dir: String): DataFrame = {
    val firstBucket = Tables.documents(s, dir)
      .select((col("doc_id") % 10).as("bucket"),
        explode(toks(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(min(col("bucket")).as("first_bucket"))
      .groupBy(col("first_bucket")).agg(count(lit(1)).as("new_tokens"))
    val w = Window.orderBy(col("first_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    firstBucket
      .withColumn("vocab_size", sum(col("new_tokens")).over(w))
      .select(col("first_bucket").as("prefix_buckets"), col("new_tokens"),
        col("vocab_size"))
      .orderBy(col("prefix_buckets"))
  }

  /** Tokenizer vocabulary coverage: with vocab = the 50 highest-frequency
    * tokens (deterministic tiebreak), per-doc out-of-vocabulary OCCURRENCE
    * rate — the statistic that decides whether a tokenizer's vocab fits a
    * new corpus before any training run. The vocab is dimension-sized and
    * broadcast; token occurrences never shuffle (map-side membership
    * probe + per-doc partial count).
    */
  private def tokOovRate(s: SparkSession, dir: String): DataFrame = {
    val occ = Tables.documents(s, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
    val vocab = occ.groupBy(col("tok")).agg(count(lit(1)).as("f"))
      .withColumn("r", row_number().over(
        Window.orderBy(col("f").desc, col("tok"))))
      .filter(col("r") <= 50)
      .select(col("tok"), lit(true).as("in_vocab"))
    occ.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("in_vocab").isNull, 1)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens").cast("double"),
          6).as("oov_rate"))
      .orderBy(col("doc_id"))
  }

  /** Readability scoring (Flesch reading ease + Flesch-Kincaid grade) —
    * the classic heuristic quality signal beside text_quality's
    * length/punct ratios: words, sentences, and vowel-group syllables
    * counted by the SAME regexes on both engines (integer-exact), the
    * two score formulas one IEEE-deterministic double chain each,
    * rounded at 6dp. Pipelines bucket corpora by grade level to build
    * curriculum mixes; the `readable` flag is the Flesch ≥ 50 filter.
    *
    * Scale notes: pure map-side projection — three codegen'd regex
    * counts per row, no shuffle anywhere at any scale.
    */
  private def textReadability(s: SparkSession, dir: String): DataFrame = {
    val low = lower(col("text"))
    val words = greatest(regexp_count(low, lit("[a-z]+")), lit(1))
      .cast("long")
    val sents = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
      .cast("long")
    val sylls = regexp_count(low, lit("[aeiouy]+")).cast("long")
    val wps = words.cast("double") / sents.cast("double")
    val spw = sylls.cast("double") / words.cast("double")
    val flesch = lit(206.835) - lit(1.015) * wps - lit(84.6) * spw
    Tables.documents(s, dir)
      .select(col("doc_id"), words.as("n_words"), sents.as("n_sentences"),
        sylls.as("n_syllables"), round(flesch, 6).as("flesch"),
        round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 6)
          .as("fk_grade"),
        (flesch >= 50.0).cast("int").as("readable"))
      .orderBy(col("doc_id"))
  }

  /** Soft deduplication by downweighting (the alternative to dropping
    * copies: keep every duplicate but weight it 1/cluster-size, so each
    * content cluster contributes exactly one document's worth of mass to
    * the training mix). Weights are integer MICRO-UNITS via integer
    * division (1e6 div n_copies) — exact and order-independent on both
    * engines, the agg_pivot/pagerank fixed-point trick — so the
    * per-source effective sizes hash bit-identically. The per-source
    * (raw, unique, effective) triple is the mixture-planning input
    * sample_mixture/sample_temperature consume.
    *
    * Scale notes: one shuffle on the content digest (the dedup_exact_hash
    * cluster key), one on source — both partial-agg friendly. No row is
    * dropped, so the pass composes with any downstream sampler.
    */
  private def sampleSoftDedup(s: SparkSession, dir: String): DataFrame = {
    val wCl = Window.partitionBy(col("digest"))
    Tables.documents(s, dir)
      .withColumn("digest", sha2(lower(trim(col("text"))), 256))
      .withColumn("n_copies", count(lit(1)).over(wCl))
      .withColumn("w_micro", expr("1000000 div n_copies"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("digest")).as("n_unique"),
        sum(col("w_micro")).as("eff_micro"))
      .orderBy(col("source"))
  }

  /** Model-based quality filtering — the DCLM / FineWeb-Edu pipeline
    * stage: a SMALL classifier trained driver-side on a bounded sample,
    * then applied MAP-SIDE to every document. Features are cheap surface
    * stats (token count, chars/token, stopword ratio, type-token
    * ratio); the label the sample is fitted to is the Flesch ≥ 50
    * readability split (a signal the features don't contain verbatim).
    * Training is 300 deterministic full-batch GD steps on standardized
    * features in a FIXED fold order (sorted by doc_id) — same weights
    * every run; inference embeds the learned weights as literals, so
    * scoring is one codegen'd expression, no UDF, no shuffle.
    *
    * Scale notes: this is the honest 100 TB shape — classifier training
    * IS small-data (fastText quality filters train on ~10⁵ docs), so
    * the driver-side sample (capped, deterministic) is the production
    * pattern, not a shortcut; the 100 TB cost is the map-side scoring
    * pass, which here is pure projection. Rows-only: iterated GD is not
    * SQL-expressible; the spec pins accuracy vs the label and monotone
    * loss descent.
    */
  private def mlQualityFilter(s: SparkSession, dir: String): DataFrame = {
    val en = Seq("the", "a", "of", "and", "to", "in")
    val low = lower(col("text"))
    val feats = Tables.documents(s, dir)
      .withColumn("arr", toks(col("text")))
      .select(col("doc_id"),
        size(col("arr")).cast("double").as("f_tokens"),
        // greatest(…, 1) guards the empty/whitespace-only document:
        // Spark division by zero yields null, and getDouble on the
        // collected training sample would then NPE
        (col("n_chars").cast("double")
          / greatest(size(col("arr")), lit(1))).as("f_cpt"),
        (size(filter(col("arr"), x => x.isin(en.map(lit): _*))).cast("double")
          / greatest(size(col("arr")), lit(1))).as("f_stop"),
        (size(array_distinct(col("arr"))).cast("double")
          / greatest(size(col("arr")), lit(1))).as("f_ttr"),
        // label: Flesch reading ease ≥ 50 (text_readability's formula)
        (lit(206.835)
          - lit(1.015) * (greatest(regexp_count(low, lit("[a-z]+")), lit(1))
              .cast("double")
            / greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
              .cast("double"))
          - lit(84.6) * (regexp_count(low, lit("[aeiouy]+")).cast("double")
            / greatest(regexp_count(low, lit("[a-z]+")), lit(1))
              .cast("double")) >= 50.0).cast("int").as("label"))
    val fCols = Seq("f_tokens", "f_cpt", "f_stop", "f_ttr")
    // bounded deterministic training sample (the small-data half)
    val sample = feats.orderBy(col("doc_id")).limit(2000)
      .select((fCols.map(col) :+ col("label").cast("double")): _*)
      .collect().map(r => (Array.tabulate(4)(r.getDouble), r.getDouble(4)))
    val n = sample.length.toDouble
    val mu = Array.tabulate(4)(j => sample.map(_._1(j)).sum / n)
    val sd = Array.tabulate(4) { j =>
      val v = sample.map(x => math.pow(x._1(j) - mu(j), 2)).sum / n
      if (v == 0.0) 1.0 else math.sqrt(v)
    }
    val z = sample.map { case (x, y) =>
      (Array.tabulate(4)(j => (x(j) - mu(j)) / sd(j)), y)
    }
    val w = new Array[Double](5) // bias + 4 weights
    var it = 0
    while (it < 300) {
      val g = new Array[Double](5)
      z.foreach { case (x, y) =>
        var m = w(0); var j = 0
        while (j < 4) { m += w(j + 1) * x(j); j += 1 }
        val e = 1.0 / (1.0 + math.exp(-m)) - y
        g(0) += e; j = 0
        while (j < 4) { g(j + 1) += e * x(j); j += 1 }
      }
      var j = 0
      while (j < 5) { w(j) -= 0.5 * g(j) / n; j += 1 }
      it += 1
    }
    // inference: learned weights as literals — one codegen'd projection
    val margin = fCols.zipWithIndex.foldLeft(lit(w(0))) { case (acc, (f, j)) =>
      acc + lit(w(j + 1)) * ((col(f) - lit(mu(j))) / lit(sd(j)))
    }
    feats
      .withColumn("score", round(lit(1.0) / (lit(1.0) + exp(-margin)), 6))
      .withColumn("kept", (col("score") >= 0.5).cast("int"))
      .select(col("doc_id"), col("score"), col("kept"), col("label"))
      .orderBy(col("doc_id"))
  }

  /** Character-level Shannon entropy per document — the low-entropy
    * screen quality pipelines run before model-based filters: keyboard
    * mash, base64 blobs, and repeated-char padding score far below
    * natural text (≈4.1 bits for English). Determinism: the per-char
    * counts leave the aggregation as a SORTED array and the −Σ p·log₂p
    * fold runs sequentially over it (the agg_entropy scheme), so the
    * libm terms accumulate in one fixed order on both engines; 6dp edge
    * round.
    *
    * Scale notes: the char explode is map-side (no pre-shuffle row
    * growth survives the first partial agg — counts collapse to
    * O(docs × alphabet) immediately); then one shuffle on doc_id.
    */
  private def textCharEntropy(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      // Spark split keeps the trailing zero-width match as "" (limit
      // -1 semantics); DuckDB's string_split does not — drop it
      .filter(col("ch") =!= "")
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct_chars"),
        expr("array_sort(collect_list(c))").as("cs"))
      .select(col("doc_id"), col("n").as("n_chars_counted"),
        col("n_distinct_chars"),
        round(expr("""aggregate(cs, cast(0.0 as double), (acc, c) ->
            acc - (c / cast(n as double)) * log2(c / cast(n as double)))"""),
          6).as("char_entropy"))
      .orderBy(col("doc_id"))

  /** URL-canonicalization dedup (the CCNet/RefinedWeb first pass): five
    * noisy spellings per canonical page — case variants, trailing
    * slash, utm_* tracking query, fragment — collapse to one canonical
    * URL (lowercase, query/fragment stripped, trailing slash trimmed)
    * and the first doc_id per canonical survives. The regex chain is
    * $-anchored so first-match (DuckDB) and all-match (Spark)
    * regexp_replace semantics coincide.
    *
    * Scale notes: canonicalization is a map-side string kernel; the
    * dedup is ONE shuffle on the canonical key — at 100 TB this is the
    * cheapest dedup stage there is (no shingling, no similarity), which
    * is why real pipelines run it first.
    */
  private def dedupUrl(s: SparkSession, dir: String): DataFrame = {
    val url = expr("""concat(
      CASE WHEN doc_id % 5 = 0 THEN 'HTTPS://WWW.EXAMPLE'
           ELSE 'https://www.example' END,
      cast((doc_id div 5) % 7 as string), '.com/page',
      cast(doc_id div 5 as string),
      CASE WHEN doc_id % 5 = 1 THEN '/' ELSE '' END,
      CASE WHEN doc_id % 5 = 2 THEN '?utm_source=feed&utm_campaign=x'
           ELSE '' END,
      CASE WHEN doc_id % 5 = 3 THEN '#section2' ELSE '' END)""")
    Tables.documents(s, dir)
      .select(col("doc_id"), url.as("url"))
      .withColumn("canonical_url",
        regexp_replace(regexp_replace(regexp_replace(
          lower(col("url")), "#.*$", ""), "\\?.*$", ""), "/$", ""))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("kept_doc"))
      .orderBy(col("canonical_url"))
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("text_char_entropy", textCharEntropy,
      Some("""WITH ch0 AS (SELECT doc_id, unnest(string_split(text, ''))
                  AS ch FROM documents),
              -- mirror Spark's ch != '' filter: string_split('', '')
              -- yields [''] in DuckDB while the Spark side drops the
              -- empty char, so an empty document would otherwise keep
              -- one oracle row the Spark result lacks
              ch AS (SELECT doc_id, ch FROM ch0 WHERE ch <> ''),
              t AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2),
              g AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
                COUNT(*) AS nd, list_sort(list(c)) AS cs FROM t GROUP BY 1)
              SELECT doc_id, n AS n_chars_counted, nd AS n_distinct_chars,
                round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(cs, c ->
                    -(c / CAST(n AS DOUBLE)) * log2(c / CAST(n AS DOUBLE)))),
                  (a, b) -> a + b), 6) AS char_entropy
              FROM g ORDER BY doc_id""")),
    QueryDef("dedup_url", dedupUrl,
      Some("""WITH u AS (SELECT doc_id, concat(
                CASE WHEN doc_id % 5 = 0 THEN 'HTTPS://WWW.EXAMPLE'
                     ELSE 'https://www.example' END,
                CAST((doc_id // 5) % 7 AS VARCHAR), '.com/page',
                CAST(doc_id // 5 AS VARCHAR),
                CASE WHEN doc_id % 5 = 1 THEN '/' ELSE '' END,
                CASE WHEN doc_id % 5 = 2 THEN '?utm_source=feed&utm_campaign=x'
                     ELSE '' END,
                CASE WHEN doc_id % 5 = 3 THEN '#section2' ELSE '' END)
                  AS url FROM documents),
              c AS (SELECT doc_id,
                regexp_replace(regexp_replace(regexp_replace(
                  lower(url), '#.*$', ''), '\?.*$', ''), '/$', '')
                  AS canonical_url FROM u)
              SELECT canonical_url, COUNT(*) AS n_variants,
                MIN(doc_id) AS kept_doc
              FROM c GROUP BY canonical_url ORDER BY canonical_url""")),
    QueryDef("ml_quality_filter", mlQualityFilter, None),
    QueryDef("text_readability", textReadability,
      Some("""WITH t AS (SELECT doc_id,
                GREATEST(len(regexp_extract_all(lower(text), '[a-z]+')), 1)
                  AS n_words,
                GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS n_sentences,
                len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS n_syllables
                FROM documents),
              f AS (SELECT doc_id,
                CAST(n_words AS BIGINT) AS n_words,
                CAST(n_sentences AS BIGINT) AS n_sentences,
                CAST(n_syllables AS BIGINT) AS n_syllables,
                CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE) AS wps,
                CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE) AS spw
                FROM t)
              SELECT doc_id, n_words, n_sentences, n_syllables,
                round(206.835 - 1.015 * wps - 84.6 * spw, 6) AS flesch,
                round(0.39 * wps + 11.8 * spw - 15.59, 6) AS fk_grade,
                CAST(206.835 - 1.015 * wps - 84.6 * spw >= 50.0 AS INTEGER)
                  AS readable
              FROM f ORDER BY doc_id""")),
    QueryDef("sample_soft_dedup", sampleSoftDedup,
      Some("""WITH t AS (SELECT source,
                sha256(lower(trim(text))) AS digest FROM documents),
              c AS (SELECT source, digest,
                COUNT(*) OVER (PARTITION BY digest) AS n_copies FROM t)
              SELECT source, COUNT(*) AS n_docs,
                COUNT(DISTINCT digest) AS n_unique,
                CAST(SUM(1000000 // n_copies) AS BIGINT) AS eff_micro
              FROM c GROUP BY source ORDER BY source""")),
    QueryDef("dedup_bloom", dedupBloom,
      Some("""SELECT doc_id,
               text IN (SELECT text FROM documents WHERE doc_id % 2 = 0)
                 AS seen
              FROM documents WHERE doc_id % 2 <> 0 ORDER BY doc_id""")),
    QueryDef("sample_reservoir", sampleReservoir,
      Some("""WITH h AS (SELECT doc_id,
                 md5(CAST(doc_id AS VARCHAR)) AS tag FROM documents),
               k AS (SELECT doc_id, tag, ROW_NUMBER() OVER
                 (ORDER BY tag, doc_id) AS rank FROM h)
              SELECT doc_id, tag, rank FROM k
              WHERE rank <= 100 ORDER BY rank""")),
    QueryDef("topk_weighted", topkWeighted,
      Some("""WITH t AS (SELECT n_chars,
                 unnest(string_split(text, ' ')) AS tok FROM documents)
              SELECT tok, CAST(SUM(n_chars) AS BIGINT) AS w,
                COUNT(*) AS n_occ
              FROM t GROUP BY tok ORDER BY w DESC, tok LIMIT 10""")),
    QueryDef("text_zipf_fit", textZipfFit,
      Some(s"""WITH f AS (SELECT tok, COUNT(*) AS f FROM (SELECT
                 unnest(string_split(text, ' ')) AS tok FROM documents) t
                 GROUP BY tok),
               rk AS (SELECT f, ROW_NUMBER() OVER
                 (ORDER BY f DESC, tok) AS r FROM f),
               pts AS (SELECT round(ln(CAST(r AS DOUBLE)), 6) AS lx,
                 round(ln(CAST(f AS DOUBLE)), 6) AS ly
                 FROM rk WHERE r <= 100),
               mom AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 ${Det.oSum("lx")} AS sx, ${Det.oSum("ly")} AS sy,
                 ${Det.oSum("lx * ly")} AS sxy,
                 ${Det.oSum("lx * lx")} AS sxx FROM pts)
              SELECT CAST(n AS BIGINT) AS n_points,
                round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                  AS zipf_slope,
                round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                  / n, 6) AS intercept
              FROM mom""")),
    QueryDef("text_compress_ratio", textCompressRatio, None),
    QueryDef("sample_curriculum", sampleCurriculum,
      Some("""WITH cs AS (SELECT list_transform(quantile_cont(n_chars,
                  [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
                  c -> round(c, 4)) AS cs
                FROM documents),
              st AS (SELECT doc_id, n_chars,
                CAST(1 + list_sum(list_transform(cs,
                  c -> CASE WHEN n_chars > c THEN 1 ELSE 0 END))
                  AS INTEGER) AS stage
                FROM documents, cs),
              r AS (SELECT stage, doc_id, n_chars,
                row_number() OVER (PARTITION BY stage
                  ORDER BY md5('curr-' || CAST(doc_id AS VARCHAR)), doc_id)
                  AS pos_in_stage FROM st)
              SELECT stage, pos_in_stage, doc_id, n_chars FROM r
              ORDER BY stage, pos_in_stage""")),
    QueryDef("text_pmi_cooccur", textPmiCooccur,
      Some("""WITH t AS (SELECT DISTINCT doc_id, w FROM (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents) u WHERE length(w) >= 3),
              top AS (SELECT w, COUNT(*) AS df FROM t GROUP BY w
                ORDER BY df DESC, w LIMIT 100),
              tt AS (SELECT t.doc_id, t.w, top.df
                FROM t JOIN top USING (w)),
              n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs
                FROM documents),
              p AS (SELECT a.w AS w1, b.w AS w2, a.df AS n1, b.df AS n2,
                  COUNT(*) AS n_pair
                FROM tt a JOIN tt b
                  ON a.doc_id = b.doc_id AND a.w < b.w
                GROUP BY 1, 2, 3, 4 HAVING COUNT(*) >= 5)
              SELECT w1, w2, n_pair, n1, n2,
                n_pair * n_docs * 1000000 // (n1 * n2) AS lift_micro
              FROM p, n
              ORDER BY lift_micro DESC, w1, w2 LIMIT 50""")),
    QueryDef("text_keywords", textKeywords,
      Some(s"""WITH $tfidfCte,
               rk AS (SELECT doc_id, token, ROW_NUMBER() OVER
                 (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rk
                 FROM sc)
              SELECT doc_id,
                string_agg(token, ',' ORDER BY rk) AS keywords
              FROM rk WHERE rk <= 3 GROUP BY doc_id ORDER BY doc_id""")),
    QueryDef("text_lm_bigram", textLmBigram,
      Some("""WITH t AS (SELECT doc_id,
                 unnest(string_split(text, ' ')) AS tok,
                 generate_subscripts(string_split(text, ' '), 1) AS o
                 FROM documents),
               bi AS (SELECT doc_id, tok, lag(tok) OVER
                 (PARTITION BY doc_id ORDER BY o) AS prev FROM t),
               bg AS (SELECT * FROM bi WHERE prev IS NOT NULL),
               cbi AS (SELECT prev, tok, COUNT(*) AS c_bi
                 FROM bg GROUP BY prev, tok),
               cpref AS (SELECT prev, COUNT(*) AS c_pref
                 FROM bg GROUP BY prev),
               cuni AS (SELECT tok, COUNT(*) AS c_uni FROM t GROUP BY tok),
               ntot AS (SELECT COUNT(*) AS n_tot FROM t),
               terms AS (SELECT doc_id, round(ln(
                 0.7 * (CAST(c_bi AS DOUBLE) / CAST(c_pref AS DOUBLE))
                 + 0.3 * (CAST(c_uni AS DOUBLE) / CAST(n_tot AS DOUBLE))),
                 6) AS term
                 FROM bg JOIN cbi USING (prev, tok)
                 JOIN cpref USING (prev) JOIN cuni USING (tok)
                 CROSS JOIN ntot)
              SELECT doc_id, COUNT(*) AS n_terms,
                round(CAST(SUM(CAST((term) AS DECIMAL(30,6))) AS DOUBLE),
                  6) AS sum_logprob
              FROM terms GROUP BY doc_id ORDER BY doc_id""")),
    QueryDef("text_corpus_divergence", textCorpusDivergence,
      Some("""WITH a AS (SELECT tok, COUNT(*) AS ca FROM (SELECT
                 unnest(string_split(text, ' ')) AS tok FROM documents
                 WHERE TRY_CAST(regexp_extract(source, '([0-9]+)', 1) AS INTEGER)
                   < 10) t GROUP BY tok),
               b AS (SELECT tok, COUNT(*) AS cb FROM (SELECT
                 unnest(string_split(text, ' ')) AS tok FROM documents
                 WHERE TRY_CAST(regexp_extract(source, '([0-9]+)', 1) AS INTEGER)
                   >= 10) t GROUP BY tok),
               j AS (SELECT COALESCE(a.tok, b.tok) AS tok,
                 COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
                 FROM a FULL JOIN b ON a.tok = b.tok),
               tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS ta,
                 CAST(SUM(cb) AS BIGINT) AS tb FROM j),
               terms AS (SELECT round(CASE
                 WHEN ca > 0 AND cb > 0 THEN
                   (CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE))
                     * ln(2.0 * (CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE))
                       / ((CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE))
                         + (CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))))
                   + (CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))
                     * ln(2.0 * (CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))
                       / ((CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE))
                         + (CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))))
                 WHEN ca > 0 THEN (CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE))
                   * 0.6931471805599453
                 ELSE (CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))
                   * 0.6931471805599453 END, 6) AS c
                 FROM j, tot)
              SELECT COUNT(*) AS vocab_union,
                round(CAST(SUM(CAST((c) AS DECIMAL(30,6))) AS DOUBLE)
                  / 1.3862943611198906, 6) AS jsd_bits
              FROM terms""")),
    QueryDef("text_vocab_growth", textVocabGrowth,
      Some("""WITH fb AS (SELECT tok, MIN(bucket) AS first_bucket
                 FROM (SELECT doc_id % 10 AS bucket,
                   unnest(string_split(text, ' ')) AS tok FROM documents) t
                 GROUP BY tok),
               h AS (SELECT first_bucket, COUNT(*) AS new_tokens
                 FROM fb GROUP BY first_bucket)
              SELECT first_bucket AS prefix_buckets, new_tokens,
                CAST(SUM(new_tokens) OVER (ORDER BY first_bucket
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size
              FROM h ORDER BY prefix_buckets""")),
    QueryDef("tok_oov_rate", tokOovRate,
      Some("""WITH occ AS (SELECT doc_id,
                 unnest(string_split(text, ' ')) AS tok FROM documents),
               v AS (SELECT tok FROM (SELECT tok, ROW_NUMBER() OVER
                 (ORDER BY COUNT(*) DESC, tok) AS r
                 FROM occ GROUP BY tok) f WHERE r <= 50)
              SELECT doc_id, COUNT(*) AS n_tokens,
                COUNT(CASE WHEN occ.tok NOT IN (SELECT tok FROM v)
                  THEN 1 END) AS n_oov,
                round(CAST(COUNT(CASE WHEN occ.tok NOT IN
                    (SELECT tok FROM v) THEN 1 END) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
              FROM occ GROUP BY doc_id ORDER BY doc_id""")),
    QueryDef("text_stats", textStats,
      Some(s"""WITH t AS (SELECT lang, source, n_chars,
                 len(string_split(text, ' ')) AS n_tokens FROM documents)
              SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               ${Det.oAvg("n_tokens")} AS avg_tokens,
               COUNT(DISTINCT source) AS n_sources
              FROM t GROUP BY lang ORDER BY lang""")),
    QueryDef("text_langid", textLangid,
      Some(s"""WITH t AS (SELECT doc_id, lang, string_split(text,' ') AS arr
                 FROM documents),
              sc AS (
                ${langStops.map { case (lang, stops) =>
                  s"""SELECT doc_id, lang, '$lang' AS cand,
                      len(list_filter(arr, x -> x IN (${stops.map("'" + _ + "'").mkString(",")})))
                        AS hits FROM t"""
                }.mkString("\n UNION ALL \n")}),
              best AS (SELECT doc_id, lang, cand, hits,
                row_number() OVER (PARTITION BY doc_id
                  ORDER BY hits DESC, cand DESC) AS rn FROM sc)
              SELECT doc_id, lang AS labeled_lang, cand AS predicted_lang,
                     CAST(hits AS INTEGER) AS hits
              FROM best WHERE rn = 1 ORDER BY doc_id""")),
    QueryDef("text_quality", textQuality,
      Some("""WITH t AS (SELECT doc_id, n_chars, string_split(text,' ') AS arr
                FROM documents)
              SELECT doc_id,
               len(arr) AS n_tokens,
               CAST(n_chars AS DOUBLE) / len(arr) AS chars_per_token,
               CAST(len(list_filter(arr,
                 x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
                 / len(arr) AS stopword_ratio,
               CAST(len(list_distinct(arr)) AS DOUBLE) / len(arr) AS ttr,
               round(CAST(len(list_filter(arr,
                   x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
                   / len(arr) * 0.5
                 + CAST(len(list_distinct(arr)) AS DOUBLE) / len(arr) * 0.5, 6)
                 AS quality
              FROM t ORDER BY doc_id""")),
    QueryDef("text_tokenize", textTokenize,
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS token
                FROM documents)
              SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
              FROM t GROUP BY token ORDER BY token""")),
    QueryDef("text_tf_idf", textTfIdf,
      Some(s"""WITH $tfidfCte
              SELECT doc_id, token, tf, df, tfidf
              FROM sc ORDER BY doc_id, token""")),
    QueryDef("text_lm_score", textLmScore,
      Some("""WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS token
                FROM documents),
              v AS (SELECT token, COUNT(*) AS c FROM t GROUP BY token),
              n AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM v)
              SELECT doc_id, COUNT(*) AS n_tokens,
                CAST(SUM(CAST(ln(CAST(c AS DOUBLE) / total)
                    AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS lm_score
              FROM t JOIN v USING (token) CROSS JOIN n
              GROUP BY doc_id ORDER BY doc_id""")),
    QueryDef("text_ngram", textNgram,
      Some("""WITH t AS (SELECT doc_id,
                unnest(string_split(text,' ')) AS tok,
                generate_subscripts(string_split(text,' '), 1) AS o
                FROM documents),
              b AS (SELECT a.tok || ' ' || c.tok AS bigram
                FROM t a JOIN t c ON a.doc_id = c.doc_id AND c.o = a.o + 1)
              SELECT bigram, COUNT(*) AS n FROM b GROUP BY bigram
              ORDER BY n DESC, bigram LIMIT 50""")),
    QueryDef("text_fingerprint", textFingerprint,
      Some("""WITH t AS (SELECT doc_id,
                list_transform(
                  list_filter(string_split(text,' '), x -> x != ''),
                  x -> length(x) * 256 + unicode(x)) AS codes
                FROM documents)
              SELECT doc_id,
               CAST(list_reduce(list_prepend(0, codes),
                 (acc, v) -> (acc * 131 + v) % 1000000007) AS BIGINT)
                 AS fingerprint
              FROM t ORDER BY doc_id""")),
    QueryDef("text_token_count", textTokenCount,
      Some("""SELECT doc_id, n_chars,
               len(string_split(text, ' ')) AS ws_tokens,
               len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                 AS re_tokens,
               round(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')), 6)
                 AS chars_per_ws_token
              FROM documents ORDER BY doc_id""")),
    QueryDef("tok_bpe_step", tokBpeStep,
      Some("""WITH v AS (SELECT word, COUNT(*) AS freq FROM (
                SELECT unnest(string_split(text, ' ')) AS word
                FROM documents) GROUP BY word),
              p AS (SELECT freq, unnest(list_transform(
                  range(1, length(word)), i -> substr(word, i, 2))) AS pair
                FROM v WHERE length(word) >= 2)
              SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
              FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 20""")),
    QueryDef("tok_bpe_train", tokBpeTrain, None),
    QueryDef("dataset_fingerprint", datasetFingerprint,
      Some("""SELECT source, COUNT(*) AS n_docs,
                CAST(SUM(CAST(CAST('0x' || substr(sha256(text), 1, 15)
                  AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR) AS fingerprint
              FROM documents GROUP BY source ORDER BY source""")),
    QueryDef("decontam_exact", decontamExact,
      Some("""WITH ev AS (SELECT doc_id AS eval_id,
                array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ')
                  AS needle
                FROM documents WHERE doc_id % 97 = 0),
              h AS (SELECT eval_id, COUNT(*) AS n
                FROM documents d JOIN ev
                  ON d.doc_id % 97 <> 0 AND contains(d.text, ev.needle)
                GROUP BY eval_id)
              SELECT eval_id, needle, COALESCE(n, 0) AS n_train_hits
              FROM ev LEFT JOIN h USING (eval_id) ORDER BY eval_id""")),
    QueryDef("sample_temperature", sampleTemperature,
      Some("""WITH per AS (SELECT source, COUNT(*) AS n FROM documents
                GROUP BY source),
              tot AS (SELECT
                CAST(SUM(CAST(sqrt(n) AS DECIMAL(30,6))) AS DOUBLE) AS sw,
                SUM(n) AS nt FROM per)
              SELECT source, n AS n_docs,
                round(sqrt(n) / sw, 6) AS share,
                LEAST(n, CAST(floor(round(sqrt(n) / sw, 6)
                  * floor(nt * 0.2)) AS BIGINT)) AS n_kept
              FROM per CROSS JOIN tot ORDER BY source""")),
    QueryDef("dedup_prefix", dedupPrefix,
      Some("""WITH t AS (SELECT doc_id,
                sha256(array_to_string(
                  list_slice(string_split(text, ' '), 1, 8), ' ')) AS digest
                FROM documents),
              r AS (SELECT doc_id, digest,
                row_number() OVER (PARTITION BY digest ORDER BY doc_id) AS rn,
                COUNT(*) OVER (PARTITION BY digest) AS n_copies
                FROM t)
              SELECT doc_id, digest, n_copies FROM r WHERE rn = 1
              ORDER BY doc_id""")),
    QueryDef("dedup_exact_hash", dedupExactHash,
      Some("""WITH t AS (SELECT doc_id, sha256(lower(trim(text))) AS digest
                FROM documents),
              r AS (SELECT doc_id, digest,
                row_number() OVER (PARTITION BY digest ORDER BY doc_id) AS rn,
                COUNT(*) OVER (PARTITION BY digest) AS n_copies
                FROM t)
              SELECT doc_id, digest, n_copies FROM r WHERE rn = 1
              ORDER BY doc_id""")),
    QueryDef("dedup_jaccard", dedupJaccard,
      Some("""WITH cand AS (SELECT doc_id,
                list_distinct(string_split(text,' ')) AS tokset
                FROM documents WHERE doc_id % 10 = 0),
              sizes AS (SELECT doc_id, len(tokset) AS sz FROM cand),
              inv AS (SELECT doc_id, unnest(tokset) AS token FROM cand),
              inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                COUNT(*) AS n_inter
                FROM inv a JOIN inv b
                  ON a.token = b.token AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id)
              SELECT id_a, id_b,
                round(CAST(n_inter AS DOUBLE)
                  / (sa.sz + sb.sz - n_inter), 6) AS jaccard
              FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE round(CAST(n_inter AS DOUBLE)
                / (sa.sz + sb.sz - n_inter), 6) >= 0.5
              ORDER BY id_a, id_b""")),
    QueryDef("decontam_ngram", decontamNgram,
      Some("""WITH sh AS (SELECT doc_id,
                list_distinct(list_transform(
                  range(1, greatest(len(string_split(text,' ')) - 1, 2)),
                  i -> array_to_string(string_split(text,' ')[i:i+2], ' ')))
                  AS shingles
                FROM documents),
              tr AS (SELECT doc_id, unnest(shingles) AS s FROM sh
                WHERE doc_id % 97 <> 0),
              ev AS (SELECT doc_id AS eval_id, unnest(shingles) AS s FROM sh
                WHERE doc_id % 97 = 0)
              SELECT tr.doc_id, COUNT(DISTINCT tr.s) AS n_shared,
                COUNT(DISTINCT ev.eval_id) AS n_eval_hit
              FROM tr JOIN ev ON tr.s = ev.s
              GROUP BY tr.doc_id ORDER BY doc_id""")),
    QueryDef("text_repetition", textRepetition,
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS arr
                FROM documents),
              g AS (SELECT doc_id,
                list_transform(range(1, greatest(len(arr) - 0, 2)),
                  i -> array_to_string(arr[i:i+1], ' ')) AS g2,
                list_transform(range(1, greatest(len(arr) - 1, 2)),
                  i -> array_to_string(arr[i:i+2], ' ')) AS g3
                FROM d),
              f AS (SELECT doc_id,
                1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)
                  AS dup_bigram_frac,
                1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)
                  AS dup_trigram_frac
                FROM g),
              tf AS (SELECT doc_id, unnest(arr) AS token FROM d),
              tc AS (SELECT doc_id, token, COUNT(*) AS n FROM tf
                GROUP BY doc_id, token),
              tt AS (SELECT doc_id,
                CAST(MAX(n) AS DOUBLE) / SUM(n) AS top_token_frac
                FROM tc GROUP BY doc_id)
              SELECT f.doc_id, dup_bigram_frac, dup_trigram_frac,
                top_token_frac,
                (dup_bigram_frac > 0.2 OR top_token_frac > 0.3)
                  AS is_repetitive
              FROM f JOIN tt ON f.doc_id = tt.doc_id
              ORDER BY f.doc_id""")),
    QueryDef("text_boilerplate", textBoilerplate,
      Some("""WITH sh AS (SELECT doc_id,
                list_distinct(list_transform(
                  range(1, greatest(len(string_split(text,' ')) - 1, 2)),
                  i -> array_to_string(string_split(text,' ')[i:i+2], ' ')))
                  AS shingles
                FROM documents),
              inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
              b AS (SELECT s FROM inv GROUP BY s
                HAVING COUNT(DISTINCT doc_id) >= 5),
              nb AS (SELECT doc_id, COUNT(*) AS n_boiler FROM inv
                WHERE s IN (SELECT s FROM b) GROUP BY doc_id)
              SELECT sh.doc_id, len(sh.shingles) AS n_shingles,
                COALESCE(nb.n_boiler, 0) AS n_boiler,
                CAST(COALESCE(nb.n_boiler, 0) AS DOUBLE) / len(sh.shingles)
                  AS boiler_ratio,
                CAST(COALESCE(nb.n_boiler, 0) AS DOUBLE) / len(sh.shingles)
                  > 0.1 AS is_boilerplate
              FROM sh LEFT JOIN nb ON sh.doc_id = nb.doc_id
              ORDER BY sh.doc_id""")),
    QueryDef("dedup_ngram_jaccard", dedupNgramJaccard,
      Some("""WITH cand AS (SELECT doc_id,
                list_distinct(list_transform(
                  range(1, greatest(len(string_split(text,' ')) - 1, 2)),
                  i -> array_to_string(string_split(text,' ')[i:i+2], ' ')))
                  AS shingles
                FROM documents WHERE doc_id % 10 = 0),
              sizes AS (SELECT doc_id, len(shingles) AS sz FROM cand),
              inv AS (SELECT doc_id, unnest(shingles) AS sh FROM cand),
              inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                COUNT(*) AS n_inter
                FROM inv a JOIN inv b
                  ON a.sh = b.sh AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id)
              SELECT id_a, id_b,
                round(CAST(n_inter AS DOUBLE)
                  / (sa.sz + sb.sz - n_inter), 6) AS jaccard
              FROM inter
              JOIN sizes sa ON sa.doc_id = id_a
              JOIN sizes sb ON sb.doc_id = id_b
              WHERE round(CAST(n_inter AS DOUBLE)
                / (sa.sz + sb.sz - n_inter), 6) >= 0.02
              ORDER BY id_a, id_b""")),
    QueryDef("pack_bestfit", packBestfit, Some("""
      WITH RECURSIVE
      d AS (SELECT doc_id, doc_id % 8 AS shard,
              least(CAST(len(string_split(text, ' ')) AS INTEGER), 512)
                AS n
            FROM documents),
      g AS (SELECT shard,
              list({'id': doc_id, 'n': n} ORDER BY n DESC, doc_id) AS ds
            FROM d GROUP BY shard),
      rec AS (
        SELECT shard, 0 AS k, CAST([] AS INTEGER[]) AS loads,
          CAST(NULL AS BIGINT) AS doc_id,
          CAST(NULL AS INTEGER) AS n_tokens,
          CAST(NULL AS INTEGER) AS bin_id
        FROM g
        UNION ALL
        SELECT b.shard, b.k + 1,
          CASE WHEN b.best IS NULL THEN list_append(b.loads, b.n)
            ELSE list_transform(generate_series(1, len(b.loads)),
              j -> CASE WHEN j = b.best THEN b.loads[j] + b.n
                   ELSE b.loads[j] END) END,
          b.id, b.n,
          CASE WHEN b.best IS NULL THEN len(b.loads)
            ELSE b.best - 1 END
        FROM (
          SELECT r.shard, r.k, r.loads,
            q.ds[r.k + 1].id AS id, q.ds[r.k + 1].n AS n,
            list_sort(list_filter(
              list_transform(generate_series(1, len(r.loads)),
                j -> {'negl': -r.loads[j], 'j': j}),
              c -> -c.negl + q.ds[r.k + 1].n <= 512))[1].j AS best
          FROM rec r JOIN g q USING (shard)
          WHERE r.k < len(q.ds)) b
      )
      SELECT shard, doc_id, n_tokens, bin_id FROM rec WHERE k >= 1
      ORDER BY shard, doc_id""")),
    QueryDef("shuffle_shard", shuffleShard,
      Some("""WITH t AS (SELECT doc_id,
                md5('epoch1-' || CAST(doc_id AS VARCHAR)) AS rk
                FROM documents),
              sh AS (SELECT doc_id, rk,
                CAST(CAST('0x' || substr(rk, 1, 8) AS BIGINT) % 8 AS BIGINT)
                  AS shard FROM t)
              SELECT doc_id, shard,
                CAST(ROW_NUMBER() OVER (PARTITION BY shard
                  ORDER BY rk, doc_id) AS BIGINT) AS pos
              FROM sh ORDER BY shard, pos""")),
    QueryDef("sample_token_budget", sampleTokenBudget,
      Some("""WITH t AS (SELECT source, doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
                md5(CAST(doc_id AS VARCHAR)) AS rk FROM documents),
              b AS (SELECT source,
                CAST(FLOOR(SUM(n_toks) * 0.3) AS BIGINT) AS budget_tokens
                FROM t GROUP BY source),
              c AS (SELECT source, doc_id, n_toks, rk,
                SUM(n_toks) OVER (PARTITION BY source
                  ORDER BY rk, doc_id) AS cum FROM t)
              SELECT c.source, COUNT(*) AS n_docs_taken,
                CAST(SUM(n_toks) AS BIGINT) AS tokens_taken,
                b.budget_tokens
              FROM c JOIN b ON c.source = b.source
              WHERE cum <= budget_tokens
              GROUP BY c.source, b.budget_tokens ORDER BY c.source""")),
    QueryDef("dedup_substring", dedupSubstring,
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                FROM documents),
              g AS (SELECT doc_id, len(toks) AS n_tokens,
                unnest(range(1, greatest(len(toks) - 3, 1))) AS pos, toks
                FROM t),
              gr AS (SELECT doc_id, n_tokens, pos,
                array_to_string(toks[pos:pos+4], ' ') AS gram FROM g),
              r AS (SELECT doc_id, n_tokens, pos,
                COUNT(*) OVER (PARTITION BY gram) AS cnt FROM gr),
              i AS (SELECT doc_id, n_tokens, pos,
                CASE WHEN pos - LAG(pos) OVER
                    (PARTITION BY doc_id ORDER BY pos) <= 4
                  THEN 0 ELSE 1 END AS new_span
                FROM r WHERE cnt >= 2),
              isl AS (SELECT doc_id, n_tokens, pos,
                SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos)
                  AS island FROM i),
              sp AS (SELECT doc_id, n_tokens, island, COUNT(*) AS n_grams,
                MIN(pos) AS spos, MAX(pos) + 4 AS epos
                FROM isl GROUP BY doc_id, n_tokens, island)
              SELECT doc_id, n_tokens,
                CAST(SUM(n_grams) AS BIGINT) AS n_rep_grams,
                COUNT(*) AS n_spans,
                CAST(SUM(epos - spos + 1) AS BIGINT) AS covered_tokens,
                CAST(MAX(epos - spos + 1) AS BIGINT) AS max_span_tokens,
                round(CAST(SUM(epos - spos + 1) AS DOUBLE) / n_tokens, 6)
                  AS rep_frac
              FROM sp GROUP BY doc_id, n_tokens ORDER BY doc_id""")),
    QueryDef("dedup_pipeline", dedupPipeline,
      Some("""WITH blk AS (SELECT doc_id, text FROM documents
                WHERE doc_id % 10 = 0),
              t AS (SELECT doc_id, text,
                sha256(lower(trim(text))) AS digest FROM blk),
              r AS (SELECT doc_id, text,
                row_number() OVER (PARTITION BY digest ORDER BY doc_id) AS rn,
                COUNT(*) OVER (PARTITION BY digest) AS n_copies FROM t),
              ex AS (SELECT doc_id, text, n_copies FROM r WHERE rn = 1),
              cand AS (SELECT doc_id,
                list_distinct(string_split(text,' ')) AS tokset FROM ex),
              sizes AS (SELECT doc_id, len(tokset) AS sz FROM cand),
              inv AS (SELECT doc_id, unnest(tokset) AS token FROM cand),
              inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                COUNT(*) AS n_inter
                FROM inv a JOIN inv b
                  ON a.token = b.token AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id),
              drops AS (SELECT DISTINCT id_b FROM inter
                JOIN sizes sa ON sa.doc_id = id_a
                JOIN sizes sb ON sb.doc_id = id_b
                WHERE round(CAST(n_inter AS DOUBLE)
                  / (sa.sz + sb.sz - n_inter), 6) >= 0.5)
              SELECT doc_id, n_copies FROM ex
              WHERE doc_id NOT IN (SELECT id_b FROM drops)
              ORDER BY doc_id""")),
    QueryDef("dedup_paragraph", dedupParagraph,
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                FROM documents),
              u AS (SELECT doc_id, unnest(list_transform(
                  range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT)),
                  i -> {'pos': CAST(i AS INTEGER),
                        'para': array_to_string(list_slice(toks,
                          CAST(i * 10 + 1 AS INT),
                          CAST(i * 10 + 10 AS INT)), ' ')})) AS pp
                FROM t),
              k AS (SELECT doc_id, pp.pos AS pos, pp.para AS para,
                row_number() OVER (PARTITION BY pp.para
                  ORDER BY doc_id, pp.pos) AS rn
                FROM u)
              SELECT doc_id, COUNT(*) AS n_paras,
                COUNT(*) FILTER (WHERE rn = 1) AS n_kept,
                string_agg(para, ' ' ORDER BY pos) FILTER (WHERE rn = 1)
                  AS cleaned
              FROM k GROUP BY doc_id ORDER BY doc_id""")),
    QueryDef("sample_importance", sampleImportance,
      Some("""WITH m AS (SELECT MAX(n_chars) AS wmax FROM documents),
              d AS (SELECT source, n_chars,
                (((doc_id % 2147483648) * 2654435761) % 4294967296) % 1000000 AS bucket
                FROM documents),
              a AS (SELECT source, n_chars, bucket * wmax < n_chars * 1000000
                AS keep FROM d CROSS JOIN m)
              SELECT source, COUNT(*) AS n_docs,
                COUNT(*) FILTER (WHERE keep) AS n_kept,
                CASE WHEN COUNT(*) FILTER (WHERE keep) > 0 THEN
                  round(CAST(SUM(n_chars) FILTER (WHERE keep) AS DOUBLE)
                      * COUNT(*)
                    / (CAST(SUM(n_chars) AS DOUBLE)
                      * COUNT(*) FILTER (WHERE keep)), 6)
                END AS length_lift
              FROM a GROUP BY source ORDER BY source""")),
    QueryDef("doc_chunk", docChunk,
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t
                FROM documents),
              x AS (SELECT doc_id, t,
                unnest(range(0, len(t), 48)) AS start FROM t)
              SELECT doc_id, start // 48 AS chunk_id, start AS start_tok,
                CAST(len(t[start+1 : start+64]) AS BIGINT) AS chunk_len,
                array_to_string(t[start+1 : start+64], ' ') AS chunk_text
              FROM x ORDER BY doc_id, chunk_id""")),
    QueryDef("sample_neyman", sampleNeyman,
      Some("""WITH st AS (SELECT source, COUNT(*) AS n_h,
                 CAST(SUM(CAST(n_chars AS HUGEINT)) AS HUGEINT) AS sx,
                 CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS HUGEINT)
                   AS sxx
                 FROM documents GROUP BY source),
               sv AS (SELECT source, n_h,
                 round(sqrt(CAST(n_h * sxx - sx * sx AS DOUBLE)
                   / CAST(n_h * n_h AS DOUBLE)), 6) AS s_h FROM st),
               wv AS (SELECT source, n_h, s_h,
                 round(n_h * s_h, 6) AS w FROM sv),
               tot AS (SELECT CAST(SUM(CAST(w AS DECIMAL(38,6)))
                 AS DOUBLE) AS tw FROM wv),
               al AS (SELECT source, n_h, s_h,
                 CAST(FLOOR(100.0 * w / tw) AS BIGINT) AS alloc
                 FROM wv, tot),
               rk AS (SELECT source, doc_id,
                 CAST(row_number() OVER (PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS INTEGER) AS rk
                 FROM documents)
              SELECT r.source, r.doc_id, r.rk, a.n_h, a.s_h, a.alloc
              FROM rk r JOIN al a USING (source) WHERE r.rk <= a.alloc
              ORDER BY r.source, r.rk""")),
    QueryDef("sample_stratified", sampleStratified,
      Some("""SELECT lang, doc_id, rk FROM (
                SELECT lang, doc_id, CAST(row_number() OVER (
                  PARTITION BY lang
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER)
                  AS rk
                FROM documents) WHERE rk <= 20
              ORDER BY lang, rk""")),
    QueryDef("sample_hash_split", sampleHashSplit,
      Some("""WITH b AS (SELECT doc_id, text,
                (((doc_id % 2147483648) * 2654435761) % 4294967296) % 100 AS bucket
                FROM documents)
              SELECT CASE WHEN bucket < 80 THEN 'train'
                          WHEN bucket < 90 THEN 'val'
                          ELSE 'test' END AS split,
                COUNT(*) AS n_docs,
                CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS n_tokens
              FROM b GROUP BY split ORDER BY split""")),
    QueryDef("sample_mixture", sampleMixture,
      Some("""WITH b AS (SELECT lang, text,
                (((doc_id % 2147483648) * 2654435761) % 4294967296) % 100 AS bucket,
                CASE WHEN lang = 'en' THEN 90
                     WHEN lang = 'zh' THEN 30 ELSE 60 END AS rate
                FROM documents)
              SELECT lang, COUNT(*) AS n_total,
                COUNT(CASE WHEN bucket < rate THEN 1 END) AS n_kept,
                CAST(SUM(CASE WHEN bucket < rate
                  THEN len(string_split(text,' ')) ELSE 0 END) AS BIGINT)
                  AS kept_tokens
              FROM b GROUP BY lang ORDER BY lang""")),
    QueryDef("pack_sequences", packSequences,
      Some("""WITH d AS (SELECT doc_id, doc_id % 8 AS shard,
                CAST(len(string_split(text,' ')) AS INTEGER) AS n_tokens
                FROM documents),
              o AS (SELECT shard, doc_id, n_tokens,
                CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
                  ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
                FROM d)
              SELECT shard, doc_id, n_tokens, start_offset,
                start_offset // 512 AS pack_id
              FROM o ORDER BY shard, doc_id""")),
    QueryDef("dedup_simhash", dedupSimhash, None),
    QueryDef("text_normalize", textNormalize,
      Some("""WITH t AS (SELECT doc_id,
                trim(regexp_replace(regexp_replace(lower(text),
                  '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
                FROM documents)
              SELECT doc_id, norm,
               CAST(length(norm) AS INTEGER) AS norm_chars,
               sha256(norm) AS norm_digest
              FROM t ORDER BY doc_id""")),
    QueryDef("text_pii_mask", textPiiMask,
      Some("""WITH t AS (SELECT doc_id,
                text || ' contact user' || doc_id || '@example.com tel 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
                FROM documents)
              SELECT doc_id,
               len(regexp_extract_all(raw, '[a-z0-9]+@[a-z0-9.]+[a-z]'))
                 AS n_emails,
               len(regexp_extract_all(raw, '[0-9]{3}-[0-9]{4}')) AS n_phones,
               regexp_replace(regexp_replace(raw,
                 '[a-z0-9]+@[a-z0-9.]+[a-z]', '<EMAIL>', 'g'),
                 '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS masked
              FROM t ORDER BY doc_id""")),
    QueryDef("text_search_bm25", textSearchBm25,
      Some(s"""WITH $bm25BaseCtes,
              ${bm25Cte("q", bm25QueryA)}
              SELECT doc_id, bm25 FROM q
              ORDER BY bm25 DESC, doc_id LIMIT 10""")),
    QueryDef("sim_rrf_fusion", simRrfFusion,
      Some(s"""WITH $bm25BaseCtes,
              ${bm25Cte("qa", bm25QueryA)},
              ${bm25Cte("qb", bm25QueryB)},
              ra AS (SELECT * FROM (SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                   AS INTEGER) AS rank_a FROM qa) WHERE rank_a <= 50),
              rb AS (SELECT * FROM (SELECT doc_id,
                 CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                   AS INTEGER) AS rank_b FROM qb) WHERE rank_b <= 50)
              SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
                rank_a, rank_b,
                COALESCE(CAST(1 AS DOUBLE)
                    / (CAST(60 AS DOUBLE) + rank_a), CAST(0 AS DOUBLE))
                  + COALESCE(CAST(1 AS DOUBLE)
                    / (CAST(60 AS DOUBLE) + rank_b), CAST(0 AS DOUBLE))
                  AS rrf
              FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
              ORDER BY rrf DESC, doc_id LIMIT 10""")),
  )

  private val bm25QueryA = Seq("join", "hash", "vector")
  private val bm25QueryB = Seq("scan", "filter", "merge")

  /** Shared oracle CTEs for the BM25 keys: corpus stats, the token
    * stream, and per-doc lengths. */
  private val bm25BaseCtes: String =
    """stats AS (SELECT COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
           / COUNT(*) AS avg_len FROM documents),
       toks AS (SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok FROM documents),
       dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dlen
         FROM documents)"""

  /** One BM25 scoring block (k1=1.2, b=0.75) as oracle CTEs —
    * arithmetic shape kept EXACTLY parallel to [[bm25Scores]] so both
    * engines produce bit-identical doubles before the Det decimal sum.
    */
  private def bm25Cte(alias: String, terms: Seq[String]): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""${alias}_tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks
          WHERE tok IN ($termList) GROUP BY doc_id, tok),
        ${alias}_df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df
          FROM ${alias}_tf GROUP BY tok),
        $alias AS (SELECT doc_id,
          CAST(SUM(CAST(
            ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                / (CAST(df AS DOUBLE) + 0.5))
              * (CAST(tf AS DOUBLE) * 2.2)
              / (CAST(tf AS DOUBLE)
                 + 1.2 * (0.25 + 0.75 * CAST(dlen AS DOUBLE) / avg_len))
            AS DECIMAL(30,6))) AS DOUBLE) AS bm25
          FROM ${alias}_tf JOIN ${alias}_df USING (tok)
          JOIN dl USING (doc_id) CROSS JOIN stats GROUP BY doc_id)"""
  }

  /** BM25 keyword retrieval (k1=1.2, b=0.75) — the full-text-index query
    * class (ClickHouse inverted/`full_text` skipping index; Lucene's
    * scoring function, public formula): score each document against a
    * fixed query term set and return the global top-10.
    *
    * Determinism: per-(doc, term) scores are computed with an identical
    * all-DOUBLE arithmetic shape on both engines, then summed per doc
    * through DECIMAL(30,6) (order-independent, Det discipline); the
    * top-k tie-breaks on doc_id.
    *
    * Scale notes: this IS the inverted-index formulation — the postings
    * list (tf per doc×term) is built by ONE partial-agg shuffle
    * restricted to the query terms (the `WHERE tok IN` pushes below the
    * groupBy, so shuffle volume is O(docs containing a query term), not
    * O(corpus tokens)); df and corpus stats are O(terms)/O(1) broadcast
    * back. Global top-10 via TakeOrdered — no full sort. At 100 TB the
    * per-term postings are exactly what the index stores; nothing here
    * touches documents that match no term except the one corpus-stats
    * scan, which a real deployment amortizes across queries.
    */
  private def bm25Scores(s: SparkSession, dir: String,
      terms: Seq[String]): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val dl = docs.select(col("doc_id"), size(col("toks")).as("dlen"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dlen")).cast("double") / count(lit(1))).as("avg_len"))
    val tf = docs
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val tfd = col("tf").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val score = idf * (tfd * lit(2.2)) /
      (tfd + lit(1.2) * (lit(0.25) +
        lit(0.75) * col("dlen").cast("double") / col("avg_len")))
    tf.join(broadcast(df_), "tok").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), score.as("term_score"))
      .groupBy(col("doc_id"))
      .agg(Det.dsum(col("term_score")).as("bm25"))
  }

  private def textSearchBm25(s: SparkSession, dir: String): DataFrame =
    bm25Scores(s, dir, bm25QueryA)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(10)

  /** Reciprocal-rank fusion (RRF, k=60 — the public Cormack/Clarke/
    * Buettcher formula every hybrid-retrieval stack uses): fuse two
    * keyword retrievers' top-50 lists into one ranking. Missing-from-a-
    * list docs contribute 0 for that list.
    *
    * Determinism: ranks are integers (row_number with a doc_id tie-
    * break); the RRF score is a fixed-shape two-term double expression
    * over those integers — bit-identical across engines, no rounding
    * at the comparison edge.
    *
    * Scale notes: each retriever's candidate set is already small
    * (top-50), so the fusion join is a broadcast of two 50-row sides;
    * the rank window runs over each retriever's scored candidates
    * (O(docs matching any query term)), not the corpus. At 100 TB the
    * per-retriever top-k comes off the inverted index (text_search_bm25)
    * or the ANN index (sim_ivf_knn) — fusion cost is independent of
    * corpus size, which is exactly why RRF is the production default.
    */
  private def simRrfFusion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byScore = Window.orderBy(col("bm25").desc, col("doc_id"))
    def top50(terms: Seq[String], rankCol: String): DataFrame =
      bm25Scores(s, dir, terms)
        .withColumn(rankCol, row_number().over(byScore))
        .filter(col(rankCol) <= 50)
        .select(col("doc_id"), col(rankCol))
    val a = top50(bm25QueryA, "rank_a")
    val b = top50(bm25QueryB, "rank_b")
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("rank_a"), col("rank_b"),
        (coalesce(lit(1.0) / (lit(60.0) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("rank_b")), lit(0.0)))
          .as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(10)
  }
}
