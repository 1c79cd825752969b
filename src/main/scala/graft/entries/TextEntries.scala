package graft
package entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.{DataFrameUtils, Transformations}

import EntryHelpers._

/** [[graft.SparkEntry]] text-analysis, corpus-quality and tokenizer queries over the documents table — one `queries` entry per operator,
  * with its DuckDB `oracleSql` twin where SQL-expressible. Split from
  * the single SparkEntry object for reviewability; [[graft.SparkEntry]]
  * composes every domain object's maps (duplicate keys across files are
  * linted by RowsOnlyLedgerSpec).
  */
private[graft] object TextEntries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- text analysis: token counts, ratios, language id, quality ----
    // tokens projected once, then every stat reads the array attribute —
    // CollapseProject keeps the non-cheap multi-referenced alias separate
    "q_text_stats" -> ((s, dir) => {
      val ta = operators.TextAnalysis
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"), ta.tokens(col("text")).as("__toks"))
        .select(
          col("doc_id"),
          size(col("__toks")).as("n_tok"),
          ta.bpeishTokenCount(col("text")).as("n_bpe"),
          round(ta.punctRatio(col("text")), 6).as("punct_ratio"),
          ta.languageIdFromTokens(col("__toks")).as("lang_id"),
          ta.qualityScoreFromTokens(col("text"), col("__toks")).as("quality"))
    }),

    // ---- corpus hygiene: repetition fractions + URL/email density ----
    "q_doc_hygiene" -> ((s, dir) => {
      val ta = operators.TextAnalysis
      t(s, dir, "documents").select(
        col("doc_id"),
        round(ta.repetitionFrac(ta.lines(col("text"))), 6).as("dup_line_frac"),
        round(ta.repetitionFrac(ta.tokens(col("text"))), 6).as("dup_token_frac"),
        round(ta.repetitionFrac(ta.shingles(col("text"), 2)), 6)
          .as("dup_bigram_frac"),
        ta.urlCount(col("text")).as("n_urls"),
        ta.emailCount(col("text")).as("n_emails"))
    }),

    // ---- per-source corpus report: the daily pipeline audit query ----
    "q_corpus_report" -> ((s, dir) => {
      val ta = operators.TextAnalysis
      t(s, dir, "documents")
        .select(col("source"), col("lang"), col("text"),
          ta.tokens(col("text")).as("__toks"))
        .select(col("source"), col("lang"),
          size(col("__toks")).as("__n_tok"),
          ta.qualityScoreFromTokens(col("text"), col("__toks")).as("__q"),
          ta.urlCount(col("text")).as("__urls"),
          ta.emailCount(col("text")).as("__emails"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("__n_tok")).as("n_tokens"),
          // integer micros, not avg(double): float summation order differs
          // between engines/partitionings, so sum exactly and divide once
          sum(round(col("__q") * 1e6).cast("long")).as("__q_micros"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("__urls")).as("n_urls"),
          sum(col("__emails")).as("n_emails"))
        .withColumn("avg_quality",
          round(col("__q_micros") / (col("n_docs") * 1e6), 6))
        .drop("__q_micros")
    }),

    // ---- boilerplate line removal (CCNet/RefinedWeb line-dedup) over a
    // corpus with a planted universal footer + a semi-rare promo line ----
    "q_remove_boilerplate" -> ((s, dir) => {
      val corpus = t(s, dir, "documents").select(col("doc_id"),
        concat(coalesce(col("text"), lit("")),
          lit("\nsubscribe to the graft newsletter"),
          when(col("doc_id") % 3 === 0, lit("\nshared promo line"))
            .otherwise(lit(""))).as("text"))
      operators.TextAnalysis.removeBoilerplate(
        corpus, "doc_id", "text", maxDocs = 200)
    }),

    // ---- intra-document repeated-line removal (C4-style) over a corpus
    // where every doc repeats its own body line ----
    "q_dedup_lines" -> ((s, dir) => {
      val corpus = t(s, dir, "documents").select(col("doc_id"),
        concat(coalesce(col("text"), lit("")),
          lit("\n"), coalesce(col("text"), lit("")),
          lit("\ntail "), col("doc_id").cast("string")).as("text"))
      corpus.select(col("doc_id"),
        operators.TextAnalysis.dedupLinesWithinDoc(col("text")).as("clean"))
    }),

    // C4 three-sentence-span global dedup: documents sentencified with a
    // period after every 5 tokens, a shared 3-sentence span planted on
    // every 6th doc; later occurrences lose their sentences.
    "q_c4_span_dedup" -> ((s, dir) => {
      val corpus = t(s, dir, "documents").select(col("doc_id"),
        concat(
          regexp_replace(coalesce(col("text"), lit("")),
            "(\\S+ \\S+ \\S+ \\S+ \\S+)", "$1."),
          when(col("doc_id") % 6 === 0,
            lit(" Alpha beta gamma. Delta epsilon zeta. Eta theta iota."))
            .otherwise(lit(""))).as("text"))
      operators.TextAnalysis.dedupSentenceSpansGlobal(
        corpus, "doc_id", "text", k = 3)
    }),

    // HTML -> text extraction over a deterministic synthetic wrapping of
    // each document (title, style, script with a raw '<', comment,
    // entities) — the crawl-side step before every text operator.
    "q_html_extract" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit(" &amp; friends</title><style>p { color: red; }</style>"),
        lit("<script>var x = 1 < 2;</script></head><body><!-- nav -->"),
        lit("<p>"), coalesce(col("text"), lit("")),
        lit("</p><div>&quot;quoted&quot; &lt;tag&gt;</div></body></html>"))
      t(s, dir, "documents").select(col("doc_id"),
        operators.TextAnalysis.htmlTitle(html).as("title"),
        operators.TextAnalysis.htmlToText(html).as("extracted"))
    }),

    // Compression-ratio quality signal (deflate/raw) — no DuckDB oracle
    // (no deflate there); rows-only, value distribution spec-asserted in
    // TextDedupSpec. Planted flood on every 9th doc gives the signal
    // observable separation to detect.
    "q_compression_signal" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        when(col("doc_id") % 9 === 0,
          concat_ws(" ", array_repeat(lit("spam flood line"), 40)))
          .otherwise(coalesce(col("text"), lit(""))).as("text"))
        .select(col("doc_id"),
          round(operators.TextAnalysis.compressionRatio(col("text")), 6)
            .as("compress_ratio"))
    }),

    // Corpus-global keep-first line dedup: a footer planted on every doc
    // and a promo on every 4th survive only at their first occurrence.
    "q_dedup_lines_global" -> ((s, dir) => {
      val corpus = t(s, dir, "documents").select(col("doc_id"),
        concat(coalesce(col("text"), lit("")),
          lit("\nshared graft footer line"),
          when(col("doc_id") % 4 === 0, lit("\npromo spring sale"))
            .otherwise(lit(""))).as("text"))
      operators.TextAnalysis.dedupLinesGlobal(corpus, "doc_id", "text")
    }),

    // ---- n-gram novelty against earlier arrivals: planted later
    // near-copies (lshCorpus) must score near zero novelty ----
    "q_novelty" -> ((s, dir) => {
      operators.TextAnalysis.noveltyFrac(
        lshCorpus(s, dir), "doc_id", "text", col("doc_id"), shingleSize = 3)
    }),

    // ---- PII redaction over a corpus with planted URLs/emails/IPs ----
    "q_pii_redact" -> ((s, dir) => {
      val ta = operators.TextAnalysis
      val seeded = piiCorpus(s, dir)
      seeded.select(
        col("doc_id"),
        ta.urlCount(col("text")).as("n_urls"),
        ta.emailCount(col("text")).as("n_emails"),
        ta.ipv4Count(col("text")).as("n_ips"),
        ta.redactPii(col("text")).as("redacted"))
    }),

    // ---- per-source distinctive vocabulary (TF-IDF top terms) ----
    "q_top_terms" -> ((s, dir) => {
      operators.TextAnalysis.topTermsPerGroup(
        t(s, dir, "documents"), "source", "text", k = 5)
    }),

    // ---- single-pass column profiling (quality audit before training) ----
    "q_profile_documents" -> ((s, dir) => {
      operators.Validation.profile(
        t(s, dir, "documents"), Seq("doc_id", "source", "lang"))
    }),

    // ---- rule-based quality gate: one agg pass for row rules + one
    // groupBy per uniqueness rule ----
    "q_quality_checks" -> ((s, dir) => {
      operators.Validation.check(t(s, dir, "lineitem"), Seq(
        operators.Validation.NotNull("l_orderkey"),
        operators.Validation.Satisfies("qty_in_range",
          col("l_quantity").between(1, 50)),
        operators.Validation.Satisfies("price_above_1000",
          col("l_extendedprice") > 1000),
        operators.Validation.Unique(Seq("l_orderkey", "l_linenumber"))))
    }),

    // ---- n-gram LM perplexity scoring (train on 4/5, score 1/5) ----
    "q_lm_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.TextAnalysis.lmQualityScore(
        docs.where(col("doc_id") % 5 === 0), "doc_id", "text",
        docs.where(col("doc_id") % 5 =!= 0), "text")
    }),

    // ---- sentence-level language segmentation: periods planted every
    // 5 words, a German sentence appended to every 4th doc -> those
    // docs must flag mixed while doc-level language ID cannot see it ----
    "q_lang_segments" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"),
        concat(
          regexp_replace(coalesce(col("text"), lit("")),
            "(\\S+ \\S+ \\S+ \\S+ \\S+)", "$1."),
          when(col("doc_id") % 4 === 0,
            lit(" Der hund ist nicht mit der katze und das haus."))
            .otherwise(lit(""))).as("text"))
      operators.TextAnalysis.languageMixture(docs, "doc_id", "text")
    }),

    // ---- trained char-3-gram language ID (one-vs-rest hashed-BoW GD,
    // the T91 integer-exact chain per language): planted 4-language
    // fixture, train on the doc_id % 5 != 0 slice, confusion matrix
    // over ALL docs; the twin replays every epoch of all four binary
    // models as materialized CTE chains ----
    "q_langid_model" -> ((s, dir) => {
      val langsArr = array(lit("en"), lit("de"), lit("fr"), lit("es"))
      val sigArr = array(
        lit("the house and the garden is of stone to the end"),
        lit("der hund und die katze ist nicht ein mit haus"),
        lit("le chien et la maison est pas une dans les arbres"),
        lit("el perro y la casa es no una por los arboles"))
      val idx = (col("doc_id") % 4 + 1).cast("int")
      val docs = t(s, dir, "documents").select(
        col("doc_id"),
        element_at(langsArr, idx).as("lang_true"),
        concat(element_at(sigArr, idx), lit(" "),
          lower(substring(coalesce(col("text"), lit("")), 1, 40)),
          lit(" "), element_at(sigArr, idx)).as("txt"))
      val model = operators.TextAnalysis.trainLangId(
        docs.where(col("doc_id") % 5 =!= 0), "txt", "lang_true",
        dim = 512, iters = 6, lr = 1.0, ns = Seq(3))
      model.predict(docs, "txt")
        .groupBy(col("lang_true"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
    }),

    // ---- Porter stemming over the corpus — FULL DuckDB twin: the
    // oracle ports the paper's rules to SQL (C/V pattern via
    // list_reduce, measure as 'VC' count, longest-match CASE per
    // step), fuzz-verified against the Scala stemmer on 22,818
    // adversarial words. Exploded to one (doc_id, pos, stem) row per
    // token so the driver compare stays on scalar columns ----
    "q_stem_tokens" -> ((s, dir) => {
      t(s, dir, "documents").where(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          posexplode(operators.TextAnalysis.stemTokens(col("text")))
            .as(Seq("pos", "stem")))
    }),

    // ---- PMI bigram collocations over the documents corpus ----
    "q_collocations" -> ((s, dir) => {
      operators.TextAnalysis.collocations(
        t(s, dir, "documents"), "text", minCount = 3L)
    }),

    // ---- Dunning G² collocations: the χ²-calibrated low-count-robust
    // sibling of PMI, 2×2 cells from the same bigram tables ----
    "q_dunning" -> ((s, dir) => {
      operators.TextAnalysis.dunningCollocations(
        t(s, dir, "documents"), "text", minCount = 3L)
    }),

    // ---- Good–Turing frequency-of-frequencies table: N_r decay +
    // raw Turing r* with loud NULLs at frequency gaps ----
    "q_good_turing" -> ((s, dir) =>
      operators.TextAnalysis.goodTuringCounts(
        t(s, dir, "documents"), "text")),

    // ---- unigram-LM (SentencePiece-style) tokenizer: hard-EM training
    // + Viterbi encoding. Likelihood-driven segmentation is not
    // SQL-expressible -> rows-only, pinned by UnigramSpec's hand-traced
    // EM/coverage/determinism cases ----
    // ---- WordPiece (BERT-family) tokenizer: likelihood-scored merge
    // training + greedy longest-match encoding; rows-only by design
    // (the merge loop / greedy matcher are not SQL-expressible),
    // hand-traced score and BERT-semantics pins in WordPieceSpec ----
    "q_wordpiece_vocab" -> ((s, dir) => {
      operators.WordPiece.train(t(s, dir, "documents"), "text",
        vocabSize = 2000, minPairCount = 2, batchSize = 32)
    }),
    // encode output is exploded to one (doc_id, pos, token_id, piece)
    // row per emitted piece — scalar columns only, so the driver's
    // pandas compare records the row count (arrays crash its sort);
    // the vocab comes from the session-shared memo, so this times the
    // ENCODE path, not a redundant re-train
    "q_wordpiece_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      explodeEncoded(operators.WordPiece.encode(
        docs.where(col("doc_id") % 20 === 0), "doc_id", "text",
        sharedWordpieceVocab(s, dir)))
    }),

    // ---- tokenizer artifact lifecycle witness: (shared) train ->
    // sidecar-committed save -> kind-checked load -> encode (rows-only) ----
    "q_tokenizer_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val p = scratchDir("graft_tokart_") + "/wp"
      operators.Tokenizers.saveWordPiece(sharedWordpieceVocab(s, dir), p)
      explodeEncoded(operators.WordPiece.encode(
        docs.where(col("doc_id") % 50 === 0), "doc_id", "text",
        operators.Tokenizers.loadWordPiece(s, p)))
    }),

    "q_unigram_vocab" -> ((s, dir) => {
      operators.Unigram.train(t(s, dir, "documents"), "text",
        vocabSize = 300, seedSize = 3000, iterations = 2, maxPieceLen = 6)
    }),
    "q_unigram_encode" -> ((s, dir) => {
      // production-shaped vocab (32k target, seed-bounded driver state)
      // — the bench pin that encode's piece table stays
      // operator-embedded at real tokenizer scale
      val docs = t(s, dir, "documents")
      val vocab = operators.Unigram.train(docs, "text",
        vocabSize = 32000, seedSize = 50000, iterations = 2,
        maxPieceLen = 6)
      explodeEncoded(operators.Unigram.encode(
        docs.where(col("doc_id") % 20 === 0), "doc_id", "text", vocab,
        maxPieceLen = 6))
    }),

    // ---- Kneser–Ney upgrade of the same split: continuation-mass
    // smoothing instead of add-one ----
    "q_kn_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.TextAnalysis.knQualityScore(
        docs.where(col("doc_id") % 5 === 0), "doc_id", "text",
        docs.where(col("doc_id") % 5 =!= 0), "text")
    }),

    // ---- trigram interpolated Kneser–Ney over the same split: raw
    // top-level counts, continuation-count middle level, the bigram
    // operator's add-one continuation base ----
    "q_kn3_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.TextAnalysis.kn3QualityScore(
        docs.where(col("doc_id") % 5 === 0), "doc_id", "text",
        docs.where(col("doc_id") % 5 =!= 0), "text")
    }),

    // ---- Gopher quality-filter rules (Rae et al. 2021 A1.1) ----
    "q_gopher_rules" -> ((s, dir) => {
      operators.TextAnalysis.withGopherRules(
        t(s, dir, "documents").select(col("doc_id"), col("text")), "text")
        .select(col("doc_id"), col("n_words"), col("mean_word_len"),
          col("symbol_ratio"), col("bullet_line_frac"),
          col("ellipsis_line_frac"), col("alpha_word_frac"),
          col("stop_hits"), col("gopher_pass"))
    }),

    // ---- CCNet-style perplexity buckets: LM-score the held-out fifth
    // against the rest, then head/middle/tail thirds per language ----
    "q_ccnet_buckets" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = operators.TextAnalysis.lmQualityScore(
        docs.where(col("doc_id") % 5 === 0), "doc_id", "text",
        docs.where(col("doc_id") % 5 =!= 0), "text")
        .where(col("n_bigrams") > 0)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      operators.Selection.quantileBuckets(
        scored.select(col("doc_id"), col("lang"), col("avg_nll")),
        "avg_nll", tieBreakCols = Seq("doc_id"), groupCols = Seq("lang"))
    }),

    // ---- lexical entropy + type-token ratio quality signal ----
    "q_token_entropy" -> ((s, dir) => {
      operators.TextAnalysis.tokenEntropy(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text")
    }),

    // ---- C4 cleaning rules (Raffel et al. 2020 §2.2) over a synthesized
    // multi-line corpus (the flat testdata docs have no lines/punct) ----
    "q_c4_clean" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = docs.withColumn("text", concat_ws("\n",
        concat(coalesce(col("text"), lit("")), lit(".")),
        lit("too short."),
        lit("this page uses javascript heavily today."),
        lit("a perfectly reasonable sentence appears right here!"),
        lit("another good sentence with enough words present?"),
        when(col("doc_id") % 7 === 0,
          lit("lorem ipsum dolor sit amet consectetur.")),
        when(col("doc_id") % 11 === 0, lit("function f() { return 1; }")),
        when(col("doc_id") % 13 === 0,
          lit("do not miss this clickbait offer today."))))
      operators.TextAnalysis.c4Clean(corpus, "text",
        badWords = Seq("clickbait"))
        .select(col("doc_id"), col("text_clean"), col("n_lines_kept"),
          col("n_sentences"), col("c4_keep"))
    }),

    // ---- markdown code-fence extraction: every 5th doc carries a
    // planted python fence ----
    "q_code_blocks" -> ((s, dir) => {
      val planted = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 5 === 0,
            concat(lit("\n```python\nprint("), col("doc_id"), lit(")\n```\n")))
            .otherwise(lit(""))).as("text"))
      operators.TextAnalysis.markdownCodeBlocks(planted, "doc_id", "text")
    }),

    // ---- mojibake repair: every 7th doc carries a cp1252-mangled
    // suffix; the oracle states the clean text directly ----
    "q_fix_mojibake" -> ((s, dir) => {
      val planted = lit(graft.functions.MojibakeFunctions
        .cp1252Mangled(" Café — déjà “vu” …"))
      t(s, dir, "documents").select(col("doc_id"),
        graft.functions.MojibakeFunctions.fixMojibake(
          concat(col("text"),
            when(col("doc_id") % 7 === 0, planted).otherwise(lit(""))))
          .as("text"))
    }),

    // ---- SQL surface: graft functions callable from spark.sql ----
    "q_sql_surface" -> ((s, dir) => {
      graft.sql.GraftFunctions.register(s)
      t(s, dir, "documents").createOrReplaceTempView("graft_docs")
      s.sql("SELECT doc_id, graft_hex_prefix(sha2(text, 256), 7) AS hp " +
        "FROM graft_docs")
    }),

    // ---- physical-layout audit: write a bloomed compacted copy, then
    // the distributed footer report must account for every file, row
    // group and row, with blooms and stats where promised ----
    "q_layout_report" -> ((s, dir) => {
      val scratch = scratchDir("graft_layout_") + "/docs"
      operators.Compaction.writeCompacted(
        t(s, dir, "documents").select("doc_id", "source", "n_chars"),
        scratch, numFiles = 8, bloomFilters = Map("doc_id" -> 100000L))
      operators.Compaction.layoutReport(s, scratch)
        .where(col("column") === "doc_id")
        .agg(countDistinct(col("file")).as("n_files"),
          count(lit(1)).as("n_row_groups"),
          sum(col("n_rows")).as("n_rows"),
          min(col("has_bloom")).as("all_bloomed"),
          min(col("has_min_max")).as("all_stats"))
    }),

    // ---- retrieval chunker: overlapping token windows ----
    "q_chunk_text" -> ((s, dir) => {
      operators.TextAnalysis.chunkTokens(t(s, dir, "documents"),
        "doc_id", "text", window = 32, stride = 24)
    }),

    // ---- Flesch reading ease over the corpus ----
    "q_flesch" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        operators.TextAnalysis.fleschReadingEase(col("text")).as("flesch"))
    }),

    // ---- frequency-ranked vocabulary with dense deterministic ids ----
    "q_vocab" -> ((s, dir) => {
      operators.TextAnalysis.buildVocab(
        t(s, dir, "documents"), "text", maxSize = 1000, minCount = 1L)
    }),

    // ---- BPE tokenizer training: 24 merges learned over word types
    // (iterative argmax — not SQL-expressible, so rows-only like the
    // KMeans queries; BpeSpec pins the algorithm to a reference impl) ----
    "q_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      val (merges, wt) = operators.Bpe.learnMerges(
        t(s, dir, "documents"), "text", numMerges = 24)
      graft.core.Caches.releaseCheckpoint(wt)
      merges.map(m => (m.rank, m.left, m.right, m.merged))
        .toDF("rank", "left", "right", "merged")
    }),

    // ---- BPE training on the production fast path: approximate
    // compatible batching (exact=false) — same merge count, ~batchSize
    // merges per driver round instead of ~1–2; rows-only like its exact
    // twin, with BpeSpec pinning the mode's determinism/losslessness ----
    "q_bpe_merges_fast" -> ((s, dir) => {
      import s.implicits._
      val (merges, wt) = operators.Bpe.learnMerges(
        t(s, dir, "documents"), "text", numMerges = 24, exact = false)
      graft.core.Caches.releaseCheckpoint(wt)
      merges.map(m => (m.rank, m.left, m.right, m.merged))
        .toDF("rank", "left", "right", "merged")
    }),

    // ---- byte-level (GPT-2 family) BPE: published regex pre-tokenizer
    // + reversible 256-point byte alphabet, merges learned by the SAME
    // exact batched loop; rows-only like the rest of the tokenizer
    // family (the iterative argmax is not SQL-expressible) — BpeSpec
    // pins the merge sequence against a single-node reference and the
    // exact encode/decode round-trip incl. multi-byte UTF-8 ----
    "q_bpe_bytes" -> ((s, dir) => {
      import s.implicits._
      val (merges, wt) = operators.Bpe.learnByteMerges(
        t(s, dir, "documents"), "text", numMerges = 24)
      graft.core.Caches.releaseCheckpoint(wt)
      merges.map(m => (m.rank, m.left, m.right, m.merged))
        .toDF("rank", "left", "right", "merged")
    }),

    // ---- BPE encode of the corpus under the learned merges, flattened
    // to (doc_id, pos, unit) — exercises the distinct-word join path ----
    "q_bpe_encode" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val (merges, wt) = operators.Bpe.learnMerges(docs, "text", numMerges = 24)
      graft.core.Caches.releaseCheckpoint(wt)
      operators.Bpe.encode(docs, "doc_id", "text", merges)
        .select(col("doc_id"),
          posexplode(col("bpe_tokens")).as(Seq("pos", "unit")))
    }),

    // ---- vocab-encode: documents as token-id sequences (OOV = -1);
    // flattened with posexplode for the row-level oracle compare ----
    "q_encode_tokens" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // a small vocab (top 20) leaves real OOV terms to exercise oovId
      val vocab = operators.TextAnalysis.buildVocab(
        docs, "text", maxSize = 20, minCount = 2L)
      operators.TextAnalysis.encodeTokens(docs, vocab, "doc_id", "text")
        .select(col("doc_id"),
          posexplode(col("token_ids")).as(Seq("pos", "token_id")))
    }),

    // ---- Zipf-law naturalness audit over the corpus vocabulary ----
    "q_zipf" -> ((s, dir) =>
      operators.TextAnalysis.zipfFit(t(s, dir, "documents"), "text")),

    // ---- license detection over a deterministically-salted corpus ----
    "q_license_scan" -> ((s, dir) => {
      val salted = t(s, dir, "documents").withColumn("text2",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" SPDX-License-Identifier: MIT")))
        .when(col("doc_id") % 7 === 1,
          concat(col("text"), lit(" Licensed under the Apache License, " +
            "Version 2.0 terms.")))
        .when(col("doc_id") % 7 === 2,
          concat(col("text"), lit(" Released under the GNU General " +
            "Public License.")))
        .otherwise(col("text")))
      operators.TextAnalysis.withLicenseDetection(salted, "text2")
        .select(col("doc_id"), col("spdx_id"), col("license_guess"),
          col("is_permissive"))
    }),

    // ---- skip-gram co-occurrence pairs + TextRank keywords ----
    "q_skipgrams" -> ((s, dir) =>
      operators.TextAnalysis.skipGramPairs(
        t(s, dir, "documents"), "doc_id", "text", window = 2)),

    "q_textrank" -> ((s, dir) =>
      operators.TextAnalysis.textRankKeywords(
        t(s, dir, "documents"), "doc_id", "text",
        window = 2, iterations = 3, topK = 20)),

    // ---- Flesch reading ease + FK grade level per doc (full twin) ----
    "q_readability" -> ((s, dir) =>
      operators.TextAnalysis.readabilityScores(
        t(s, dir, "documents"), "doc_id", "text")),

    // ---- vocabulary coverage per source (Chao1 + Good–Turing): how
    // much of each source's type inventory the crawl has seen ----
    "q_vocab_richness" -> ((s, dir) =>
      operators.TextAnalysis.vocabularyCoverage(
        t(s, dir, "documents"), Seq("source"), "text")),

    // ---- term burstiness (Church & Gale 1995): Fisher dispersion +
    // adaptation per vocabulary type over the whole corpus ----
    "q_burstiness" -> ((s, dir) =>
      operators.TextAnalysis.termBurstiness(
        t(s, dir, "documents"), "doc_id", "text", minDocs = 5L)),

    // ---- distinct-n diversity per source (Li 2016): mode-collapse
    // audit before synthetic data enters the mix ----
    "q_distinct_ngrams" -> ((s, dir) =>
      operators.TextAnalysis.distinctNgrams(
        t(s, dir, "documents"), "source", "text", maxN = 3)),

    // ---- n-gram novelty vs a reference split (RAVEN-style
    // memorization audit): every 7th doc scored against the rest ----
    "q_ngram_novelty" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      operators.TextAnalysis.ngramNovelty(
        docs.where(col("doc_id") % 7 === 0), "doc_id", "text",
        docs.where(col("doc_id") % 7 =!= 0), "text", n = 3)
    }),

    // ---- Heaps' law vocabulary-growth fit over the doc_id walk ----
    "q_heaps" -> ((s, dir) =>
      operators.TextAnalysis.heapsLaw(
        t(s, dir, "documents"), "doc_id", "text", maxPoints = 256)),


    // ---- MATTR lexical diversity (Covington 2010): length-independent
    // windowed TTR per document ----
    "q_mattr" -> ((s, dir) =>
      operators.TextAnalysis.mattr(
        t(s, dir, "documents"), "doc_id", "text", window = 50)),

    // ---- corpus bigram entropy rate: template/boilerplate corpora
    // score low, healthy prose high ----
    "q_entropy_rate" -> ((s, dir) =>
      operators.TextAnalysis.bigramEntropyRate(
        t(s, dir, "documents"), "text")),

    // ---- vocab coverage audit: per-doc OOV rate against a top-20
    // vocabulary (does the tokenizer fit the corpus?) ----
    "q_vocab_coverage" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val vocab = operators.TextAnalysis.buildVocab(
        docs, "text", maxSize = 20, minCount = 2L)
      operators.TextAnalysis.vocabCoverage(docs, vocab, "doc_id", "text")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    // readability: identical whitespace/sentence/vowel-group counting,
    // constants as ::DOUBLE literals (bare decimals are DECIMAL in
    // DuckDB and overflow/diverge)
    "q_readability" ->
      """WITH base AS (
        |  SELECT doc_id, coalesce(text, '') AS text,
        |    list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                t -> t <> '') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
        |      AS BIGINT)) AS n_sentences,
        |    CAST(coalesce(list_sum(list_transform(toks, t ->
        |      greatest(1, len(regexp_extract_all(t, '[aeiouyAEIOUY]+'))))),
        |      0) AS BIGINT) AS n_syllables
        |  FROM base)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words = 0 THEN NULL ELSE round(206.835::DOUBLE
        |    - 1.015::DOUBLE * (n_words::DOUBLE / n_sentences)
        |    - 84.6::DOUBLE * (n_syllables::DOUBLE / n_words), 6)
        |  END AS fre,
        |  CASE WHEN n_words = 0 THEN NULL ELSE round(0.39::DOUBLE
        |    * (n_words::DOUBLE / n_sentences)
        |    + 11.8::DOUBLE * (n_syllables::DOUBLE / n_words)
        |    - 15.59::DOUBLE, 6)
        |  END AS fkgl
        |FROM c""".stripMargin,
    "q_text_stats" ->
      """WITH base AS (
        |  SELECT doc_id, coalesce(text, '') AS text,
        |    list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                t -> t <> '') AS toks
        |  FROM documents),
        |stats AS (
        |  SELECT doc_id, text, len(toks) AS n_tok,
        |    len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS n_bpe,
        |    CASE WHEN length(text) = 0 THEN 0.0
        |         ELSE length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g'))
        |              * 1.0 / length(text) END AS praw,
        |    CASE WHEN length(text) = 0 THEN 0.0
        |         ELSE length(regexp_replace(text, '[^A-Z]', '', 'g'))
        |              * 1.0 / length(text) END AS uraw,
        |    len(list_filter(list_transform(toks, t -> lower(t)),
        |      t -> list_contains(['the','and','of','to','in','is','that','for'], t))) AS s_en,
        |    len(list_filter(list_transform(toks, t -> lower(t)),
        |      t -> list_contains(['der','die','das','und','ist','nicht','ein','mit'], t))) AS s_de,
        |    len(list_filter(list_transform(toks, t -> lower(t)),
        |      t -> list_contains(['le','la','les','et','est','pas','une','dans'], t))) AS s_fr,
        |    len(list_filter(list_transform(toks, t -> lower(t)),
        |      t -> list_contains(['el','la','los','y','es','no','una','por'], t))) AS s_es
        |  FROM base)
        |SELECT doc_id, n_tok, n_bpe, round(praw, 6) AS punct_ratio,
        |  CASE WHEN s_en > 0 AND s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
        |       WHEN s_de > 0 AND s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
        |       WHEN s_fr > 0 AND s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
        |       WHEN s_es > 0 AND s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
        |       ELSE 'und' END AS lang_id,
        |  round(
        |    0.25 * least(1.0, n_tok / 50.0)
        |    + 0.25 * (1.0 - least(1.0, praw * 4.0))
        |    + 0.25 * (1.0 - least(1.0, uraw * 4.0))
        |    + 0.25 * (CASE WHEN n_tok > 0
        |        AND length(regexp_replace(text, '\s+', '', 'g')) * 1.0 / n_tok
        |            BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.0 END),
        |  6) AS quality
        |FROM stats""".stripMargin,
    "q_profile_documents" ->
      """SELECT 'doc_id' AS "column", count(*)::BIGINT AS n_rows,
        |  (count(*) - count(doc_id))::BIGINT AS n_null,
        |  count(DISTINCT doc_id)::BIGINT AS n_distinct,
        |  CAST(min(doc_id) AS VARCHAR) AS min_val,
        |  CAST(max(doc_id) AS VARCHAR) AS max_val
        |FROM documents
        |UNION ALL
        |SELECT 'source', count(*)::BIGINT, (count(*) - count(source))::BIGINT,
        |  count(DISTINCT source)::BIGINT,
        |  CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
        |FROM documents
        |UNION ALL
        |SELECT 'lang', count(*)::BIGINT, (count(*) - count(lang))::BIGINT,
        |  count(DISTINCT lang)::BIGINT,
        |  CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
        |FROM documents""".stripMargin,
    "q_quality_checks" ->
      """SELECT 'l_orderkey_not_null' AS rule,
        |  (count(*) FILTER (WHERE l_orderkey IS NULL))::BIGINT AS violations
        |FROM lineitem
        |UNION ALL
        |SELECT 'qty_in_range', (count(*) FILTER (
        |  WHERE NOT coalesce(l_quantity BETWEEN 1 AND 50, false)))::BIGINT
        |FROM lineitem
        |UNION ALL
        |SELECT 'price_above_1000', (count(*) FILTER (
        |  WHERE NOT coalesce(l_extendedprice > 1000, false)))::BIGINT
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_orderkey_l_linenumber_unique', coalesce(sum(c - 1), 0)::BIGINT
        |FROM (SELECT count(*) AS c FROM lineitem
        |      GROUP BY l_orderkey, l_linenumber) g
        |WHERE c > 1""".stripMargin,
    // vocab: ids assigned in (cnt desc, term asc) order on both sides;
    // row_number is BIGINT in DuckDB → ::INT to match Spark's int
    "q_vocab" ->
      """WITH t AS (
        |  SELECT lower(tok) AS term
        |  FROM (
        |    SELECT unnest(list_filter(
        |      string_split_regex(coalesce(text, ''), '\s+'),
        |      x -> x <> '')) AS tok
        |    FROM documents)),
        |c AS (
        |  SELECT term, count(*) AS cnt FROM t
        |  GROUP BY term HAVING count(*) >= 1),
        |top AS (SELECT term, cnt FROM c ORDER BY cnt DESC, term LIMIT 1000)
        |SELECT term, cnt,
        |  (row_number() OVER (ORDER BY cnt DESC, term) - 1)::INT AS token_id
        |FROM top""".stripMargin,
    // vocab-encode: the vocab CTE mirrors q_vocab at maxSize 20; DuckDB
    // range() yields BIGINT and row_number BIGINT → ::INT to match Spark
    "q_encode_tokens" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                x -> x <> '') AS toks
        |  FROM documents),
        |t AS (
        |  SELECT lower(tok) AS term
        |  FROM (SELECT unnest(toks) AS tok FROM toks)),
        |c AS (
        |  SELECT term, count(*) AS cnt FROM t
        |  GROUP BY term HAVING count(*) >= 2),
        |top AS (SELECT term, cnt FROM c ORDER BY cnt DESC, term LIMIT 20),
        |vocab AS (
        |  SELECT term,
        |    (row_number() OVER (ORDER BY cnt DESC, term) - 1)::INT AS token_id
        |  FROM top),
        |pt AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(0, len(toks)),
        |      i -> {'pos': i, 'term': lower(toks[i + 1])})) AS u
        |  FROM toks),
        |flat AS (SELECT doc_id, (u.pos)::INT AS pos, u.term AS term FROM pt)
        |SELECT f.doc_id, f.pos, coalesce(v.token_id, -1) AS token_id
        |FROM flat f LEFT JOIN vocab v ON f.term = v.term""".stripMargin,
    "q_lm_score" ->
      """WITH ref AS (
        |  SELECT text FROM documents WHERE doc_id % 5 <> 0),
        |score_docs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
        |rt AS (
        |  SELECT list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                     t -> t <> '') AS toks FROM ref),
        |uni AS (
        |  SELECT w AS w1, count(*)::BIGINT AS cu
        |  FROM rt CROSS JOIN unnest(toks) u(w) GROUP BY w),
        |v AS (SELECT count(*)::BIGINT AS v FROM uni),
        |rb AS (
        |  SELECT toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i AS INTEGER)+1] AS bg
        |  FROM rt CROSS JOIN unnest(range(1, greatest(len(toks) - 1, 0) + 1)) t(i)),
        |bi AS (SELECT bg, count(*)::BIGINT AS cb FROM rb GROUP BY bg),
        |dt AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                t -> t <> '') AS toks FROM score_docs),
        |db AS (
        |  SELECT doc_id, toks[CAST(i AS INTEGER)] AS w1,
        |    toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i AS INTEGER)+1] AS bg
        |  FROM dt CROSS JOIN unnest(range(1, greatest(len(toks) - 1, 0) + 1)) t(i)),
        |nll AS (
        |  SELECT db.doc_id,
        |    -ln((coalesce(bi.cb, 0) + 1.0) / (coalesce(uni.cu, 0) + v.v))
        |      AS nll
        |  FROM db LEFT JOIN bi ON db.bg = bi.bg
        |          LEFT JOIN uni ON db.w1 = uni.w1
        |          CROSS JOIN v),
        |agg AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
        |    round(avg(nll), 6) AS avg_nll
        |  FROM nll GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(agg.n_bigrams, 0)::BIGINT AS n_bigrams,
        |  agg.avg_nll
        |FROM score_docs d LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin,
    // PMI collocations: marginals from the FULL bigram-types table,
    // min-count filter applied to the output pairs only
    // Good–Turing: exact count-of-counts + one left self-join on r+1.
    "q_good_turing" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(
        |    coalesce(text, ''), '\s+'), t -> t <> '')) AS w
        |  FROM documents),
        |freq AS (
        |  SELECT w, count(*)::BIGINT AS r FROM toks GROUP BY w),
        |nr AS (SELECT r, count(*)::BIGINT AS n_r FROM freq GROUP BY r)
        |SELECT a.r, a.n_r,
        |  round(((a.r + 1) * b.n_r)::DOUBLE / a.n_r::DOUBLE, 6) AS r_star
        |FROM nr a LEFT JOIN nr b ON a.r + 1 = b.r""".stripMargin,

    // Dunning G²: same bigram/marginal tables as q_collocations, the
    // 4-cell log-likelihood ratio in the Scala side's exact term order
    // (o11, o12, o21, o22 left to right — every IEEE op lines up).
    "q_dunning" ->
      """WITH toks AS (
        |  SELECT list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                     t -> t <> '') AS toks FROM documents),
        |rb AS (
        |  SELECT toks[CAST(i AS INTEGER)] AS w1,
        |    toks[CAST(i AS INTEGER)+1] AS w2
        |  FROM toks CROSS JOIN unnest(range(1, greatest(len(toks) - 1, 0) + 1)) t(i)),
        |bi AS (SELECT w1, w2, count(*)::BIGINT AS n12 FROM rb GROUP BY w1, w2),
        |m1 AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM bi GROUP BY w1),
        |m2 AS (SELECT w2, CAST(sum(n12) AS BIGINT) AS n2 FROM bi GROUP BY w2),
        |tot AS (SELECT CAST(sum(n12) AS BIGINT) AS nn FROM bi),
        |cells AS (
        |  SELECT bi.w1, bi.w2, bi.n12, m1.n1, m2.n2, tot.nn,
        |    bi.n12 AS o11, m1.n1 - bi.n12 AS o12, m2.n2 - bi.n12 AS o21,
        |    tot.nn - m1.n1 - m2.n2 + bi.n12 AS o22
        |  FROM bi JOIN m1 ON bi.w1 = m1.w1 JOIN m2 ON bi.w2 = m2.w2
        |    CROSS JOIN tot
        |  WHERE bi.n12 >= 3)
        |SELECT w1, w2, n12, n1, n2,
        |  round(2.0 * (
        |    (CASE WHEN o11 = 0 THEN 0.0 ELSE o11::DOUBLE *
        |      ln(o11::DOUBLE / (n1::DOUBLE * n2::DOUBLE / nn::DOUBLE)) END) +
        |    (CASE WHEN o12 = 0 THEN 0.0 ELSE o12::DOUBLE *
        |      ln(o12::DOUBLE / (n1::DOUBLE * (nn - n2)::DOUBLE / nn::DOUBLE)) END) +
        |    (CASE WHEN o21 = 0 THEN 0.0 ELSE o21::DOUBLE *
        |      ln(o21::DOUBLE / ((nn - n1)::DOUBLE * n2::DOUBLE / nn::DOUBLE)) END) +
        |    (CASE WHEN o22 = 0 THEN 0.0 ELSE o22::DOUBLE *
        |      ln(o22::DOUBLE / ((nn - n1)::DOUBLE * (nn - n2)::DOUBLE / nn::DOUBLE)) END)
        |  ), 6) AS g2
        |FROM cells""".stripMargin,

    "q_collocations" ->
      """WITH toks AS (
        |  SELECT list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                     t -> t <> '') AS toks FROM documents),
        |rb AS (
        |  SELECT toks[CAST(i AS INTEGER)] AS w1,
        |    toks[CAST(i AS INTEGER)+1] AS w2
        |  FROM toks CROSS JOIN unnest(range(1, greatest(len(toks) - 1, 0) + 1)) t(i)),
        |bi AS (SELECT w1, w2, count(*)::BIGINT AS n12 FROM rb GROUP BY w1, w2),
        |m1 AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM bi GROUP BY w1),
        |m2 AS (SELECT w2, CAST(sum(n12) AS BIGINT) AS n2 FROM bi GROUP BY w2),
        |tot AS (SELECT CAST(sum(n12) AS BIGINT) AS nn FROM bi)
        |SELECT bi.w1, bi.w2, bi.n12,
        |  round(ln((bi.n12::DOUBLE * tot.nn::DOUBLE)
        |    / (m1.n1::DOUBLE * m2.n2::DOUBLE)), 6) AS pmi
        |FROM bi JOIN m1 ON bi.w1 = m1.w1 JOIN m2 ON bi.w2 = m2.w2
        |  CROSS JOIN tot
        |WHERE bi.n12 >= 3""".stripMargin,
    // Kneser–Ney: identical expression ORDER to the Spark side so every
    // IEEE op is bit-reproducible; only ln is transcendental (same
    // empirical-agreement footing as q_lm_score)
    "q_kn_score" ->
      """WITH ref AS (
        |  SELECT text FROM documents WHERE doc_id % 5 <> 0),
        |score_docs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
        |rt AS (
        |  SELECT list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                     t -> t <> '') AS toks FROM ref),
        |v AS (SELECT count(DISTINCT w)::BIGINT AS v
        |  FROM rt CROSS JOIN unnest(toks) u(w)),
        |rb AS (
        |  SELECT toks[CAST(i AS INTEGER)] AS w1,
        |    toks[CAST(i AS INTEGER)+1] AS w2,
        |    toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i AS INTEGER)+1] AS bg
        |  FROM rt CROSS JOIN unnest(range(1, greatest(len(toks) - 1, 0) + 1)) t(i)),
        |bi AS (SELECT bg, count(*)::BIGINT AS cb FROM rb GROUP BY bg),
        |w1s AS (SELECT w1, count(*)::BIGINT AS c1,
        |    count(DISTINCT w2)::BIGINT AS n1pl FROM rb GROUP BY w1),
        |w2s AS (SELECT w2, count(DISTINCT w1)::BIGINT AS n1pr FROM rb GROUP BY w2),
        |tot AS (SELECT count(DISTINCT bg)::BIGINT AS n1pall FROM rb),
        |dt AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                t -> t <> '') AS toks FROM score_docs),
        |db AS (
        |  SELECT doc_id, toks[CAST(i AS INTEGER)] AS w1,
        |    toks[CAST(i AS INTEGER)+1] AS w2,
        |    toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i AS INTEGER)+1] AS bg
        |  FROM dt CROSS JOIN unnest(range(1, greatest(len(toks) - 1, 0) + 1)) t(i)),
        |nll AS (
        |  SELECT db.doc_id,
        |    -ln(CASE WHEN coalesce(w1s.c1, 0) > 0 THEN
        |        greatest(coalesce(bi.cb, 0)::DOUBLE - 0.75, 0.0)
        |          / coalesce(w1s.c1, 0)::DOUBLE
        |        + 0.75 * coalesce(w1s.n1pl, 0)::DOUBLE
        |          / coalesce(w1s.c1, 0)::DOUBLE
        |          * ((coalesce(w2s.n1pr, 0)::DOUBLE + 1.0)
        |             / (tot.n1pall::DOUBLE + v.v::DOUBLE + 1.0))
        |      ELSE (coalesce(w2s.n1pr, 0)::DOUBLE + 1.0)
        |             / (tot.n1pall::DOUBLE + v.v::DOUBLE + 1.0)
        |      END) AS nll
        |  FROM db LEFT JOIN bi ON db.bg = bi.bg
        |          LEFT JOIN w1s ON db.w1 = w1s.w1
        |          LEFT JOIN w2s ON db.w2 = w2s.w2
        |          CROSS JOIN tot CROSS JOIN v),
        |agg AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
        |    round(avg(nll), 6) AS avg_nll
        |  FROM nll GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(agg.n_bigrams, 0)::BIGINT AS n_bigrams,
        |  agg.avg_nll
        |FROM score_docs d LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin,
    // trigram Kneser–Ney: identical expression ORDER to the Spark side
    // (p2 materialized as a DOUBLE column — bit-preserving — so the
    // backoff CASE is written once); same empirical-ln footing as
    // q_kn_score
    "q_kn3_score" ->
      """WITH ref AS (
        |  SELECT text FROM documents WHERE doc_id % 5 <> 0),
        |score_docs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
        |rt AS (
        |  SELECT list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                     t -> t <> '') AS toks FROM ref),
        |v AS (SELECT count(DISTINCT w)::BIGINT AS v
        |  FROM rt CROSS JOIN unnest(toks) u(w)),
        |rb AS (
        |  SELECT toks[CAST(i AS INTEGER)] AS w1,
        |    toks[CAST(i AS INTEGER)+1] AS w2,
        |    toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i AS INTEGER)+1] AS bg
        |  FROM rt CROSS JOIN unnest(range(1, greatest(len(toks) - 1, 0) + 1)) t(i)),
        |w3c AS (SELECT w2 AS w3, count(DISTINCT w1)::BIGINT AS n1pr
        |  FROM rb GROUP BY w2),
        |tot AS (SELECT count(DISTINCT bg)::BIGINT AS n1pall FROM rb),
        |rtri AS (
        |  SELECT toks[CAST(i AS INTEGER)] AS w1,
        |    toks[CAST(i AS INTEGER)+1] AS w2,
        |    toks[CAST(i AS INTEGER)+2] AS w3
        |  FROM rt CROSS JOIN unnest(range(1, greatest(len(toks) - 2, 0) + 1)) t(i)),
        |tri AS (SELECT w1, w2, w3, count(*)::BIGINT AS c123
        |  FROM rtri GROUP BY w1, w2, w3),
        |hist AS (SELECT w1, w2, count(*)::BIGINT AS c12,
        |    count(DISTINCT w3)::BIGINT AS n1pl3 FROM rtri GROUP BY w1, w2),
        |kn2 AS (SELECT w2, w3, count(*)::BIGINT AS kn2 FROM tri GROUP BY w2, w3),
        |mid AS (SELECT w2, CAST(sum(kn2) AS BIGINT) AS kn2den,
        |    count(*)::BIGINT AS n1pl2 FROM kn2 GROUP BY w2),
        |dt AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                t -> t <> '') AS toks FROM score_docs),
        |dtri AS (
        |  SELECT doc_id, toks[CAST(i AS INTEGER)] AS w1,
        |    toks[CAST(i AS INTEGER)+1] AS w2,
        |    toks[CAST(i AS INTEGER)+2] AS w3
        |  FROM dt CROSS JOIN unnest(range(1, greatest(len(toks) - 2, 0) + 1)) t(i)),
        |j AS (
        |  SELECT dtri.doc_id,
        |    coalesce(tri.c123, 0) AS c123, coalesce(hist.c12, 0) AS c12,
        |    coalesce(hist.n1pl3, 0) AS n1pl3, coalesce(kn2.kn2, 0) AS kn2,
        |    coalesce(mid.kn2den, 0) AS kn2den,
        |    coalesce(mid.n1pl2, 0) AS n1pl2, coalesce(w3c.n1pr, 0) AS n1pr,
        |    tot.n1pall AS n1pall, v.v AS v
        |  FROM dtri LEFT JOIN tri ON dtri.w1 = tri.w1 AND dtri.w2 = tri.w2
        |      AND dtri.w3 = tri.w3
        |    LEFT JOIN hist ON dtri.w1 = hist.w1 AND dtri.w2 = hist.w2
        |    LEFT JOIN kn2 ON dtri.w2 = kn2.w2 AND dtri.w3 = kn2.w3
        |    LEFT JOIN mid ON dtri.w2 = mid.w2
        |    LEFT JOIN w3c ON dtri.w3 = w3c.w3
        |    CROSS JOIN tot CROSS JOIN v),
        |p2t AS (
        |  SELECT doc_id, c123, c12, n1pl3,
        |    CASE WHEN kn2den > 0 THEN
        |        greatest(kn2::DOUBLE - 0.75, 0.0) / kn2den::DOUBLE
        |        + 0.75 * n1pl2::DOUBLE / kn2den::DOUBLE
        |          * ((n1pr::DOUBLE + 1.0) / (n1pall::DOUBLE + v::DOUBLE + 1.0))
        |      ELSE (n1pr::DOUBLE + 1.0) / (n1pall::DOUBLE + v::DOUBLE + 1.0)
        |      END AS p2
        |  FROM j),
        |nll AS (
        |  SELECT doc_id,
        |    -ln(CASE WHEN c12 > 0 THEN
        |        greatest(c123::DOUBLE - 0.75, 0.0) / c12::DOUBLE
        |        + 0.75 * n1pl3::DOUBLE / c12::DOUBLE * p2
        |      ELSE p2 END) AS nll
        |  FROM p2t),
        |agg AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_trigrams,
        |    round(avg(nll), 6) AS avg_nll
        |  FROM nll GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(agg.n_trigrams, 0)::BIGINT AS n_trigrams,
        |  agg.avg_nll
        |FROM score_docs d LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin,
    "q_burstiness" ->
      """WITH dt AS (
        |  SELECT doc_id, list_filter(string_split_regex(
        |    coalesce(text, ''), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |nn AS (SELECT count(*)::BIGINT AS n FROM documents),
        |dc AS (
        |  SELECT doc_id, w, count(*)::BIGINT AS c
        |  FROM dt CROSS JOIN unnest(toks) u(w) GROUP BY doc_id, w),
        |st AS (
        |  SELECT w, count(*)::BIGINT AS n_docs,
        |    CAST(sum(c) AS BIGINT) AS total,
        |    CAST(sum(c * c) AS BIGINT) AS s2,
        |    count(CASE WHEN c >= 2 THEN 1 END)::BIGINT AS d2
        |  FROM dc GROUP BY w)
        |SELECT w AS term, n_docs, total,
        |  round((nn.n::DOUBLE * s2::DOUBLE - total::DOUBLE * total::DOUBLE)
        |    / (nn.n::DOUBLE * total::DOUBLE), 6) AS vmr,
        |  round(d2::DOUBLE / n_docs::DOUBLE, 6) AS adaptation
        |FROM st CROSS JOIN nn
        |WHERE n_docs >= 5""".stripMargin,
    "q_distinct_ngrams" ->
      """WITH dt AS (
        |  SELECT source, list_filter(string_split_regex(
        |    coalesce(text, ''), '\s+'), t -> t <> '') AS toks
        |  FROM documents WHERE source IS NOT NULL),
        |g AS (
        |  SELECT source, CAST(n AS INTEGER) AS n,
        |    array_to_string(toks[CAST(i AS INTEGER):
        |      CAST(i AS INTEGER) + CAST(n AS INTEGER) - 1], ' ') AS gram
        |  FROM dt CROSS JOIN range(1, 4) t(n)
        |  CROSS JOIN unnest(range(1,
        |    greatest(len(toks) - CAST(n AS INTEGER) + 1, 0) + 1)) r(i))
        |SELECT source, n, count(*)::BIGINT AS total_ngrams,
        |  count(DISTINCT gram)::BIGINT AS distinct_ngrams,
        |  round(count(DISTINCT gram)::DOUBLE / count(*)::DOUBLE, 6)
        |    AS distinct_ratio
        |FROM g GROUP BY source, n""".stripMargin,
    "q_ngram_novelty" ->
      """WITH sd AS (
        |  SELECT doc_id, list_filter(string_split_regex(
        |    coalesce(text, ''), '\s+'), t -> t <> '') AS toks
        |  FROM documents WHERE doc_id % 7 = 0),
        |rd AS (
        |  SELECT list_filter(string_split_regex(
        |    coalesce(text, ''), '\s+'), t -> t <> '') AS toks
        |  FROM documents WHERE doc_id % 7 <> 0),
        |rg AS (
        |  SELECT DISTINCT array_to_string(
        |    toks[CAST(i AS INTEGER):CAST(i AS INTEGER)+2], ' ') AS g
        |  FROM rd CROSS JOIN unnest(range(1,
        |    greatest(len(toks) - 2, 0) + 1)) r(i)),
        |dg AS (
        |  SELECT doc_id, array_to_string(
        |    toks[CAST(i AS INTEGER):CAST(i AS INTEGER)+2], ' ') AS g
        |  FROM sd CROSS JOIN unnest(range(1,
        |    greatest(len(toks) - 2, 0) + 1)) r(i)),
        |sc AS (
        |  SELECT dg.doc_id, count(*)::BIGINT AS n_ngrams,
        |    count(CASE WHEN rg.g IS NULL THEN 1 END)::BIGINT AS novel_ngrams
        |  FROM dg LEFT JOIN rg ON dg.g = rg.g GROUP BY dg.doc_id)
        |SELECT d.doc_id, coalesce(sc.n_ngrams, 0)::BIGINT AS n_ngrams,
        |  coalesce(sc.novel_ngrams, 0)::BIGINT AS novel_ngrams,
        |  round(sc.novel_ngrams::DOUBLE / sc.n_ngrams::DOUBLE, 6) AS novelty
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 7 = 0) d
        |LEFT JOIN sc ON d.doc_id = sc.doc_id""".stripMargin,
    "q_heaps" ->
      """WITH dt AS (
        |  SELECT doc_id, list_filter(string_split_regex(
        |    coalesce(text, ''), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |d0 AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS ntok, toks
        |  FROM dt WHERE len(toks) > 0),
        |mint AS (
        |  SELECT mid AS doc_id, count(*)::BIGINT AS minted FROM (
        |    SELECT w, min(doc_id) AS mid
        |    FROM d0 CROSS JOIN unnest(toks) u(w) GROUP BY w)
        |  GROUP BY mid),
        |cur AS (
        |  SELECT d0.doc_id, ntok, coalesce(minted, 0) AS minted
        |  FROM d0 LEFT JOIN mint ON d0.doc_id = mint.doc_id),
        |cum AS (
        |  SELECT row_number() OVER (ORDER BY doc_id) AS idx,
        |    CAST(sum(ntok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS ct,
        |    CAST(sum(minted) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cv
        |  FROM cur),
        |params AS (SELECT count(*)::BIGINT AS nd,
        |  CAST((count(*) + 255) // 256 AS BIGINT) AS step FROM cur),
        |pts AS (
        |  SELECT CAST(round(ln(ct::DOUBLE) * 1e6) AS BIGINT) AS x,
        |    CAST(round(ln(cv::DOUBLE) * 1e6) AS BIGINT) AS y
        |  FROM cum CROSS JOIN params WHERE idx % step = 0),
        |mo AS (SELECT count(*)::BIGINT AS kk, CAST(sum(x) AS BIGINT) AS sx,
        |  CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
        |  CAST(sum(x * x) AS BIGINT) AS sxx FROM pts),
        |fit AS (
        |  SELECT (SELECT nd FROM params) AS n_docs, kk AS n_points,
        |    (SELECT max(ct) FROM cum) AS n_tokens,
        |    (SELECT max(cv) FROM cum) AS n_types,
        |    CAST(kk::HUGEINT * sxy::HUGEINT - sx::HUGEINT * sy::HUGEINT
        |        AS DOUBLE)
        |      / CAST(kk::HUGEINT * sxx::HUGEINT - sx::HUGEINT * sx::HUGEINT
        |        AS DOUBLE) AS beta,
        |    sx, sy FROM mo)
        |SELECT n_docs, n_points, n_tokens, n_types,
        |  round(beta, 6) AS beta,
        |  round(exp((sy::DOUBLE / 1e6 - beta * (sx::DOUBLE / 1e6))
        |    / n_points::DOUBLE), 6) AS k
        |FROM fit""".stripMargin,
    "q_mattr" ->
      """WITH dt AS (
        |  SELECT doc_id, list_filter(string_split_regex(
        |    coalesce(text, ''), '\s+'), t -> t <> '') AS toks
        |  FROM documents)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(greatest(len(toks) - 49, 0) AS BIGINT) AS n_windows,
        |  round(CASE WHEN len(toks) = 0 THEN NULL
        |    WHEN len(toks) < 50 THEN
        |      len(list_distinct(toks))::DOUBLE / len(toks)::DOUBLE
        |    ELSE CAST(coalesce(list_sum(list_transform(
        |        range(1, len(toks) - 49 + 1),
        |        i -> len(list_distinct(
        |          toks[CAST(i AS INTEGER):CAST(i AS INTEGER)+49])))), 0)
        |        AS DOUBLE)
        |      / (greatest(len(toks) - 49, 0) * 50)::DOUBLE END, 6) AS mattr
        |FROM dt""".stripMargin,
    "q_entropy_rate" ->
      """WITH rt AS (
        |  SELECT list_filter(string_split_regex(
        |    coalesce(text, ''), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |rb AS (
        |  SELECT toks[CAST(i AS INTEGER)] AS w1,
        |    toks[CAST(i AS INTEGER)+1] AS w2
        |  FROM rt CROSS JOIN unnest(range(1,
        |    greatest(len(toks) - 1, 0) + 1)) t(i)),
        |cnt AS (SELECT w1, w2, count(*)::BIGINT AS c12
        |  FROM rb GROUP BY w1, w2),
        |ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
        |  FROM cnt GROUP BY w1),
        |mo AS (SELECT CAST(coalesce(sum(c12), 0) AS BIGINT) AS n,
        |  count(*)::BIGINT AS types,
        |  CAST(coalesce(sum(c12 * CAST(round(
        |    ln(c12::DOUBLE / c1::DOUBLE) * 1e9) AS BIGINT)), 0) AS BIGINT)
        |    AS s
        |  FROM cnt JOIN ctx USING (w1)),
        |nc AS (SELECT count(*)::BIGINT AS nctx FROM ctx)
        |SELECT mo.n AS n_bigrams, mo.types AS n_bigram_types,
        |  nc.nctx AS n_contexts,
        |  round(CASE WHEN mo.n = 0 THEN NULL
        |    ELSE mo.s::DOUBLE / (mo.n::DOUBLE * 1e9)
        |      * CAST(-1.0 AS DOUBLE) END, 6) AS entropy_rate
        |FROM mo CROSS JOIN nc""".stripMargin,
    "q_gopher_rules" ->
      """WITH base AS (
        |  SELECT doc_id, coalesce(text, '') AS text,
        |    list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                t -> t <> '') AS toks,
        |    list_filter(list_transform(
        |        string_split(coalesce(text, ''), chr(10)), l -> trim(l)),
        |      l -> l <> '') AS ls
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id, len(toks) AS n_words,
        |    CASE WHEN len(toks) = 0 THEN 0.0
        |         ELSE CAST(coalesce(
        |             list_sum(list_transform(toks, t -> length(t))), 0)
        |           AS BIGINT) * 1.0 / len(toks) END AS mean_len,
        |    CASE WHEN len(toks) = 0 THEN 0.0
        |         ELSE (len(regexp_extract_all(text, '#'))
        |               + len(regexp_extract_all(text, '\.\.\.')))
        |              * 1.0 / len(toks) END AS sym,
        |    CASE WHEN len(ls) = 0 THEN 0.0
        |         ELSE len(list_filter(ls, l -> regexp_matches(l, '^[-•*]')))
        |              * 1.0 / len(ls) END AS bullet,
        |    CASE WHEN len(ls) = 0 THEN 0.0
        |         ELSE len(list_filter(ls,
        |                l -> regexp_matches(l, '(\.\.\.|…)$')))
        |              * 1.0 / len(ls) END AS ellip,
        |    CASE WHEN len(toks) = 0 THEN 0.0
        |         ELSE len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]')))
        |              * 1.0 / len(toks) END AS alpha,
        |    len(list_filter(['the','be','to','of','and','that','have','with'],
        |      w -> list_contains(list_transform(toks, t -> lower(t)), w)))
        |      AS stop_hits
        |  FROM base)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  round(mean_len, 6) AS mean_word_len,
        |  round(sym, 6) AS symbol_ratio,
        |  round(bullet, 6) AS bullet_line_frac,
        |  round(ellip, 6) AS ellipsis_line_frac,
        |  round(alpha, 6) AS alpha_word_frac,
        |  CAST(stop_hits AS BIGINT) AS stop_hits,
        |  (n_words >= 50 AND n_words <= 100000
        |   AND mean_len >= 3.0 AND mean_len <= 10.0
        |   AND sym <= 0.1 AND bullet < 0.9 AND ellip < 0.3
        |   AND alpha >= 0.8 AND stop_hits >= 2) AS gopher_pass
        |FROM sig""".stripMargin,
    "q_ccnet_buckets" ->
      """WITH ref AS (
        |  SELECT text FROM documents WHERE doc_id % 5 <> 0),
        |score_docs AS (
        |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 5 = 0),
        |rt AS (
        |  SELECT list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                     t -> t <> '') AS toks FROM ref),
        |uni AS (
        |  SELECT w AS w1, count(*)::BIGINT AS cu
        |  FROM rt CROSS JOIN unnest(toks) u(w) GROUP BY w),
        |v AS (SELECT count(*)::BIGINT AS v FROM uni),
        |rb AS (
        |  SELECT toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i AS INTEGER)+1] AS bg
        |  FROM rt CROSS JOIN unnest(range(1, greatest(len(toks) - 1, 0) + 1)) t(i)),
        |bi AS (SELECT bg, count(*)::BIGINT AS cb FROM rb GROUP BY bg),
        |dt AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                t -> t <> '') AS toks FROM score_docs),
        |db AS (
        |  SELECT doc_id, toks[CAST(i AS INTEGER)] AS w1,
        |    toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i AS INTEGER)+1] AS bg
        |  FROM dt CROSS JOIN unnest(range(1, greatest(len(toks) - 1, 0) + 1)) t(i)),
        |nll AS (
        |  SELECT db.doc_id,
        |    -ln((coalesce(bi.cb, 0) + 1.0) / (coalesce(uni.cu, 0) + v.v))
        |      AS nll
        |  FROM db LEFT JOIN bi ON db.bg = bi.bg
        |          LEFT JOIN uni ON db.w1 = uni.w1
        |          CROSS JOIN v),
        |agg AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
        |    round(avg(nll), 6) AS avg_nll
        |  FROM nll GROUP BY doc_id),
        |scored AS (
        |  SELECT d.doc_id, d.lang, agg.avg_nll
        |  FROM score_docs d JOIN agg ON d.doc_id = agg.doc_id
        |  WHERE agg.n_bigrams > 0),
        |bkt AS (
        |  SELECT doc_id, lang, avg_nll,
        |    CAST(ntile(3) OVER (
        |      PARTITION BY lang ORDER BY avg_nll, doc_id) AS INTEGER)
        |      AS bucket
        |  FROM scored)
        |SELECT doc_id, lang, avg_nll, bucket,
        |  (['head','middle','tail'])[bucket] AS bucket_label
        |FROM bkt""".stripMargin,
    "q_token_entropy" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
        |                t -> t <> '') AS toks
        |  FROM documents),
        |t AS (SELECT doc_id, unnest(toks) AS w FROM toks),
        |pt AS (
        |  SELECT doc_id, w, count(*)::BIGINT AS c FROM t GROUP BY doc_id, w),
        |pd AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
        |    count(*)::BIGINT AS n_types,
        |    CAST(sum(CASE WHEN c > 1
        |      THEN CAST(round(c * ln(c) * 1000000.0) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS s
        |  FROM pt GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(pd.n_tok, 0) AS n_tok,
        |  coalesce(pd.n_types, 0) AS n_types,
        |  CASE WHEN coalesce(pd.n_tok, 0) > 0
        |       THEN round(ln(pd.n_tok) - (pd.s / 1000000.0) / pd.n_tok, 6)
        |       ELSE 0.0 END AS entropy,
        |  CASE WHEN coalesce(pd.n_tok, 0) > 0
        |       THEN round(pd.n_types * 1.0 / pd.n_tok, 6)
        |       ELSE 0.0 END AS ttr
        |FROM documents d LEFT JOIN pd USING (doc_id)""".stripMargin,
    "q_c4_clean" ->
      """WITH corpus AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    coalesce(text, '') || '.',
        |    'too short.',
        |    'this page uses javascript heavily today.',
        |    'a perfectly reasonable sentence appears right here!',
        |    'another good sentence with enough words present?',
        |    CASE WHEN doc_id % 7 = 0
        |         THEN 'lorem ipsum dolor sit amet consectetur.' END,
        |    CASE WHEN doc_id % 11 = 0 THEN 'function f() { return 1; }' END,
        |    CASE WHEN doc_id % 13 = 0
        |         THEN 'do not miss this clickbait offer today.' END) AS text
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, coalesce(text, '') AS text,
        |    list_filter(list_transform(
        |        string_split(coalesce(text, ''), chr(10)), l -> trim(l)),
        |      l -> l <> '') AS ls
        |  FROM corpus),
        |k AS (
        |  SELECT doc_id, text,
        |    list_filter(ls, l -> regexp_matches(l, '[.!?"]$')
        |      AND len(list_filter(string_split_regex(l, '\s+'),
        |                          w -> w <> '')) >= 5
        |      AND NOT contains(lower(l), 'javascript')) AS kept
        |  FROM base),
        |c AS (
        |  SELECT doc_id, text, array_to_string(kept, chr(10)) AS clean,
        |    len(kept) AS n_kept FROM k)
        |SELECT doc_id, clean AS text_clean,
        |  CAST(n_kept AS BIGINT) AS n_lines_kept,
        |  CAST(len(regexp_extract_all(clean, '[.!?]+')) AS BIGINT)
        |    AS n_sentences,
        |  (len(regexp_extract_all(clean, '[.!?]+')) >= 3
        |   AND NOT contains(lower(text), 'lorem ipsum')
        |   AND NOT contains(text, '{')
        |   AND NOT contains(lower(text), 'clickbait')) AS c4_keep
        |FROM c""".stripMargin,

    // SQL surface: the registered function must equal the engine-
    // independent hex-prefix arithmetic.
    "q_sql_surface" ->
      ("SELECT doc_id, ('0x' || substring(sha256(text), 1, 7))::BIGINT AS hp " +
        "FROM documents"),

    // Layout report: the written layout is fully determined (8 files,
    // one row group each at this size, blooms+stats on doc_id).
    "q_layout_report" ->
      ("SELECT CAST(8 AS BIGINT) AS n_files, CAST(8 AS BIGINT) AS n_row_groups, " +
        "(SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_rows, " +
        "TRUE AS all_bloomed, TRUE AS all_stats"),
    "q_chunk_text" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                t -> t <> '') AS toks
        |  FROM documents),
        |st AS (SELECT doc_id, toks,
        |    CASE WHEN len(toks) = 0 THEN 0
        |      ELSE CAST(ceil(greatest(len(toks) - 32, 0) / 24.0) AS INT) + 1
        |      END AS ns
        |  FROM toks),
        |ex AS (SELECT doc_id, toks, unnest(range(0, ns)) AS s FROM st)
        |SELECT doc_id, CAST(s AS BIGINT) AS chunk_idx,
        |  CAST(s * 24 AS BIGINT) AS chunk_start,
        |  CAST(least(32, len(toks) - s * 24) AS BIGINT) AS n_tokens,
        |  array_to_string(toks[s * 24 + 1 : s * 24 + 32], ' ') AS chunk_text
        |FROM ex""".stripMargin,

    // Code fences: the planted block (and nothing else) extracts with
    // its tag and trailing newline.
    "q_code_blocks" ->
      ("SELECT doc_id, CAST(0 AS BIGINT) AS block_idx, 'python' AS lang, " +
        "'print(' || doc_id || ')' || chr(10) AS code " +
        "FROM documents WHERE doc_id % 5 = 0"),

    // Mojibake: the repair must recover the exact clean literal on the
    // planted docs and leave the ASCII corpus untouched.
    "q_fix_mojibake" ->
      ("SELECT doc_id, text || CASE WHEN doc_id % 7 = 0 " +
        "THEN ' Café — déjà “vu” …' ELSE '' END AS text FROM documents"),

    // Flesch: the syllable heuristic is regexp-specified, so both
    // engines compute identical counts; the formula is plain doubles.
    "q_flesch" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                t -> t <> '') AS toks,
        |    greatest(1, len(regexp_extract_all(coalesce(text, ''), '[.!?]+')))
        |      AS sents
        |  FROM documents),
        |syl AS (
        |  SELECT doc_id, toks, sents,
        |    list_sum(list_transform(toks, w ->
        |      greatest(1, len(regexp_extract_all(lower(w), '[aeiouy]+')) -
        |        CASE WHEN regexp_matches(lower(w), '[^aeiouy]e$')
        |              AND NOT regexp_matches(lower(w), 'le$')
        |              AND len(regexp_extract_all(lower(w), '[aeiouy]+')) > 1
        |          THEN 1 ELSE 0 END))) AS syls
        |  FROM toks)
        |SELECT doc_id, CASE WHEN len(toks) = 0 THEN NULL ELSE
        |  206.835 - 1.015 * (len(toks)::DOUBLE / sents)
        |          - 84.6 * (syls::DOUBLE / len(toks)) END AS flesch
        |FROM syl""".stripMargin,
    // Trained langid: the four one-vs-rest GD chains + integer argmax
    // generated by EntryHelpers.langIdOracle (classifierEpochChain
    // recipe per language over shared char-3-gram features).
    "q_langid_model" -> langIdOracle,

    "q_lang_segments" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |    regexp_replace(coalesce(text, ''),
        |      '(\S+ \S+ \S+ \S+ \S+)', '\1.', 'g')
        |    || CASE WHEN doc_id % 4 = 0
        |       THEN ' Der hund ist nicht mit der katze und das haus.'
        |       ELSE '' END AS text
        |  FROM documents),
        |sent AS (
        |  SELECT doc_id, s AS sentence
        |  FROM corpus, unnest(list_filter(list_transform(
        |    regexp_extract_all(text, '[^.!?]+[.!?]+|[^.!?]+$'),
        |    x -> trim(x)), x -> x <> '')) AS t(s)),
        |scored AS (
        |  SELECT doc_id,
        |    CASE WHEN s_en > 0 AND s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
        |         WHEN s_de > 0 AND s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
        |         WHEN s_fr > 0 AND s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
        |         WHEN s_es > 0 AND s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
        |         ELSE 'und' END AS lang
        |  FROM (
        |    SELECT doc_id,
        |      len(list_filter(toks,
        |        t -> list_contains(['the','and','of','to','in','is','that','for'], t))) AS s_en,
        |      len(list_filter(toks,
        |        t -> list_contains(['der','die','das','und','ist','nicht','ein','mit'], t))) AS s_de,
        |      len(list_filter(toks,
        |        t -> list_contains(['le','la','les','et','est','pas','une','dans'], t))) AS s_fr,
        |      len(list_filter(toks,
        |        t -> list_contains(['el','la','los','y','es','no','una','por'], t))) AS s_es
        |    FROM (
        |      SELECT doc_id, list_transform(list_filter(
        |        string_split_regex(sentence, '\s+'), t -> t <> ''),
        |        t -> lower(t)) AS toks
        |      FROM sent))),
        |counts AS (
        |  SELECT doc_id, lang, count(*) AS c FROM scored GROUP BY 1, 2),
        |tot AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_sentences,
        |    CAST(count(CASE WHEN lang <> 'und' THEN 1 END) AS BIGINT) AS n_langs
        |  FROM counts GROUP BY doc_id),
        |maj AS (
        |  SELECT doc_id, lang AS majority_lang, c FROM (
        |    SELECT doc_id, lang, c, row_number() OVER (
        |      PARTITION BY doc_id ORDER BY c DESC, lang ASC) AS rn
        |    FROM counts) WHERE rn = 1)
        |SELECT t.doc_id, t.n_sentences, t.n_langs, m.majority_lang,
        |  m.c * 1.0 / t.n_sentences AS majority_frac,
        |  t.n_langs >= 2 AS mixed
        |FROM tot t JOIN maj m ON t.doc_id = m.doc_id""".stripMargin,
    // Zipf fit: identical nano-quantized log sums, identical final
    // double expression trees
    "q_zipf" ->
      """WITH tok AS (
        |  SELECT unnest(list_transform(list_filter(
        |    string_split_regex(coalesce(text, ''), '\s+'), t -> t <> ''),
        |    t -> lower(t))) AS t
        |  FROM documents),
        |cnt AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY t),
        |r AS (SELECT c, CAST(row_number() OVER (ORDER BY c DESC, t ASC)
        |    AS BIGINT) AS rnk
        |  FROM cnt),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(ln(CAST(rnk AS DOUBLE)) * 1e9) AS BIGINT))
        |      AS BIGINT) AS sx,
        |    CAST(sum(CAST(round(ln(CAST(c AS DOUBLE)) * 1e9) AS BIGINT))
        |      AS BIGINT) AS sy,
        |    CAST(sum(CAST(round(ln(CAST(rnk AS DOUBLE))
        |      * ln(CAST(c AS DOUBLE)) * 1e9) AS BIGINT)) AS BIGINT) AS sxy,
        |    CAST(sum(CAST(round(ln(CAST(rnk AS DOUBLE))
        |      * ln(CAST(rnk AS DOUBLE)) * 1e9) AS BIGINT)) AS BIGINT) AS sxx
        |  FROM r),
        |f AS (SELECT n, CAST(n AS DOUBLE) AS nd, sx / 1e9 AS sxd,
        |    sy / 1e9 AS syd, sxy / 1e9 AS sxyd, sxx / 1e9 AS sxxd
        |  FROM s)
        |SELECT n AS n_terms,
        |  round(CASE WHEN n < 2 OR nd * sxxd - sxd * sxd = 0 THEN NULL
        |    ELSE (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) END, 6)
        |    AS slope,
        |  round(CASE WHEN n < 2 OR nd * sxxd - sxd * sxd = 0 THEN NULL
        |    ELSE (syd - ((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd))
        |      * sxd) / nd END, 6) AS intercept
        |FROM f""".stripMargin,
    "q_license_scan" ->
      """WITH salted AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0
        |        THEN text || ' SPDX-License-Identifier: MIT'
        |      WHEN doc_id % 7 = 1
        |        THEN text || ' Licensed under the Apache License, Version 2.0 terms.'
        |      WHEN doc_id % 7 = 2
        |        THEN text || ' Released under the GNU General Public License.'
        |      ELSE text END AS t2
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, coalesce(t2, '') AS t, lower(coalesce(t2, '')) AS lt
        |  FROM salted),
        |x AS (
        |  SELECT doc_id, lt,
        |    regexp_extract(t, 'SPDX-License-Identifier:[ \t]*([A-Za-z0-9.+-]+)', 1)
        |      AS spdx
        |  FROM d),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN spdx <> '' THEN spdx END AS spdx_id,
        |    coalesce(
        |      CASE WHEN spdx <> '' THEN lower(spdx) END,
        |      CASE WHEN contains(lt, 'apache license')
        |        AND contains(lt, 'version 2.0') THEN 'apache-2.0' END,
        |      CASE WHEN contains(lt,
        |        'permission is hereby granted, free of charge') THEN 'mit' END,
        |      CASE WHEN contains(lt, 'gnu affero general public license')
        |        THEN 'agpl-3.0' END,
        |      CASE WHEN contains(lt, 'gnu lesser general public license')
        |        THEN 'lgpl-3.0' END,
        |      CASE WHEN contains(lt, 'gnu general public license')
        |        THEN 'gpl-3.0' END,
        |      CASE WHEN contains(lt, 'mozilla public license')
        |        THEN 'mpl-2.0' END,
        |      CASE WHEN contains(lt,
        |        'redistribution and use in source and binary forms')
        |        THEN 'bsd-3-clause' END,
        |      CASE WHEN contains(lt, 'creative commons') THEN 'cc' END)
        |      AS license_guess
        |  FROM x)
        |SELECT doc_id, spdx_id, license_guess,
        |  CASE WHEN license_guess IS NULL THEN NULL
        |    ELSE (license_guess LIKE 'mit%' OR license_guess LIKE 'bsd%'
        |      OR license_guess LIKE 'apache%' OR license_guess LIKE 'mpl%'
        |      OR license_guess LIKE 'isc%' OR license_guess LIKE 'unlicense%'
        |      OR license_guess LIKE 'cc0%') END AS is_permissive
        |FROM g""".stripMargin,
    "q_skipgrams" ->
      """WITH s AS (
        |  SELECT doc_id, generate_subscripts(toks, 1) AS pos,
        |    unnest(toks) AS tok
        |  FROM (SELECT doc_id, list_transform(list_filter(
        |      string_split_regex(coalesce(text, ''), '\s+'), t -> t <> ''),
        |      t -> lower(t)) AS toks
        |    FROM documents)),
        |fwd AS (
        |  SELECT a.tok AS center, b.tok AS context
        |  FROM s a JOIN s b ON a.doc_id = b.doc_id
        |    AND b.pos > a.pos AND b.pos <= a.pos + 2),
        |bothdir AS (
        |  SELECT center, context FROM fwd
        |  UNION ALL SELECT context, center FROM fwd)
        |SELECT center, context, CAST(count(*) AS BIGINT) AS n
        |FROM bothdir GROUP BY center, context""".stripMargin,
    // TextRank: the skip-gram graph above, then the weighted unrolled
    // nano-unit PageRank (the q_pagerank_weighted contract) and a
    // totally-ordered top-20
    "q_textrank" ->
      """WITH s AS (
        |  SELECT doc_id, generate_subscripts(toks, 1) AS pos,
        |    unnest(toks) AS tok
        |  FROM (SELECT doc_id, list_transform(list_filter(
        |      string_split_regex(coalesce(text, ''), '\s+'), t -> t <> ''),
        |      t -> lower(t)) AS toks
        |    FROM documents)),
        |fwd AS (
        |  SELECT a.tok AS center, b.tok AS context
        |  FROM s a JOIN s b ON a.doc_id = b.doc_id
        |    AND b.pos > a.pos AND b.pos <= a.pos + 2),
        |bothdir AS (
        |  SELECT center, context FROM fwd
        |  UNION ALL SELECT context, center FROM fwd),
        |pairs AS (
        |  SELECT center AS src, context AS dst,
        |    CAST(count(*) AS BIGINT)::DOUBLE AS w
        |  FROM bothdir GROUP BY center, context),
        |e AS (
        |  SELECT src, dst, w, sum(w) OVER (PARTITION BY src) AS ws
        |  FROM pairs),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |p0 AS (SELECT node, 1.0::DOUBLE / (SELECT n FROM nn) AS pr FROM nodes),
        |i1 AS (
        |  SELECT nd.node,
        |    (1::DOUBLE - 0.85::DOUBLE) / (SELECT n FROM nn)
        |      + 0.85::DOUBLE * (coalesce(s.v, 0) / 1e9) AS pr
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst AS node,
        |      CAST(sum(CAST(round(p.pr * e.w / e.ws * 1e9) AS BIGINT)) AS BIGINT) AS v
        |    FROM e JOIN p0 p ON p.node = e.src
        |    GROUP BY e.dst) s ON s.node = nd.node),
        |i2 AS (
        |  SELECT nd.node,
        |    (1::DOUBLE - 0.85::DOUBLE) / (SELECT n FROM nn)
        |      + 0.85::DOUBLE * (coalesce(s.v, 0) / 1e9) AS pr
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst AS node,
        |      CAST(sum(CAST(round(p.pr * e.w / e.ws * 1e9) AS BIGINT)) AS BIGINT) AS v
        |    FROM e JOIN i1 p ON p.node = e.src
        |    GROUP BY e.dst) s ON s.node = nd.node),
        |i3 AS (
        |  SELECT nd.node,
        |    (1::DOUBLE - 0.85::DOUBLE) / (SELECT n FROM nn)
        |      + 0.85::DOUBLE * (coalesce(s.v, 0) / 1e9) AS pr
        |  FROM nodes nd LEFT JOIN (
        |    SELECT e.dst AS node,
        |      CAST(sum(CAST(round(p.pr * e.w / e.ws * 1e9) AS BIGINT)) AS BIGINT) AS v
        |    FROM e JOIN i2 p ON p.node = e.src
        |    GROUP BY e.dst) s ON s.node = nd.node)
        |SELECT node AS word, pr FROM i3
        |ORDER BY pr DESC, node LIMIT 20""".stripMargin,
    "q_vocab_coverage" ->
      """WITH t AS (
        |  SELECT lower(tok) AS term
        |  FROM (
        |    SELECT unnest(list_filter(
        |      string_split_regex(coalesce(text, ''), '\s+'),
        |      x -> x <> '')) AS tok
        |    FROM documents)),
        |c AS (SELECT term, count(*) AS cnt FROM t
        |  GROUP BY term HAVING count(*) >= 2),
        |vocab AS (SELECT term FROM c ORDER BY cnt DESC, term LIMIT 20),
        |dt AS (
        |  SELECT doc_id, lower(tok) AS term
        |  FROM (
        |    SELECT doc_id, unnest(list_filter(
        |      string_split_regex(coalesce(text, ''), '\s+'),
        |      x -> x <> '')) AS tok
        |    FROM documents)),
        |agg AS (
        |  SELECT d.doc_id,
        |    CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(count(CASE WHEN v.term IS NULL THEN 1 END) AS BIGINT)
        |      AS n_oov
        |  FROM dt d LEFT JOIN vocab v ON d.term = v.term
        |  GROUP BY d.doc_id)
        |SELECT doc_id,
        |  coalesce(a.n_tokens, 0) AS n_tokens,
        |  coalesce(a.n_oov, 0) AS n_oov,
        |  CASE WHEN coalesce(a.n_tokens, 0) = 0 THEN 0.0
        |    ELSE round(a.n_oov / a.n_tokens::DOUBLE, 6) END AS oov_frac
        |FROM documents LEFT JOIN agg a USING (doc_id)""".stripMargin,
    // vocabulary richness: exact type/hapax/doubleton counts, the
    // bias-corrected Chao1 and Good-Turing coverage as one division each
    "q_vocab_richness" ->
      """WITH tok AS (
        |  SELECT source, w, count(*)::BIGINT AS c
        |  FROM (SELECT source, unnest(list_filter(string_split_regex(
        |    coalesce(text, ''), '\s+'), t -> t <> '')) AS w
        |    FROM documents WHERE source IS NOT NULL) u
        |  GROUP BY source, w)
        |SELECT source,
        |  CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS vocab,
        |  CAST(count(CASE WHEN c = 1 THEN 1 END) AS BIGINT) AS f1,
        |  CAST(count(CASE WHEN c = 2 THEN 1 END) AS BIGINT) AS f2,
        |  round(count(*) + CAST(count(CASE WHEN c = 1 THEN 1 END) *
        |      (count(CASE WHEN c = 1 THEN 1 END) - 1) AS DOUBLE)
        |    / (2 * (count(CASE WHEN c = 2 THEN 1 END) + 1)), 6) AS chao1,
        |  round(1.0 - CAST(count(CASE WHEN c = 1 THEN 1 END) AS DOUBLE)
        |    / CAST(sum(c) AS BIGINT), 6) AS coverage
        |FROM tok GROUP BY source""".stripMargin,
    // Porter stemmer (Porter 1980) ported rule-for-rule to DuckDB SQL:
    // the C/V pattern string is built once per intermediate word with a
    // list_reduce lambda (prefix-stable: a position's class depends only
    // on earlier chars, so stem conditions read pattern PREFIXES), measure
    // m = count of 'VC' in the pattern, and each step is a longest-match
    // CASE ordered by suffix length — verified equal to the Scala
    // PorterStemmer on 22,818 adversarial fuzz words (y-chains, double
    // consonants, every suffix x stem product) plus the corpus itself.
    "q_stem_tokens" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |toks AS (
        |  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
        |         lower(arr[CAST(i AS INTEGER)]) AS w
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                      t -> t <> '') AS arr FROM docs)
        |  CROSS JOIN unnest(range(1, len(arr) + 1)) t(i)),
        |s0 AS (
        |  SELECT doc_id, pos, w,
        |         (len(w) >= 3 AND regexp_matches(w, '^[a-z]+$')) AS ok
        |  FROM toks),
        |s1a AS (
        |  SELECT doc_id, pos, w, ok,
        |    CASE WHEN ends_with(w, 'sses') THEN left(w, len(w) - 2)
        |         WHEN ends_with(w, 'ies')  THEN left(w, len(w) - 2)
        |         WHEN ends_with(w, 'ss')   THEN w
        |         WHEN ends_with(w, 's')    THEN left(w, len(w) - 1)
        |         ELSE w END AS wa
        |  FROM s0),
        |s1b0 AS (
        |  SELECT doc_id, pos, w, ok, wa, substr(list_reduce(['#'] + string_split_regex(wa, ''), (acc, c) -> acc || CASE WHEN c IN ('a','e','i','o','u') THEN 'V' WHEN c = 'y' THEN (CASE WHEN acc = '#' OR right(acc, 1) = 'V' THEN 'C' ELSE 'V' END) ELSE 'C' END), 2) AS pa FROM s1a),
        |s1b1 AS (
        |  SELECT doc_id, pos, w, ok,
        |    CASE WHEN ends_with(wa, 'eed') THEN
        |           (CASE WHEN len(regexp_extract_all(left(pa, len(wa) - 3), 'VC')) > 0
        |                 THEN left(wa, len(wa) - 1) ELSE wa END)
        |         WHEN ends_with(wa, 'ed') AND contains(left(pa, len(wa) - 2), 'V')
        |           THEN left(wa, len(wa) - 2)
        |         WHEN ends_with(wa, 'ing') AND contains(left(pa, len(wa) - 3), 'V')
        |           THEN left(wa, len(wa) - 3)
        |         ELSE wa END AS wb0,
        |    (NOT ends_with(wa, 'eed') AND
        |     ((ends_with(wa, 'ed') AND contains(left(pa, len(wa) - 2), 'V')) OR
        |      (ends_with(wa, 'ing') AND contains(left(pa, len(wa) - 3), 'V')))) AS did,
        |    pa
        |  FROM s1b0),
        |s1b AS (
        |  SELECT doc_id, pos, w, ok,
        |    CASE WHEN NOT did THEN wb0
        |         WHEN ends_with(wb0, 'at') OR ends_with(wb0, 'bl') OR
        |              ends_with(wb0, 'iz') THEN wb0 || 'e'
        |         WHEN len(wb0) >= 2 AND right(left(pa, len(wb0)), 1) = 'C' AND
        |              substr(wb0, len(wb0), 1) = substr(wb0, len(wb0) - 1, 1) AND
        |              right(wb0, 1) NOT IN ('l', 's', 'z')
        |           THEN left(wb0, len(wb0) - 1)
        |         WHEN len(regexp_extract_all(left(pa, len(wb0)), 'VC')) = 1 AND len(wb0) >= 3 AND
        |              right(left(pa, len(wb0)), 3) = 'CVC' AND
        |              right(wb0, 1) NOT IN ('w', 'x', 'y')
        |           THEN wb0 || 'e'
        |         ELSE wb0 END AS wb
        |  FROM s1b1),
        |s1c0 AS (SELECT doc_id, pos, w, ok, wb, substr(list_reduce(['#'] + string_split_regex(wb, ''), (acc, c) -> acc || CASE WHEN c IN ('a','e','i','o','u') THEN 'V' WHEN c = 'y' THEN (CASE WHEN acc = '#' OR right(acc, 1) = 'V' THEN 'C' ELSE 'V' END) ELSE 'C' END), 2) AS pc FROM s1b),
        |s1c AS (
        |  SELECT doc_id, pos, w, ok,
        |    CASE WHEN ends_with(wb, 'y') AND contains(left(pc, len(wb) - 1), 'V')
        |         THEN left(wb, len(wb) - 1) || 'i' ELSE wb END AS wc
        |  FROM s1c0),
        |s2p AS (SELECT doc_id, pos, w, ok, wc, substr(list_reduce(['#'] + string_split_regex(wc, ''), (acc, c) -> acc || CASE WHEN c IN ('a','e','i','o','u') THEN 'V' WHEN c = 'y' THEN (CASE WHEN acc = '#' OR right(acc, 1) = 'V' THEN 'C' ELSE 'V' END) ELSE 'C' END), 2) AS p2 FROM s1c),
        |s2 AS (SELECT doc_id, pos, w, ok, CASE WHEN ends_with(wc, 'ational') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 7), 'VC')) > 0 THEN left(wc, len(wc) - 7) || 'ate' ELSE wc END) WHEN ends_with(wc, 'ization') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 7), 'VC')) > 0 THEN left(wc, len(wc) - 7) || 'ize' ELSE wc END) WHEN ends_with(wc, 'iveness') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 7), 'VC')) > 0 THEN left(wc, len(wc) - 7) || 'ive' ELSE wc END) WHEN ends_with(wc, 'fulness') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 7), 'VC')) > 0 THEN left(wc, len(wc) - 7) || 'ful' ELSE wc END) WHEN ends_with(wc, 'ousness') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 7), 'VC')) > 0 THEN left(wc, len(wc) - 7) || 'ous' ELSE wc END) WHEN ends_with(wc, 'tional') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 6), 'VC')) > 0 THEN left(wc, len(wc) - 6) || 'tion' ELSE wc END) WHEN ends_with(wc, 'biliti') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 6), 'VC')) > 0 THEN left(wc, len(wc) - 6) || 'ble' ELSE wc END) WHEN ends_with(wc, 'entli') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 5), 'VC')) > 0 THEN left(wc, len(wc) - 5) || 'ent' ELSE wc END) WHEN ends_with(wc, 'ousli') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 5), 'VC')) > 0 THEN left(wc, len(wc) - 5) || 'ous' ELSE wc END) WHEN ends_with(wc, 'ation') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 5), 'VC')) > 0 THEN left(wc, len(wc) - 5) || 'ate' ELSE wc END) WHEN ends_with(wc, 'alism') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 5), 'VC')) > 0 THEN left(wc, len(wc) - 5) || 'al' ELSE wc END) WHEN ends_with(wc, 'aliti') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 5), 'VC')) > 0 THEN left(wc, len(wc) - 5) || 'al' ELSE wc END) WHEN ends_with(wc, 'iviti') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 5), 'VC')) > 0 THEN left(wc, len(wc) - 5) || 'ive' ELSE wc END) WHEN ends_with(wc, 'enci') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 4), 'VC')) > 0 THEN left(wc, len(wc) - 4) || 'ence' ELSE wc END) WHEN ends_with(wc, 'anci') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 4), 'VC')) > 0 THEN left(wc, len(wc) - 4) || 'ance' ELSE wc END) WHEN ends_with(wc, 'izer') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 4), 'VC')) > 0 THEN left(wc, len(wc) - 4) || 'ize' ELSE wc END) WHEN ends_with(wc, 'abli') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 4), 'VC')) > 0 THEN left(wc, len(wc) - 4) || 'able' ELSE wc END) WHEN ends_with(wc, 'alli') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 4), 'VC')) > 0 THEN left(wc, len(wc) - 4) || 'al' ELSE wc END) WHEN ends_with(wc, 'ator') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 4), 'VC')) > 0 THEN left(wc, len(wc) - 4) || 'ate' ELSE wc END) WHEN ends_with(wc, 'eli') THEN (CASE WHEN len(regexp_extract_all(left(p2, len(wc) - 3), 'VC')) > 0 THEN left(wc, len(wc) - 3) || 'e' ELSE wc END) ELSE wc END AS w2 FROM s2p),
        |s3p AS (SELECT doc_id, pos, w, ok, w2, substr(list_reduce(['#'] + string_split_regex(w2, ''), (acc, c) -> acc || CASE WHEN c IN ('a','e','i','o','u') THEN 'V' WHEN c = 'y' THEN (CASE WHEN acc = '#' OR right(acc, 1) = 'V' THEN 'C' ELSE 'V' END) ELSE 'C' END), 2) AS p3 FROM s2),
        |s3 AS (SELECT doc_id, pos, w, ok, CASE WHEN ends_with(w2, 'icate') THEN (CASE WHEN len(regexp_extract_all(left(p3, len(w2) - 5), 'VC')) > 0 THEN left(w2, len(w2) - 5) || 'ic' ELSE w2 END) WHEN ends_with(w2, 'ative') THEN (CASE WHEN len(regexp_extract_all(left(p3, len(w2) - 5), 'VC')) > 0 THEN left(w2, len(w2) - 5) || '' ELSE w2 END) WHEN ends_with(w2, 'alize') THEN (CASE WHEN len(regexp_extract_all(left(p3, len(w2) - 5), 'VC')) > 0 THEN left(w2, len(w2) - 5) || 'al' ELSE w2 END) WHEN ends_with(w2, 'iciti') THEN (CASE WHEN len(regexp_extract_all(left(p3, len(w2) - 5), 'VC')) > 0 THEN left(w2, len(w2) - 5) || 'ic' ELSE w2 END) WHEN ends_with(w2, 'ical') THEN (CASE WHEN len(regexp_extract_all(left(p3, len(w2) - 4), 'VC')) > 0 THEN left(w2, len(w2) - 4) || 'ic' ELSE w2 END) WHEN ends_with(w2, 'ness') THEN (CASE WHEN len(regexp_extract_all(left(p3, len(w2) - 4), 'VC')) > 0 THEN left(w2, len(w2) - 4) || '' ELSE w2 END) WHEN ends_with(w2, 'ful') THEN (CASE WHEN len(regexp_extract_all(left(p3, len(w2) - 3), 'VC')) > 0 THEN left(w2, len(w2) - 3) || '' ELSE w2 END) ELSE w2 END AS w3 FROM s3p),
        |s4p AS (SELECT doc_id, pos, w, ok, w3, substr(list_reduce(['#'] + string_split_regex(w3, ''), (acc, c) -> acc || CASE WHEN c IN ('a','e','i','o','u') THEN 'V' WHEN c = 'y' THEN (CASE WHEN acc = '#' OR right(acc, 1) = 'V' THEN 'C' ELSE 'V' END) ELSE 'C' END), 2) AS p4 FROM s3),
        |s4 AS (SELECT doc_id, pos, w, ok, CASE WHEN ends_with(w3, 'ement') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 5), 'VC')) > 1 THEN left(w3, len(w3) - 5) ELSE w3 END) WHEN ends_with(w3, 'ance') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 4), 'VC')) > 1 THEN left(w3, len(w3) - 4) ELSE w3 END) WHEN ends_with(w3, 'ence') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 4), 'VC')) > 1 THEN left(w3, len(w3) - 4) ELSE w3 END) WHEN ends_with(w3, 'able') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 4), 'VC')) > 1 THEN left(w3, len(w3) - 4) ELSE w3 END) WHEN ends_with(w3, 'ible') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 4), 'VC')) > 1 THEN left(w3, len(w3) - 4) ELSE w3 END) WHEN ends_with(w3, 'ment') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 4), 'VC')) > 1 THEN left(w3, len(w3) - 4) ELSE w3 END) WHEN ends_with(w3, 'ant') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 3), 'VC')) > 1 THEN left(w3, len(w3) - 3) ELSE w3 END) WHEN ends_with(w3, 'ent') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 3), 'VC')) > 1 THEN left(w3, len(w3) - 3) ELSE w3 END) WHEN ends_with(w3, 'ion') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 3), 'VC')) > 1 AND (ends_with(left(w3, len(w3) - 3), 's') OR ends_with(left(w3, len(w3) - 3), 't')) THEN left(w3, len(w3) - 3) ELSE w3 END) WHEN ends_with(w3, 'ism') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 3), 'VC')) > 1 THEN left(w3, len(w3) - 3) ELSE w3 END) WHEN ends_with(w3, 'ate') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 3), 'VC')) > 1 THEN left(w3, len(w3) - 3) ELSE w3 END) WHEN ends_with(w3, 'iti') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 3), 'VC')) > 1 THEN left(w3, len(w3) - 3) ELSE w3 END) WHEN ends_with(w3, 'ous') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 3), 'VC')) > 1 THEN left(w3, len(w3) - 3) ELSE w3 END) WHEN ends_with(w3, 'ive') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 3), 'VC')) > 1 THEN left(w3, len(w3) - 3) ELSE w3 END) WHEN ends_with(w3, 'ize') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 3), 'VC')) > 1 THEN left(w3, len(w3) - 3) ELSE w3 END) WHEN ends_with(w3, 'al') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 2), 'VC')) > 1 THEN left(w3, len(w3) - 2) ELSE w3 END) WHEN ends_with(w3, 'er') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 2), 'VC')) > 1 THEN left(w3, len(w3) - 2) ELSE w3 END) WHEN ends_with(w3, 'ic') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 2), 'VC')) > 1 THEN left(w3, len(w3) - 2) ELSE w3 END) WHEN ends_with(w3, 'ou') THEN (CASE WHEN len(regexp_extract_all(left(p4, len(w3) - 2), 'VC')) > 1 THEN left(w3, len(w3) - 2) ELSE w3 END) ELSE w3 END AS w4 FROM s4p),
        |s5p AS (SELECT doc_id, pos, w, ok, w4, substr(list_reduce(['#'] + string_split_regex(w4, ''), (acc, c) -> acc || CASE WHEN c IN ('a','e','i','o','u') THEN 'V' WHEN c = 'y' THEN (CASE WHEN acc = '#' OR right(acc, 1) = 'V' THEN 'C' ELSE 'V' END) ELSE 'C' END), 2) AS p5 FROM s4),
        |s5a AS (
        |  SELECT doc_id, pos, w, ok, w4, p5,
        |    CASE WHEN ends_with(w4, 'e') AND
        |              (len(regexp_extract_all(left(p5, len(w4) - 1), 'VC')) > 1 OR
        |               (len(regexp_extract_all(left(p5, len(w4) - 1), 'VC')) = 1 AND NOT
        |                (len(w4) - 1 >= 3 AND
        |                 right(left(p5, len(w4) - 1), 3) = 'CVC' AND
        |                 substr(w4, len(w4) - 1, 1) NOT IN ('w', 'x', 'y'))))
        |         THEN left(w4, len(w4) - 1) ELSE w4 END AS w5
        |  FROM s5p),
        |s5b AS (
        |  SELECT doc_id, pos, w, ok,
        |    CASE WHEN len(regexp_extract_all(left(p5, len(w5)), 'VC')) > 1 AND len(w5) >= 2 AND
        |              right(left(p5, len(w5)), 1) = 'C' AND
        |              substr(w5, len(w5), 1) = substr(w5, len(w5) - 1, 1) AND
        |              ends_with(w5, 'l')
        |         THEN left(w5, len(w5) - 1) ELSE w5 END AS w6
        |  FROM s5a)
        |SELECT doc_id, pos, CASE WHEN ok THEN w6 ELSE w END AS stem
        |FROM s5b""".stripMargin,
    "q_doc_hygiene" ->
      """WITH t AS (
        |  SELECT doc_id, coalesce(text, '') AS text,
        |    list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                x -> x <> '') AS toks,
        |    list_filter(list_transform(
        |        string_split(coalesce(text, ''), chr(10)), l -> trim(l)),
        |      l -> l <> '') AS ls
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, text, toks, ls,
        |    CASE WHEN len(toks) = 0 THEN []
        |         ELSE list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
        |                i -> array_to_string(toks[i:i+1], ' ')) END AS bg
        |  FROM t)
        |SELECT doc_id,
        |  round(CASE WHEN len(ls) = 0 THEN 0.0
        |    ELSE 1.0 - len(list_distinct(ls)) * 1.0 / len(ls) END, 6)
        |    AS dup_line_frac,
        |  round(CASE WHEN len(toks) = 0 THEN 0.0
        |    ELSE 1.0 - len(list_distinct(toks)) * 1.0 / len(toks) END, 6)
        |    AS dup_token_frac,
        |  round(CASE WHEN len(bg) = 0 THEN 0.0
        |    ELSE 1.0 - len(list_distinct(bg)) * 1.0 / len(bg) END, 6)
        |    AS dup_bigram_frac,
        |  len(regexp_extract_all(text, 'https?://[^ \t\n]+')) AS n_urls,
        |  len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails
        |FROM b""".stripMargin,
    "q_corpus_report" ->
      """WITH base AS (
        |  SELECT source, lang, coalesce(text, '') AS text,
        |    list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                t -> t <> '') AS toks
        |  FROM documents),
        |q AS (
        |  SELECT source, lang, len(toks) AS n_tok,
        |    round(
        |      0.25 * least(1.0, len(toks) / 50.0)
        |      + 0.25 * (1.0 - least(1.0,
        |          (CASE WHEN length(text) = 0 THEN 0.0
        |           ELSE length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g'))
        |                * 1.0 / length(text) END) * 4.0))
        |      + 0.25 * (1.0 - least(1.0,
        |          (CASE WHEN length(text) = 0 THEN 0.0
        |           ELSE length(regexp_replace(text, '[^A-Z]', '', 'g'))
        |                * 1.0 / length(text) END) * 4.0))
        |      + 0.25 * (CASE WHEN len(toks) > 0
        |          AND length(regexp_replace(text, '\s+', '', 'g')) * 1.0 / len(toks)
        |              BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.0 END),
        |    6) AS q,
        |    len(regexp_extract_all(text, 'https?://[^ \t\n]+')) AS urls,
        |    len(regexp_extract_all(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS emails
        |  FROM base)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  round(CAST(sum(CAST(round(q * 1000000) AS BIGINT)) AS BIGINT)
        |        / (count(*) * 1000000.0), 6) AS avg_quality,
        |  count(DISTINCT lang) AS n_langs,
        |  CAST(sum(urls) AS BIGINT) AS n_urls,
        |  CAST(sum(emails) AS BIGINT) AS n_emails
        |FROM q GROUP BY source""".stripMargin,
    "q_dedup_lines" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |    coalesce(text, '') || chr(10) || coalesce(text, '')
        |    || chr(10) || 'tail ' || CAST(doc_id AS VARCHAR) AS text
        |  FROM documents),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS parts FROM corpus),
        |ln AS (
        |  SELECT doc_id, generate_subscripts(parts, 1) AS pos,
        |    unnest(parts) AS line
        |  FROM ls),
        |firsts AS (
        |  SELECT doc_id, line, min(pos) AS pos FROM ln GROUP BY doc_id, line)
        |SELECT doc_id,
        |  array_to_string(list(line ORDER BY pos), chr(10)) AS clean
        |FROM firsts GROUP BY doc_id""".stripMargin,

    // C4 span dedup: sentencify (period per 5 tokens, '\1' replacement is
    // DuckDB's '$1'), plant the shared span, rank spans by (doc, pos),
    // remove rank>=2 occurrences' sentences, reassemble.
    "q_c4_span_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |    regexp_replace(coalesce(text, ''),
        |      '(\S+ \S+ \S+ \S+ \S+)', '\1.', 'g')
        |    || CASE WHEN doc_id % 6 = 0
        |       THEN ' Alpha beta gamma. Delta epsilon zeta. Eta theta iota.'
        |       ELSE '' END AS text
        |  FROM documents),
        |sent AS (
        |  SELECT doc_id,
        |    list_filter(list_transform(
        |      regexp_extract_all(text, '[^.!?]+[.!?]+|[^.!?]+$'),
        |      s -> trim(s)), s -> s <> '') AS sents
        |  FROM corpus),
        |sr AS (
        |  SELECT doc_id, i AS pos, sents[i] AS s
        |  FROM sent, UNNEST(range(1, len(sents) + 1)) u(i)),
        |sp AS (
        |  SELECT doc_id, i AS spos, array_to_string(sents[i:i+2], ' ') AS span
        |  FROM sent, UNNEST(range(1, len(sents) - 3 + 2)) u(i)
        |  WHERE len(sents) >= 3),
        |rk AS (
        |  SELECT doc_id, spos,
        |    row_number() OVER (PARTITION BY span ORDER BY doc_id, spos) AS rn
        |  FROM sp),
        |rem AS (
        |  SELECT DISTINCT doc_id, spos + o AS pos
        |  FROM rk, UNNEST(range(0, 3)) t(o) WHERE rn >= 2),
        |kept AS (
        |  SELECT s.doc_id, s.pos, s.s
        |  FROM sr s ANTI JOIN rem r ON r.doc_id = s.doc_id AND r.pos = s.pos),
        |agg AS (
        |  SELECT doc_id, string_agg(s, ' ' ORDER BY pos) AS text,
        |    count(*) AS nk
        |  FROM kept GROUP BY doc_id)
        |SELECT c.doc_id, coalesce(a.text, '') AS text,
        |  CAST(len(se.sents) - coalesce(a.nk, 0) AS INTEGER) AS removed_sentences
        |FROM corpus c JOIN sent se ON se.doc_id = c.doc_id
        |LEFT JOIN agg a ON a.doc_id = c.doc_id""".stripMargin,

    // HTML extraction: the html CTE mirrors the query's synthetic wrap;
    // the strip/decode chain mirrors htmlToText step-for-step (same RE2
    // patterns; DuckDB needs the explicit 'g' flag Spark implies).
    "q_html_extract" ->
      """WITH html AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || doc_id::VARCHAR
        |    || ' &amp; friends</title><style>p { color: red; }</style>'
        |    || '<script>var x = 1 < 2;</script></head><body><!-- nav -->'
        |    || '<p>' || coalesce(text, '')
        |    || '</p><div>&quot;quoted&quot; &lt;tag&gt;</div></body></html>'
        |      AS h
        |  FROM documents),
        |stripped AS (
        |  SELECT doc_id, h,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(h, '(?s)<!--.*?-->', ' ', 'g'),
        |          '(?is)<script\b[^>]*>.*?(</script\s*>|$)', ' ', 'g'),
        |        '(?is)<style\b[^>]*>.*?(</style\s*>|$)', ' ', 'g'),
        |      '(?s)<[^>]*>', ' ', 'g') AS t
        |  FROM html),
        |decoded AS (
        |  SELECT doc_id, h,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(regexp_replace(t,
        |      '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |      '&#39;', '''', 'g'), '&apos;', '''', 'g'), '&nbsp;', ' ', 'g'),
        |      '&amp;', '&', 'g') AS t
        |  FROM stripped)
        |SELECT doc_id,
        |  trim(regexp_replace(
        |    regexp_extract(h, '(?is)<title\b[^>]*>(.*?)</title\s*>', 1),
        |    '\s+', ' ', 'g')) AS title,
        |  trim(regexp_replace(t, '\s+', ' ', 'g')) AS extracted
        |FROM decoded""".stripMargin,

    // Global keep-first line dedup: trimmed non-blank lines ranked by
    // (doc_id, pos) per distinct line; rank 1 survives, docs reassemble.
    // Novelty: identical shingling (distinct, right-truncated 3-grams),
    // first-arrival via min(doc_id), strict-inequality seen counts.
    "q_novelty" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' extra extra'
        |  FROM documents WHERE doc_id % 10 = 0),
        |toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                t -> t <> '') AS toks
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(toks) = 0 THEN []
        |    ELSE list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
        |           i -> array_to_string(toks[i:i+2], ' ')) END) AS s
        |  FROM toks),
        |ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
        |m AS (SELECT sg, min(doc_id) AS first_ord FROM ex GROUP BY sg),
        |agg AS (SELECT e.doc_id, count(*) AS n_shingles,
        |    count(CASE WHEN m.first_ord < e.doc_id THEN 1 END) AS n_seen
        |  FROM ex e JOIN m ON m.sg = e.sg GROUP BY e.doc_id)
        |SELECT c.doc_id,
        |  CAST(coalesce(a.n_shingles, 0) AS BIGINT) AS n_shingles,
        |  CAST(coalesce(a.n_seen, 0) AS BIGINT) AS n_seen,
        |  CASE WHEN a.n_shingles IS NULL THEN NULL
        |    ELSE 1.0 - a.n_seen / CAST(a.n_shingles AS DOUBLE) END
        |    AS novelty_frac
        |FROM (SELECT DISTINCT doc_id FROM corpus) c
        |LEFT JOIN agg a ON a.doc_id = c.doc_id""".stripMargin,

    "q_dedup_lines_global" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |    coalesce(text, '') || chr(10) || 'shared graft footer line'
        |    || CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'promo spring sale'
        |       ELSE '' END AS text
        |  FROM documents),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS parts FROM corpus),
        |raw AS (
        |  SELECT doc_id, generate_subscripts(parts, 1) AS pos,
        |    trim(unnest(parts)) AS line
        |  FROM ls),
        |ln AS (SELECT doc_id, pos, line FROM raw WHERE line <> ''),
        |kept AS (
        |  SELECT doc_id, pos, line FROM (
        |    SELECT doc_id, pos, line,
        |      row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
        |    FROM ln) WHERE rn = 1),
        |agg AS (
        |  SELECT doc_id,
        |    array_to_string(list(line ORDER BY pos), chr(10)) AS text
        |  FROM kept GROUP BY doc_id)
        |SELECT c.doc_id, coalesce(a.text, '') AS text
        |FROM corpus c LEFT JOIN agg a ON c.doc_id = a.doc_id""".stripMargin,

    "q_remove_boilerplate" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |    coalesce(text, '') || chr(10) || 'subscribe to the graft newsletter'
        |    || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'shared promo line'
        |       ELSE '' END AS text
        |  FROM documents),
        |ls AS (SELECT doc_id, string_split(text, chr(10)) AS parts FROM corpus),
        |ln AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS pos,
        |    trim(parts[CAST(i AS INTEGER)]) AS line
        |  FROM ls CROSS JOIN range(1, 1000) t(i)
        |  WHERE CAST(i AS INTEGER) <= len(parts)
        |    AND trim(parts[CAST(i AS INTEGER)]) <> ''),
        |freq AS (
        |  SELECT line FROM ln GROUP BY line
        |  HAVING count(DISTINCT doc_id) > 200),
        |kept AS (
        |  SELECT l.doc_id, l.pos, l.line
        |  FROM ln l ANTI JOIN freq f ON l.line = f.line),
        |agg AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
        |  FROM kept GROUP BY doc_id)
        |SELECT c.doc_id, coalesce(a.text, '') AS text
        |FROM corpus c LEFT JOIN agg a ON c.doc_id = a.doc_id""".stripMargin,
    "q_pii_redact" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN
        |      coalesce(text, '') || ' contact user' || doc_id
        |        || '@example.com via https://example.org/d/' || doc_id
        |        || ' or 10.1.2.3'
        |    ELSE coalesce(text, '') END AS text
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(text, 'https?://[^ \t\n]+')) AS n_urls,
        |  len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(text,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    'https?://[^ \t\n]+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
        |FROM corpus""".stripMargin,
    "q_top_terms" ->
      """WITH toks AS (
        |  SELECT source AS "group", unnest(list_filter(
        |    string_split_regex(lower(coalesce(text, '')), '\s+'),
        |    t -> t <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT "group", term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |gf AS (SELECT term, count(*) AS gf FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT source) AS n_groups FROM documents),
        |scored AS (
        |  SELECT tf."group", tf.term, tf.tf,
        |    round(tf.tf * ln(n.n_groups * 1.0 / gf.gf), 6) AS score
        |  FROM tf JOIN gf USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY "group" ORDER BY score DESC, term) AS "rank"
        |  FROM scored)
        |SELECT "group", term, tf, score, "rank" AS rank
        |FROM ranked WHERE "rank" <= 5""".stripMargin,
  )
}
