package graft
package entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.{DataFrameUtils, Transformations}

import EntryHelpers._

/** [[graft.SparkEntry]] sampling, packing, layout, crawl-format, URL, multimodal and event/time-series queries — one `queries` entry per operator,
  * with its DuckDB `oracleSql` twin where SQL-expressible. Split from
  * the single SparkEntry object for reviewability; [[graft.SparkEntry]]
  * composes every domain object's maps (duplicate keys across files are
  * linted by RowsOnlyLedgerSpec).
  */
private[graft] object PipelineEntries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Efraimidis-Spirakis weighted sampling: 20 docs per source,
    // inclusion probability ∝ n_chars, reproducible by any engine ----
    "q_weighted_sample" -> ((s, dir) => {
      operators.Sampling.weightedSample(
        t(s, dir, "documents"), Seq("source"), "doc_id", "n_chars",
        k = 20, salt = "ws1")
        .select("source", "doc_id", "n_chars")
    }),

    // ---- the pipeline, end to end: classifier quality gate → exact
    // dedup → per-source token budget → sequence packing. One oracle
    // covers the composition — every stage is engine-exact, so the
    // integrated result hash-matches too.
    "q_pipeline_quality_pack" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      val gated = operators.Classifier
        .TextClassifierModel(plantedWeights(64), 0L)
        .scoreLogit(docs, "text")
        .where(col("logit_micros") > 0)
      val deduped = operators.Dedup.exactDedup(gated, Seq("text"), "doc_id")
        .select(col("doc_id"), col("source"),
          operators.TextAnalysis.tokenCount(col("text")).cast("long")
            .as("n_tok"))
      val quota = operators.Sampling.tokenBudgetPerGroup(
        deduped, Seq("source"), "n_tok", budget = 400L,
        Seq(operators.Sampling.hashBucket(col("doc_id"), "pp"),
          col("doc_id")))
      operators.Packing.packSequences(quota, "n_tok", budget = 256L,
        orderCols = Seq(operators.Sampling.hashBucket(col("doc_id"), "pp"),
          col("doc_id")),
        shardCols = Seq("source"))
        .select(col("doc_id"), col("source"), col("n_tok"),
          col("bin"), col("bin_offset"))
    }),

    // ---- clustered compaction: range+sort layout, then a pruned scan ----
    "q_clustered_compaction" -> ((s, dir) => {
      val scratch = scratchDir("graft_cluster_") + "/t"
      operators.Compaction.writeClustered(
        t(s, dir, "lineitem"), scratch, Seq("l_shipdate"), numFiles = 8)
      s.read.parquet(scratch)
        .where(col("l_shipdate").between("1996-01-01", "1996-12-31"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum("l_extendedprice"), 2).as("revenue"))
    }),

    // ---- in-place compaction through the crash-recoverable swap ----
    // ---- Z-order layout: orders written Morton-interleaved on
    // (o_custkey, o_totalprice) so min/max pruning serves predicates on
    // EITHER column; content roundtrip is the correctness contract ----
    "q_zorder_layout" -> ((s, dir) => {
      val scratch = scratchDir("graft_zorder_") + "/orders"
      operators.Compaction.writeZOrdered(
        t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        scratch, Seq("o_custkey", "o_totalprice"), numFiles = 8)
      s.read.parquet(scratch).select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    "q_hilbert_layout" -> ((s, dir) => {
      val scratch = scratchDir("graft_hilbert_") + "/orders"
      operators.Compaction.writeHilbert(
        t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        scratch, Seq("o_custkey", "o_totalprice"), numFiles = 8)
      s.read.parquet(scratch).select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    "q_compact_roundtrip" -> ((s, dir) => {
      val scratch = scratchDir("graft_compact_") + "/docs"
      t(s, dir, "documents").select(col("doc_id"), col("source"))
        .repartition(16).write.parquet(scratch)
      operators.Compaction.compactInPlace(s, scratch)
      s.read.parquet(scratch).select("doc_id", "source")
    }),

    // ---- WARC ingestion (ISO 28500): export the corpus as gzipped
    // response records, then parse it back through the streaming record
    // reader — the Common Crawl entry-point round-trip, hash-checked
    // against the source table ----
    // ---- WET export round-trip: conversion records, no HTTP envelope ----
    "q_wet_roundtrip" -> ((s, dir) => {
      val scratch = scratchDir("graft_wet_") + "/corpus"
      val docs = t(s, dir, "documents")
        .withColumn("uri",
          concat(lit("https://example.org/doc/"), col("doc_id")))
        .repartition(8)
      io.warc.Warc.wetExport(docs, scratch, "uri", "text")
      io.warc.Warc.readWarc(s, scratch + "/*.warc.gz")
        .where(col("warc_type") === "conversion")
        .select(
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
            .cast("bigint").as("doc_id"),
          decode(col("payload"), "utf-8").as("text"),
          col("content_type"))
    }),

    "q_warc_roundtrip" -> ((s, dir) => {
      val scratch = scratchDir("graft_warc_") + "/corpus"
      val docs = t(s, dir, "documents")
        .withColumn("uri",
          concat(lit("https://example.org/doc/"), col("doc_id")))
        .withColumn("payload", encode(col("text"), "utf-8"))
        .repartition(8)
      io.warc.Warc.writeWarc(docs, scratch, "uri", "payload")
      io.warc.Warc.readWarc(s, scratch + "/*.warc.gz")
        .where(col("warc_type") === "response")
        .select(
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
            .cast("bigint").as("doc_id"),
          decode(col("payload"), "utf-8").as("text"),
          col("http_status").cast("bigint").as("http_status"))
    }),

    // ---- same round-trip through the DSv2 `graft-warc` format (the
    // SQL/catalog access path must agree with the function API) ----
    "q_warc_dsv2" -> ((s, dir) => {
      val scratch = scratchDir("graft_warc2_") + "/corpus"
      val docs = t(s, dir, "documents")
        .withColumn("uri",
          concat(lit("https://example.org/doc/"), col("doc_id")))
        .withColumn("payload", encode(col("text"), "utf-8"))
        .repartition(8)
      io.warc.Warc.writeWarc(docs, scratch, "uri", "payload")
      s.read.format("graft-warc").load(scratch)
        .where(col("warc_type") === "response")
        .select(
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
            .cast("bigint").as("doc_id"),
          decode(col("payload"), "utf-8").as("text"))
    }),

    // ---- full WARC record families (warcinfo/request/response/metadata)
    // with the size-targeted file split, re-parsed and re-joined: each
    // doc's response text, its synthetic GET, and its warc-fields
    // metadata must all survive the archive round trip ----
    "q_warc_families" -> ((s, dir) => {
      val scratch = scratchDir("graft_warc3_") + "/corpus"
      val docs = t(s, dir, "documents")
        .withColumn("uri",
          concat(lit("https://example.org/doc/"), col("doc_id")))
        .withColumn("payload", encode(col("text"), "utf-8"))
        .withColumn("meta",
          concat(lit("lang: "), coalesce(col("lang"), lit("und")), lit("\r\n")))
        .repartition(4)
      io.warc.Warc.writeWarc(docs, scratch, "uri", "payload",
        writeWarcinfo = true, requestRecords = true,
        metadataCol = Some("meta"), targetFileBytes = 256L << 10)
      val back = io.warc.Warc.readWarc(s, scratch + "/*.warc.gz")
      val resp = back.where(col("warc_type") === "response").select(
        col("target_uri").as("uri"),
        decode(col("payload"), "utf-8").as("text"))
      val req = back.where(col("warc_type") === "request").select(
        col("target_uri").as("uri"),
        (decode(col("payload"), "utf-8") ===
          concat(lit("GET "), col("target_uri"),
            lit(" HTTP/1.1\r\nHost: example.org\r\n\r\n"))).as("req_ok"))
      val meta = back.where(col("warc_type") === "metadata").select(
        col("target_uri").as("uri"),
        regexp_extract(decode(col("payload"), "utf-8"),
          "^lang: (.*)\r\n$", 1).as("meta_lang"))
      resp.join(req, Seq("uri")).join(meta, Seq("uri"))
        .select(
          regexp_extract(col("uri"), "/doc/(\\d+)$", 1)
            .cast("bigint").as("doc_id"),
          col("text"), col("req_ok"), col("meta_lang"))
    }),

    // ---- WAT export (Common Crawl's metadata sibling of WARC/WET):
    // planted HTML with known outlinks -> watExport -> readWarc -> JSON
    // envelope parse -> one row per (doc, link position). The twin
    // hand-derives every resolved link from the same planted HTML. ----
    "q_wat_roundtrip" -> ((s, dir) => {
      val scratch = scratchDir("graft_wat_") + "/corpus"
      val id = col("doc_id").cast("string")
      val docs = t(s, dir, "documents")
        .withColumn("uri",
          concat(lit("https://example.org/a/doc"), id))
        .withColumn("html", concat(
          lit("<html><body><a href=\"https://partner.example.net/p/"), id,
          lit("?a=1&amp;b=2\">x</a><a href='/local/"), id,
          lit("'>y</a><a href=\"rel/page"), id,
          lit(".html\">z</a><a href=\"//cdn.example.org/lib.js\">w</a>"),
          lit("<a href=\"#frag\">f</a><a href=\"mailto:a@b.example\">m</a>"),
          lit("</body></html>")))
        .repartition(8)
      io.warc.Warc.watExport(docs, scratch, "uri", "html")
      val watSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "`Envelope` STRUCT<`Payload-Metadata`: STRUCT<" +
          "`Actual-Content-Length`: BIGINT, " +
          "`HTTP-Response-Metadata`: STRUCT<`HTML-Metadata`: STRUCT<" +
          "`Links`: ARRAY<STRUCT<`url`: STRING>>>>>>")
      io.warc.Warc.readWarc(s, scratch + "/*.warc.gz")
        .where(col("warc_type") === "metadata")
        .select(
          regexp_extract(col("target_uri"), "/doc(\\d+)$", 1)
            .cast("bigint").as("doc_id"),
          from_json(decode(col("payload"), "utf-8"), watSchema).as("env"))
        .select(col("doc_id"),
          col("env.Envelope.Payload-Metadata.Actual-Content-Length")
            .as("content_length"),
          posexplode(col("env.Envelope.Payload-Metadata" +
            ".HTTP-Response-Metadata.HTML-Metadata.Links")))
        .select(col("doc_id"), col("pos").cast("bigint").as("link_pos"),
          col("col.url").as("link"), col("content_length"))
    }),

    // Clustered layout + write-side parquet bloom filters on the id, then
    // point lookups against the laid-out copy: row-group stats prune the
    // range predicate, the bloom filter prunes the equality probes.
    "q_bloom_layout" -> ((s, dir) => {
      val scratch = scratchDir("graft_bloomlay_") + "/docs"
      operators.Compaction.writeClustered(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
        scratch, Seq("doc_id"), numFiles = 4,
        bloomFilters = Map("doc_id" -> 100000L))
      s.read.parquet(scratch)
        .where(col("doc_id") % 97 === 0 || col("doc_id") === 421)
        .select("doc_id", "lang", "n_chars")
    }),

    // ---- bloom-pruned join: fact side reduced at the scan by the
    // dimension subset's key bloom before the shuffle ----
    "q_bloom_prune_join" -> ((s, dir) => {
      val urgent = t(s, dir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
      operators.RuntimeFilters.bloomPrunedJoin(
        t(s, dir, "lineitem"), "l_orderkey", urgent, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum("l_extendedprice"), 2).as("revenue"))
    }),

    // ---- crawl-tier pipeline witness: corpus → WARC export → streamed
    // parse-back → per-host robots gate → mojibake repair → token stats,
    // ONE integrated oracle over the final rows (T96+T101+T103 composed)
    "q_pipeline_crawl" -> ((s, dir) => {
      val scratch = scratchDir("graft_crawlpipe_") + "/corpus"
      val mangled = lit(graft.functions.MojibakeFunctions
        .cp1252Mangled(" Café — déjà “vu” …"))
      val docs = t(s, dir, "documents")
        .withColumn("uri",
          concat(lit("https://"), col("source"), lit(".example.com"),
            when(col("doc_id") % 4 === 0,
              concat(lit("/private/"), col("doc_id")))
              .when(col("doc_id") % 4 === 1, lit("/private/stats"))
              .when(col("doc_id") % 4 === 2,
                concat(lit("/archive/"), col("doc_id"), lit(".zip")))
              .otherwise(concat(lit("/public/"), col("doc_id")))))
        .withColumn("payload", encode(
          concat(col("text"),
            when(col("doc_id") % 7 === 0, mangled).otherwise(lit(""))),
          "utf-8"))
        .repartition(8)
      io.warc.Warc.writeWarc(docs, scratch, "uri", "payload")
      val graftGroup = "User-agent: graftbot\nDisallow: /private/\n" +
        "Allow: /private/stats$\nDisallow: /archive/*.zip\n\n"
      val starGroup = "User-agent: *\nDisallow: /\n"
      val robots = t(s, dir, "documents").select(col("source")).distinct()
        .select(concat(col("source"), lit(".example.com")).as("domain"),
          when(length(col("source")) % 2 === 0, lit(graftGroup + starGroup))
            .otherwise(lit(starGroup)).as("robots"))
      val fetched = io.warc.Warc.readWarc(s, scratch + "/*.warc.gz")
        .where(col("warc_type") === "response")
        .select(col("target_uri").as("url"),
          decode(col("payload"), "utf-8").as("raw_text"))
      val allowed = operators.Robots.filterAllowed(fetched, "url", robots,
        "domain", "robots", "graftbot")
      val ta = operators.TextAnalysis
      allowed
        .select(col("url"),
          graft.functions.MojibakeFunctions.fixMojibake(col("raw_text"))
            .as("text"))
        .select(col("url"), col("text"),
          ta.tokenCount(col("text")).cast("bigint").as("n_tok"))
    }),

    // ---- event analytics: ordered funnel + cohort retention ----
    "q_funnel" -> ((s, dir) => {
      operators.Funnels.funnelCounts(t(s, dir, "events"), "user_id", "ts",
        Seq("view" -> (col("event_type") === "view"),
          "click" -> (col("event_type") === "click"),
          "purchase" -> (col("event_type") === "purchase")))
    }),
    "q_retention" -> ((s, dir) => {
      operators.Funnels.cohortRetention(t(s, dir, "events"),
        "user_id", "ts", periodDays = 7)
    }),

    // ---- sitemap extraction: per-source urlsets synthesized from the
    // corpus, locs exploded back out with entity decode ----
    "q_sitemap" -> ((s, dir) => {
      val xml = t(s, dir, "documents").select(col("source"), col("doc_id"))
        .groupBy("source").agg(
          concat(lit("<urlset>"),
            concat_ws("", array_sort(collect_list(
              concat(lit("<url><loc>https://"), col("source"),
                lit(".example.com/doc/"), col("doc_id"),
                lit("&amp;ref=sm</loc></url>"))))),
            lit("</urlset>")).as("xml"))
      operators.Urls.extractSitemapUrls(xml, "xml")
    }),

    // ---- the RAG retrieval pipeline, end to end: token-window chunking
    // → deterministic chunk embeddings → brute-force cosine top-k per
    // query doc. Every stage is engine-exact, so the COMPOSITION has a
    // full oracle too (the q_pipeline_quality_pack discipline) ----
    "q_pipeline_rag" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val chunks = operators.TextAnalysis.chunkTokens(
          docs, "doc_id", "text", window = 32, stride = 24)
        .select((col("doc_id") * 1000 + col("chunk_idx")).as("id"),
          similarity.HashEmbedding.hashToVector(
            col("chunk_text"), dims = 8, normalize = false).as("emb"))
      val queries = docs.where(col("doc_id") < 5)
        .select(col("doc_id").as("q_id"),
          similarity.HashEmbedding.hashToVector(
            col("text"), dims = 8, normalize = false).as("emb"))
      operators.Ann.bruteForceTopK(chunks, queries, "id", "emb", "q_id", 3)
    }),

    // ---- robots.txt politeness gate (RFC 9309): per-host robots parse
    // + longest-match URL verdicts; even-length sources carry a graftbot
    // group (private/ blocked, stats$ anchor allowed, *.zip blocked),
    // odd-length sources only a deny-all * group ----
    "q_robots_filter" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
      val graftGroup = "User-agent: graftbot\nDisallow: /private/\n" +
        "Allow: /private/stats$\nDisallow: /archive/*.zip\n\n"
      val starGroup = "User-agent: *\nDisallow: /\n"
      val robots = docs.select(col("source")).distinct()
        .select(concat(col("source"), lit(".example.com")).as("domain"),
          when(length(col("source")) % 2 === 0, lit(graftGroup + starGroup))
            .otherwise(lit(starGroup)).as("robots"))
      val urls = docs.select(col("doc_id"),
        concat(lit("https://"), col("source"), lit(".example.com"),
          when(col("doc_id") % 4 === 0,
            concat(lit("/private/"), col("doc_id")))
            .when(col("doc_id") % 4 === 1, lit("/private/stats"))
            .when(col("doc_id") % 4 === 2,
              concat(lit("/archive/"), col("doc_id"), lit(".zip")))
            .otherwise(concat(lit("/public/"), col("doc_id")))).as("url"))
      operators.Robots.evaluate(urls, "url",
        operators.Robots.parseRobots(robots, "domain", "robots", "graftbot"))
        .select(col("doc_id"), col("url"), col("robots_allowed"))
    }),

    // ---- bucketized range join: events into overlapping campaign
    // windows (533 s grid, 400-2800 s widths) without a nested loop ----
    "q_range_join" -> ((s, dir) => {
      val base = 1704067200L // 2024-01-01T00:00:00Z, the events epoch
      val ev = streaming.StreamingOps.readEventsRaw(s, s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"),
          expr("ts_ns div 1000000000").as("sec"))
      val iv = s.range(0, 500).select(
        col("id").as("window_id"),
        (lit(base) + col("id") * 533).as("w_start"),
        (lit(base) + col("id") * 533 + (col("id") % 7 + 1) * 400).as("w_end"))
      operators.RangeJoin.pointInInterval(ev, iv,
          "sec", "w_start", "w_end", bucketWidth = 1024L)
        .select("event_id", "user_id", "sec", "window_id")
    }),

    // ---- interval-OVERLAP join: order date-windows vs synthetic
    // review windows, per key — the interval×interval sibling of
    // q_range_join, one bucket equi-shuffle, canonical-bucket dedup ----
    "q_interval_overlap" -> ((s, dir) => {
      val a = t(s, dir, "orders").where(col("o_custkey") < 400)
        .select(col("o_orderkey").cast("long").as("aid"),
          datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("a_start"),
          (datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
            + col("o_custkey") % 20 + 1).as("a_end"),
          (col("o_custkey") % 7).cast("long").as("k"))
      val b = s.range(0, 600).select(col("id").as("bid"),
        (lit(8035L) + col("id") * 4).as("b_start"),
        (lit(8035L) + col("id") * 4 + col("id") % 9 * 3 + 2).as("b_end"),
        (col("id") % 7).as("k"))
      operators.RangeJoin.intervalOverlap(a, b,
          "a_start", "a_end", "b_start", "b_end",
          bucketWidth = 64L, extraKeys = Seq("k"))
        .select("aid", "bid", "k")
    }),

    // ---- multimodal: binary content + batched stub decode (mapPartitions) ----
    "q_multimodal_meta" -> ((s, dir) => {
      val withContent = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
      operators.Multimodal.withDecodedMeta(withContent, "content")
        .select(col("doc_id"),
          col("meta.format").as("format"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.n_bytes").as("n_bytes"))
    }),

    // ---- deterministic hash split (train/val/test, engine-reproducible) --
    "q_hash_split" -> ((s, dir) => {
      operators.Sampling.withHashSplit(
        t(s, dir, "documents").select(col("doc_id")),
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    }),

    // ---- split-leakage audit, the chained witness for withHashSplit's
    // leakage-safe contract: ONE near-dup pair set (the planted-twin
    // LSH corpus of q_dedup_clusters) scored under a row-keyed AND a
    // domain-keyed 80/20 split in a single aggregate — twins keep
    // their source, so the domain split can never separate them while
    // the row split scatters ~2·p·(1−p) of them across the boundary ----
    "q_split_leakage" -> ((s, dir) => {
      val base = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
      val corpus = base.unionByName(base.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" extra extra")).as("text"),
          col("source")))
      val pairs = operators.Dedup.minhashLshPairs(corpus, "doc_id", "text",
        numPerms = 16, bands = 4, shingleSize = 3, threshold = 0.5)
      val splits = operators.Sampling.withHashSplit(
        operators.Sampling.withHashSplit(corpus, "doc_id",
          Seq("train" -> 0.8, "eval" -> 0.2), salt = "sl",
          outputCol = "row_split"),
        "source", Seq("train" -> 0.8, "eval" -> 0.2), salt = "sl",
        outputCol = "domain_split")
        .select(col("doc_id"), col("row_split"), col("domain_split"))
      pairs.select("id_a", "id_b")
        .join(splits.select(col("doc_id").as("id_a"),
          col("row_split").as("ra"), col("domain_split").as("da")), "id_a")
        .join(splits.select(col("doc_id").as("id_b"),
          col("row_split").as("rb"), col("domain_split").as("db")), "id_b")
        .agg(count(lit(1)).as("n_pairs"),
          count(when(col("ra") =!= col("rb"), 1)).as("row_cross"),
          count(when(col("da") =!= col("db"), 1)).as("domain_cross"))
    }),

    // ---- word2vec frequent-word subsampling over the corpus ----
    "q_subsample" -> ((s, dir) =>
      operators.TextAnalysis.subsampleFrequent(
        t(s, dir, "documents"), "doc_id", "text", t = 0.001, seed = "w2v")),

    // ---- fill-in-the-middle transform (Bavarian 2022): sha-gated 50%
    // of docs reordered into the PSM layout, cuts sha-derived ----
    "q_fim" -> ((s, dir) =>
      operators.TextAnalysis.fimTransform(
        t(s, dir, "documents"), "doc_id", "text")),

    // ---- T5 span-corruption pairs (Raffel 2020 §3.1.4): block-gridded
    // sha spans, numbered sentinels, denoising input/target per doc ----
    "q_span_corruption" -> ((s, dir) =>
      operators.TextAnalysis.spanCorruption(
        t(s, dir, "documents"), "doc_id", "text")),

    // ---- waterfill budget allocation: one shared cap funds small
    // groups fully and throttles mega-groups — proportional-fair crawl
    // / mixture quotas in closed form ----
    "q_waterfill" -> ((s, dir) => {
      val counts = t(s, dir, "documents")
        .groupBy(concat_ws(":", coalesce(col("lang"), lit("und")),
          col("source")).as("grp"))
        .agg(count(lit(1)).as("n_docs"))
      operators.Sampling.waterfillAllocations(counts, "grp", "n_docs",
        budget = 300L)
    }),

    // ---- data-constrained scaling plan (Muennighoff 2023 Eq. 5):
    // per-source epochs + effective tokens under a uniform-split token
    // budget and the published R* = 15.39 repetition-decay fit ----
    "q_data_constrained" -> ((s, dir) =>
      operators.Sampling.dataConstrainedPlan(
        t(s, dir, "documents"), "source", "text", budget = 400000L)),

    // ---- balanced training shards: near-equal token totals via the
    // two-phase global cumsum (deterministic hash order, bounded driver
    // state) — the trainer-facing anti-straggler split ----
    "q_shard_assign" -> ((s, dir) => {
      operators.Packing.assignShards(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", numShards = 8, orderBuckets = 32)
        .select(col("doc_id"), col("shard"))
    }),

    // ---- token-budget mixture fill: 600 tokens per source, unbiased
    // hash order, straddling doc kept (greedy-fill contract)
    "q_token_budget" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"),
        operators.TextAnalysis.tokenCount(col("text")).cast("long")
          .as("n_tok"))
      operators.Sampling.tokenBudgetPerGroup(docs, Seq("source"), "n_tok",
        budget = 600L,
        orderCols = Seq(operators.Sampling.hashBucket(col("doc_id"), "tb"),
          col("doc_id")))
    }),

    // ---- per-group quota: keep the 8 lowest-id docs per (source, lang) --
    "q_quota_per_group" -> ((s, dir) => {
      operators.Sampling.limitPerGroup(
        t(s, dir, "documents").select(col("doc_id"), col("source"), col("lang")),
        Seq("source", "lang"), n = 8, orderCols = Seq(col("doc_id")))
    }),

    // ---- stratified hash sample (per-language keep fractions) ----
    "q_stratified_sample" -> ((s, dir) => {
      operators.Sampling.stratifiedSample(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang",
        fractions = Map("en" -> 0.5, "de" -> 0.25),
        defaultFraction = 0.1)
    }),

    // ---- domain mixture: sample sources to 50/30/20 target proportions
    // (largest achievable total without up-sampling) ----
    "q_mixture_sample" -> ((s, dir) => {
      operators.Sampling.sampleToMixture(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source",
        weights = Map("src1" -> 0.5, "src2" -> 0.3, "src3" -> 0.2))
    }),

    // ---- temperature-smoothed language mixture (p_l ∝ n_l^0.3) ----
    "q_alpha_mixture" -> ((s, dir) => {
      operators.Sampling.sampleToAlphaMixture(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang", alpha = 0.3)
    }),

    // ---- deterministic global shuffle (engine-reproducible training
    // order; global position without a single-partition window) ----
    "q_corpus_shuffle" -> ((s, dir) => {
      operators.Sampling.deterministicShuffle(
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", seed = "epoch0")
    }),

    // ---- token-budget sequence packing (cumsum bins, sharded by source) --
    "q_pack_sequences" -> ((s, dir) => {
      val withTok = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          // long, not int: DuckDB's len() is BIGINT, so agree by construction
          size(operators.TextAnalysis.tokens(col("text"))).cast("long")
            .as("n_tok"))
      operators.Packing.packSequences(withTok, "n_tok", budget = 1024L,
        orderCols = Seq(col("doc_id")), shardCols = Seq("source"))
    }),

    // ---- as-of join: events aligned to their latest per-user snapshot
    // (union+window formulation — one shuffle, no range-join blowup) ----
    "q_asof_join" -> ((s, dir) => {
      val raw = streaming.StreamingOps
        .readEventsRaw(s, s"$dir/events.parquet")
        .withColumn("ts_us", expr("ts_ns div 1000"))
      val left = raw.select("event_id", "user_id", "ts_us")
      val snaps = raw.where(col("event_id") % 10 === 0)
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(col("value")).as("snap_value"))
      operators.AsofJoin.asofJoin(left, snaps, Seq("user_id"), "ts_us")
    }),

    // ---- as-of with a staleness bound: matches older than 60s are
    // dropped (row kept, right columns null) — merge_asof(tolerance=...)
    "q_asof_tolerance" -> ((s, dir) => {
      val raw = streaming.StreamingOps
        .readEventsRaw(s, s"$dir/events.parquet")
        .withColumn("ts_us", expr("ts_ns div 1000"))
      val left = raw.select("event_id", "user_id", "ts_us")
      val snaps = raw.where(col("event_id") % 10 === 0)
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(col("value")).as("snap_value"))
      operators.AsofJoin.asofJoin(left, snaps, Seq("user_id"), "ts_us",
        tolerance = Some(60000000L))
    }),

    // ---- forward as-of: next snapshot at-or-after each event (DuckDB
    // ASOF with l.ts <= r.ts is the oracle; `nearest` has no SQL twin
    // and is spec-pinned in AsofJoinSpec) ----
    "q_asof_forward" -> ((s, dir) => {
      val raw = streaming.StreamingOps
        .readEventsRaw(s, s"$dir/events.parquet")
        .withColumn("ts_us", expr("ts_ns div 1000"))
      val left = raw.select("event_id", "user_id", "ts_us")
      val snaps = raw.where(col("event_id") % 10 === 0)
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(col("value")).as("snap_value"))
      operators.AsofJoin.asofJoin(left, snaps, Seq("user_id"), "ts_us",
        direction = "forward")
    }),

    // ---- IDN canonicalization: planted unicode hostnames must reach
    // their exact punycode forms; ASCII stays byte-identical ----
    "q_idn_hosts" -> ((s, dir) => {
      val url = concat(lit("https://"),
        when(col("doc_id") % 3 === 0, lit("münchen"))
          .when(col("doc_id") % 3 === 1, lit("пример"))
          .otherwise(lit("plain")),
        lit("."), col("source"), lit(".example.com/d/"), col("doc_id"))
      t(s, dir, "documents").select(col("doc_id"),
        operators.Urls.asciiHost(url).as("ascii_host"))
    }),

    // ---- URL hygiene: canonicalization, domains, per-domain quota ----
    "q_url_canonical" -> ((s, dir) => {
      urlCorpus(s, dir).select(col("doc_id"),
        operators.Urls.canonicalizeUrl(col("url")).as("canon_url"),
        operators.Urls.registrableDomain(col("url")).as("domain"))
    }),

    "q_domain_quota" -> ((s, dir) => {
      operators.Urls.perDomainQuota(
        urlCorpus(s, dir), "url", 3, Seq(col("doc_id")))
        .select(col("doc_id"), col("domain"))
    }),

    // Domain blocklist: drop documents whose URL host is (or lives
    // under) a blocked domain.
    "q_blocklist_filter" -> ((s, dir) => {
      operators.Urls.filterBlockedDomains(
        urlCorpus(s, dir), "url", Seq("example.co.uk", "example.org"))
    }),

    // URL-identity dedup: canonicalize, then keep the first doc per
    // canonical URL — the crawl-side step BEFORE content dedup.
    "q_url_dedup" -> ((s, dir) => {
      operators.Sampling.limitPerGroup(
        urlCorpus(s, dir).select(col("doc_id"),
          operators.Urls.canonicalizeUrl(col("url")).as("canon_url")),
        Seq("canon_url"), 1, Seq(col("doc_id")))
    }),

    // ---- multimodal: bytewise frame sampling over binary content ----
    "q_frame_sample" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .select(col("doc_id"),
          posexplode(operators.Multimodal.frameSample(col("content"), 3, 16)))
        .select(col("doc_id"), col("pos").as("frame_idx"),
          hex(col("col")).as("frame_hex"))
    }),

    // ---- image perceptual hash (median-threshold over the stub stride) --
    "q_image_phash" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .select(col("doc_id"),
          operators.Multimodal.perceptualHash(col("content")).as("phash"))
    }),

    // ---- image near-dup pairs: banded Hamming join over the pHash -------
    // planted near-dups: every 10th payload re-enters with its last three
    // characters overwritten at EQUAL length — the shape an equal-size
    // re-encode produces (stride sampling, like real pHash, is robust to
    // small in-place edits but not to length changes)
    "q_image_near_dup" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = base.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(expr("substring(text, 1, length(text) - 3)"), lit("xyz"))
            .as("text"))
      operators.Dedup.hashNearDupPairs(base.unionByName(planted), "doc_id",
        operators.Multimodal.perceptualHash(col("text").cast("binary")),
        bits = 60, bands = 6, maxHamming = 5, dropZero = true)
    }),

    // ---- frame-level video dedup: sample frames, pHash each, pair
    // across the corpus — near-dup VIDEOS surface as shared frames.
    // Same planted tail-edit corpus: copies share frames 0-1 exactly
    // (hamming 0) and differ slightly in the edited tail frame.
    "q_frame_near_dup" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = base.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(expr("substring(text, 1, length(text) - 3)"), lit("xyz"))
            .as("text"))
      val frames = base.unionByName(planted)
        .select(col("doc_id"),
          posexplode(operators.Multimodal.frameSample(
            col("text").cast("binary"), 3, 64)).as(Seq("frame_idx", "frame")))
        .select((col("doc_id") * 10 + col("frame_idx")).as("fid"),
          col("frame"))
      operators.Dedup.hashNearDupPairs(frames, "fid",
        operators.Multimodal.perceptualHash(col("frame")),
        bits = 60, bands = 6, maxHamming = 5, dropZero = true)
    }),

    // ---- north-star: tumbling-window event aggregates (batch twin of the
    // streaming op; epoch-second window_start for exact cross-engine compare)
    "q_event_windows" -> ((s, dir) => {
      streaming.StreamingOps.windowedTypeCounts(
        streaming.StreamingOps.readEvents(s, s"$dir/events.parquet"))
    }),

    // ---- sliding (overlapping) windows: trailing hour per 15-minute
    // slide; every event lands in 4 windows ----
    "q_sliding_windows" -> ((s, dir) => {
      streaming.StreamingOps.slidingTypeCounts(
        streaming.StreamingOps.readEvents(s, s"$dir/events.parquet"))
    }),

    // ---- keyed interval join (the stream-stream attribution shape, on
    // its static twin): every 10th event attributed to same-user events
    // in the preceding 10 minutes ----
    "q_interval_join" -> ((s, dir) => {
      val ev = streaming.StreamingOps.readEvents(s, s"$dir/events.parquet")
      streaming.StreamingOps.intervalJoin(
        ev.where(col("event_id") % 10 === 0), ev, "user_id", "ts",
        lookback = "10 minutes", lookahead = "0 seconds")
        .select(col("l_event_id"), col("r_event_id"))
    }),

    // ---- north-star: batch sessionization via window functions
    // (µs precision on both sides: DuckDB truncates the ns parquet to µs) --
    "q_sessionize" -> ((s, dir) => {
      streaming.StreamingOps.sessionizeBatch(
        streaming.StreamingOps.readEventsRaw(s, s"$dir/events.parquet")
          .withColumn("ts_us", expr("ts_ns div 1000")))
    }),

    // ---- pairwise association rules over per-user event baskets ----
    "q_assoc_rules" -> ((s, dir) => {
      val e = streaming.StreamingOps.readEventsRaw(s, s"$dir/events.parquet")
      operators.Funnels.associationRules(e, "user_id", "event_type")
    }),

    // ---- behavioral path n-grams over the event stream ----
    "q_path_ngrams" -> ((s, dir) => {
      val e = streaming.StreamingOps.readEventsRaw(s, s"$dir/events.parquet")
        .withColumn("ts_us", expr("ts_ns div 1000"))
      operators.Funnels.pathNgrams(
        e, "user_id", "ts_us", "event_id", "event_type", n = 3)
    }),
  )

  def oracleSql: Map[String, String] = Map(

    // URL canonicalization: the urls CTE mirrors urlCorpus verbatim; the
    // IDN: the punycode forms are fixed by RFC 3490/3492 — the oracle
    // states them as literals.
    "q_idn_hosts" ->
      """SELECT doc_id,
        |  CASE doc_id % 3
        |    WHEN 0 THEN 'xn--mnchen-3ya.'
        |    WHEN 1 THEN 'xn--e1afmkfd.'
        |    ELSE 'plain.' END || source || '.example.com' AS ascii_host
        |FROM documents""".stripMargin,

    // rest mirrors Urls.canonicalizeUrl / registrableDomain step-by-step
    // (anchored RE2-safe regexes, byte-wise param sort, PSL-lite domain).
    "q_url_canonical" ->
      """WITH urls AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 5 AS INTEGER)
        |      WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.COM:443/Path/'
        |                  || doc_id::VARCHAR || '?utm_source=feed&b=2&a=1#frag'
        |      WHEN 1 THEN 'http://' || source || '.example.com:80/' || doc_id::VARCHAR
        |      WHEN 2 THEN 'http://user:pw@' || source || '.example.co.uk:8080/x?z=1&y=2&gclid=abc'
        |      WHEN 3 THEN 'https://cdn.' || source || '.example.org/a/b/?fbclid=1'
        |      ELSE 'not a url ' || doc_id::VARCHAR END AS url
        |  FROM documents),
        |c1 AS (SELECT doc_id, trim(url) AS raw,
        |  regexp_replace(trim(url), '#.*', '') AS u FROM urls),
        |parts AS (
        |  SELECT doc_id, raw, u,
        |    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_replace(
        |      regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
        |      '^[^@]*@', '')) AS auth,
        |    regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) AS pathq
        |  FROM c1),
        |hostp AS (
        |  SELECT doc_id, raw, scheme, pathq,
        |    regexp_extract(auth, ':([0-9]+)$', 1) AS port,
        |    regexp_replace(regexp_replace(auth, ':[0-9]+$', ''), '^www\.', '') AS barehost
        |  FROM parts),
        |comp AS (
        |  SELECT doc_id, raw, scheme, barehost,
        |    CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
        |              AND NOT (scheme = 'https' AND port = '443')
        |         THEN barehost || ':' || port ELSE barehost END AS hostpart,
        |    CASE WHEN regexp_replace(pathq, '\?.*', '') = '' THEN '/'
        |         ELSE regexp_replace(pathq, '\?.*', '') END AS path,
        |    list_sort(list_filter(
        |      string_split(regexp_extract(pathq, '\?(.*)', 1), '&'),
        |      p -> p <> '' AND NOT regexp_matches(p,
        |        '^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|mc_eid|igshid|ref|ref_src)(=.*)?$')))
        |      AS params
        |  FROM hostp),
        |dom AS (
        |  SELECT doc_id, barehost, string_split(barehost, '.') AS ls FROM comp)
        |SELECT c.doc_id,
        |  CASE WHEN c.scheme = '' THEN c.raw
        |       ELSE c.scheme || '://' || c.hostpart || c.path ||
        |         CASE WHEN len(c.params) = 0 THEN ''
        |              ELSE '?' || array_to_string(c.params, '&') END END AS canon_url,
        |  CASE WHEN d.barehost = '' THEN NULL
        |       WHEN len(d.ls) <= 2 THEN d.barehost
        |       WHEN d.ls[-2] IN ('co','com','net','org','gov','ac','edu')
        |            AND length(d.ls[-1]) <= 3
        |         THEN d.ls[-3] || '.' || d.ls[-2] || '.' || d.ls[-1]
        |       ELSE d.ls[-2] || '.' || d.ls[-1] END AS domain
        |FROM comp c JOIN dom d ON c.doc_id = d.doc_id""".stripMargin,

    // Blocklist: host (userinfo/port/www-stripped, lowered) equals a
    // blocked domain or ends with '.'+domain.
    "q_blocklist_filter" ->
      """WITH urls AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 5 AS INTEGER)
        |      WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.COM:443/Path/'
        |                  || doc_id::VARCHAR || '?utm_source=feed&b=2&a=1#frag'
        |      WHEN 1 THEN 'http://' || source || '.example.com:80/' || doc_id::VARCHAR
        |      WHEN 2 THEN 'http://user:pw@' || source || '.example.co.uk:8080/x?z=1&y=2&gclid=abc'
        |      WHEN 3 THEN 'https://cdn.' || source || '.example.org/a/b/?fbclid=1'
        |      ELSE 'not a url ' || doc_id::VARCHAR END AS url
        |  FROM documents),
        |hostp AS (
        |  SELECT doc_id, url,
        |    regexp_replace(regexp_replace(
        |      lower(regexp_replace(
        |        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
        |        '^[^@]*@', '')),
        |      ':[0-9]+$', ''), '^www\.', '') AS h
        |  FROM urls)
        |SELECT doc_id, url FROM hostp
        |WHERE NOT (h = 'example.co.uk' OR h LIKE '%.example.co.uk'
        |           OR h = 'example.org' OR h LIKE '%.example.org')""".stripMargin,

    // Canonical-URL keep-first dedup: the canon CTE chain mirrors
    // q_url_canonical; rank 1 per canon_url by doc_id survives.
    "q_url_dedup" ->
      """WITH urls AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 5 AS INTEGER)
        |      WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.COM:443/Path/'
        |                  || doc_id::VARCHAR || '?utm_source=feed&b=2&a=1#frag'
        |      WHEN 1 THEN 'http://' || source || '.example.com:80/' || doc_id::VARCHAR
        |      WHEN 2 THEN 'http://user:pw@' || source || '.example.co.uk:8080/x?z=1&y=2&gclid=abc'
        |      WHEN 3 THEN 'https://cdn.' || source || '.example.org/a/b/?fbclid=1'
        |      ELSE 'not a url ' || doc_id::VARCHAR END AS url
        |  FROM documents),
        |c1 AS (SELECT doc_id, trim(url) AS raw,
        |  regexp_replace(trim(url), '#.*', '') AS u FROM urls),
        |parts AS (
        |  SELECT doc_id, raw, u,
        |    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    lower(regexp_replace(
        |      regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
        |      '^[^@]*@', '')) AS auth,
        |    regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) AS pathq
        |  FROM c1),
        |hostp AS (
        |  SELECT doc_id, raw, scheme, pathq,
        |    regexp_extract(auth, ':([0-9]+)$', 1) AS port,
        |    regexp_replace(regexp_replace(auth, ':[0-9]+$', ''), '^www\.', '') AS barehost
        |  FROM parts),
        |comp AS (
        |  SELECT doc_id, raw, scheme,
        |    CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
        |              AND NOT (scheme = 'https' AND port = '443')
        |         THEN barehost || ':' || port ELSE barehost END AS hostpart,
        |    CASE WHEN regexp_replace(pathq, '\?.*', '') = '' THEN '/'
        |         ELSE regexp_replace(pathq, '\?.*', '') END AS path,
        |    list_sort(list_filter(
        |      string_split(regexp_extract(pathq, '\?(.*)', 1), '&'),
        |      p -> p <> '' AND NOT regexp_matches(p,
        |        '^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|mc_eid|igshid|ref|ref_src)(=.*)?$')))
        |      AS params
        |  FROM hostp),
        |canon AS (
        |  SELECT doc_id,
        |    CASE WHEN scheme = '' THEN raw
        |         ELSE scheme || '://' || hostpart || path ||
        |           CASE WHEN len(params) = 0 THEN ''
        |                ELSE '?' || array_to_string(params, '&') END END AS canon_url
        |  FROM comp)
        |SELECT doc_id, canon_url FROM (
        |  SELECT doc_id, canon_url,
        |    row_number() OVER (PARTITION BY canon_url ORDER BY doc_id) AS rn
        |  FROM canon) WHERE rn = 1""".stripMargin,

    "q_domain_quota" ->
      """WITH urls AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 5 AS INTEGER)
        |      WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.COM:443/Path/'
        |                  || doc_id::VARCHAR || '?utm_source=feed&b=2&a=1#frag'
        |      WHEN 1 THEN 'http://' || source || '.example.com:80/' || doc_id::VARCHAR
        |      WHEN 2 THEN 'http://user:pw@' || source || '.example.co.uk:8080/x?z=1&y=2&gclid=abc'
        |      WHEN 3 THEN 'https://cdn.' || source || '.example.org/a/b/?fbclid=1'
        |      ELSE 'not a url ' || doc_id::VARCHAR END AS url
        |  FROM documents),
        |hostp AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(
        |      lower(regexp_replace(
        |        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
        |        '^[^@]*@', '')),
        |      ':[0-9]+$', ''), '^www\.', '') AS barehost
        |  FROM urls),
        |dom AS (
        |  SELECT doc_id, barehost, string_split(barehost, '.') AS ls FROM hostp),
        |d2 AS (
        |  SELECT doc_id,
        |    CASE WHEN barehost = '' THEN NULL
        |         WHEN len(ls) <= 2 THEN barehost
        |         WHEN ls[-2] IN ('co','com','net','org','gov','ac','edu')
        |              AND length(ls[-1]) <= 3
        |           THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
        |         ELSE ls[-2] || '.' || ls[-1] END AS domain
        |  FROM dom),
        |ranked AS (
        |  SELECT doc_id, domain,
        |    row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn
        |  FROM d2)
        |SELECT doc_id, domain FROM ranked WHERE rn <= 3""".stripMargin,
    "q_interval_overlap" ->
      """WITH a AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS aid,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS a_start,
        |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      + o_custkey % 20 + 1 AS a_end,
        |    CAST(o_custkey % 7 AS BIGINT) AS k
        |  FROM orders WHERE o_custkey < 400),
        |b AS (
        |  SELECT id AS bid, 8035 + id * 4 AS b_start,
        |    8035 + id * 4 + id % 9 * 3 + 2 AS b_end, id % 7 AS k
        |  FROM range(0, 600) t(id))
        |SELECT aid, CAST(bid AS BIGINT) AS bid, a.k AS k
        |FROM a JOIN b ON a.k = b.k
        |  AND a_start <= b_end AND b_start <= a_end""".stripMargin,
    "q_range_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) // 1000000 AS sec
        |  FROM events),
        |iv AS (
        |  SELECT i AS window_id,
        |    1704067200 + i * 533 AS w_start,
        |    1704067200 + i * 533 + ((i % 7) + 1) * 400 AS w_end
        |  FROM range(0, 500) t(i))
        |SELECT event_id, user_id, sec, window_id
        |FROM ev JOIN iv ON ev.sec >= iv.w_start AND ev.sec <= iv.w_end""".stripMargin,
    "q_pipeline_quality_pack" ->
      """WITH w AS (
        |  SELECT CAST(j AS BIGINT) AS bucket,
        |    (('0x' || substring(sha256('w:' || CAST(j AS VARCHAR)), 1, 15))
        |      ::BIGINT % 2001) - 1000 AS wt
        |  FROM range(64) t(j)),
        |toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(coalesce(text, ''), '\s+'),
        |    t -> t <> '')) AS tok
        |  FROM documents),
        |lg AS (
        |  SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS s
        |  FROM toks JOIN w
        |    ON (('0x' || substring(sha256(tok), 1, 15))::BIGINT % 64)
        |       = w.bucket
        |  GROUP BY doc_id),
        |gated AS (
        |  SELECT d.doc_id, d.source, d.text
        |  FROM documents d JOIN lg USING (doc_id) WHERE lg.s > 0),
        |dd AS (
        |  SELECT doc_id, source, text,
        |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM gated),
        |tokd AS (
        |  SELECT doc_id, source,
        |    len(list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                    t -> t <> ''))::BIGINT AS n_tok,
        |    ('0x' || substring(sha256(CAST(doc_id AS VARCHAR) || ':pp'),
        |        1, 7))::BIGINT % 1000000 AS hb
        |  FROM dd WHERE rn = 1),
        |quota AS (
        |  SELECT doc_id, source, n_tok, hb FROM (
        |    SELECT *, COALESCE(CAST(SUM(n_tok) OVER (PARTITION BY source
        |      ORDER BY hb, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS cum
        |    FROM tokd) WHERE cum < 400),
        |packed AS (
        |  SELECT doc_id, source, n_tok,
        |    COALESCE(CAST(SUM(n_tok) OVER (PARTITION BY source
        |      ORDER BY hb, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS bin_offset
        |  FROM quota)
        |SELECT doc_id, source, n_tok, bin_offset // 256 AS bin, bin_offset
        |FROM packed""".stripMargin,
    "q_clustered_compaction" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        |GROUP BY 1""".stripMargin,
    "q_compact_roundtrip" ->
      "SELECT doc_id, source FROM documents",
    "q_warc_roundtrip" ->
      "SELECT doc_id, text, CAST(200 AS BIGINT) AS http_status FROM documents",
    "q_wet_roundtrip" ->
      """SELECT doc_id, coalesce(text, '') AS text,
        |  'text/plain' AS content_type FROM documents""".stripMargin,
    "q_warc_dsv2" ->
      "SELECT doc_id, text FROM documents",
    "q_warc_families" ->
      """SELECT doc_id, text, TRUE AS req_ok,
        |  coalesce(lang, 'und') AS meta_lang FROM documents""".stripMargin,

    // WAT roundtrip: every resolved outlink of the planted HTML is
    // hand-derived per resolveLink's published rules (absolute passes
    // through with &amp; decoded, relative appends to the base dir,
    // // takes the base scheme, / takes scheme+authority; fragment-only
    // and mailto: drop) — an independent witness, not a regex replay.
    "q_wat_roundtrip" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    '<html><body><a href="https://partner.example.net/p/'
        |    || doc_id::VARCHAR || '?a=1&amp;b=2">x</a><a href=''/local/'
        |    || doc_id::VARCHAR || '''>y</a><a href="rel/page'
        |    || doc_id::VARCHAR
        |    || '.html">z</a><a href="//cdn.example.org/lib.js">w</a>'
        |    || '<a href="#frag">f</a><a href="mailto:a@b.example">m</a>'
        |    || '</body></html>' AS html
        |  FROM documents),
        |links AS (
        |  SELECT doc_id, CAST(octet_length(encode(html)) AS BIGINT)
        |      AS content_length,
        |    ['https://partner.example.net/p/' || doc_id::VARCHAR
        |       || '?a=1&b=2',
        |     'https://example.org/a/rel/page' || doc_id::VARCHAR || '.html',
        |     'https://cdn.example.org/lib.js',
        |     'https://example.org/local/' || doc_id::VARCHAR] AS ls
        |  FROM docs)
        |SELECT doc_id, CAST(i - 1 AS BIGINT) AS link_pos,
        |  ls[CAST(i AS INTEGER)] AS link, content_length
        |FROM links CROSS JOIN unnest(range(1, 5)) t(i)""".stripMargin,

    // Funnel: the same progressive min-reach joins, inclusive >= ties.
    "q_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 ON s2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY e.user_id)
        |SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
        |  (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_users
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'click',
        |  (SELECT CAST(count(*) AS BIGINT) FROM s2)
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), 'purchase',
        |  (SELECT CAST(count(*) AS BIGINT) FROM s3)""".stripMargin,

    // Retention: epoch-anchored integer week buckets on both engines.
    "q_retention" ->
      """WITH pu AS (SELECT user_id AS u,
        |    CAST(floor(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      / 7.0) AS BIGINT) AS p
        |  FROM events WHERE ts IS NOT NULL),
        |coh AS (SELECT u, min(p) AS c FROM pu GROUP BY u),
        |act AS (SELECT DISTINCT u, p FROM pu),
        |sz AS (SELECT c, CAST(count(*) AS BIGINT) AS csize FROM coh GROUP BY c)
        |SELECT coh.c AS cohort_period, act.p - coh.c AS offset,
        |  CAST(count(DISTINCT act.u) AS BIGINT) AS n_users,
        |  round(CAST(count(DISTINCT act.u) AS BIGINT)
        |    / CAST(any_value(sz.csize) AS DOUBLE), 6) AS retained_frac
        |FROM act JOIN coh ON coh.u = act.u JOIN sz ON sz.c = coh.c
        |GROUP BY coh.c, act.p - coh.c""".stripMargin,

    // Sitemap: one loc per doc, &amp; decoded back to & on extraction.
    "q_sitemap" ->
      ("SELECT source, 'https://' || source || '.example.com/doc/' || doc_id " +
        "|| '&ref=sm' AS url, FALSE AS is_index FROM documents"),

    // Chunker: identical window/stride arithmetic; DuckDB list slices
    // are 1-based inclusive, matching Spark's slice(start, length).
    "q_pipeline_rag" ->
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
        |ex AS (SELECT doc_id, toks, unnest(range(0, ns)) AS s FROM st),
        |chunks AS (
        |  SELECT doc_id * 1000 + CAST(s AS BIGINT) AS id,
        |    array_to_string(toks[s * 24 + 1 : s * 24 + 32], ' ') AS ctext
        |  FROM ex),
        |c AS (
        |  SELECT id, list_transform(range(8), i ->
        |    CASE WHEN ctext IS NULL OR ctext = '' THEN 0.0
        |      ELSE ('0x' || substring(sha256(ctext),
        |        CAST(i AS INTEGER) * 8 + 1, 8))::BIGINT / 4294967295.0
        |    END) AS cv
        |  FROM chunks),
        |q AS (
        |  SELECT doc_id AS q_id, list_transform(range(8), i ->
        |    CASE WHEN text IS NULL OR text = '' THEN 0.0
        |      ELSE ('0x' || substring(sha256(text),
        |        CAST(i AS INTEGER) * 8 + 1, 8))::BIGINT / 4294967295.0
        |    END) AS qv
        |  FROM documents WHERE doc_id < 5),
        |s AS (
        |  SELECT q_id, id,
        |    list_sum(list_transform(range(len(qv)),
        |      i -> qv[CAST(i AS INTEGER)+1] * cv[CAST(i AS INTEGER)+1])) AS dot,
        |    sqrt(list_sum(list_transform(qv, x -> x * x))) AS na,
        |    sqrt(list_sum(list_transform(cv, x -> x * x))) AS nb
        |  FROM q CROSS JOIN c),
        |r AS (
        |  SELECT q_id, id,
        |    round(CASE WHEN na = 0 OR nb = 0 THEN 0.0
        |          ELSE dot / (na * nb) END, 6) AS cos
        |  FROM s),
        |w AS (
        |  SELECT q_id, id, cos, row_number() OVER (
        |    PARTITION BY q_id ORDER BY cos DESC, id ASC) AS rank
        |  FROM r)
        |SELECT q_id, id, cos, CAST(rank AS INTEGER) AS rank
        |FROM w WHERE rank <= 3""".stripMargin,

    // Crawl pipeline witness: survivors = even-length sources (the ones
    // with a graftbot group) at the stats/public paths; text carries the
    // repaired clean literal on every 7th doc; token count over the
    // final text. One divergence anywhere in the WARC/robots/mojibake
    // chain breaks the hash.
    "q_pipeline_crawl" ->
      """WITH base AS (
        |  SELECT doc_id, source,
        |    text || CASE WHEN doc_id % 7 = 0 THEN ' Café — déjà “vu” …'
        |      ELSE '' END AS text
        |  FROM documents
        |  WHERE length(source) % 2 = 0 AND doc_id % 4 IN (1, 3))
        |SELECT
        |  'https://' || source || '.example.com' ||
        |    CASE WHEN doc_id % 4 = 1 THEN '/private/stats'
        |         ELSE '/public/' || doc_id END AS url,
        |  text,
        |  CAST(len(list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |       t -> t <> '')) AS BIGINT) AS n_tok
        |FROM base""".stripMargin,

    // Robots: the oracle derives each planted case's RFC verdict from
    // the same construction (even-length sources: graftbot group —
    // /private/ blocked, /private/stats end-anchor allowed, *.zip
    // blocked, /public free; odd-length sources: deny-all * group). A
    // parse or longest-match bug on the Spark side diverges from these.
    "q_robots_filter" ->
      """SELECT doc_id,
        |  'https://' || source || '.example.com' ||
        |  CASE doc_id % 4
        |    WHEN 0 THEN '/private/' || doc_id
        |    WHEN 1 THEN '/private/stats'
        |    WHEN 2 THEN '/archive/' || doc_id || '.zip'
        |    ELSE '/public/' || doc_id END AS url,
        |  CASE WHEN length(source) % 2 = 1 THEN FALSE
        |    ELSE CASE doc_id % 4
        |      WHEN 0 THEN FALSE
        |      WHEN 1 THEN TRUE
        |      WHEN 2 THEN FALSE
        |      ELSE TRUE END END AS robots_allowed
        |FROM documents""".stripMargin,
    "q_bloom_layout" ->
      "SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 97 = 0 OR doc_id = 421",
    "q_zorder_layout" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders",
    "q_hilbert_layout" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders",

    "q_bloom_prune_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1""".stripMargin,
    "q_multimodal_meta" ->
      """WITH d AS (
        |  SELECT doc_id, encode(text) AS content, sha256(text) AS dg
        |  FROM documents)
        |SELECT doc_id,
        |  ['png', 'jpg', 'webp'][(('0x' || substring(dg, 1, 2))::INTEGER % 3) + 1]
        |    AS format,
        |  CAST(16 + (('0x' || substring(dg, 3, 2))::INTEGER % 16) * 16 AS INTEGER)
        |    AS width,
        |  CAST(16 + (('0x' || substring(dg, 5, 2))::INTEGER % 16) * 16 AS INTEGER)
        |    AS height,
        |  CAST(octet_length(content) AS BIGINT) AS n_bytes
        |FROM d""".stripMargin,
    // subsampling: 0-based positions in the hash preimage (Spark
    // posexplode convention), IEEE-exact sqrt/divide probability tree
    "q_subsample" ->
      """WITH s AS (
        |  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos,
        |    unnest(toks) AS tok
        |  FROM (SELECT doc_id, list_transform(list_filter(
        |      string_split_regex(coalesce(text, ''), '\s+'), t -> t <> ''),
        |      t -> lower(t)) AS toks
        |    FROM documents)),
        |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM s GROUP BY tok),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM s),
        |k AS (
        |  SELECT s.doc_id, s.pos, s.tok
        |  FROM s JOIN c USING (tok)
        |  WHERE (('0x' || substring(sha256('w2v' || ':' || s.doc_id::VARCHAR
        |      || ':' || s.pos::VARCHAR || ':' || s.tok), 1, 7))
        |      ::BIGINT::DOUBLE + 0.5) / 268435456.0
        |    >= greatest(0.0::DOUBLE, 1.0::DOUBLE
        |      - sqrt(0.001::DOUBLE / (cnt::DOUBLE
        |        / (SELECT total FROM tot)::DOUBLE)))),
        |agg AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos)
        |    AS text_subsampled
        |  FROM k GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.text_subsampled, '') AS text_subsampled
        |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id""".stripMargin,
    // Waterfill: same sorted-prefix pivot arithmetic; engines may
    // disagree on NEGATIVE integer division (floor vs truncate) but
    // data-constrained plan: exact LONG token counts, integer budget
    // split, and the Eq. 5 decay as the identical IEEE expression with
    // the multiplication order pinned (u + (u·15.39)·(1 − e^(−r/15.39)))
    "q_data_constrained" ->
      """WITH c AS (
        |  SELECT source AS domain,
        |    CAST(sum(len(list_filter(string_split_regex(coalesce(text, ''),
        |      '\s+'), t -> t <> ''))) AS BIGINT) AS unique_tokens
        |  FROM documents WHERE source IS NOT NULL
        |  GROUP BY source HAVING unique_tokens > 0),
        |p AS (
        |  SELECT domain, unique_tokens,
        |    CAST(400000 // (SELECT count(*) FROM c) AS BIGINT) AS alloc
        |  FROM c)
        |SELECT domain, unique_tokens, alloc AS alloc_tokens,
        |  round(CAST(alloc AS DOUBLE) / unique_tokens, 6) AS epochs,
        |  CASE WHEN alloc <= unique_tokens THEN CAST(alloc AS DOUBLE)
        |    ELSE round(unique_tokens + unique_tokens * 15.39 *
        |      (1.0 - exp(-(CAST(alloc AS DOUBLE) / unique_tokens - 1.0)
        |        / 15.39)), 6)
        |  END AS effective_tokens,
        |  CASE WHEN alloc <= unique_tokens THEN 1.0
        |    ELSE round((unique_tokens + unique_tokens * 15.39 *
        |      (1.0 - exp(-(CAST(alloc AS DOUBLE) / unique_tokens - 1.0)
        |        / 15.39))) / CAST(alloc AS DOUBLE), 6)
        |  END AS efficiency
        |FROM p""".stripMargin,
    // every negative candidate fails the prev <= cand validity gate on
    // both sides, so only the exact shared pivot survives.
    "q_waterfill" ->
      """WITH counts AS (
        |  SELECT concat_ws(':', coalesce(lang, 'und'), source) AS grp,
        |    CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |r AS (
        |  SELECT grp, n_docs,
        |    CAST(row_number() OVER (ORDER BY n_docs, grp) AS BIGINT) AS k,
        |    COALESCE(CAST(sum(n_docs) OVER (ORDER BY n_docs, grp
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |      0) AS excl,
        |    lag(n_docs, 1, 0) OVER (ORDER BY n_docs, grp) AS prev,
        |    CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM counts),
        |w AS (SELECT *, (300 - excl) // (n - k + 1) AS cand FROM r),
        |cap AS (SELECT min(cand) AS c FROM w
        |  WHERE prev <= cand AND cand < n_docs)
        |SELECT grp, n_docs,
        |  CAST(CASE WHEN (SELECT c FROM cap) IS NULL THEN n_docs
        |    ELSE LEAST(n_docs, (SELECT c FROM cap)) END AS BIGINT) AS alloc
        |FROM w""".stripMargin,
    // Split-leakage twin: the dedup-clusters LSH head (same planting,
    // same minhash/banding SQL) + the q_hash_split bucket idiom on both
    // keys, counted in one aggregate.
    "q_split_leakage" ->
      """WITH corpus AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text || ' extra extra', source
        |  FROM documents WHERE doc_id % 10 = 0),
        |toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                t -> t <> '') AS toks
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
        |      i -> array_to_string(toks[i:i+2], ' ')) AS shingles
        |  FROM toks WHERE len(toks) > 0),
        |h AS (
        |  SELECT doc_id,
        |    ('0x' || substring(sha256(s), 1, 7))::BIGINT % 268435399 AS h
        |  FROM sh CROSS JOIN unnest(shingles) AS u(s)),
        |minh AS (
        |  SELECT doc_id, CAST(p AS INTEGER) AS p,
        |    min((h * (2 * p + 1) + p * 7919) % 268435399) AS mh
        |  FROM h CROSS JOIN range(16) t(p)
        |  GROUP BY doc_id, p),
        |sig AS (SELECT doc_id, list(mh ORDER BY p) AS sig FROM minh GROUP BY doc_id),
        |bandh AS (
        |  SELECT doc_id, b,
        |    ('0x' || substring(sha256(
        |      array_to_string(sig[CAST(b AS INTEGER)*4+1 : CAST(b AS INTEGER)*4+4], ',')),
        |      1, 15))::BIGINT AS bh
        |  FROM sig CROSS JOIN range(4) t(b)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
        |  FROM bandh a JOIN bandh c ON a.b = c.b AND a.bh = c.bh
        |  WHERE a.doc_id < c.doc_id),
        |est AS (
        |  SELECT cand.id_a, cand.id_b,
        |    round(len(list_filter(range(16),
        |      i -> s1.sig[CAST(i AS INTEGER)+1] = s2.sig[CAST(i AS INTEGER)+1]))
        |      / 16.0, 6) AS est_jaccard
        |  FROM cand
        |  JOIN sig s1 ON s1.doc_id = cand.id_a
        |  JOIN sig s2 ON s2.doc_id = cand.id_b),
        |pairs AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.5),
        |sp AS (
        |  SELECT doc_id,
        |    CASE WHEN ('0x' || substring(sha256(
        |        CAST(doc_id AS VARCHAR) || ':sl'), 1, 7))::BIGINT
        |        % 1000000 < 800000 THEN 'train' ELSE 'eval' END AS rs,
        |    CASE WHEN ('0x' || substring(sha256(
        |        source || ':sl'), 1, 7))::BIGINT
        |        % 1000000 < 800000 THEN 'train' ELSE 'eval' END AS ds
        |  FROM corpus)
        |SELECT count(*)::BIGINT AS n_pairs,
        |  CAST(count(CASE WHEN a.rs <> b.rs THEN 1 END) AS BIGINT)
        |    AS row_cross,
        |  CAST(count(CASE WHEN a.ds <> b.ds THEN 1 END) AS BIGINT)
        |    AS domain_cross
        |FROM pairs
        |JOIN sp a ON a.doc_id = pairs.id_a
        |JOIN sp b ON b.doc_id = pairs.id_b""".stripMargin,
    // Span-corruption twin: the same sha-derived block draws (len
    // repeated inline — DuckDB list lambdas have no let-binding), list
    // indexing past the spans returns NULL so the CASE falls through
    // to the raw token exactly like the guarded Spark branches.
    "q_span_corruption" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                t -> t <> '') AS t
        |  FROM documents),
        |s0 AS (
        |  SELECT doc_id, t, len(t) AS n,
        |    CASE WHEN len(t) >= 20 THEN
        |      list_transform(range(len(t) // 20), b -> struct_pack(
        |        s := CAST(b * 20 +
        |          ('0x' || substring(sha256('t5:' || doc_id::VARCHAR ||
        |            ':' || b::VARCHAR || ':off'), 1, 15))::BIGINT %
        |          (20 - (1 + ('0x' || substring(sha256('t5:' ||
        |            doc_id::VARCHAR || ':' || b::VARCHAR || ':len'), 1,
        |            15))::BIGINT % 5) + 1) AS INTEGER),
        |        e := CAST(b * 20 +
        |          ('0x' || substring(sha256('t5:' || doc_id::VARCHAR ||
        |            ':' || b::VARCHAR || ':off'), 1, 15))::BIGINT %
        |          (20 - (1 + ('0x' || substring(sha256('t5:' ||
        |            doc_id::VARCHAR || ':' || b::VARCHAR || ':len'), 1,
        |            15))::BIGINT % 5) + 1) +
        |          1 + ('0x' || substring(sha256('t5:' ||
        |            doc_id::VARCHAR || ':' || b::VARCHAR || ':len'), 1,
        |            15))::BIGINT % 5 AS INTEGER)))
        |    ELSE [] END AS sp
        |  FROM d)
        |SELECT doc_id,
        |  coalesce(array_to_string(list_filter(list_transform(range(n), p ->
        |    CASE WHEN p = sp[CAST(p // 20 AS INTEGER) + 1].s
        |           THEN '<extra_id_' || (p // 20)::VARCHAR || '>'
        |         WHEN p >= sp[CAST(p // 20 AS INTEGER) + 1].s AND
        |              p < sp[CAST(p // 20 AS INTEGER) + 1].e THEN ''
        |         ELSE t[CAST(p AS INTEGER) + 1] END),
        |    x -> x <> ''), ' '), '') AS input_text,
        |  coalesce(array_to_string(list_filter(list_transform(range(n), p ->
        |    CASE WHEN p = sp[CAST(p // 20 AS INTEGER) + 1].s
        |           THEN '<extra_id_' || (p // 20)::VARCHAR || '> ' ||
        |             t[CAST(p AS INTEGER) + 1]
        |         WHEN p >= sp[CAST(p // 20 AS INTEGER) + 1].s AND
        |              p < sp[CAST(p // 20 AS INTEGER) + 1].e
        |           THEN t[CAST(p AS INTEGER) + 1]
        |         ELSE '' END),
        |    x -> x <> ''), ' '), '') AS target_text,
        |  CAST(len(sp) AS BIGINT) AS n_spans,
        |  CAST(coalesce(list_sum(list_transform(sp, x -> x.e - x.s)), 0)
        |    AS BIGINT) AS n_masked
        |FROM s0""".stripMargin,
    // FIM twin: same sha cut points and gate, DuckDB 1-based inclusive
    // list slices mirror Spark's slice(start, length) exactly.
    "q_fim" ->
      """WITH d AS (
        |  SELECT doc_id, coalesce(text, '') AS text,
        |    list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                t -> t <> '') AS t
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, text, t, len(t) AS n,
        |    ('0x' || substring(sha256('fim:' || doc_id::VARCHAR || ':1'),
        |      1, 15))::BIGINT % (len(t) + 1) AS h1,
        |    ('0x' || substring(sha256('fim:' || doc_id::VARCHAR || ':2'),
        |      1, 15))::BIGINT % (len(t) + 1) AS h2,
        |    ('0x' || substring(sha256('fim:' || doc_id::VARCHAR ||
        |      ':gate'), 1, 15))::BIGINT % 1000000 < 500000 AS g
        |  FROM d),
        |s AS (
        |  SELECT doc_id, text, t, n, g,
        |    least(h1, h2) AS lo, greatest(h1, h2) AS hi
        |  FROM c)
        |SELECT doc_id,
        |  CASE WHEN g THEN array_to_string(
        |    ['<fim_prefix>'] || t[1:lo] || ['<fim_suffix>'] ||
        |    t[hi+1:n] || ['<fim_middle>'] || t[lo+1:hi], ' ')
        |  ELSE text END AS fim_text,
        |  g AS is_fim,
        |  CASE WHEN g THEN CAST(lo AS BIGINT) END AS n_prefix,
        |  CASE WHEN g THEN CAST(hi - lo AS BIGINT) END AS n_middle,
        |  CASE WHEN g THEN CAST(n - hi AS BIGINT) END AS n_suffix
        |FROM s""".stripMargin,
    // Shard assignment: the oracle rebuilds the two-phase global cumsum
    // verbatim — 60-bit order hash, order buckets, exclusive in-bucket
    // window sums, bucket-offset prefix sums, integer-division cut.
    "q_shard_assign" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    ('0x' || substring(sha256(CAST(doc_id AS VARCHAR)
        |        || ':graft-shard'), 1, 15))::BIGINT AS hh
        |  FROM documents),
        |b AS (SELECT doc_id, n_chars, hh, hh % 32 AS ob FROM h),
        |c AS (SELECT doc_id, ob,
        |    COALESCE(CAST(sum(n_chars) OVER (PARTITION BY ob
        |      ORDER BY hh, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |      0) AS cum
        |  FROM b),
        |t AS (SELECT ob, CAST(sum(n_chars) AS BIGINT) AS tot
        |  FROM b GROUP BY ob),
        |o AS (SELECT ob,
        |    COALESCE(CAST(sum(tot) OVER (ORDER BY ob
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |      0) AS off
        |  FROM t),
        |g AS (SELECT (CAST(sum(n_chars) AS BIGINT) + 7) // 8 AS target
        |  FROM documents)
        |SELECT c.doc_id,
        |  CAST(LEAST(7, (c.cum + o.off) // (SELECT target FROM g))
        |    AS BIGINT) AS shard
        |FROM c JOIN o USING (ob)""".stripMargin,
    "q_hash_split" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    ('0x' || substring(sha256(CAST(doc_id AS VARCHAR) || ':graft'),
        |        1, 7))::BIGINT % 1000000 AS b
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN b < 800000 THEN 'train'
        |       WHEN b < 900000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM w""".stripMargin,
    "q_token_budget" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    len(list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                    t -> t <> ''))::BIGINT AS n_tok,
        |    ('0x' || substring(sha256(CAST(doc_id AS VARCHAR) || ':tb'),
        |        1, 7))::BIGINT % 1000000 AS hb
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tok,
        |    COALESCE(CAST(SUM(n_tok) OVER (PARTITION BY source
        |      ORDER BY hb, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS cum
        |  FROM d)
        |SELECT doc_id, source, n_tok FROM c WHERE cum < 600""".stripMargin,
    "q_weighted_sample" ->
      """WITH w AS (
        |  SELECT source, doc_id, n_chars,
        |    ln((('0x' || substring(sha256(doc_id::VARCHAR || ':ws1'), 1, 7))
        |        ::BIGINT + 1)::DOUBLE / 268435456.0) / n_chars::DOUBLE AS sk
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        |r AS (
        |  SELECT source, doc_id, n_chars, row_number() OVER (
        |    PARTITION BY source ORDER BY sk DESC, doc_id) AS rk
        |  FROM w)
        |SELECT source, doc_id, n_chars FROM r WHERE rk <= 20""".stripMargin,
    "q_quota_per_group" ->
      """SELECT doc_id, source, lang FROM (
        |  SELECT doc_id, source, lang,
        |    row_number() OVER (PARTITION BY source, lang ORDER BY doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 8""".stripMargin,
    "q_stratified_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    ('0x' || substring(sha256(CAST(doc_id AS VARCHAR) || ':graft'),
        |        1, 7))::BIGINT % 1000000 AS b
        |  FROM documents)
        |WHERE b < CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 250000
        |           ELSE 100000 END""".stripMargin,
    "q_mixture_sample" ->
      """WITH c AS (
        |  SELECT source, count(*)::DOUBLE AS c FROM documents
        |  WHERE source IN ('src1', 'src2', 'src3') GROUP BY source),
        |w AS (
        |  SELECT source, c,
        |    (CASE source WHEN 'src1' THEN 0.5
        |                 WHEN 'src2' THEN 0.3 ELSE 0.2 END)::DOUBLE AS w
        |  FROM c),
        |n AS (SELECT floor(min(c / w)) AS n FROM w),
        |cuts AS (
        |  SELECT w.source,
        |    round(least(n.n * w.w / w.c, 1.0) * 1000000.0) AS cut
        |  FROM w, n)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN cuts ON d.source = cuts.source
        |WHERE ('0x' || substring(sha256(CAST(d.doc_id AS VARCHAR) || ':graft'),
        |       1, 7))::BIGINT % 1000000 < cuts.cut""".stripMargin,
    "q_alpha_mixture" ->
      """WITH c AS (
        |  SELECT lang, count(*)::BIGINT AS c FROM documents
        |  WHERE lang IS NOT NULL GROUP BY lang),
        |p AS (
        |  SELECT lang, c,
        |    CAST(round(pow(c * 1.0, 0.3) * 1000000.0) AS BIGINT) AS pw
        |  FROM c),
        |s AS (SELECT CAST(sum(pw) AS BIGINT) AS s FROM p),
        |w AS (SELECT lang, c * 1.0 AS c, pw * 1.0 / s.s AS w FROM p, s),
        |n AS (SELECT floor(min(c / w)) AS n FROM w),
        |cuts AS (
        |  SELECT w.lang, round(least(n.n * w.w / w.c, 1.0) * 1000000.0) AS cut
        |  FROM w, n)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN cuts ON d.lang = cuts.lang
        |WHERE ('0x' || substring(sha256(CAST(d.doc_id AS VARCHAR) || ':graft'),
        |       1, 7))::BIGINT % 1000000 < cuts.cut""".stripMargin,
    "q_corpus_shuffle" ->
      """SELECT doc_id, source,
        |  row_number() OVER (
        |    ORDER BY sha256('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id)
        |    - 1 AS pos
        |FROM documents""".stripMargin,
    "q_pack_sequences" ->
      """WITH tok AS (
        |  SELECT doc_id, source,
        |    len(list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                    t -> t <> '')) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tok,
        |    CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS bin_offset
        |  FROM tok)
        |SELECT doc_id, source, n_tok, bin_offset,
        |  CAST(floor(bin_offset / 1024) AS BIGINT) AS bin
        |FROM c""".stripMargin,
    "q_asof_join" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
        |s AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(value) AS snap_value
        |  FROM events WHERE event_id % 10 = 0
        |  GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts_us, s.snap_value
        |FROM e ASOF LEFT JOIN s
        |  ON e.user_id = s.user_id AND e.ts_us >= s.ts_us""".stripMargin,
    "q_asof_tolerance" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
        |s AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(value) AS snap_value
        |  FROM events WHERE event_id % 10 = 0
        |  GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts_us,
        |  CASE WHEN s.ts_us IS NOT NULL AND e.ts_us - s.ts_us <= 60000000
        |       THEN s.snap_value END AS snap_value
        |FROM e ASOF LEFT JOIN s
        |  ON e.user_id = s.user_id AND e.ts_us >= s.ts_us""".stripMargin,
    "q_asof_forward" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
        |s AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(value) AS snap_value
        |  FROM events WHERE event_id % 10 = 0
        |  GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts_us, s.snap_value
        |FROM e ASOF LEFT JOIN s
        |  ON e.user_id = s.user_id AND e.ts_us <= s.ts_us""".stripMargin,
    "q_frame_sample" ->
      """WITH d AS (SELECT doc_id, hex(encode(text)) AS h FROM documents),
        |f AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        |    substring(h, CAST(i AS INTEGER) * 32 + 1, 32) AS frame_hex
        |  FROM d CROSS JOIN range(3) t(i))
        |SELECT doc_id, frame_idx, frame_hex
        |FROM f WHERE length(frame_hex) > 0""".stripMargin,
    "q_image_phash" ->
      """WITH d AS (SELECT doc_id, hex(encode(text)) AS h,
        |    octet_length(encode(text)) AS nb FROM documents),
        |cells AS (
        |  SELECT doc_id, i,
        |    COALESCE(TRY_CAST('0x' || substring(h,
        |      CAST((i * nb) // 60 AS INTEGER) * 2 + 1, 2)
        |      AS BIGINT), 0) AS c
        |  FROM d CROSS JOIN range(60) t(i)),
        |med AS (
        |  SELECT doc_id, arr[31] AS m FROM (
        |    SELECT doc_id, list_sort(list(c)) AS arr
        |    FROM cells GROUP BY doc_id)),
        |bits AS (
        |  SELECT cells.doc_id,
        |    CAST(SUM(CASE WHEN c > m
        |             THEN (1::BIGINT << CAST(i AS INTEGER)) ELSE 0 END)
        |      AS BIGINT) AS v
        |  FROM cells JOIN med USING (doc_id) GROUP BY cells.doc_id)
        |SELECT d.doc_id, COALESCE(bits.v, 0)::BIGINT AS phash
        |FROM d LEFT JOIN bits USING (doc_id)""".stripMargin,
    "q_image_near_dup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    substring(text, 1, length(text) - 3) || 'xyz'
        |  FROM documents WHERE doc_id % 10 = 0),
        |d AS (SELECT doc_id, hex(encode(text)) AS h,
        |    octet_length(encode(text)) AS nb FROM corpus),
        |cells AS (
        |  SELECT doc_id, i,
        |    COALESCE(TRY_CAST('0x' || substring(h,
        |      CAST((i * nb) // 60 AS INTEGER) * 2 + 1, 2)
        |      AS BIGINT), 0) AS c
        |  FROM d CROSS JOIN range(60) t(i)),
        |med AS (
        |  SELECT doc_id, arr[31] AS m FROM (
        |    SELECT doc_id, list_sort(list(c)) AS arr
        |    FROM cells GROUP BY doc_id)),
        |ah AS (
        |  SELECT cells.doc_id,
        |    CAST(SUM(CASE WHEN c > m
        |             THEN (1::BIGINT << CAST(i AS INTEGER)) ELSE 0 END)
        |      AS BIGINT) AS sh
        |  FROM cells JOIN med USING (doc_id) GROUP BY cells.doc_id),
        |bands AS (
        |  SELECT doc_id, sh, b, (sh >> (CAST(b AS INTEGER) * 10)) & 1023 AS bv
        |  FROM ah CROSS JOIN range(6) t(b)
        |  WHERE sh <> 0)
        |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |  bit_count(xor(a.sh, b.sh)) AS hamming
        |FROM bands a JOIN bands b
        |  ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 5""".stripMargin,
    "q_frame_near_dup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    substring(text, 1, length(text) - 3) || 'xyz'
        |  FROM documents WHERE doc_id % 10 = 0),
        |d AS (SELECT doc_id, hex(encode(text)) AS h FROM corpus),
        |fr AS (
        |  SELECT doc_id * 10 + i AS fid,
        |    substring(h, CAST(i AS INTEGER) * 128 + 1, 128) AS fh
        |  FROM d CROSS JOIN range(3) t(i)),
        |fr2 AS (
        |  SELECT fid, fh, length(fh) // 2 AS nb
        |  FROM fr WHERE length(fh) > 0),
        |cells AS (
        |  SELECT fid, c,
        |    COALESCE(TRY_CAST('0x' || substring(fh,
        |      CAST((c * nb) // 60 AS INTEGER) * 2 + 1, 2)
        |      AS BIGINT), 0) AS v
        |  FROM fr2 CROSS JOIN range(60) t(c)),
        |med AS (
        |  SELECT fid, arr[31] AS m FROM (
        |    SELECT fid, list_sort(list(v)) AS arr
        |    FROM cells GROUP BY fid)),
        |ah AS (
        |  SELECT cells.fid,
        |    CAST(SUM(CASE WHEN v > m
        |             THEN (1::BIGINT << CAST(c AS INTEGER)) ELSE 0 END)
        |      AS BIGINT) AS sh
        |  FROM cells JOIN med USING (fid) GROUP BY cells.fid),
        |bands AS (
        |  SELECT fid, sh, b, (sh >> (CAST(b AS INTEGER) * 10)) & 1023 AS bv
        |  FROM ah CROSS JOIN range(6) t(b)
        |  WHERE sh <> 0)
        |SELECT DISTINCT a.fid AS id_a, b.fid AS id_b,
        |  bit_count(xor(a.sh, b.sh)) AS hamming
        |FROM bands a JOIN bands b
        |  ON a.b = b.b AND a.bv = b.bv AND a.fid < b.fid
        |WHERE bit_count(xor(a.sh, b.sh)) <= 5""".stripMargin,
    "q_event_windows" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start,
        |  event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin,
    "q_sliding_windows" ->
      """WITH ev AS (
        |  SELECT epoch_us(ts) AS us, event_type, value FROM events),
        |off AS (SELECT unnest([0, 1, 2, 3]) AS i),
        |w AS (
        |  SELECT ((us // 900000000) - i) * 900000000 AS ws_us,
        |    event_type, value
        |  FROM ev CROSS JOIN off)
        |SELECT ws_us // 1000000 AS window_start, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM w GROUP BY 1, 2""".stripMargin,
    "q_interval_join" ->
      """WITH l AS (
        |  SELECT event_id AS l_event_id, user_id, epoch_us(ts) AS l_us
        |  FROM events WHERE event_id % 10 = 0),
        |r AS (
        |  SELECT event_id AS r_event_id, user_id, epoch_us(ts) AS r_us
        |  FROM events)
        |SELECT l_event_id, r_event_id
        |FROM l JOIN r USING (user_id)
        |WHERE r_us >= l_us - 600000000 AND r_us <= l_us""".stripMargin,
    "q_sessionize" ->
      """WITH d AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events),
        |b AS (
        |  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER
        |      (PARTITION BY user_id ORDER BY ts_us, event_id)
        |      > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM d),
        |g AS (
        |  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_us,
        |    event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS sid
        |  FROM b)
        |SELECT user_id, min(ts_us) AS session_start,
        |  max(ts_us) AS session_end,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM g GROUP BY user_id, sid""".stripMargin,
    "q_assoc_rules" ->
      """WITH si AS (
        |  SELECT DISTINCT user_id AS s, event_type AS i FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |t AS (SELECT CAST(count(DISTINCT s) AS BIGINT) AS n FROM si),
        |itn AS (SELECT i, CAST(count(*) AS BIGINT) AS ni FROM si GROUP BY i),
        |p AS (
        |  SELECT a.i AS antecedent, b.i AS consequent,
        |    CAST(count(*) AS BIGINT) AS n_both
        |  FROM si a JOIN si b ON a.s = b.s AND a.i <> b.i
        |  GROUP BY 1, 2)
        |SELECT antecedent, consequent, n AS n_sessions, n_both,
        |  (n_both * 1000000) // n AS support_micros,
        |  (n_both * 1000000) // na.ni AS confidence_micros,
        |  round(CAST(n_both * n AS DOUBLE) / (na.ni * nb.ni), 6) AS lift
        |FROM p
        |CROSS JOIN t
        |JOIN itn na ON na.i = p.antecedent
        |JOIN itn nb ON nb.i = p.consequent""".stripMargin,
    "q_path_ngrams" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    coalesce(event_type, '(null)') AS t
        |  FROM events),
        |g AS (
        |  SELECT t || ' > ' || lead(t, 1) OVER w || ' > '
        |      || lead(t, 2) OVER w AS ngram,
        |    lead(t, 1) OVER w AS l1, lead(t, 2) OVER w AS l2
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        |SELECT ngram, CAST(count(*) AS BIGINT) AS n_occurrences
        |FROM g WHERE l1 IS NOT NULL AND l2 IS NOT NULL
        |GROUP BY ngram""".stripMargin,
  )
}
