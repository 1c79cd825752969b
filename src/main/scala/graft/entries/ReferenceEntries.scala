package graft
package entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.operators.{DataFrameUtils, Transformations}

import EntryHelpers._

/** [[graft.SparkEntry]] reference-surface queries: TPC-H-style aggregation, column transforms, date/time dimensions, SCD upserts, connectors, LLM transforms, the similarity pipeline — one `queries` entry per operator,
  * with its DuckDB `oracleSql` twin where SQL-expressible. Split from
  * the single SparkEntry object for reviewability; [[graft.SparkEntry]]
  * composes every domain object's maps (duplicate keys across files are
  * linted by RowsOnlyLedgerSpec).
  */
private[graft] object ReferenceEntries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // ---- P1 renameColumns + P3 castColumns + P2 withConstants ----
    "q_rename_cast_constants" -> ((s, dir) => {
      val renamed = Transformations.renameColumns(
        t(s, dir, "nation"),
        Map("n_nationkey" -> "nation_id", "n_name" -> "nation_name"))
      val cast = Transformations.castColumns(renamed, Map("nation_id" -> "bigint"))
      Transformations.withConstants(cast, Seq("source_system" -> "graft"))
    }),

    // ---- F2 normalizeWhitespace over documents.text ----
    "q_normalize_whitespace" -> ((s, dir) => {
      Transformations
        .normalizeWhitespace(
          t(s, dir, "documents").select(col("doc_id"), col("text")),
          Seq("text"))
        .withColumnRenamed("text", "text_norm")
    }),

    // ---- Unicode hygiene: NFC + mark stripping over a corpus with
    // planted mixed-normalization text (decomposed accents, precomposed
    // accents, Indic matras, non-decomposable ø/ß) ----
    "q_unicode_fold" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.where(col("doc_id") % 25 === 0).select(
        (col("doc_id") + 3000000).as("doc_id"),
        concat(lit(unicodePlant), coalesce(col("text"), lit(""))).as("text"))
      val corpus = docs.unionAll(planted)
      corpus.select(col("doc_id"),
        graft.functions.UnicodeFunctions.normalizeNfc(col("text")).as("nfc_text"),
        graft.functions.UnicodeFunctions.foldMarks(col("text")).as("folded"))
    }),

    // ---- F3/P7 splitByDateFormats over a mixed-format date string ----
    "q_split_date_formats" -> ((s, dir) => {
      val src = t(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_orderkey") % 3 === 0, date_format(col("o_orderdate"), "yyyy-MM-dd"))
          .when(col("o_orderkey") % 3 === 1, date_format(col("o_orderdate"), "MM/dd/yyyy"))
          .otherwise(concat(lit("junk-"), col("o_orderkey").cast("string")))
          .as("d"))
      Transformations
        .splitByDateFormats(src, "d", Seq("yyyy-MM-dd", "MM/dd/yyyy"))
        .df
    }),

    // ---- F5/F7 createDateDataframe calendar dimension ----
    "q_date_dim" -> ((s, _) =>
      DataFrameUtils.createDateDataframe(s, "2024-01-01", "2024-12-31")),

    // ---- F6/F7 createTimeDataframe clock dimension ----
    "q_time_dim" -> ((s, _) =>
      DataFrameUtils.createTimeDataframe(s, "00:00:00", "23:59:00", 60)),

    // ---- F1 deterministic row hash ----
    "q_row_hash" -> ((s, dir) => {
      t(s, dir, "nation").select(
        col("n_nationkey"),
        Hashing.rowHashOf(Seq("n_name", "n_regionkey")).as("row_hash"))
    }),

    // ---- C1 SCD1 current-only upsert (two batches into a parquet target) ----
    "q_scd1_current_only" -> ((s, dir) => {
      val base = t(s, dir, "customer").select(
        col("c_custkey").as("id"),
        col("c_name").as("name"),
        col("c_mktsegment").as("segment"))
      val b2 = base.where(col("id") % 3 === 0)
        .withColumn("segment", lit("UPDATED"))
      val target = scratchDir("graft_scd1_") + "/t"
      ct.ChangeTracking.currentOnlyUpsert(s, base, target, Seq("id"))
      ct.ChangeTracking.currentOnlyUpsert(s, b2, target, Seq("id"))
      s.read.parquet(target)
    }),

    // ---- C1 + bucketed target: merges prune + rewrite only touched
    // hash-buckets of the target (the 100 TB path; same logical contract)
    "q_scd1_bucketed" -> ((s, dir) => {
      val base = t(s, dir, "customer").select(
        col("c_custkey").as("id"),
        col("c_name").as("name"),
        col("c_mktsegment").as("segment"))
      val b2 = base.where(col("id") % 3 === 0)
        .withColumn("segment", lit("UPDATED"))
      val target = scratchDir("graft_scd1b_") + "/t"
      ct.ChangeTracking.currentOnlyUpsert(s, base, target, Seq("id"),
        numBuckets = Some(16))
      ct.ChangeTracking.currentOnlyUpsert(s, b2, target, Seq("id"),
        numBuckets = Some(16))
      s.read.parquet(target).drop(ct.TableStore.BucketCol)
    }),

    // ---- C2 SCD2 track-history upsert (bootstrap + changed-subset batch) ----
    "q_scd2_track_history" -> ((s, dir) => {
      val b1 = t(s, dir, "orders").select(
        col("o_orderkey").as("id"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").cast("decimal(12,2)").as("price"))
      val b2 = b1.where(col("id") % 2 === 0)
        .withColumn("price",
          when(col("id") % 10 === 0, (col("price") + lit(10)).cast("decimal(12,2)"))
            .otherwise(col("price")))
      val target = scratchDir("graft_scd2_") + "/t"
      ct.ChangeTracking.trackHistoryUpsert(s, b1, target, Seq("id"),
        loadTsExpr = Some("to_timestamp('2020-01-01 00:00:00')"))
      ct.ChangeTracking.trackHistoryUpsert(s, b2, target, Seq("id"),
        loadTsExpr = Some("to_timestamp('2020-02-01 00:00:00')"))
      // timestamps → epoch µs (NULL open-row expiry → -1) and decimal →
      // integer cents: the oracle compare is only precision-stable on
      // integers (a DECIMAL '100.10' read back through float prints
      // '100.1' and breaks the value hash)
      s.read.parquet(target).select(
        col("id"), col("status"),
        (col("price") * 100).cast("long").as("price_cents"), col("row_hash"),
        unix_micros(col("effective_start_ts")).as("start_us"),
        coalesce(unix_micros(col("effective_end_ts")), lit(-1L)).as("end_us"),
        col("is_current"), col("version"))
    }),

    // ---- SCD2 time travel: the as-of snapshot between the two batches
    // must reproduce batch 1 exactly (every key at version 1) ----
    "q_scd2_asof" -> ((s, dir) => {
      val b1 = t(s, dir, "orders").select(
        col("o_orderkey").as("id"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").cast("decimal(12,2)").as("price"))
      val b2 = b1.where(col("id") % 2 === 0)
        .withColumn("price",
          when(col("id") % 10 === 0, (col("price") + lit(10)).cast("decimal(12,2)"))
            .otherwise(col("price")))
      val target = scratchDir("graft_scd2asof_") + "/t"
      ct.ChangeTracking.trackHistoryUpsert(s, b1, target, Seq("id"),
        loadTsExpr = Some("to_timestamp('2020-01-01 00:00:00')"))
      ct.ChangeTracking.trackHistoryUpsert(s, b2, target, Seq("id"),
        loadTsExpr = Some("to_timestamp('2020-02-01 00:00:00')"))
      ct.ChangeTracking.asOf(s, target,
          to_timestamp(lit("2020-01-15 00:00:00")))
        .select(col("id"), col("status"),
          (col("price") * 100).cast("long").as("price_cents"),
          col("version"))
    }),

    // ---- warehouse witness: SCD2 history + as-of join = point-in-time
    // fact enrichment. Facts straddle both dimension versions; only the
    // ids whose hash actually changed (id % 10 = 0 price bump) may pick
    // version 2 — the composition oracle encodes exactly that ----
    "q_pipeline_scd_enrich" -> ((s, dir) => {
      val b1 = t(s, dir, "orders").select(
        col("o_orderkey").as("id"),
        col("o_orderstatus").as("status"),
        col("o_totalprice").cast("decimal(12,2)").as("price"))
      val b2 = b1.where(col("id") % 2 === 0)
        .withColumn("price",
          when(col("id") % 10 === 0, (col("price") + lit(10)).cast("decimal(12,2)"))
            .otherwise(col("price")))
      val target = scratchDir("graft_scdenrich_") + "/t"
      ct.ChangeTracking.trackHistoryUpsert(s, b1, target, Seq("id"),
        loadTsExpr = Some("to_timestamp('2020-01-01 00:00:00')"))
      ct.ChangeTracking.trackHistoryUpsert(s, b2, target, Seq("id"),
        loadTsExpr = Some("to_timestamp('2020-02-01 00:00:00')"))
      val hist = s.read.parquet(target).select(col("id"),
        unix_micros(col("effective_start_ts")).as("ts_us"),
        col("version"), col("status"),
        (col("price") * 100).cast("long").as("price_cents"))
      val facts = t(s, dir, "orders").where(col("o_orderkey") < 500)
        .select(col("o_orderkey").as("id"),
          when(col("o_orderkey") % 3 === 0,
            unix_micros(to_timestamp(lit("2020-01-15 00:00:00"))))
            .otherwise(unix_micros(to_timestamp(lit("2020-02-15 00:00:00"))))
            .as("ts_us"))
      operators.AsofJoin.asofJoin(facts, hist, Seq("id"), "ts_us",
          valueCols = Seq("version", "status", "price_cents"))
        .select(col("id"), col("ts_us"), col("version"), col("status"),
          col("price_cents"))
    }),

    // ---- U3 deterministic hash embedding (pure column expressions) ----
    "q_hash_embedding" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        posexplode(similarity.HashEmbedding.hashToVector(
          col("text"), dims = 8, normalize = false)))
        .withColumnRenamed("pos", "dim")
        .withColumnRenamed("col", "val")
    }),

    // ---- M1-M6/W3-W4 similarity pipeline: KMeans + representative choice
    // (not SQL-expressible → rows-only check; seeded for determinism) ----
    "q_cluster_representatives" -> ((s, dir) => {
      val pipeline = similarity.SimilarityPipeline(
        similarity.IdentityEmbeddingGenerator(inputCol = "embedding"),
        similarity.KMeansPartitioner(k = 8, seed = Some(42L)),
        Some(similarity.CosineSimilarity()),
        Some(similarity.MaxColumnChoice("label")))
      val clustered = pipeline.run(t(s, dir, "embeddings"))
      pipeline.selectRepresentatives(clustered)
        .select(col("vec_id"), col("cluster_id"), col("label"))
    }),

    // ---- S1/S2 DSv2 REST source vs in-process fixture server ----
    "q_rest_read" -> ((s, _) => {
      val base = io.DemoServers.restServer()
      s.read.format("graft-rest")
        .schema("id LONG, name STRING, score LONG")
        .option("graft.rest.config",
          s"""{"sources": "$base/items",
             | "pagination": {"mode": "query", "param": "page",
             |                "start": 1, "stop": 3},
             | "records_field": "data", "parallelism": 3}""".stripMargin)
        .load()
    }),

    // ---- S8-S9 DSv2 SPARQL source vs in-process fixture server ----
    "q_sparql_read" -> ((s, _) => {
      val base = io.DemoServers.sparqlServer()
      s.read.format("graft-sparql")
        .option("graft.sparql.config",
          s"""{"endpoint": "$base/sparql",
             | "queries": "SELECT ?city ?population WHERE { }"}""".stripMargin)
        .load()
    }),

    // ---- S13-S15 DSv2 Qdrant write + scroll read round trip ----
    "q_qdrant_roundtrip" -> ((s, dir) => {
      val base = io.DemoServers.qdrantServer()
      val src = t(s, dir, "embeddings").where(col("vec_id") < 6)
        .select(col("vec_id").as("id"),
          transform(col("embedding"), x => round(x.cast("double"), 3))
            .as("vector"),
          concat(lit("v"), col("vec_id")).as("name"))
      src.coalesce(1).write.format("graft-qdrant")
        .option("graft.qdrant.config",
          s"""{"endpoint": "$base", "collection": "demo",
             | "payload_format": "points", "write_method": "put"}""".stripMargin)
        .mode("append").save()
      s.read.format("graft-qdrant")
        .schema("id LONG, payload STRUCT<name: STRING>")
        .option("graft.qdrant.config",
          s"""{"endpoint": "$base", "collection": "demo",
             | "with_vectors": false}""".stripMargin)
        .load()
        .select(col("id"), col("payload.name").as("name"))
    }),

    // ---- U2 LLM column mapping (deterministic dry-run path) ----
    "q_llm_map_dry_run" -> ((s, dir) => {
      llm.Llm.mapColumnWithLlm(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "lang", Seq("EN", "DE", "FR", "ES"), dryRun = true)
        .df.select(col("doc_id"), col("lang"), col("lang_mapped"))
    }),

    // ---- U1 batched pluggable embeddings (hash stub, chunking plumbing) ----
    "q_llm_embeddings" -> ((s, dir) => {
      llm.Llm.withEmbeddings(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "text", () => llm.HashEmbeddingsClient(dims = 8, normalize = true),
        batchSize = 16)
        .select(col("doc_id"), posexplode(col("embedding")))
        .withColumnRenamed("pos", "dim")
        .withColumnRenamed("col", "val")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_rename_cast_constants" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS nation_id, n_name AS nation_name,
        |  n_regionkey, 'graft' AS source_system
        |FROM nation""".stripMargin,
    "q_normalize_whitespace" ->
      """SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS text_norm
        |FROM documents""".stripMargin,
    // the planted prefix is interpolated from the SAME Scala constant the
    // query uses, so both engines see byte-identical input; DuckDB's
    // nfc_normalize/strip_accents are the utf8proc semantics StripMarks
    // implements (NFD, drop Mn/Mc/Me, NFC)
    "q_unicode_fold" ->
      s"""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000, '$unicodePlant' || coalesce(text, '')
        |  FROM documents WHERE doc_id % 25 = 0)
        |SELECT doc_id, nfc_normalize(text) AS nfc_text,
        |  strip_accents(nfc_normalize(text)) AS folded
        |FROM corpus""".stripMargin,
    "q_split_date_formats" ->
      """WITH src AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%d')
        |         WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%m/%d/%Y')
        |         ELSE 'junk-' || CAST(o_orderkey AS VARCHAR) END AS d
        |  FROM orders)
        |SELECT o_orderkey, d,
        |  CAST(coalesce(try_strptime(d, '%Y-%m-%d'), try_strptime(d, '%m/%d/%Y')) AS DATE)
        |    AS d_date
        |FROM src""".stripMargin,
    "q_date_dim" ->
      """SELECT CAST(d AS DATE) AS date,
        |  CAST(year(d) AS INTEGER) AS year,
        |  CAST(quarter(d) AS INTEGER) AS quarter,
        |  CAST(month(d) AS INTEGER) AS month,
        |  monthname(d) AS month_name,
        |  CAST(weekofyear(d) AS INTEGER) AS week,
        |  CAST(day(d) AS INTEGER) AS day,
        |  CAST(dayofweek(d) + 1 AS INTEGER) AS day_of_week,
        |  dayname(d) AS day_name
        |FROM generate_series(DATE '2024-01-01', DATE '2024-12-31', INTERVAL 1 DAY) AS t(d)""".stripMargin,
    "q_time_dim" ->
      """SELECT CAST(s // 3600 AS INTEGER) AS hour,
        |  CAST((s % 3600) // 60 AS INTEGER) AS minute,
        |  CAST(s % 60 AS INTEGER) AS second,
        |  printf('%02d:%02d:%02d', s // 3600, (s % 3600) // 60, s % 60) AS time
        |FROM generate_series(0, 86340, 60) AS t(s)""".stripMargin,
    "q_row_hash" ->
      """SELECT n_nationkey,
        |  sha256(concat_ws(chr(9247),
        |    coalesce(CAST(n_name AS VARCHAR), ''),
        |    coalesce(CAST(n_regionkey AS VARCHAR), ''))) AS row_hash
        |FROM nation""".stripMargin,
    "q_scd1_current_only" ->
      """WITH b1 AS (
        |  SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment
        |  FROM customer),
        |fin AS (
        |  SELECT id, name,
        |    CASE WHEN id % 3 = 0 THEN 'UPDATED' ELSE segment END AS segment
        |  FROM b1)
        |SELECT id, name, segment,
        |  sha256(concat_ws(chr(9247),
        |    coalesce(CAST(name AS VARCHAR), ''),
        |    coalesce(CAST(segment AS VARCHAR), ''))) AS row_hash
        |FROM fin""".stripMargin,
    // identical logical contract; the bucketed layout is physical only
    "q_scd1_bucketed" ->
      """WITH b1 AS (
        |  SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment
        |  FROM customer),
        |fin AS (
        |  SELECT id, name,
        |    CASE WHEN id % 3 = 0 THEN 'UPDATED' ELSE segment END AS segment
        |  FROM b1)
        |SELECT id, name, segment,
        |  sha256(concat_ws(chr(9247),
        |    coalesce(CAST(name AS VARCHAR), ''),
        |    coalesce(CAST(segment AS VARCHAR), ''))) AS row_hash
        |FROM fin""".stripMargin,
    "q_scd2_track_history" ->
      """WITH b1 AS (
        |  SELECT o_orderkey AS id, o_orderstatus AS status,
        |    CAST(o_totalprice AS DECIMAL(12,2)) AS price
        |  FROM orders),
        |b2 AS (
        |  SELECT id, status,
        |    CASE WHEN id % 10 = 0 THEN CAST(price + 10 AS DECIMAL(12,2))
        |         ELSE price END AS price
        |  FROM b1 WHERE id % 2 = 0),
        |h1 AS (
        |  SELECT b1.*, sha256(concat_ws(chr(9247),
        |    coalesce(CAST(status AS VARCHAR), ''),
        |    coalesce(CAST(price AS VARCHAR), ''))) AS row_hash FROM b1),
        |h2 AS (
        |  SELECT b2.*, sha256(concat_ws(chr(9247),
        |    coalesce(CAST(status AS VARCHAR), ''),
        |    coalesce(CAST(price AS VARCHAR), ''))) AS row_hash FROM b2),
        |changed AS (
        |  SELECT h2.id FROM h2 JOIN h1 USING (id)
        |  WHERE h2.row_hash <> h1.row_hash)
        |SELECT h1.id, h1.status,
        |  CAST(h1.price * 100 AS BIGINT) AS price_cents, h1.row_hash,
        |  epoch_us(TIMESTAMP '2020-01-01 00:00:00') AS start_us,
        |  CASE WHEN c.id IS NOT NULL
        |       THEN epoch_us(TIMESTAMP '2020-02-01 00:00:00')
        |       ELSE CAST(-1 AS BIGINT) END AS end_us,
        |  c.id IS NULL AS is_current,
        |  CAST(1 AS BIGINT) AS version
        |FROM h1 LEFT JOIN changed c USING (id)
        |UNION ALL
        |SELECT h2.id, h2.status,
        |  CAST(h2.price * 100 AS BIGINT) AS price_cents, h2.row_hash,
        |  epoch_us(TIMESTAMP '2020-02-01 00:00:00'), CAST(-1 AS BIGINT),
        |  TRUE, CAST(2 AS BIGINT)
        |FROM h2 WHERE h2.id IN (SELECT id FROM changed)""".stripMargin,
    // As-of mid-history = batch 1 verbatim, all at version 1.
    "q_scd2_asof" ->
      """SELECT o_orderkey AS id, o_orderstatus AS status,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |    AS price_cents,
        |  CAST(1 AS BIGINT) AS version
        |FROM orders""".stripMargin,
    // SCD enrich: Jan facts (id % 3 = 0) always see version 1; Feb facts
    // see version 2 exactly when the SCD2 hash changed (id % 10 = 0)
    "q_pipeline_scd_enrich" ->
      """SELECT o_orderkey AS id,
        |  CASE WHEN o_orderkey % 3 = 0
        |    THEN epoch_us(TIMESTAMP '2020-01-15 00:00:00')
        |    ELSE epoch_us(TIMESTAMP '2020-02-15 00:00:00') END AS ts_us,
        |  CAST(CASE WHEN o_orderkey % 3 <> 0 AND o_orderkey % 10 = 0
        |    THEN 2 ELSE 1 END AS BIGINT) AS version,
        |  o_orderstatus AS status,
        |  CAST((CAST(o_totalprice AS DECIMAL(12,2))
        |    + CASE WHEN o_orderkey % 3 <> 0 AND o_orderkey % 10 = 0
        |        THEN 10 ELSE 0 END) * 100 AS BIGINT) AS price_cents
        |FROM orders WHERE o_orderkey < 500""".stripMargin,

    "q_hash_embedding" ->
      """SELECT doc_id, CAST(i AS INTEGER) AS dim,
        |  CASE WHEN text IS NULL OR text = '' THEN 0.0
        |       ELSE ('0x' || substring(sha256(text), i * 8 + 1, 8))::BIGINT
        |            / 4294967295.0 END AS val
        |FROM documents, range(8) AS t(i)""".stripMargin,
    "q_rest_read" ->
      """SELECT CAST(p * 100 + i AS BIGINT) AS id,
        |  'item' || CAST(p * 100 + i AS VARCHAR) AS name,
        |  CAST((p * 100 + i) % 7 AS BIGINT) AS score
        |FROM range(1, 4) AS a(p), range(1, 4) AS b(i)""".stripMargin,
    "q_sparql_read" ->
      """SELECT * FROM (VALUES
        |  ('Berlin', CAST(3700000 AS BIGINT)),
        |  ('Paris',  CAST(2100000 AS BIGINT)),
        |  ('Madrid', CAST(3200000 AS BIGINT)))
        |AS t(city, population)""".stripMargin,
    "q_qdrant_roundtrip" ->
      """SELECT vec_id AS id, 'v' || CAST(vec_id AS VARCHAR) AS name
        |FROM embeddings WHERE vec_id < 6""".stripMargin,
    "q_llm_map_dry_run" ->
      """SELECT doc_id, lang,
        |  CASE lower(coalesce(lang, ''))
        |    WHEN 'en' THEN 'EN' WHEN 'de' THEN 'DE'
        |    WHEN 'fr' THEN 'FR' WHEN 'es' THEN 'ES'
        |    ELSE NULL END AS lang_mapped
        |FROM documents""".stripMargin,
    "q_llm_embeddings" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    CASE WHEN text IS NULL OR text = ''
        |         THEN list_transform(range(8), i -> 0.0)
        |         ELSE list_transform(range(8), i ->
        |           ('0x' || substring(sha256(text),
        |             CAST(i AS INTEGER) * 8 + 1, 8))::BIGINT / 4294967295.0)
        |    END AS v
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
        |  FROM raw)
        |SELECT doc_id, CAST(i AS INTEGER) AS dim,
        |  CAST(CASE WHEN nrm = 0 THEN v[CAST(i AS INTEGER) + 1]
        |       ELSE v[CAST(i AS INTEGER) + 1] / nrm END AS FLOAT) AS val
        |FROM n CROSS JOIN range(8) AS t(i)""".stripMargin,
  )
}
