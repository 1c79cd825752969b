package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Specs for the standing BM25 inverted index ([[Search]]). */
class SearchSpec extends SparkTestBase {
  import spark.implicits._

  private def scratch(): String =
    Files.createTempDirectory("graft_search_").toString + "/idx"

  test("searchIndex equals ad-hoc bm25 bit-for-bit on the indexed corpus") {
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("text"))
    val terms = Seq("spark", "window", "merge", "shuffle")
    val dir = scratch()
    Search.writeIndex(docs, "doc_id", "text", dir, numBuckets = 8)
    val fromIndex = Search.searchIndex(spark, dir, terms)
      .as[(Long, Long, Double)].collect().toSet
    val adHoc = TextAnalysis.bm25(docs, "doc_id", "text", terms)
      .as[(Long, Long, Double)].collect().toSet
    assert(fromIndex == adHoc)
    assert(adHoc.nonEmpty, "corpus should match at least one query term")
  }

  test("probe prunes to the query terms' bucket directories") {
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"), (3L, "delta"))
      .toDF("doc_id", "text")
    val dir = scratch()
    Search.writeIndex(docs, "doc_id", "text", dir, numBuckets = 16)
    val q = Search.searchIndex(spark, dir, Seq("beta"))
    // the __tb literal predicate must land in PartitionFilters — that is
    // what turns the bucket filter into directory pruning (a single-term
    // IN simplifies to equality, hence the alternation)
    val pruneFilter = """PartitionFilters: \[[^\]]*__tb#\d+ (IN|=)""".r
    val plan = q.queryExecution.executedPlan.toString
    assert(pruneFilter.findFirstIn(plan).isDefined,
      s"__tb IN filter must reach the scan's PartitionFilters:\n$plan")
    assert(q.as[(Long, Long, Double)].collect().map(_._1).toSet == Set(1L, 2L))
  }

  test("driver-side bucket twin equals the column-side assignment") {
    val terms = ('a' to 'z').map(c => s"term_$c") ++
      Seq("Spark", "UPPER", "küche", "日本語", "", "x:y", "a b")
    val fromCols = terms.toDF("t")
      .select(col("t"), graft.functions.Hashing.hexPrefixBucket(
        col("t"), "graft-search-tb", 16L).as("b"))
      .as[(String, Long)].collect().toMap
    terms.foreach { t =>
      assert(Search.termBucketLocal(t, 16) == fromCols(t),
        s"driver/column bucket mismatch for '$t'")
    }
  }

  test("uncommitted or duplicate builds fail loud") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val dir = scratch()
    Search.writeIndex(docs, "doc_id", "text", dir, numBuckets = 4)
    // rebuild over a committed index refuses
    intercept[IllegalArgumentException] {
      Search.writeIndex(docs, "doc_id", "text", dir, numBuckets = 4)
    }
    // a sidecar-less directory (crashed build) refuses to serve queries
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(dir, Search.ParamsFileName), false)
    intercept[IllegalStateException] {
      Search.searchIndex(spark, dir, Seq("a"))
    }
  }

  test("a zero-posting index (all docs tokenless) serves typed empty results") {
    val docs = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "  "))
      .toDF("doc_id", "text")
    val dir = scratch()
    Search.writeIndex(docs, "doc_id", "text", dir, numBuckets = 4)
    val out = Search.searchIndex(spark, dir, Seq("anything"))
    assert(out.schema.map(f => (f.name, f.dataType.typeName))
      == Seq(("doc_id", "long"), ("n_hits", "long"), ("score", "double")))
    assert(out.count() == 0)
  }

  test("segmented append+query equals monolithic rebuild+query bit-for-bit") {
    val docs = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), col("text"))
    val terms = Seq("spark", "window", "merge", "shuffle")
    val segDir = scratch()
    // three disjoint daily-style batches
    Search.appendSegment(docs.where(col("doc_id") % 3 === 0),
      "doc_id", "text", segDir, numBuckets = 8)
    Search.appendSegment(docs.where(col("doc_id") % 3 === 1),
      "doc_id", "text", segDir, numBuckets = 8)
    Search.appendSegment(docs.where(col("doc_id") % 3 === 2),
      "doc_id", "text", segDir, numBuckets = 8)
    val monoDir = scratch()
    Search.writeIndex(docs, "doc_id", "text", monoDir, numBuckets = 8)
    val segmented = Search.searchIndex(spark, segDir, terms)
      .as[(Long, Long, Double)].collect().toSet
    val mono = Search.searchIndex(spark, monoDir, terms)
      .as[(Long, Long, Double)].collect().toSet
    assert(segmented == mono)
    assert(segmented.nonEmpty)
    // and compaction rewrites to ONE segment without changing a bit
    Search.compactSegments(spark, segDir)
    val fs = new org.apache.hadoop.fs.Path(segDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val segNames = fs.listStatus(
      new org.apache.hadoop.fs.Path(segDir, "segments"))
      .map(_.getPath.getName).filter(_.startsWith("seg_"))
    assert(segNames.toSeq == Seq("seg_000001"))
    val compacted = Search.searchIndex(spark, segDir, terms)
      .as[(Long, Long, Double)].collect().toSet
    assert(compacted == mono)
  }

  test("segmented layout guards: monolithic append, layout drift, empty index") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val mono = scratch()
    Search.writeIndex(docs, "doc_id", "text", mono, numBuckets = 4)
    intercept[IllegalArgumentException] { // no appending a one-shot index
      Search.appendSegment(docs, "doc_id", "text", mono, numBuckets = 4)
    }
    val seg = scratch()
    Search.appendSegment(docs, "doc_id", "text", seg, numBuckets = 4)
    intercept[IllegalArgumentException] { // numBuckets drift breaks pruning
      Search.appendSegment(docs, "doc_id", "text", seg, numBuckets = 8)
    }
    // zero-posting segments still serve typed empty results
    val empty = scratch()
    Search.appendSegment(Seq((1L, ""), (2L, "  ")).toDF("doc_id", "text"),
      "doc_id", "text", empty, numBuckets = 4)
    val out = Search.searchIndex(spark, empty, Seq("anything"))
    assert(out.schema.map(f => (f.name, f.dataType.typeName))
      == Seq(("doc_id", "long"), ("n_hits", "long"), ("score", "double")))
    assert(out.count() == 0)
    // a tokenless segment next to a real one only dilutes avgdl/n_docs —
    // same as the monolithic zero-length-doc contract
    Search.appendSegment(Seq((3L, "hit miss"), (4L, "miss"))
      .toDF("doc_id", "text"), "doc_id", "text", empty, numBuckets = 4)
    val scored = Search.searchIndex(spark, empty, Seq("hit"))
      .as[(Long, Long, Double)].collect()
    assert(scored.map(_._1).toSet == Set(3L))
    // N=4 docs total (two tokenless), avgdl=3/4 — identical formula to the
    // monolithic test below
    val exp = math.log(1 + 3.5 / 1.5) * 2.2 /
      (1 + 1.2 * (0.25 + 0.75 * 2 / (3.0 / 4)))
    assert(math.abs(scored.head._3 - exp) < 1e-6)
  }

  test("a crashed compaction reads loud, never as an empty index") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val dir = scratch()
    Search.appendSegment(docs, "doc_id", "text", dir, numBuckets = 4)
    // simulate the crash window: segments renamed away, new tree never in
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val segs = new org.apache.hadoop.fs.Path(dir, "segments")
    val old = new org.apache.hadoop.fs.Path(dir, ".old-segments-crashed")
    assert(fs.rename(segs, old))
    val e1 = intercept[IllegalStateException] {
      Search.searchIndex(spark, dir, Seq("a"))
    }
    assert(e1.getMessage.contains("crashed"))
    val e2 = intercept[IllegalStateException] {
      Search.appendSegment(docs, "doc_id", "text", dir, numBuckets = 4)
    }
    assert(e2.getMessage.contains("crashed"))
    // the documented recovery restores service bit-for-bit
    assert(fs.rename(old, segs))
    assert(Search.searchIndex(spark, dir, Seq("a")).count() == 1)
  }

  test("rrfFuse matches the hand-computed reciprocal-rank formula") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val b = Seq((3L, 1), (1L, 2)).toDF("id", "rank") // doc 2 absent here
    val got = Search.rrfFuse(Seq(a, b), "id", k = 60)
      .as[(Long, Long, Double)].collect().map { case (i, n, s) => i -> ((n, s)) }
      .toMap
    def r(x: Int) = 1.0 / (60 + x)
    assert(got(1L)._1 == 2 && math.abs(got(1L)._2 - (r(1) + r(2))) < 1e-6)
    assert(got(2L)._1 == 1 && math.abs(got(2L)._2 - r(2)) < 1e-6)
    assert(got(3L)._1 == 2 && math.abs(got(3L)._2 - (r(3) + r(1))) < 1e-6)
  }

  test("rankBy is dense, 1-based, and tie-broken by id") {
    val df = Seq((5L, 10.0), (3L, 10.0), (9L, 20.0)).toDF("id", "s")
    val got = Search.rankBy(df, "id", col("s").desc)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(9L -> 1, 3L -> 2, 5L -> 3))
  }

  test("docs with no query terms never appear; zero-length docs only dilute avgdl") {
    val docs = Seq((1L, "hit miss"), (2L, "miss"), (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val dir = scratch()
    Search.writeIndex(docs, "doc_id", "text", dir, numBuckets = 4)
    val out = Search.searchIndex(spark, dir, Seq("hit"))
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSet == Set(1L))
    // N=4, avgdl=3/4: idf = ln(1+(4-1+0.5)/1.5), denom = 1+1.2*(0.25+0.75*2/(3.0/4))
    val exp = math.log(1 + 3.5 / 1.5) * 2.2 /
      (1 + 1.2 * (0.25 + 0.75 * 2 / (3.0 / 4)))
    assert(math.abs(out.head._3 - exp) < 1e-6)
  }

  test("stemmed index: inflections collapse at index AND query time; layout guarded; compact preserves") {
    val docs = Seq(
      (1L, "running runs quickly"),
      (2L, "the runner ran the race"),   // 'ran' does not stem to 'run'
      (3L, "walking walked walks")).toDF("doc_id", "text")
    val stemDir = scratch()
    val plainDir = scratch()
    Search.writeIndex(docs, "doc_id", "text", stemDir, numBuckets = 8,
      stem = true)
    Search.writeIndex(docs, "doc_id", "text", plainDir, numBuckets = 8)
    // query with ONE inflection; the stemmed index must surface every
    // doc sharing the stem — the plain index only exact matches (none)
    def hits(dir: String, term: String): Set[Long] =
      Search.searchIndex(spark, dir, Seq(term))
        .select("doc_id").as[Long].collect().toSet
    assert(hits(stemDir, "runs") == Set(1L), s"run stem: doc 1 has run twice")
    assert(hits(stemDir, "walked") == Set(3L))
    assert(hits(plainDir, "walked") == Set(3L), "exact term still matches")
    assert(hits(plainDir, "walks") == Set(3L))
    // 'running' and 'runs' share doc 1's postings under one stem: the
    // stemmed index scores them identically, the plain one differently
    val a = Search.searchIndex(spark, stemDir, Seq("running"))
      .select("score").as[Double].collect().toSeq
    val b = Search.searchIndex(spark, stemDir, Seq("runs"))
      .select("score").as[Double].collect().toSeq
    assert(a == b, "inflections must be one posting under stemming")
    // segmented: stem recorded at creation, drift is loud
    val segDir = scratch()
    assert(Search.appendSegment(docs, "doc_id", "text", segDir,
      numBuckets = 8, stem = true))
    intercept[IllegalArgumentException] {
      Search.appendSegment(docs, "doc_id", "text", segDir,
        numBuckets = 8, stem = false)
    }
    assert(Search.appendSegment(docs.withColumn("doc_id", col("doc_id") + 10),
      "doc_id", "text", segDir, numBuckets = 8, stem = true))
    Search.compactSegments(spark, segDir)
    assert(Search.searchIndex(spark, segDir, Seq("runs"))
      .select("doc_id").as[Long].collect().toSet == Set(1L, 11L),
      "compaction must preserve the stem analyzer")
  }

  private val rm3Corpus = Seq(
    (1L, "apple banana banana cherry"),
    (2L, "apple cherry cherry durian"),
    (3L, "banana cherry elder"),
    (4L, "durian elder fig grape"),
    (5L, "apple apple banana")).toDF("doc_id", "text")

  test("bm25WithWeights at uniform 1e12 picos IS plain bm25, bit for bit") {
    val terms = Seq("apple", "banana")
    val plain = TextAnalysis.bm25(rm3Corpus, "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val weighted = Search.bm25WithWeights(rm3Corpus, "doc_id", "text",
      terms.map(_ -> 1000000000000L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(plain == weighted)
  }

  test("rm3Weights expands into feedback-doc vocabulary, exact interpolation") {
    val w = Search.rm3Weights(rm3Corpus, "doc_id", "text", Seq("apple"),
      fbDocs = 2, fbTerms = 5, alphaMicros = 500000L).toMap
    // original term survives with at least its interpolated floor
    assert(w.contains("apple") && w("apple") >= 500000L * 1000000L)
    // expansion terms come from the feedback docs only (1, 2, 5 score;
    // top-2 selected) — "elder"/"fig"/"grape" live outside them
    val expanded = w.keySet - "apple"
    assert(expanded.nonEmpty)
    assert(!expanded.contains("fig") && !expanded.contains("grape"))
    // feedback side of the mix is normalized: rm picos sum to
    // (1e6 - alpha) * 1e6 within per-term rounding
    val rmPicos = w.values.sum - 500000L * 1000000L // minus orig apple share
    assert(math.abs(rmPicos - 500000L * 1000000L) <= w.size * 500000L)
    // determinism across partitionings
    val w2 = Search.rm3Weights(rm3Corpus.repartition(7), "doc_id", "text",
      Seq("apple"), fbDocs = 2, fbTerms = 5, alphaMicros = 500000L).toMap
    assert(w == w2)
  }

  test("rm3Search retrieves expansion-only docs the raw query misses") {
    // doc 3 has no query term; RM3's expansion ("banana"/"cherry" from
    // the apple docs) must pull it in
    val raw = TextAnalysis.bm25(rm3Corpus, "doc_id", "text", Seq("apple"))
      .select("doc_id").as[Long].collect().toSet
    assert(!raw.contains(3L))
    val rm3 = Search.rm3Search(rm3Corpus, "doc_id", "text", Seq("apple"),
      fbDocs = 2, fbTerms = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(rm3.contains(3L), "expansion must recall beyond the raw query")
    assert(raw.subsetOf(rm3))
  }

  test("rm3 loud paths") {
    intercept[IllegalArgumentException](
      Search.rm3Weights(rm3Corpus, "doc_id", "text", Seq("zzz_nomatch")))
    intercept[IllegalArgumentException](
      Search.bm25WithWeights(rm3Corpus, "doc_id", "text", Nil))
    intercept[IllegalArgumentException](
      Search.bm25WithWeights(rm3Corpus, "doc_id", "text",
        Seq("a" -> 1L, "a" -> 2L)))
    intercept[IllegalArgumentException](
      Search.bm25WithWeights(rm3Corpus, "doc_id", "text", Seq("a" -> 0L)))
    intercept[IllegalArgumentException](
      Search.rm3Weights(rm3Corpus, "doc_id", "text", Seq("apple"),
        alphaMicros = 2000000L))
  }
}
