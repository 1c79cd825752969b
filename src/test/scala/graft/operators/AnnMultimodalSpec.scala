package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AnnMultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val embeddings =
    spark.read.parquet(sf("embeddings"))

  test("brute-force top-k returns k ranked neighbors incl. self at rank 1") {
    val queries = embeddings.filter($"vec_id" < 5)
    val out = Ann.bruteForceTopK(embeddings, queries, "vec_id", "embedding", "vec_id", 5)
    val rows = out.collect()
    assert(rows.length == 25) // 5 queries × 5
    // self-match is rank 1 with cos 1.0
    val rank1 = rows.filter(_.getAs[Int]("rank") == 1)
    assert(rank1.forall(r => r.getAs[Long]("q_id") == r.getAs[Long]("id")))
    assert(rank1.forall(_.getAs[Double]("cos") == 1.0))
    // ranks strictly ordered by cos desc within a query
    val perQ = rows.groupBy(_.getAs[Long]("q_id"))
    perQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      val cosSeq = sorted.map(_.getAs[Double]("cos")).toSeq
      assert(cosSeq == cosSeq.sorted.reverse)
    }
  }

  test("mmrRerank: greedy reference replay, diversity beats a redundant runner-up, lambda poles, loud contracts") {
    // planted geometry: relevance order a > b > c, but b duplicates a
    // exactly — MMR at lambda 0.5 must pick the diverse c second
    val cand = Seq(
      (1L, 900000L, Seq(1.0, 0.0)), // a: most relevant
      (2L, 880000L, Seq(1.0, 0.0)), // b: near-tie duplicate of a
      (3L, 500000L, Seq(0.0, 1.0))) // c: orthogonal
      .toDF("id", "score_micros", "v")
    val outDf = Ann.mmrRerank(cand, "id", "score_micros", "v",
      k = 3, lambdaMicros = 500000L)
    val out = outDf.collect().sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id"),
        r.getAs[Long]("maxsim_micros"), r.getAs[Long]("mmr_micros")))
    graft.core.Caches.releaseCheckpoint(outDf)
    // pick 1: a (pure relevance). pick 2: b's penalty is a full 1e6
    // (identical vector) -> mmr(b) = .5*880000 - .5*1e6 < mmr(c) =
    // .5*500000 - 0 -> c. pick 3: b with its duplicate penalty on record
    assert(out.toSeq == Seq(
      (1, 1L, 0L, 450000000000L),
      (2, 3L, 0L, 250000000000L),
      (3, 2L, 1000000L, -60000000000L)), out.mkString(", "))
    // lambda = 1e6: pure relevance order, penalties ignored
    val pure = Ann.mmrRerank(cand, "id", "score_micros", "v",
      k = 3, lambdaMicros = 1000000L)
      .collect().sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("id")).toSeq
    assert(pure == Seq(1L, 2L, 3L))
    // k beyond the candidate count stops early, ranks stay dense
    val short = Ann.mmrRerank(cand, "id", "score_micros", "v",
      k = 200, lambdaMicros = 700000L).collect()
    assert(short.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3))
    // anti-correlated vectors never earn a bonus: maxsim floors at 0
    val anti = Seq(
      (1L, 500000L, Seq(1.0, 0.0)),
      (2L, 400000L, Seq(-1.0, 0.0)))
      .toDF("id", "score_micros", "v")
    val a2 = Ann.mmrRerank(anti, "id", "score_micros", "v", 2, 500000L)
      .collect().find(_.getAs[Int]("rank") == 2).get
    assert(a2.getAs[Long]("maxsim_micros") == 0L)
    assert(a2.getAs[Long]("mmr_micros") == 200000000000L)
    // loud: double scores, NULLs, bad k / lambda
    intercept[IllegalArgumentException](Ann.mmrRerank(
      Seq((1L, 0.5, Seq(1.0))).toDF("id", "s", "v"), "id", "s", "v",
      1, 500000L))
    intercept[IllegalArgumentException](Ann.mmrRerank(
      Seq((1L, Option.empty[Long], Seq(1.0))).toDF("id", "s", "v"),
      "id", "s", "v", 1, 500000L))
    intercept[IllegalArgumentException](Ann.mmrRerank(
      cand, "id", "score_micros", "v", 0, 500000L))
    intercept[IllegalArgumentException](Ann.mmrRerank(
      cand, "id", "score_micros", "v", 1, 1000001L))
    // shortlist contract: k full-candidate scans is a shortlist tool,
    // not a corpus tool — > 1M candidates are refused loudly
    val corpus = spark.range(1000001L).select($"id",
      org.apache.spark.sql.functions.lit(1L).as("s"),
      org.apache.spark.sql.functions.array(
        org.apache.spark.sql.functions.lit(1.0)).as("v"))
    val big = intercept[IllegalArgumentException](Ann.mmrRerank(
      corpus, "id", "s", "v", 1, 500000L))
    assert(big.getMessage.contains("shortlist"), big.getMessage)
    // empty candidates: the empty frame carries the NORMAL schema —
    // id keeps the input's type (a bare null literal would be
    // NullType, unwritable to parquet and un-unionable)
    val empty = Ann.mmrRerank(cand.where($"id" < 0L), "id",
      "score_micros", "v", 3, 500000L)
    assert(empty.count() == 0L)
    assert(empty.schema("id").dataType ==
      org.apache.spark.sql.types.LongType, empty.schema.treeString)
    graft.core.Caches.releaseCheckpoint(empty)
  }

  test("alignmentUniformity: collapsed space at (0, 0), orthogonal pair pins, loud contracts") {
    def run(rows: Seq[(Long, Seq[Double], String)]) = {
      val r = Ann.alignmentUniformity(rows.toDF("id", "vec", "lab"),
        "id", "vec", "lab").head()
      (r.getAs[Long]("n_pos_pairs"), r.getAs[Long]("n_rand_pairs"),
        r.getAs[Double]("alignment"), r.getAs[Double]("uniformity"))
    }
    // a COLLAPSED space (all vectors identical): alignment 0 (positives
    // coincide) and uniformity 0 (ln E[exp(0)]) — the degenerate pole
    // the metric exists to expose
    val collapsed = (1L to 8L).map(i => (i, Seq(3.0, 0.0), "a"))
    assert(run(collapsed) == ((4L, 4L, 0.0, 0.0)))
    // two rows, same label, orthogonal: the one positive pair has
    // ||x-y||^2 = 2 -> alignment 2; the one ring pair is the same pair
    // -> uniformity = ln(exp(-4)) = -4 through the nano quantization
    val ortho = Seq((1L, Seq(1.0, 0.0), "a"), (2L, Seq(0.0, 1.0), "a"))
    assert(run(ortho) == ((1L, 1L, 2.0, -4.0)))
    // normalization: magnitudes must not matter
    val scaled = Seq((1L, Seq(9.0, 0.0), "a"), (2L, Seq(0.0, 0.25), "a"))
    assert(run(scaled) == ((1L, 1L, 2.0, -4.0)))
    // a spread space scores BELOW a collapsed one on uniformity
    val spread = (1L to 20L).map(i =>
      (i, if (i % 2 == 0) Seq(1.0, 0.0) else Seq(0.0, 1.0),
        if (i % 2 == 0) "a" else "b"))
    val sp = run(spread)
    assert(sp._3 == 0.0, "positives within each label coincide")
    assert(sp._4 < 0.0, s"spread uniformity ${sp._4} must be negative")
    // loud: zero vectors, NULLs, singleton labels, single row
    intercept[IllegalArgumentException](run(
      Seq((1L, Seq(0.0, 0.0), "a"), (2L, Seq(1.0, 0.0), "a"))))
    intercept[IllegalArgumentException](Ann.alignmentUniformity(
      Seq((1L, Seq(1.0), Option.empty[String])).toDF("id", "vec", "lab"),
      "id", "vec", "lab"))
    intercept[IllegalArgumentException](run(
      Seq((1L, Seq(1.0, 0.0), "a"), (2L, Seq(0.0, 1.0), "b"))))
    intercept[IllegalArgumentException](run(Seq((1L, Seq(1.0), "a"))))
  }

  test("hardNegatives: gold excluded, equals exclusion-rerank of exact topk, denoise guard") {
    val queries = embeddings.filter($"vec_id" < 4)
    // gold pairs: self for every query + a planted doc; query 3 has NONE
    val posPairs = Seq((0L, 0L), (0L, 17L), (1L, 1L), (2L, 2L), (2L, 40L))
    val pos = posPairs.toDF("pos_q", "pos_id")
    val out = Ann.hardNegatives(embeddings, queries, pos,
      "vec_id", "embedding", "vec_id", "pos_q", "pos_id", k = 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("id"), r.getAs[Double]("cos"))).toMap
    // reference: full exact ranking minus the gold set, re-ranked
    val n = embeddings.count().toInt
    val full = Ann.bruteForceTopK(embeddings, queries, "vec_id",
      "embedding", "vec_id", n)
      .collect().map(r => (r.getAs[Long]("q_id"),
        r.getAs[Long]("id"), r.getAs[Double]("cos"), r.getAs[Int]("rank")))
    val posSet = posPairs.toSet
    val expected = full.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      rows.sortBy(_._4)
        .filterNot(r => posSet.contains((qid, r._2)))
        .take(5).zipWithIndex
        .map { case (r, i) => (qid, i + 1) -> ((r._2, r._3)) }
    }.toMap
    assert(out == expected, s"got $out\nexpected $expected")
    // gold never appears; query 3 (no positives) still self-matches at rank 1
    assert(!out.exists { case ((q, _), (id, _)) => posSet.contains((q, id)) })
    assert(out((3L, 1))._1 == 3L)
    // denoise: ratio 0 -> everything above 0×posmax survives... use a
    // ratio that provably drops the top survivor of query 0: its best
    // non-gold cos vs its best gold cos
    val bestGold0 = full.filter(r => r._1 == 0L && posSet.contains((0L, r._2)))
      .map(_._3).max
    val bestNonGold0 = expected((0L, 1))._2
    if (bestNonGold0 > 0 && bestGold0 > 0 && bestNonGold0 <= bestGold0) {
      val ratio = (bestNonGold0 / bestGold0) * 0.999 // just below the top survivor
      val denoised = Ann.hardNegatives(embeddings, queries, pos,
        "vec_id", "embedding", "vec_id", "pos_q", "pos_id", k = 5,
        denoiseRatio = ratio)
        .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("id"))).toSet
      assert(!denoised.contains((0L, expected((0L, 1))._1)),
        "the too-similar negative must be denoised away")
      // query 3 has no positives: guard skipped, self still present
      assert(denoised.contains((3L, 3L)))
    }
    intercept[IllegalArgumentException](
      Ann.hardNegatives(embeddings, queries, pos, "vec_id", "embedding",
        "vec_id", "pos_q", "pos_id", k = 0))
    intercept[IllegalArgumentException](
      Ann.hardNegatives(embeddings, queries, pos, "vec_id", "embedding",
        "vec_id", "pos_q", "pos_id", k = 5, denoiseRatio = 1.5))
  }

  test("IVF search hits >= 0.9 recall vs exact; full probe equals exact") {
    // Quantifies the claimed ANN scale path on the (IVF-hostile: near-random
    // 64-dim) fixture. Operating point nlist=16 / nassign=3 / nprobe=6:
    // measured recall 0.96, asserted floor 0.9. Probing all cells must
    // reproduce the exact result bit-for-bit — the machinery check.
    val queries = embeddings.filter($"vec_id" < 10)
    val exact = Ann.bruteForceTopK(embeddings, queries, "vec_id", "embedding", "vec_id", 5)
    val index = Ann.Ivf.build(embeddings, "vec_id", "embedding",
      nlist = 16, seed = 42L, nassign = 3)
    val approx = Ann.Ivf.search(index, queries, "vec_id", "embedding", k = 5, nprobe = 6)
    val recall = Ann.recallAgainstExact(exact, approx)
    assert(recall >= 0.9, s"recall $recall below the 0.9 floor")
    // self-match always found (its own cell is always probed first)
    val self = approx.filter($"q_id" === $"id")
    assert(self.count() == 10)
    val full = Ann.Ivf.search(index, queries, "vec_id", "embedding", k = 5, nprobe = 16)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    assert(rows(full) == rows(exact))
  }

  test("persisted IVF index round-trips and searches identically, cell-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_").toString
    try {
      val queries = embeddings.filter($"vec_id" < 10)
      val index = Ann.Ivf.build(embeddings, "vec_id", "embedding",
        nlist = 16, seed = 42L, nassign = 2)
      val direct = Ann.Ivf.search(index, queries, "vec_id", "embedding",
        k = 5, nprobe = 4)
      Ann.Ivf.writeIndex(index, dir)
      val loaded = Ann.Ivf.loadIndex(spark, dir)
      assert(loaded.nassign == 2 && loaded.idCol == "vec_id"
        && loaded.centroids.length == 16)
      val fromDisk = Ann.Ivf.search(loaded, queries, "vec_id", "embedding",
        k = 5, nprobe = 4)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
      assert(rows(fromDisk) == rows(direct))
      // the probed-cell IN predicate must land in the scan's
      // PartitionFilters — that is what turns the filter into directory
      // pruning ("__cell" alone appears in any search plan via join keys)
      val pruneFilter = """PartitionFilters: \[[^\]]*__cell#\d+ IN""".r
      val plan = fromDisk.queryExecution.executedPlan.toString
      assert(pruneFilter.findFirstIn(plan).isDefined,
        s"cell IN filter must reach the scan's PartitionFilters:\n$plan")
      // pruneScan=false is the same answer (machinery check) and, without
      // the eager cell collect, carries no IN partition filter — proving
      // the assertion above can actually fail
      val unpruned = Ann.Ivf.search(loaded, queries, "vec_id", "embedding",
        k = 5, nprobe = 4, pruneScan = false)
      assert(rows(unpruned) == rows(direct))
      assert(pruneFilter.findFirstIn(
        unpruned.queryExecution.executedPlan.toString).isEmpty)
      // torn write (no sidecar) fails loud
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(dir, Ann.Ivf.SidecarFileName), false)
      val e = intercept[IllegalArgumentException] { Ann.Ivf.loadIndex(spark, dir) }
      assert(e.getMessage.contains("sidecar"))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("quantized IVF index: 4x smaller vectors, recall holds vs exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_q_").toString
    try {
      val queries = embeddings.filter($"vec_id" < 10)
      val exact = Ann.bruteForceTopK(embeddings, queries, "vec_id",
        "embedding", "vec_id", 5)
      val index = Ann.Ivf.build(embeddings, "vec_id", "embedding",
        nlist = 16, seed = 42L, nassign = 3)
      Ann.Ivf.writeIndex(index, dir, quantize = true)
      val loaded = Ann.Ivf.loadIndex(spark, dir)
      // the stored rows carry int8 codes, not the float array
      val stored = spark.read.parquet(dir)
      assert(stored.columns.contains("__q_codes")
        && stored.columns.contains("__q_scale")
        && !stored.columns.contains("embedding"))
      assert(stored.schema("__q_codes").dataType
        == org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ByteType, containsNull = false)
        || stored.schema("__q_codes").dataType
        == org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ByteType, containsNull = true))
      // searching the dequantized path keeps recall near the float path
      // (same operating point as the float test: floor 0.85 vs its 0.9 —
      // the headroom is the bounded scale/2-per-component reconstruction
      // error)
      val approx = Ann.Ivf.search(loaded, queries, "vec_id", "embedding",
        k = 5, nprobe = 6)
      val recall = Ann.recallAgainstExact(exact, approx)
      assert(recall >= 0.85, s"quantized recall $recall below the 0.85 floor")
      // self-match survives quantization (cos(dequant(v), v) stays rank 1)
      assert(approx.filter($"q_id" === $"id").count() == 10)
      // round-trip: a second load searches identically (determinism)
      val again = Ann.Ivf.search(Ann.Ivf.loadIndex(spark, dir), queries,
        "vec_id", "embedding", k = 5, nprobe = 6)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
      assert(rows(again) == rows(approx))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("IVF multi-assignment raises recall at a fixed probe width") {
    val queries = embeddings.filter($"vec_id" < 10)
    val exact = Ann.bruteForceTopK(embeddings, queries, "vec_id", "embedding", "vec_id", 5)
    val recalls = Seq(1, 2).map { nassign =>
      val idx = Ann.Ivf.build(embeddings, "vec_id", "embedding",
        nlist = 16, seed = 42L, nassign = nassign)
      val a = Ann.Ivf.search(idx, queries, "vec_id", "embedding", k = 5, nprobe = 4)
      Ann.recallAgainstExact(exact, a)
    }
    assert(recalls(1) > recalls.head,
      s"nassign=2 recall ${recalls(1)} should beat nassign=1 ${recalls.head}")
  }

  test("multimodal decoded meta is deterministic and null-safe") {
    val df = Seq(
      (1L, "hello world".getBytes("UTF-8")),
      (2L, "hello world".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("id", "content")
    val out = Multimodal.withDecodedMeta(df, "content").orderBy("id").collect()
    val m1 = out(0).getStruct(2)
    val m2 = out(1).getStruct(2)
    assert(m1 == m2) // deterministic
    assert(Set("png", "jpg", "webp").contains(m1.getString(0)))
    assert(m1.getInt(1) >= 16 && m1.getInt(1) <= 256)
    assert(m1.getLong(3) == 11L)
    assert(out(2).isNullAt(2)) // null content → null meta
  }

  test("frame sampling slices binary payloads bytewise") {
    val df = Seq((1L, "abcdefghij".getBytes("UTF-8"))).toDF("id", "content")
    val frames = df.select(
      Multimodal.frameSample(col("content"), n = 4, frameBytes = 3).as("f"))
      .collect()(0).getSeq[Array[Byte]](0)
    assert(frames.map(new String(_, "UTF-8")).toSeq == Seq("abc", "def", "ghi", "j"))
  }

  test("CDC chunks tile the payload within size bounds, deterministically") {
    val rnd = new java.util.Random(7)
    val payload = Array.fill(50000)(rnd.nextInt().toByte)
    val df = Seq((1L, payload), (2L, payload), (3L, Array.emptyByteArray),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("id", "content")
    val chunks = Multimodal.contentChunks(df, "id", "content",
      minSize = 64, avgSize = 256, maxSize = 1024)
      .orderBy("id", "chunk_idx").collect()
    val byDoc = chunks.groupBy(_.getAs[Long]("id"))
    assert(!byDoc.contains(3L) && !byDoc.contains(4L),
      "empty/null payloads produce no chunk rows")
    val c1 = byDoc(1L)
    // exact tiling: contiguous offsets, sizes sum to the payload
    assert(c1.head.getAs[Long]("chunk_offset") == 0L)
    c1.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("chunk_offset") ==
        a.getAs[Long]("chunk_offset") + a.getAs[Long]("chunk_size"))
      case _ => ()
    }
    assert(c1.map(_.getAs[Long]("chunk_size")).sum == payload.length)
    // bounds: every chunk <= max; all but the final >= min
    assert(c1.forall(_.getAs[Long]("chunk_size") <= 1024))
    assert(c1.dropRight(1).forall(_.getAs[Long]("chunk_size") >= 64))
    // the average should be in the right ballpark for random bytes
    val avg = payload.length.toDouble / c1.length
    assert(avg > 64 && avg < 1024, s"mean chunk $avg outside (min, max)")
    // identical payloads chunk identically (rows 1 and 2)
    assert(c1.map(r => (r.getAs[Long]("chunk_offset"), r.getAs[Long]("chunk_size"),
        r.getAs[Array[Byte]]("chunk_hash").toSeq)).toSeq ==
      byDoc(2L).map(r => (r.getAs[Long]("chunk_offset"), r.getAs[Long]("chunk_size"),
        r.getAs[Array[Byte]]("chunk_hash").toSeq)).toSeq)
  }

  test("chunkOverlapPairs: shifted copy pairs high, strangers don't, hot chunks capped") {
    val rnd = new java.util.Random(13)
    val shared = Array.fill(30000)(rnd.nextInt().toByte)
    val prefix = Array.fill(101)(rnd.nextInt().toByte)
    val strangerA = Array.fill(30000)(rnd.nextInt().toByte)
    val boiler = Array.fill(3000)(rnd.nextInt().toByte) // in EVERY doc
    val df = Seq(
      (1L, boiler ++ shared),
      (2L, boiler ++ prefix ++ shared),  // shifted copy of 1
      (3L, boiler ++ strangerA),
      (4L, boiler ++ Array.fill(30000)(rnd.nextInt().toByte))
    ).toDF("id", "content")
    val pairs = Multimodal.chunkOverlapPairs(df, "id", "content",
      threshold = 0.5, minSize = 64, avgSize = 256, maxSize = 1024,
      maxChunkFreq = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("overlap_frac")))
    assert(pairs.length == 1 && pairs(0)._1 == 1L && pairs(0)._2 == 2L,
      s"only the shifted copy should pair, got ${pairs.toSeq}")
    assert(pairs(0)._3 >= 0.8, s"shifted copy overlap ${pairs(0)._3} too low")
    // with the cap at 3, chunks in all 4 docs (the boiler block) cannot
    // pair strangers: already asserted by pairs.length == 1. Raising the
    // cap lets boilerplate-only pairs appear — proving the cap did work
    val uncapped = Multimodal.chunkOverlapPairs(df, "id", "content",
      threshold = 0.05, minSize = 64, avgSize = 256, maxSize = 1024,
      maxChunkFreq = 100).count()
    assert(uncapped > 1, "without the cap the universal block pairs everyone")
  }

  test("CDC realigns after an insertion — the anti-fixed-block property") {
    val rnd = new java.util.Random(11)
    val base = Array.fill(40000)(rnd.nextInt().toByte)
    val prefix = Array.fill(137)(rnd.nextInt().toByte)
    val df = Seq((1L, base), (2L, prefix ++ base)).toDF("id", "content")
    val chunks = Multimodal.contentChunks(df, "id", "content",
      minSize = 64, avgSize = 256, maxSize = 1024)
      .select($"id", $"chunk_hash").collect()
      .groupBy(_.getAs[Long]("id"))
      .map { case (k, v) =>
        k -> v.map(_.getAs[Array[Byte]]("chunk_hash").toSeq).toSet }
    val shared = chunks(1L).intersect(chunks(2L)).size.toDouble / chunks(1L).size
    assert(shared >= 0.9,
      s"only ${shared * 100}%% of chunks realigned after a 137-byte insert " +
        "(fixed-size blocking would share ~0)")
  }

  test("PQ ADC search: recall floor vs exact, self found, deterministic encode") {
    val queries = embeddings.filter($"vec_id" < 10)
    val exact = Ann.bruteForceTopK(embeddings, queries, "vec_id", "embedding",
      "vec_id", 5)
    val index = Ann.Pq.build(embeddings, "vec_id", "embedding", m = 16, ksub = 64)
    assert(index.model.m == 16 && index.model.dsub == 4)
    val approx = Ann.Pq.search(index, queries, "vec_id", "embedding", 5)
    val recall = Ann.recallAgainstExact(exact, approx)
    assert(recall >= 0.6, s"PQ m=16 ksub=64 recall $recall below 0.6")
    val refined = Ann.Pq.searchRefined(index, embeddings, "vec_id", "embedding",
      queries, "vec_id", "embedding", 5, refine = 4)
    val refinedRecall = Ann.recallAgainstExact(exact, refined)
    assert(refinedRecall >= 0.85,
      s"refined (x4 shortlist) recall $refinedRecall below 0.85")
    assert(refinedRecall >= recall, "refine must not lose recall")
    // a query IS in the corpus: its own row reconstructs nearest-possible
    val selfHits = approx.where(col("q_id") === col("id")).count()
    assert(selfHits >= 8, s"only $selfHits/10 queries found themselves in top-5")
    // encode is a pure expression over frozen codebooks — bit-stable
    // across independent plan executions and repartitionings
    val enc = Ann.Pq.encode(index.model, embeddings, "embedding")
      .select($"vec_id", col(Ann.Pq.CodesCol))
    val run1 = enc.collect().map(_.toString).sorted.toSeq
    val run2 = enc.repartition(7).collect().map(_.toString).sorted.toSeq
    assert(run1 == run2)
    // dimension drift fails loud in-row
    val bad = Seq((999L, Array.fill(32)(0.5))).toDF("vec_id", "embedding")
    val err = intercept[Exception](
      Ann.Pq.encode(index.model, bad, "embedding").collect())
    assert(err.getMessage.contains("dim"))
    // a null vector in the corpus must not NPE training (excluded from
    // the sample) — and encode stays loud on it
    val withNull = embeddings.select("vec_id", "embedding").unionByName(
      embeddings.limit(1).select(lit(99999L).as("vec_id"),
        lit(null).cast(embeddings.schema("embedding").dataType).as("embedding")))
    val m2 = Ann.Pq.train(withNull, "embedding", m = 8, ksub = 16)
    assert(m2.m == 8)
    intercept[Exception](
      Ann.Pq.encode(m2, withNull.where($"vec_id" === 99999L), "embedding")
        .collect())
  }

  test("IVF-PQ: probed-cell ADC + refine reaches the recall floor; full probe ≈ PQ flat") {
    val queries = embeddings.filter($"vec_id" < 10)
    val exact = Ann.bruteForceTopK(embeddings, queries, "vec_id", "embedding",
      "vec_id", 5)
    val index = Ann.IvfPq.build(embeddings, "vec_id", "embedding",
      nlist = 16, m = 16, ksub = 64, nassign = 2)
    val refined = Ann.IvfPq.searchRefined(index, embeddings, "vec_id",
      "embedding", queries, "vec_id", "embedding", k = 5, nprobe = 6,
      refine = 4)
    val recall = Ann.recallAgainstExact(exact, refined)
    assert(recall >= 0.7,
      s"IVF-PQ nprobe=6/16 + x4 refine recall $recall below 0.7")
    // probing EVERY cell must equal the flat-PQ ranking (same codes,
    // same LUT — the coarse stage only prunes)
    val flat = Ann.PqIndex(
      index.encoded.select(col("id"), col(Ann.Pq.CodesCol)).dropDuplicates("id"),
      index.model, "id")
    val full = Ann.IvfPq.search(index, queries, "vec_id", "embedding",
      k = 5, nprobe = 16)
      .collect().map(_.toString).sorted.toSeq
    val flatRes = Ann.Pq.search(flat, queries, "vec_id", "embedding", 5)
      .collect().map(_.toString).sorted.toSeq
    assert(full == flatRes, "nprobe = nlist must reduce to the flat ADC scan")
  }

  test("persisted IVF-PQ index round-trips and searches identically") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivfpq_").toString
    try {
      val queries = embeddings.filter($"vec_id" < 10)
      val index = Ann.IvfPq.build(embeddings, "vec_id", "embedding",
        nlist = 8, m = 8, ksub = 16)
      Ann.IvfPq.writeIndex(index, s"$root/idx")
      val loaded = Ann.IvfPq.loadIndex(spark, s"$root/idx")
      val a = Ann.IvfPq.search(index, queries, "vec_id", "embedding", 5, 3)
        .collect().map(_.toString).sorted.toSeq
      val b = Ann.IvfPq.search(loaded, queries, "vec_id", "embedding", 5, 3)
        .collect().map(_.toString).sorted.toSeq
      assert(a == b, "loaded IVF-PQ index must search identically")
      intercept[IllegalArgumentException](
        Ann.IvfPq.loadIndex(spark, s"$root/nonexistent"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(root))
  }

  test("IVF-PQ appendBatch: frozen quantizers index new arrivals in place") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivfpq_app_").toString
    try {
      val base = embeddings.filter($"vec_id" < 400)
      val fresh = embeddings.filter($"vec_id" >= 400)
      val index = Ann.IvfPq.build(base, "vec_id", "embedding",
        nlist = 8, m = 8, ksub = 16, nassign = 2)
      Ann.IvfPq.writeIndex(index, s"$root/idx")
      Ann.IvfPq.appendBatch(spark, s"$root/idx", fresh, "vec_id", "embedding")
      val loaded = Ann.IvfPq.loadIndex(spark, s"$root/idx")
      // the appended rows are searchable: querying the fresh vectors
      // finds themselves (frozen quantizers assigned + encoded them)
      val queries = fresh.filter($"vec_id" < 410)
      val hits = Ann.IvfPq.search(loaded, queries, "vec_id", "embedding",
        k = 3, nprobe = 8)
        .where(col("q_id") === col("id")).count()
      assert(hits == 10, s"appended vectors must find themselves, got $hits/10")
      // codes of appended rows equal a fresh encode under the SAME model
      // (quantizers really were frozen, not refit)
      val stored = loaded.encoded
        .where(col("id") >= 400).select("id", Ann.Pq.CodesCol)
        .dropDuplicates("id").collect()
        .map(r => r.getAs[Long]("id") -> r.getSeq[Short](1)).toMap
      val expect = Ann.Pq.encode(index.model, fresh, "embedding")
        .select(col("vec_id"), col(Ann.Pq.CodesCol)).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Short](1)).toMap
      assert(stored == expect)
      // appending to a non-index path is loud
      intercept[IllegalArgumentException](
        Ann.IvfPq.appendBatch(spark, s"$root/nope", fresh, "vec_id", "embedding"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(root))
  }

  test("IVFADC residual encoding: ADC recall >= plain codes at the same budget") {
    // True IVFADC (residual = true) spends the codebook budget on the
    // residual volume; at an identical (nlist, m, ksub, nprobe) operating
    // point its codes-only recall must not fall below the plain encoding's
    // on this fixture, and the refined path must hold the same floor.
    val queries = embeddings.filter($"vec_id" < 10)
    val exact = Ann.bruteForceTopK(embeddings, queries, "vec_id", "embedding",
      "vec_id", 5)
    val plain = Ann.IvfPq.build(embeddings, "vec_id", "embedding",
      nlist = 16, m = 16, ksub = 64, nassign = 2)
    val resid = Ann.IvfPq.build(embeddings, "vec_id", "embedding",
      nlist = 16, m = 16, ksub = 64, nassign = 2, residual = true)
    assert(resid.residual && !plain.residual)
    def adcRecall(ix: Ann.IvfPqIndex) = Ann.recallAgainstExact(exact,
      Ann.IvfPq.search(ix, queries, "vec_id", "embedding", k = 5, nprobe = 6))
    val (rPlain, rResid) = (adcRecall(plain), adcRecall(resid))
    info(s"ADC-only recall: plain=$rPlain residual=$rResid")
    assert(rResid >= rPlain - 1e-9,
      s"residual recall $rResid fell below plain $rPlain at the same budget")
    val refined = Ann.IvfPq.searchRefined(resid, embeddings, "vec_id",
      "embedding", queries, "vec_id", "embedding", k = 5, nprobe = 6,
      refine = 4)
    val rRef = Ann.recallAgainstExact(exact, refined)
    assert(rRef >= 0.7, s"residual+refine recall $rRef below 0.7")
    // multi-assign + residual: per-cell estimates differ, so the collapse
    // must be deterministic — two independent executions agree exactly
    val s1 = Ann.IvfPq.search(resid, queries, "vec_id", "embedding", 5, 6)
      .collect().map(_.toString).sorted.toSeq
    val s2 = Ann.IvfPq.search(resid, queries.repartition(3), "vec_id",
      "embedding", 5, 6).collect().map(_.toString).sorted.toSeq
    assert(s1 == s2, "residual multi-assign search must be deterministic")
  }

  test("persisted IVFADC index round-trips the residual flag; appendBatch encodes residuals") {
    val root = java.nio.file.Files.createTempDirectory("graft_ivfadc_").toString
    try {
      val base = embeddings.filter($"vec_id" < 400)
      val fresh = embeddings.filter($"vec_id" >= 400)
      val index = Ann.IvfPq.build(base, "vec_id", "embedding",
        nlist = 8, m = 8, ksub = 16, residual = true)
      Ann.IvfPq.writeIndex(index, s"$root/idx")
      val loaded = Ann.IvfPq.loadIndex(spark, s"$root/idx")
      assert(loaded.residual, "residual flag must survive the sidecar")
      val queries = base.filter($"vec_id" < 10)
      val a = Ann.IvfPq.search(index, queries, "vec_id", "embedding", 5, 3)
        .collect().map(_.toString).sorted.toSeq
      val b = Ann.IvfPq.search(loaded, queries, "vec_id", "embedding", 5, 3)
        .collect().map(_.toString).sorted.toSeq
      assert(a == b, "loaded IVFADC index must search identically")
      // frozen-quantizer append: the new rows' RESIDUAL codes make them
      // findable — each appended vector is its own top hit
      Ann.IvfPq.appendBatch(spark, s"$root/idx", fresh, "vec_id", "embedding")
      val re = Ann.IvfPq.loadIndex(spark, s"$root/idx")
      val qf = fresh.filter($"vec_id" < 410)
      val hits = Ann.IvfPq.search(re, qf, "vec_id", "embedding",
        k = 3, nprobe = 8)
        .where(col("q_id") === col("id")).count()
      assert(hits == 10, s"appended vectors must find themselves, got $hits/10")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(root))
  }

  test("marginBitextPairs: planted twins mine as mutual best pairs, hubs score low") {
    val src = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    // targets: exact (scaled) twins of each source plus a HUB that is
    // moderately close to everything
    val tgt = Seq(
      (11L, Array(2.0f, 0.0f, 0.0f)),
      (12L, Array(0.0f, 2.0f, 0.0f)),
      (13L, Array(0.0f, 0.0f, 2.0f)),
      (99L, Array(1.0f, 1.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Ann.marginBitextPairs(src, tgt, "vec_id", "embedding",
      k = 3, threshold = 0.0)
      .collect().map(r => r.getAs[Long]("src_id") ->
        (r.getAs[Long]("tgt_id"), r.getAs[Boolean]("mutual"))).toMap
    assert(out == Map(1L -> ((11L, true)), 2L -> ((12L, true)),
      3L -> ((13L, true))),
      s"each source must mine its twin as the mutual best: $out")
    // the hub is nobody's best pair despite cos ~0.577 with everyone
    assert(!out.values.exists(_._1 == 99L))
    // threshold filters: raising it above every margin empties the result
    val none = Ann.marginBitextPairs(src, tgt, "vec_id", "embedding",
      k = 3, threshold = 99.0)
    assert(none.count() == 0)
    intercept[IllegalArgumentException](
      Ann.marginBitextPairs(src, tgt, "vec_id", "embedding", k = 0))
  }

  test("marginBitextPairsByLanguage: blocks equal direct per-pair mining; oversized buckets fail loud before any plan runs") {
    // one multilingual corpus: en sources, fr/de targets (fr twins of
    // en, de twins rotated) — each language-pair block must mine
    // exactly what a direct marginBitextPairs over its buckets mines
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), "en"),
      (2L, Array(0.0f, 1.0f, 0.0f), "en"),
      (11L, Array(2.0f, 0.0f, 0.0f), "fr"),
      (12L, Array(0.0f, 2.0f, 0.0f), "fr"),
      (13L, Array(1.0f, 1.0f, 1.0f), "fr"),
      (21L, Array(0.9f, 0.1f, 0.0f), "de"),
      (22L, Array(0.1f, 0.9f, 0.0f), "de"))
      .toDF("vec_id", "embedding", "lang")
    val out = Ann.marginBitextPairsByLanguage(corpus, "vec_id", "embedding",
      "lang", Seq("en" -> "fr", "en" -> "de"), k = 2, threshold = 0.0)
    val byPair = out.collect()
      .groupBy(r => (r.getAs[String]("src_lang"), r.getAs[String]("tgt_lang")))
      .view.mapValues(_.map(r =>
        (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"))).toSet).toMap
    def direct(ls: String, lt: String) = Ann.marginBitextPairs(
      corpus.where(col("lang") === ls), corpus.where(col("lang") === lt),
      "vec_id", "embedding", k = 2, threshold = 0.0)
      .collect().map(r =>
        (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"))).toSet
    assert(byPair(("en", "fr")) == direct("en", "fr"))
    assert(byPair(("en", "de")) == direct("en", "de"))
    assert(byPair(("en", "fr")) == Set(1L -> 11L, 2L -> 12L))
    // the planted oversized bucket: fr holds 3 rows; a 2-row contract
    // must refuse loudly, naming the offender, BEFORE mining anything
    val e = intercept[IllegalArgumentException](
      Ann.marginBitextPairsByLanguage(corpus, "vec_id", "embedding",
        "lang", Seq("en" -> "fr"), k = 2, maxBlockRows = 2L))
    assert(e.getMessage.contains("fr=3"), e.getMessage)
    // a requested language missing from the corpus is loud too
    intercept[IllegalArgumentException](
      Ann.marginBitextPairsByLanguage(corpus, "vec_id", "embedding",
        "lang", Seq("en" -> "zz")))
    // self-pairing is a caller bug
    intercept[IllegalArgumentException](
      Ann.marginBitextPairsByLanguage(corpus, "vec_id", "embedding",
        "lang", Seq("en" -> "en")))
  }

  test("cellStats: balance audit flags appendBatch drift, loud off-index") {
    val root = java.nio.file.Files.createTempDirectory("graft_cellstats_").toString
    try {
      val base = embeddings.filter($"vec_id" < 400)
      val index = Ann.IvfPq.build(base, "vec_id", "embedding",
        nlist = 8, m = 8, ksub = 16)
      Ann.IvfPq.writeIndex(index, s"$root/idx")
      val before = Ann.IvfPq.cellStats(spark, s"$root/idx")
        .collect().map(r => r.getAs[Int]("cell") -> r.getAs[Long]("rows")).toMap
      assert(before.values.sum == 400)
      // drift: append many NEAR-copies of one vector (tiny per-row
      // perturbation keeps them distinct, as real drift is) — the
      // vector's cell balloons
      val hot = embeddings.filter($"vec_id" === 3L)
        .select($"embedding").collect().head.getSeq[Float](0)
      val drift = (1000L to 1399L).map { i =>
        val eps = (i % 17).toFloat * 1e-3f
        (i, hot.zipWithIndex.map { case (x, j) =>
          if (j == (i % hot.length).toInt) x + eps else x })
      }.toDF("vec_id", "embedding")
      Ann.IvfPq.appendBatch(spark, s"$root/idx", drift, "vec_id", "embedding")
      val after = Ann.IvfPq.cellStats(spark, s"$root/idx").collect()
      assert(after.map(_.getAs[Long]("rows")).sum == 800)
      val top = after.head
      assert(top.getAs[Double]("mean_ratio") > 2.0,
        s"the hot cell must stand out: ${top}")
      // rows are sorted by ratio descending
      val ratios = after.map(_.getAs[Double]("mean_ratio")).toSeq
      assert(ratios == ratios.sorted.reverse)
      intercept[IllegalArgumentException](
        Ann.IvfPq.cellStats(spark, s"$root/nope"))
      // the evidence-driven loop: split exactly the drifted cell(s) via
      // the Maintenance dispatcher, then the layout is balanced enough
      // that a re-run is a no-op — and every appended row still found
      val hotCell = after.head.getAs[Int]("cell")
      graft.operators.Maintenance.compact(spark, "ivfpq-balance", s"$root/idx")
      val postCells = Ann.IvfPq.loadIndex(spark, s"$root/idx")
        .centroids.map(_._1).toSet
      assert(!postCells.contains(hotCell),
        s"the $hotCell drift cell must have been split: $postCells")
      // a re-run is a bounded step over fresh evidence: it may keep
      // cutting the drift cluster's DESCENDANTS (fresh ids), but the
      // balanced base cells are never touched
      val second = Ann.IvfPq.splitOversizedCells(spark, s"$root/idx")
      val baseCells = before.keySet - hotCell
      assert(second.forall(c => !baseCells.contains(c)),
        s"re-run must never split balanced base cells: $second")
      val loaded = Ann.IvfPq.loadIndex(spark, s"$root/idx")
      val probe = Seq((9999L, hot)).toDF("vec_id", "embedding")
      val hotTop = Ann.IvfPq.search(loaded, probe, "vec_id", "embedding",
        k = 3, nprobe = loaded.centroids.length).collect()
      val dupIds = (1000L to 1399L).toSet + 3L
      assert(hotTop.length == 3 &&
        hotTop.forall(r => dupIds.contains(r.getAs[Long]("id"))),
        s"the hot vector's duplicates must survive the split: " +
          hotTop.map(_.getAs[Long]("id")).mkString(", "))
      // a cell of EXACT duplicates cannot spread — the nightly loop must
      // SKIP it (warn), not throw, and split nothing
      val e1v = embeddings.filter($"vec_id" === 1L)
        .select($"embedding").collect().head.getSeq[Float](0)
      val e2v = embeddings.filter($"vec_id" === 2L)
        .select($"embedding").collect().head.getSeq[Float](0)
      val twoClusters = ((0L until 100L).map(i => (i, e1v)) ++
        (100L until 120L).map(i => (i, e2v))).toDF("vec_id", "embedding")
      val degIdx = Ann.IvfPq.build(twoClusters, "vec_id", "embedding",
        nlist = 2, m = 8, ksub = 4)
      Ann.IvfPq.writeIndex(degIdx, s"$root/deg")
      assert(Ann.IvfPq.splitOversizedCells(spark, s"$root/deg",
        ratioThreshold = 1.2).isEmpty,
        "all-duplicate oversized cells must be skipped, not split or thrown")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(root))
  }

  test("splitCell: sub-cells replace the fat cell exactly; torn splits invisible then GC'd; residual recall holds") {
    val root = java.nio.file.Files.createTempDirectory("graft_split_").toString
    try {
      val queries = embeddings.filter($"vec_id" < 10)
      def results(path: String, nprobe: Int) =
        Ann.IvfPq.search(Ann.IvfPq.loadIndex(spark, path), queries,
          "vec_id", "embedding", 5, nprobe)
          .collect().map(_.toString).sorted.toSeq
      // ---- plain encoding: codes are cell-independent, so a full-probe
      // search must return BIT-IDENTICAL results across the split
      val index = Ann.IvfPq.build(embeddings, "vec_id", "embedding",
        nlist = 8, m = 8, ksub = 16)
      Ann.IvfPq.writeIndex(index, s"$root/idx")
      val before = results(s"$root/idx", nprobe = 8)
      val fat = Ann.IvfPq.cellStats(spark, s"$root/idx")
        .head().getAs[Int]("cell")
      val newIds = Ann.IvfPq.splitCell(spark, s"$root/idx", fat, nsplit = 2)
      assert(newIds.length == 2 && newIds.forall(_ >= 8), s"ids: $newIds")
      val loaded = Ann.IvfPq.loadIndex(spark, s"$root/idx")
      val liveCells = loaded.centroids.map(_._1).toSet
      assert(!liveCells.contains(fat) && newIds.forall(liveCells) &&
        liveCells.size == 9, s"cells after split: $liveCells")
      assert(results(s"$root/idx", nprobe = 9) == before,
        "plain-encoding full-probe results must survive the split bit-for-bit")
      // row count conserved: the sub-cells hold exactly the old cell's rows
      assert(loaded.encoded.count() == index.encoded.count())
      // deletion is DEFERRED: the split cell's directory survives the
      // commit (so a scan planned on the previous sidecar can drain) but
      // is unlisted — invisible to readers, audited as stale
      assert(new java.io.File(s"$root/idx/__cell=$fat").exists(),
        "splitCell must NOT delete the old cell dir at commit time")
      assert(Ann.IvfPq.staleCellDirs(spark, s"$root/idx") == Seq(fat))
      // stale bytes never inflate the balance audit: cellStats is scoped
      // to the sidecar's live cells
      assert(Ann.IvfPq.cellStats(spark, s"$root/idx")
        .agg(sum($"rows")).head().getLong(0) == index.encoded.count(),
        "cellStats must exclude the unlisted stale directory")
      val side = graft.io.Json.parse(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$root/idx", Ann.IvfPq.SidecarFileName))))
      assert(side.get("version").asLong() == 1L)
      // ---- torn split: an unlisted cell directory (crash between data
      // write and sidecar commit) is invisible to readers, audited by
      // staleCellDirs, and GC'd by the next splitCell
      val donor = spark.read.parquet(s"$root/idx/__cell=${newIds.head}")
      donor.write.parquet(s"$root/idx/__cell=99")
      assert(Ann.IvfPq.staleCellDirs(spark, s"$root/idx") == Seq(fat, 99))
      assert(results(s"$root/idx", nprobe = 9) == before,
        "an unlisted (torn) cell directory must not change search results")
      val fat2 = Ann.IvfPq.cellStats(spark, s"$root/idx")
        .where(col("cell").isin(loaded.centroids.map(c => Int.box(c._1)).toSeq: _*))
        .head().getAs[Int]("cell")
      Ann.IvfPq.splitCell(spark, s"$root/idx", fat2, nsplit = 2)
      assert(Ann.IvfPq.staleCellDirs(spark, s"$root/idx") == Seq(fat2),
        "splitCell must GC its predecessors' stale dirs on entry and " +
          "leave only its own deferred old cell")
      assert(!new java.io.File(s"$root/idx/__cell=$fat").exists() &&
        !new java.io.File(s"$root/idx/__cell=99").exists(),
        "entry GC must remove the prior split's old cell and torn orphans")
      assert(results(s"$root/idx", nprobe = 10) == before)
      // splitting an unknown cell is loud
      intercept[IllegalArgumentException](
        Ann.IvfPq.splitCell(spark, s"$root/idx", 9999))
      // ---- residual encoding: split re-quantizes the cell against its
      // sub-centroids (approximate reconstruction) — recall must hold
      val exact = Ann.bruteForceTopK(embeddings, queries,
        "vec_id", "embedding", "vec_id", 5)
      val ridx = Ann.IvfPq.build(embeddings, "vec_id", "embedding",
        nlist = 8, m = 8, ksub = 16, residual = true)
      Ann.IvfPq.writeIndex(ridx, s"$root/ridx")
      val rFat = Ann.IvfPq.cellStats(spark, s"$root/ridx")
        .head().getAs[Int]("cell")
      val preRecall = Ann.recallAgainstExact(exact,
        Ann.IvfPq.search(Ann.IvfPq.loadIndex(spark, s"$root/ridx"), queries,
          "vec_id", "embedding", 5, 8))
      Ann.IvfPq.splitCell(spark, s"$root/ridx", rFat, nsplit = 2)
      val rLoaded = Ann.IvfPq.loadIndex(spark, s"$root/ridx")
      assert(rLoaded.residual, "split must preserve the residual flag")
      val postRecall = Ann.recallAgainstExact(exact,
        Ann.IvfPq.search(rLoaded, queries, "vec_id", "embedding", 5, 9))
      assert(postRecall >= preRecall - 0.1,
        s"residual split recall $postRecall fell too far below $preRecall")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(root))
  }

  test("persisted PQ index round-trips; torn write (no sidecar) is loud") {
    val root = java.nio.file.Files.createTempDirectory("graft_pq_").toString
    try {
      val queries = embeddings.filter($"vec_id" < 10)
      val index = Ann.Pq.build(embeddings, "vec_id", "embedding", m = 8, ksub = 16)
      Ann.Pq.writeIndex(index, s"$root/idx")
      val loaded = Ann.Pq.loadIndex(spark, s"$root/idx")
      assert(loaded.model.codebooks.map(_.toSeq.map(_.toSeq)).toSeq ==
        index.model.codebooks.map(_.toSeq.map(_.toSeq)).toSeq,
        "codebooks must round-trip exactly")
      val a = Ann.Pq.search(index, queries, "vec_id", "embedding", 5)
        .collect().map(_.toString).sorted.toSeq
      val b = Ann.Pq.search(loaded, queries, "vec_id", "embedding", 5)
        .collect().map(_.toString).sorted.toSeq
      assert(a == b, "loaded index must search identically")
      // torn write: data without sidecar must not load
      index.encoded.write.mode("overwrite").parquet(s"$root/torn")
      val e = intercept[IllegalArgumentException](
        Ann.Pq.loadIndex(spark, s"$root/torn"))
      assert(e.getMessage.contains("sidecar"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(root))
  }

  test("slicedWasserstein: zero for identical slices, exact constant-shift replay, loud guards") {
    def run(rows: Seq[(String, Seq[Double])], maxSlices: Int = 64) = {
      val out = Ann.slicedWasserstein(rows.toDF("k", "vec"), "k", "vec",
        directions = 8, grid = 32, salt = 7L, maxSlices = maxSlices)
      val m = out.collect().map(r => (r.getAs[String]("key_a"),
        r.getAs[String]("key_b")) -> ((r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Double]("sw")))).toMap
      graft.core.Caches.releaseCheckpoint(out)
      m
    }
    val base = (1 to 5).map(i => Seq(i.toDouble, 2.0 * i))
    // identical distributions -> every quantile pair coincides -> sw 0
    val same = run(base.map(("A", _)) ++ base.map(("B", _)))
    assert(same == Map(("A", "B") -> ((5L, 5L, 0.0))), same.toString)
    // slice B = A + (10, 10): per direction d the projections shift by
    // 10·(s_{d,0} + s_{d,1}), so every quantile diff is that constant —
    // replay the SrpProject sign hash and compute sw exactly
    def sign(k: Int, j: Int): Int = {
      var h = (k * 73856093L + 7L + j * 19349663L) & 0xFFFFFFFFL
      h = ((h ^ (h >>> 16)) * 0x45d9f3bL) & 0xFFFFFFFFL
      h = ((h ^ (h >>> 16)) * 0x45d9f3bL) & 0xFFFFFFFFL
      h = h ^ (h >>> 16)
      if ((h & 1L) != 0L) -1 else 1
    }
    val shifted = run(base.map(("A", _)) ++
      base.map(v => ("B", v.map(_ + 10.0))))
    val termSum = (0 until 8).map { d =>
      val shift = math.abs(10.0 * (sign(d, 0) + sign(d, 1)))
      32L * math.round(shift * 1e9)
    }.sum
    val want = BigDecimal(termSum.toDouble / 256L / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(shifted == Map(("A", "B") -> ((5L, 5L, want))), shifted.toString)
    // NULL slice keys drop; a NULL vector is refused loudly
    val nk = run(base.map(("A", _)) ++ base.map(("B", _)) :+
      ((null.asInstanceOf[String], Seq(1.0, 1.0))))
    assert(nk.keySet == Set(("A", "B")))
    intercept[IllegalArgumentException](Ann.slicedWasserstein(
      (base.map(("A", _)) :+ (("B", null.asInstanceOf[Seq[Double]])))
        .toDF("k", "vec"), "k", "vec"))
    // loud: < 2 slices; doc-granularity key refused eagerly
    intercept[IllegalArgumentException](run(base.map(("A", _))))
    val e = intercept[IllegalArgumentException](run(
      (1 to 5).flatMap(i => base.map((s"doc_$i", _))), maxSlices = 4))
    assert(e.getMessage.contains("SLICES"), e.getMessage)
  }

  test("recallAudit: pinned regression table across IVF/PQ/IVF-PQ/OPQ budgets") {
    // one diffable table instead of scattered per-spec floors: every
    // stage is deterministic, so these recalls are EXACT pins — an
    // intentional quantizer change must update this table consciously
    val queries = embeddings.filter($"vec_id" < 10)
    // degenerate setup refuses loudly instead of pinning recall = 1.0
    val eEmpty = intercept[IllegalArgumentException](Ann.recallAudit(
      embeddings, embeddings.filter($"vec_id" < 0), "vec_id", "embedding"))
    assert(eEmpty.getMessage.contains("nothing to audit"), eEmpty.getMessage)
    val table = Ann.recallAudit(embeddings, queries, "vec_id", "embedding",
      k = 5, budgets = Seq(1, 2, 4), nlist = 16, m = 8, ksub = 32)
      .collect().map(r => (r.getAs[String]("index_kind"),
        r.getAs[Int]("budget")) -> r.getAs[Double]("recall")).toMap
    println("[recallAudit] " + table.toSeq.sortBy(_._1).mkString(", "))
    // shape: 4 kinds x 3 budgets, all well-defined
    assert(table.size == 12)
    assert(table.values.forall(r => r >= 0.0 && r <= 1.0))
    // budget monotonicity per family (more probes / wider shortlist
    // never lose recall on a fixed deterministic index)
    Seq("ivf", "pq", "ivfpq", "opq").foreach { kind =>
      assert(table((kind, 1)) <= table((kind, 2)) + 1e-9 &&
        table((kind, 2)) <= table((kind, 4)) + 1e-9,
        s"$kind recall not monotone in budget: " +
          Seq(1, 2, 4).map(b => table((kind, b))).mkString(", "))
    }
    // the EXACT pinned table at this audit's operating point (nlist=16,
    // nassign=2, m=8, ksub=32, k=5 over the sf0.001 fixture). The
    // historical per-operating-point floors stay in their own tests
    // above (IVF nassign=3/nprobe=6 >= 0.9, PQ m=16/ksub=64 >= 0.85, …);
    // this table is the cross-family regression record.
    val pinned = Map(
      ("ivf", 1) -> 0.44, ("ivf", 2) -> 0.64, ("ivf", 4) -> 0.86,
      ("pq", 1) -> 0.42, ("pq", 2) -> 0.5, ("pq", 4) -> 0.62,
      ("ivfpq", 1) -> 0.4, ("ivfpq", 2) -> 0.54, ("ivfpq", 4) -> 0.66,
      ("opq", 1) -> 0.42, ("opq", 2) -> 0.54, ("opq", 4) -> 0.64)
    assert(table == pinned,
      s"recall table drifted:\n got $table\n want $pinned")
    // the OPQ rotation must not lose recall vs flat PQ at the widest
    // budget (the allocation's whole point)
    assert(table(("opq", 4)) >= table(("pq", 4)))
  }

  test("slicedWasserstein: partition-invariant, no per-(slice, direction) sort window") {
    // ranks ride keyedRangePrefix (range-repartition + per-physical-
    // partition prefixes + broadcast offsets): a corpus-sized slice
    // must never pin one window task. Pin 1: every executed plan's
    // rank window carries the physical-partition id in its PARTITION
    // spec — a window partitioned by (__k, __d) alone ordering by the
    // projection value is the single-task shape this test keeps out.
    // Pin 2: results are bit-identical at 1 vs 13 input partitions.
    val rows = (1 to 40).map(i => (if (i % 2 == 0) "A" else "B",
      Seq(i.toDouble, 3.0 * i, i / 7.0)))
    def run(parts: Int) = {
      val out = Ann.slicedWasserstein(
        rows.toDF("k", "vec").repartition(parts), "k", "vec",
        directions = 8, grid = 32, salt = 7L)
      val m = out.collect().map(r => (r.getAs[String]("key_a"),
        r.getAs[String]("key_b")) -> ((r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Double]("sw")))).toMap
      graft.core.Caches.releaseCheckpoint(out)
      m
    }
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val one = try run(1)
    finally spark.listenerManager.unregister(listener)
    // flush the async listener bus: wait until no new plans arrive
    var last = -1
    var spins = 0
    while (plans.size() != last && spins < 20) {
      last = plans.size(); spins += 1; Thread.sleep(250)
    }
    assert(plans.size() > 0, "listener captured no plans — the net is dead")
    // the value-ordered rank window must be sub-partition-scoped: no
    // windowspecdefinition partitioned by exactly (__k, __d) over __v
    val offender = """windowspecdefinition\(__k#\d+, __d#\d+, __v#""".r
    plans.forEach { p =>
      assert(offender.findFirstIn(p).isEmpty,
        s"per-(slice, direction) sort window found:\n$p")
    }
    // and the keyedRangePrefix discipline actually ran (pid-scoped window)
    assert(plans.toArray.exists(_.toString.contains(
      "windowspecdefinition(__rp_pid")),
      "expected the keyedRangePrefix pid-scoped rank window in some plan")
    assert(one == run(13), "sliced-Wasserstein must be partition-invariant")
  }
}
