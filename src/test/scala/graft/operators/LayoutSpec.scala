package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Compaction / clustered-layout writers and bloom runtime filters. */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("graft_layout_").toString

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))

  test("writeCompacted hits the requested file count and keeps all rows") {
    val dir = tempDir()
    try {
      val df = spark.range(10000).select(col("id"), rand(7).as("x"))
      Compaction.writeCompacted(df, dir, numFiles = 4)
      assert(parquetFiles(dir).length == 4)
      val back = spark.read.parquet(dir)
      assert(back.count() == 10000)
      assert(back.agg(sum("id")).as[Long].head() == 10000L * 9999 / 2)
    } finally cleanup(dir)
  }

  test("targetFileCount sizes from bytes and clamps") {
    val dir = tempDir()
    try {
      spark.range(20000).select(col("id"), sha2(col("id").cast("string"), 256).as("h"))
        .coalesce(1).write.parquet(dir + "/t")
      val scan = spark.read.parquet(dir + "/t")
      val bytes = Compaction.estimatedBytes(scan).toLong
      assert(bytes > 0)
      // ~bytes/target files, never 0, never above the clamp
      assert(Compaction.targetFileCount(scan, bytes + 1) == 1)
      val n = Compaction.targetFileCount(scan, math.max(bytes / 7, 1))
      assert(n >= 7 && n <= 8)
      assert(Compaction.targetFileCount(scan, 1, maxFiles = 5) == 5)
    } finally cleanup(dir)
  }

  test("writeClustered gives files disjoint ranges of the cluster column") {
    val dir = tempDir()
    try {
      // write in scrambled order; clustering must still localize ranges
      val df = spark.range(8000)
        .select((col("id") * 2654435761L % 8000).as("k"), col("id").as("v"))
      Compaction.writeClustered(df, dir, Seq("k"), numFiles = 4)
      assert(parquetFiles(dir).length == 4)
      val perFile = spark.read.parquet(dir)
        .select(input_file_name().as("f"), col("k"))
        .groupBy("f").agg(min("k").as("lo"), max("k").as("hi"))
        .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
        .sortBy(_._1)
      perFile.sliding(2).foreach {
        case Array((_, hi), (lo2, _)) => assert(hi <= lo2,
          s"file ranges overlap: hi=$hi lo2=$lo2")
        case _ =>
      }
      assert(spark.read.parquet(dir).count() == 8000)
    } finally cleanup(dir)
  }

  test("compactInPlace swaps layout atomically and preserves data") {
    val dir = tempDir() + "/t"
    try {
      spark.range(5000).select(col("id"), (col("id") % 13).as("k"))
        .repartition(24).write.parquet(dir)
      assert(parquetFiles(dir).length == 24)
      Compaction.compactInPlace(spark, dir, targetFileBytes = Long.MaxValue)
      assert(parquetFiles(dir).length == 1)
      val back = spark.read.parquet(dir)
      assert(back.count() == 5000)
      assert(back.agg(sum("id")).as[Long].head() == 5000L * 4999 / 2)
      // no staging/old leftovers
      val parent = new java.io.File(dir).getParentFile
      assert(!parent.listFiles().exists(_.getName.contains("__graft_")))
    } finally cleanup(new java.io.File(dir).getParent)
  }

  test("compactInPlace refuses a partitionBy-layout directory") {
    val dir = tempDir() + "/t"
    try {
      spark.range(100).select(col("id"), (col("id") % 3).as("p"))
        .write.partitionBy("p").parquet(dir)
      val e = intercept[IllegalArgumentException] {
        Compaction.compactInPlace(spark, dir)
      }
      assert(e.getMessage.contains("partitioned layout"))
    } finally cleanup(new java.io.File(dir).getParent)
  }

  test("bloomSemiFilter never drops a true match and does prune") {
    val big = spark.range(50000).select(col("id").as("k"), (col("id") * 3).as("v"))
    val small = spark.range(100).select((col("id") * 500).as("k"))
    val pruned = RuntimeFilters.bloomSemiFilter(big, "k", small, "k")
    val prunedCount = pruned.count()
    // all 100 true matches survive
    assert(pruned.join(small, "k").count() == 100)
    // 1% fpp on 50k rows: expect ~100 + ~500 false positives, far below 50k
    assert(prunedCount >= 100 && prunedCount < 5000,
      s"prunedCount=$prunedCount")
  }

  test("bloomPrunedJoin equals the plain join; rejects unsafe join types") {
    val big = spark.range(20000)
      .select(col("id").as("k"), sha2(col("id").cast("string"), 256).as("pay"))
    val small = spark.range(50).select((col("id") * 400).as("sk"), lit("d").as("tag"))
    val expected = big.join(small, big("k") === small("sk"))
      .select("k", "tag").as[(Long, String)].collect().toSet
    val got = RuntimeFilters.bloomPrunedJoin(big, "k", small, "sk")
      .select("k", "tag").as[(Long, String)].collect().toSet
    assert(got == expected)
    val e = intercept[IllegalArgumentException] {
      RuntimeFilters.bloomPrunedJoin(big, "k", small, "sk", joinType = "left_outer")
    }
    assert(e.getMessage.contains("bloom pruning"))
  }

  test("bloomPrunedJoin with same-named keys emits ONE key column") {
    val big = spark.range(5000).select(col("id").as("k"), (col("id") % 7).as("v"))
    val small = spark.range(20).select((col("id") * 100).as("k"), lit("d").as("tag"))
    val out = RuntimeFilters.bloomPrunedJoin(big, "k", small, "k")
    // USING-form join: no ambiguous duplicate pair, key selectable by name
    assert(out.columns.count(_ == "k") == 1)
    assert(out.select("k", "tag").as[(Long, String)].collect().toSet ==
      big.join(small, Seq("k")).select("k", "tag")
        .as[(Long, String)].collect().toSet)
  }

  test("bloom auto-sizing caches the small side only for the call") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val big = spark.range(1000).select(col("id").as("k"))
    val small = spark.range(10).select((col("id") * 50).as("k"))
    // semi filter: cache is internal and released before returning
    RuntimeFilters.bloomSemiFilter(big, "k", small, "k").count()
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
    // pruned join: self-contained too — nothing cached survives the call,
    // even without a collectPins scope (the long-lived-session contract)
    val out = RuntimeFilters.bloomPrunedJoin(big, "k", small, "k")
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
    assert(out.count() == 10)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("bloom works on string keys and treats null keys as non-matching") {
    val big = Seq(Some("a"), Some("b"), Some("zz"), None)
      .toDF("k")
    val small = Seq("a", "b").toDF("k")
    val bf = RuntimeFilters.bloomOf(small, "k")
    val kept = big.where(graft.functions.BloomFunctions.mightContain(col("k"), bf))
      .as[Option[String]].collect().toSet
    assert(kept.contains(Some("a")) && kept.contains(Some("b")))
    assert(!kept.contains(None))
  }

  test("zorderKey interleaves bit-planes (hand-checked Morton codes)") {
    // 2 bits, 2 cols scaled over [0,3]: z(x=3,y=0)=0b0101, z(0,3)=0b1010
    val stats = Map("x" -> ((0.0, 3.0)), "y" -> ((0.0, 3.0)))
    val out = Seq((0, 0), (3, 0), (0, 3), (3, 3), (2, 1)).toDF("x", "y")
      .select(col("x"), col("y"),
        Compaction.zorderKey(Seq("x", "y"), stats, bits = 2).as("z"))
      .as[(Int, Int, Long)].collect().map { case (x, y, z) => (x, y) -> z }.toMap
    assert(out((0, 0)) == 0L && out((3, 0)) == 5L && out((0, 3)) == 10L
      && out((3, 3)) == 15L && out((2, 1)) == 6L) // 2=0b10,1=0b01 -> 0b0110
  }

  test("writeZOrdered bounds per-file spans in BOTH dimensions") {
    val dir = tempDir()
    val dirX = tempDir()
    try {
      // a 100x100 grid; single-column clustering leaves the other
      // dimension's span at ~99 in every file, z-order bounds both
      val grid = spark.range(10000)
        .select((col("id") / 100).cast("int").as("x"),
          (col("id") % 100).cast("int").as("y"))
      Compaction.writeZOrdered(grid, dir, Seq("x", "y"), numFiles = 16)
      Compaction.writeClustered(grid, dirX, Seq("x"), numFiles = 16)
      def spans(d: String): Seq[(Long, Long)] = spark.read.parquet(d)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .select("sx", "sy").as[(Long, Long)].collect().toSeq
      val z = spans(dir)
      val c = spans(dirX)
      // content identical
      assert(spark.read.parquet(dir).as[(Int, Int)].collect().sorted.toSeq
        == grid.as[(Int, Int)].collect().sorted.toSeq)
      // most z-ordered files cover a bounded rectangle in BOTH dims (a
      // file whose Morton range straddles a quadrant boundary may span
      // wide in one dim — that's inherent to the curve, so count, don't
      // forall); the x-clustered layout bounds y in NO file
      def bounded(s: Seq[(Long, Long)]) =
        s.count { case (sx, sy) => sx <= 50 && sy <= 50 }
      assert(bounded(z) >= z.size * 3 / 4, s"z-order spans too wide: $z")
      assert(bounded(c) == 0, s"x-clustered should not bound y: $c")
    } finally { cleanup(dir); cleanup(dirX) }
  }

  test("hilbert curve: bijective, unit-step adjacent, fixed origin — across dims and bits") {
    // the defining Hilbert property Morton lacks: SORTED BY KEY, every
    // consecutive cell pair differs by exactly 1 in exactly one dim
    for ((n, bits) <- Seq((2, 1), (2, 3), (3, 2))) {
      val side = 1 << bits
      val cells = (0 until math.pow(side, n).toInt).map { i =>
        val coord = Array.tabulate(n)(d =>
          ((i / math.pow(side, d).toInt) % side).toLong)
        coord -> graft.functions.HilbertCurve.encode(coord.clone(), bits)
      }
      val keys = cells.map(_._2)
      assert(keys.toSet == (0 until keys.size).map(_.toLong).toSet,
        s"n=$n bits=$bits: not a bijection onto [0, ${keys.size})")
      val byKey = cells.sortBy(_._2).map(_._1)
      byKey.sliding(2).foreach { case Seq(a, b) =>
        val diffs = a.zip(b).map { case (x, y) => math.abs(x - y) }
        assert(diffs.sum == 1,
          s"n=$n bits=$bits: non-unit step ${a.toList} -> ${b.toList}")
      }
      assert(cells.find(_._1.forall(_ == 0L)).get._2 == 0L,
        "origin must map to key 0")
    }
  }

  test("hilbertKey stays in whole-stage codegen and matches the static transform") {
    val stats = Map("x" -> ((0.0, 7.0)), "y" -> ((0.0, 7.0)))
    val df = spark.range(64)
      .select((col("id") / 8).cast("int").as("x"),
        (col("id") % 8).cast("int").as("y"))
      .select(col("x"), col("y"),
        Compaction.hilbertKey(Seq("x", "y"), stats, bits = 3).as("h"))
    // the projection containing the key must be inside a codegen span —
    // the compact plan form marks codegen'd operators with `*(id)`; a
    // CodegenFallback expression would strip the star from its Project
    val plan = df.queryExecution.executedPlan.toString
    val keyLine = plan.linesIterator
      .find(_.contains("graft_hilbert_key")).getOrElse("")
    assert(keyLine.replaceFirst("^[\\s+-]*", "").startsWith("*("),
      s"hilbert projection not codegen'd:\n$plan")
    val got = df.as[(Int, Int, Long)].collect()
      .map { case (x, y, h) => (x, y) -> h }.toMap
    for (x <- 0 until 8; y <- 0 until 8)
      assert(got((x, y)) ==
        graft.functions.HilbertCurve.encode(Array(x.toLong, y.toLong), 3))
  }

  test("writeHilbert bounds per-file spans at least as tightly as z-order") {
    val dirH = tempDir()
    val dirZ = tempDir()
    try {
      val grid = spark.range(10000)
        .select((col("id") / 100).cast("int").as("x"),
          (col("id") % 100).cast("int").as("y"))
      Compaction.writeHilbert(grid, dirH, Seq("x", "y"), numFiles = 16)
      Compaction.writeZOrdered(grid, dirZ, Seq("x", "y"), numFiles = 16)
      def boxes(d: String): Seq[Long] = spark.read.parquet(d)
        .groupBy(input_file_name())
        .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).as("vol"))
        .select("vol").as[Long].collect().toSeq
      // content identical
      assert(spark.read.parquet(dirH).as[(Int, Int)].collect().sorted.toSeq
        == grid.as[(Int, Int)].collect().sorted.toSeq)
      // every hilbert file covers a bounded rectangle (the curve never
      // teleports — no straddle exemption needed, unlike the Morton
      // test above), and the total bounding-box volume is no worse
      // than Morton's
      val h = boxes(dirH)
      val z = boxes(dirZ)
      h.foreach(v => assert(v <= 2600, s"hilbert file box too big: $h"))
      assert(h.sum <= z.sum, s"hilbert ${h.sum} vs z-order ${z.sum}")
    } finally { cleanup(dirH); cleanup(dirZ) }
  }

  test("layoutReport audits files, row groups, stats, blooms and dictionaries") {
    val dir = tempDir()
    try {
      val df = spark.range(4000).select(col("id"),
        (col("id") % 5).cast("string").as("cat"),
        sha2(col("id").cast("string"), 256).as("payload"))
      Compaction.writeCompacted(df, dir, numFiles = 2,
        bloomFilters = Map("id" -> 4000L))
      val rep = Compaction.layoutReport(spark, dir).collect()
      assert(rep.map(_.getAs[String]("file")).distinct.length == 2)
      // every row group reports every column
      assert(rep.map(_.getAs[String]("column")).distinct.sorted.toSeq ==
        Seq("cat", "id", "payload"))
      // row counts per column agree and sum to the table
      val idRows = rep.filter(_.getAs[String]("column") == "id")
      assert(idRows.map(_.getAs[Long]("n_rows")).sum == 4000L)
      // bloom exactly where requested
      assert(rep.forall(r =>
        r.getAs[Boolean]("has_bloom") == (r.getAs[String]("column") == "id")))
      // min/max stats present everywhere; the 5-value cat column
      // dictionary-encodes, the sha payload column may not
      assert(rep.forall(_.getAs[Boolean]("has_min_max")))
      assert(rep.filter(_.getAs[String]("column") == "cat")
        .forall(_.getAs[Boolean]("has_dictionary")))
      assert(rep.forall(r => r.getAs[Long]("compressed_bytes") > 0 &&
        r.getAs[Long]("uncompressed_bytes") > 0))
      // missing path fails loud (FileNotFound from the listing itself)
      intercept[Exception](
        Compaction.layoutReport(spark, dir + "/definitely-missing"))
    } finally org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir))
  }

  test("write-side parquet bloom filters land in the footer and answer membership") {
    import scala.jdk.CollectionConverters._
    val dir = tempDir()
    try {
      val df = spark.range(5000).select(col("id"),
        sha2(col("id").cast("string"), 256).as("payload"))
      Compaction.writeCompacted(df, dir, numFiles = 1,
        bloomFilters = Map("id" -> 5000L))
      val file = parquetFiles(dir).head
      val conf = spark.sessionState.newHadoopConf()
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(file.getAbsolutePath), conf))
      try {
        val rg = reader.getRowGroups.get(0)
        val idChunk = rg.getColumns.asScala
          .find(_.getPath.toDotString == "id").get
        assert(idChunk.getBloomFilterOffset >= 0,
          "id column chunk carries no bloom filter offset")
        val payloadChunk = rg.getColumns.asScala
          .find(_.getPath.toDotString == "payload").get
        assert(payloadChunk.getBloomFilterOffset < 0,
          "bloom filter leaked onto a column that didn't ask for one")
        val bloom = reader.getBloomFilterDataReader(rg).readBloomFilter(idChunk)
        assert(bloom != null)
        // no false negatives on present keys...
        (0L until 5000L by 97L).foreach { v =>
          assert(bloom.findHash(bloom.hash(v)), s"present key $v missed")
        }
        // ...and absent keys overwhelmingly rejected (the pruning signal)
        val falsePos =
          (100000L until 101000L).count(v => bloom.findHash(bloom.hash(v)))
        assert(falsePos < 100, s"bloom too weak to prune: $falsePos/1000 hits")
      } finally reader.close()
      // readers that ignore bloom filters still see every row
      assert(spark.read.parquet(dir).count() == 5000)
    } finally cleanup(dir)
  }

  test("writeClustered + bloom: point lookup reads the file correctly") {
    val dir = tempDir()
    try {
      val df = spark.range(4000).select(col("id"),
        (col("id") % 7).as("grp"))
      Compaction.writeClustered(df, dir, Seq("id"), numFiles = 4,
        bloomFilters = Map("id" -> 4000L))
      val hit = spark.read.parquet(dir).where(col("id") === 1234L).collect()
      assert(hit.length == 1 && hit.head.getLong(1) == 1234L % 7)
      assert(spark.read.parquet(dir).where(col("id") === 999999L).isEmpty)
    } finally cleanup(dir)
  }
}
