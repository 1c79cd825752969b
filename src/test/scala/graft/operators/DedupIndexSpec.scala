package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val base = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "entirely different sentence about distributed query planning"),
    (3L, "a third unrelated document mentioning parquet row groups")
  ).toDF("doc_id", "text")

  test("dedupAgainstIndex drops index near-dups, keeps novel docs") {
    val index = DedupIndex.indexRowsFor(base, "doc_id", "text")
    val batch = Seq(
      // near-dup of doc 1 (small suffix edit)
      (10L, "the quick brown fox jumps over the lazy dog again and again ok"),
      // novel
      (11L, "completely fresh content never seen in the historical corpus"),
      // exact re-delivery of doc 2
      (12L, "entirely different sentence about distributed query planning")
    ).toDF("doc_id", "text")

    val matches = DedupIndex.matchesAgainstIndex(
      batch, "doc_id", "text", index)
    val matchedPairs = matches.select("batch_id", "index_id").as[(Long, Long)]
      .collect().toSet
    assert(matchedPairs.contains((10L, 1L)))
    assert(matchedPairs.contains((12L, 2L)))
    assert(!matchedPairs.exists(_._1 == 11L))

    val survivors = DedupIndex.dedupAgainstIndex(
      batch, "doc_id", "text", index)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(11L))
  }

  test("empty index passes everything through; empty text always survives") {
    val empty = DedupIndex.indexRowsFor(base.limit(0), "doc_id", "text")
    val batch = Seq((20L, "anything at all"), (21L, "   ")).toDF("doc_id", "text")
    val out = DedupIndex.dedupAgainstIndex(batch, "doc_id", "text", empty)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(20L, 21L))
    // whitespace-only docs survive even against a populated index
    val out2 = DedupIndex.dedupAgainstIndex(
      batch, "doc_id", "text", DedupIndex.indexRowsFor(base, "doc_id", "text"))
      .select("doc_id").as[Long].collect().toSet
    assert(out2.contains(21L))
  }

  test("ingestBatch dedups within the batch first, then against the index") {
    val index = DedupIndex.indexRowsFor(base, "doc_id", "text")
    val batch = Seq(
      (30L, "brand new material for the corpus to learn from today"),
      // within-batch near-dup of 30 — min id survives
      (31L, "brand new material for the corpus to learn from today yes"),
      // index near-dup of doc 3
      (32L, "a third unrelated document mentioning parquet row groups")
    ).toDF("doc_id", "text")
    val (survivors, newRows) = DedupIndex.ingestBatch(
      batch, "doc_id", "text", index)
    assert(survivors.select("doc_id").as[Long].collect().toSet == Set(30L))
    // new index rows cover exactly the survivors, one row per band
    val ids = newRows.select("__id").distinct().as[Long].collect().toSet
    assert(ids == Set(30L))
    assert(newRows.count() == 4) // default bands = 4
    // appending keeps the updated index probe-consistent: re-delivering the
    // survivor next batch is now caught
    val updated = index.unionByName(newRows)
    val redelivered = Seq((40L,
      "brand new material for the corpus to learn from today")).toDF("doc_id", "text")
    val out = DedupIndex.dedupAgainstIndex(
      redelivered, "doc_id", "text", updated)
    assert(out.isEmpty)
  }

  test("writeIndex partitions by band and round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ddidx_").toString
    try {
      DedupIndex.writeIndex(
        DedupIndex.indexRowsFor(base, "doc_id", "text"), dir)
      assert(new java.io.File(dir).listFiles()
        .exists(_.getName.startsWith("__band=")))
      val back = spark.read.parquet(dir)
      assert(back.select("__id").distinct().count() == 3)
      val survivors = DedupIndex.dedupAgainstIndex(
        base.select(col("doc_id") + 100 as "doc_id", col("text")),
        "doc_id", "text", back)
      assert(survivors.isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("parameter mismatch between index and probe is a loud error") {
    val index = DedupIndex.indexRowsFor(base, "doc_id", "text", numPerms = 8)
    val e = intercept[IllegalArgumentException] {
      DedupIndex.matchesAgainstIndex(
        base, "doc_id", "text", index, numPerms = 16).collect()
    }
    assert(e.getMessage.contains("numPerms"))
  }

  test("params sidecar: loadIndex and append both reject build/probe drift") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ddidx_sc_").toString
    try {
      DedupIndex.writeIndex(
        DedupIndex.indexRowsFor(base, "doc_id", "text"), dir)
      assert(new java.io.File(dir, DedupIndex.ParamsFileName).exists())
      // matching params round-trip
      assert(DedupIndex.loadIndex(spark, dir)
        .select("__id").distinct().count() == 3)
      // probe-side drift: bands differ — not detectable from the rows,
      // only from the sidecar
      val e1 = intercept[IllegalArgumentException] {
        DedupIndex.loadIndex(spark, dir, bands = 8)
      }
      assert(e1.getMessage.contains("must match"))
      // shingleSize drift is equally loud
      intercept[IllegalArgumentException] {
        DedupIndex.loadIndex(spark, dir, shingleSize = 5)
      }
      // append-side drift: writing rows built with other params is refused
      val e2 = intercept[IllegalArgumentException] {
        DedupIndex.writeIndex(
          DedupIndex.indexRowsFor(base, "doc_id", "text",
            numPerms = 8, bands = 2), dir, numPerms = 8, bands = 2)
      }
      assert(e2.getMessage.contains("must match"))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("writeIndex refuses claimed params that contradict the rows themselves") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ddidx_rows_").toString
    try {
      // rows built 8-banded, claimed 4-banded: the sidecar would record 4
      // and every later probe would silently miss — must fail loud instead
      val rows8 = DedupIndex.indexRowsFor(base, "doc_id", "text",
        numPerms = 16, bands = 8)
      val e1 = intercept[IllegalArgumentException] {
        DedupIndex.writeIndex(rows8, dir, numPerms = 16, bands = 4)
      }
      assert(e1.getMessage.contains("bands"))
      // rows built with 8 perms, claimed 16
      val rowsP8 = DedupIndex.indexRowsFor(base, "doc_id", "text",
        numPerms = 8, bands = 4)
      val e2 = intercept[IllegalArgumentException] {
        DedupIndex.writeIndex(rowsP8, dir, numPerms = 16, bands = 4)
      }
      assert(e2.getMessage.contains("numPerms"))
      // nothing was committed by the refused writes
      assert(!new java.io.File(dir, DedupIndex.ParamsFileName).exists())
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("first sidecar on a legacy index validates against the band layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ddidx_lg_").toString
    try {
      // legacy: rows written without a sidecar (plain parquet append)
      DedupIndex.indexRowsFor(base, "doc_id", "text", numPerms = 16, bands = 8)
        .write.mode("append").partitionBy("__band").parquet(dir)
      assert(!new java.io.File(dir, DedupIndex.ParamsFileName).exists())
      // stamping a sidecar with a contradicting band count is refused
      val e = intercept[IllegalArgumentException] {
        DedupIndex.writeIndex(
          DedupIndex.indexRowsFor(base, "doc_id", "text",
            numPerms = 16, bands = 4), dir, numPerms = 16, bands = 4)
      }
      assert(e.getMessage.contains("band partitions"))
      // the matching appender stamps it fine
      DedupIndex.writeIndex(
        DedupIndex.indexRowsFor(base, "doc_id", "text",
          numPerms = 16, bands = 8), dir, numPerms = 16, bands = 8)
      assert(new java.io.File(dir, DedupIndex.ParamsFileName).exists())
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("compactIndex shrinks files, keeps layout, sidecar, and probe results") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ddidx_cp_").toString
    try {
      // three appends of pre-spread rows → many small files per band
      (0 until 3).foreach { i =>
        val shard = base.select(
          (col("doc_id") + i * 100).as("doc_id"), col("text"))
        DedupIndex.writeIndex(
          DedupIndex.indexRowsFor(shard, "doc_id", "text").repartition(4), dir)
      }
      def parquetFiles = org.apache.commons.io.FileUtils
        .listFiles(new java.io.File(dir),
          Array("parquet"), true).size
      val before = spark.read.parquet(dir).orderBy("__id", "__band")
        .collect().toSeq
      val filesBefore = parquetFiles
      DedupIndex.compactIndex(spark, dir)
      // data identical, fewer files, band layout + sidecar intact
      assert(spark.read.parquet(dir).orderBy("__id", "__band")
        .collect().toSeq == before)
      assert(parquetFiles < filesBefore, s"$parquetFiles vs $filesBefore")
      assert(new java.io.File(dir).listFiles()
        .exists(_.getName.startsWith("__band=")))
      assert(new java.io.File(dir, DedupIndex.ParamsFileName).exists())
      // loadIndex still validates; a dup probe still matches
      val matched = DedupIndex.dedupAgainstIndex(
        base, "doc_id", "text", DedupIndex.loadIndex(spark, dir))
      assert(matched.isEmpty) // every base doc is in the index
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("broadcastBatch=false matches the broadcast plan's results") {
    val index = DedupIndex.indexRowsFor(base, "doc_id", "text")
    val batch = Seq(
      (50L, "the quick brown fox jumps over the lazy dog again and again"),
      (51L, "novel row")
    ).toDF("doc_id", "text")
    val a = DedupIndex.dedupAgainstIndex(batch, "doc_id", "text", index,
      broadcastBatch = true).select("doc_id").as[Long].collect().toSet
    val b = DedupIndex.dedupAgainstIndex(batch, "doc_id", "text", index,
      broadcastBatch = false).select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }
}
