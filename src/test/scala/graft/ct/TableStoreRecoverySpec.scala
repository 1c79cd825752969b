package graft.ct

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase

/** State-matrix test for [[TableStore]] crash recovery: fabricates each
  * distinct intermediate on-disk layout a crashed swap can leave (staging ±
  * marker, dest ± marker, old, in combination) and asserts the recovery
  * outcome — roll forward, roll back, or loud failure. Each layout is named
  * for the crash point that produces it.
  */
class TableStoreRecoverySpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTarget(): String = {
    val dir = Files.createTempDirectory("graft_tsr_").toString
    s"$dir/tbl"
  }

  private def df(vals: Int*): DataFrame = vals.toDF("v")
  private def readVals(target: String): Set[Int] =
    spark.read.parquet(target).as[Int].collect().toSet

  /** Write a complete staged snapshot (parquet + marker) as a finished
    * staging write would leave it.
    */
  private def fabricateStaging(target: String, data: DataFrame,
      markerLines: String = "\n\nEND\n"): String = {
    val staging = target + "__graft_staging__"
    data.write.mode("overwrite").parquet(staging)
    Files.write(Paths.get(staging, "_GRAFT_STAGED"), markerLines.getBytes("UTF-8"))
    staging
  }

  test("flat: staging+marker and old present rolls the swap forward") {
    // crash point: after dest→old rename, before staging→dest rename
    val target = tmpTarget()
    fabricateStaging(target, df(10, 11))
    val old = target + "__graft_old__"
    df(1, 2).write.parquet(old) // pre-merge snapshot, already moved aside
    TableStore.append(df(99), target) // entry point runs recoverFlat
    assert(readVals(target) == Set(10, 11, 99))
    assert(!Files.exists(Paths.get(target + "__graft_staging__")))
    assert(!Files.exists(Paths.get(old)))
    assert(!Files.exists(Paths.get(target, "_GRAFT_STAGED")),
      "marker must not survive into the committed table")
  }

  test("exists() recovers a crashed swap first, so merges never duplicate keys") {
    // crash point: dest renamed aside, staging complete — a bare fs.exists
    // would say "no table", and an SCD merge would take the create/append
    // branch, stacking the whole batch on top of the later-recovered table
    val target = tmpTarget()
    fabricateStaging(target, df(10, 11))
    df(1, 2).write.parquet(target + "__graft_old__")
    assert(TableStore.exists(spark, target), "exists must answer post-recovery")
    assert(readVals(target) == Set(10, 11), "recovery rolled the swap forward")
    // end-to-end: an SCD1 merge after the crash updates, never duplicates
    val t2 = tmpTarget()
    import org.apache.spark.sql.functions.col
    df(1).withColumnRenamed("v", "id").withColumn("s", col("id") * 10)
      .write.parquet(t2 + "__graft_old__")
    val staged = df(1, 2).withColumnRenamed("v", "id")
      .withColumn("s", col("id") * 10)
    fabricateStaging(t2, staged)
    // the fabricated crash predates the merge, so the recovered table has
    // no row_hash column yet — evolution adds it
    ChangeTracking.currentOnlyUpsert(spark, staged, t2, Seq("id"),
      allowSchemaEvolution = true)
    val rows = spark.read.parquet(t2).groupBy("id").count()
      .as[(Long, Long)].collect().toMap
    assert(rows.values.forall(_ == 1L),
      s"exactly one current row per key after crash+merge, got $rows")
  }

  test("flat: marker inside dest + old present finishes cleanup forward") {
    // crash point: after staging→dest rename (marker rode along), before
    // delete(old) — the swap IS complete; recovery must not reject it
    val target = tmpTarget()
    df(10, 11).write.parquet(target)
    Files.write(Paths.get(target, "_GRAFT_STAGED"), "\n\nEND\n".getBytes("UTF-8"))
    df(1, 2).write.parquet(target + "__graft_old__")
    TableStore.append(df(99), target)
    assert(readVals(target) == Set(10, 11, 99))
    assert(!Files.exists(Paths.get(target + "__graft_old__")))
    assert(!Files.exists(Paths.get(target, "_GRAFT_STAGED")))
  }

  test("flat: old without any marker or dest restores the pre-merge snapshot") {
    // crash point: between dest→old and staging→dest, with staging also dead
    val target = tmpTarget()
    df(1, 2).write.parquet(target + "__graft_old__")
    TableStore.overwrite(spark, df(50), target)
    // recovery restored old→dest, then the overwrite replaced it
    assert(readVals(target) == Set(50))
    assert(!Files.exists(Paths.get(target + "__graft_old__")))
  }

  test("flat: old alongside dest with no marker anywhere fails loudly") {
    val target = tmpTarget()
    df(1, 2).write.parquet(target)
    df(3, 4).write.parquet(target + "__graft_old__")
    val ex = intercept[IllegalStateException] {
      TableStore.overwrite(spark, df(50), target)
    }
    assert(ex.getMessage.contains("unrecognized crash state"))
    assert(readVals(target) == Set(1, 2), "loud failure must not touch data")
  }

  test("flat: truncated or malformed marker fails loudly, never rolls forward") {
    // single line without terminator — neither current nor legacy format
    val t1 = tmpTarget()
    df(1).write.parquet(t1)
    fabricateStaging(t1, df(10), markerLines = "12,34")
    val e1 = intercept[IllegalStateException](TableStore.overwrite(spark, df(5), t1))
    assert(e1.getMessage.contains("corrupt"))
    assert(readVals(t1) == Set(1))
    // non-integer bucket id with a valid terminator
    val t2 = tmpTarget()
    df(1).write.parquet(t2)
    fabricateStaging(t2, df(10), markerLines = "12,3x\n\nEND\n")
    val e2 = intercept[IllegalStateException](TableStore.overwrite(spark, df(5), t2))
    assert(e2.getMessage.contains("corrupt"))
  }

  test("flat: two-line marker (no END) fails loudly — torn legacy writes are ambiguous") {
    // the pre-terminator writer was non-atomic, so a two-line payload is
    // indistinguishable from a torn write with the emptied list lost;
    // rolling it forward could silently resurrect an emptied bucket.
    // Ambiguity = loud error, data untouched.
    val target = tmpTarget()
    df(1, 2).write.parquet(target)
    fabricateStaging(target, df(10, 11), markerLines = "\n\n")
    val e = intercept[IllegalStateException](TableStore.append(df(99), target))
    assert(e.getMessage.contains("corrupt"))
    assert(readVals(target) == Set(1, 2), "loud failure must not touch data")
  }

  /** Run crash recovery on `target` directly (as every write entry point
    * does), without also writing data — lets cross-mode dispatch be asserted
    * on the recovered layout alone.
    */
  private def runRecover(target: String): Unit = {
    val dest = new org.apache.hadoop.fs.Path(target)
    val fs = dest.getFileSystem(spark.sessionState.newHadoopConf())
    TableStore.recover(fs,
      new org.apache.hadoop.fs.Path(target + "__graft_staging__"), dest,
      new org.apache.hadoop.fs.Path(target + "__graft_old__"), target)
  }

  test("recovery dispatches on marker shape, not on the write API invoked") {
    // a crashed BUCKETED swap must replay bucket-wise no matter which entry
    // point runs recovery — renaming the partial-bucket staging over dest
    // would silently drop every untouched bucket
    val target = tmpTarget()
    TableStore.appendBucketed(bucketDf(1 -> 0, 2 -> 1), target)
    val staging = target + "__graft_staging__"
    bucketDf(10 -> 0).write.mode("overwrite")
      .partitionBy(TableStore.BucketCol).parquet(staging)
    Files.write(Paths.get(staging, "_GRAFT_STAGED"), "0\n\nEND\n".getBytes("UTF-8"))
    runRecover(target)
    val got = spark.read.parquet(target)
      .select("v", TableStore.BucketCol).as[(Int, Int)].collect().toSet
    assert(got == Set(10 -> 0, 2 -> 1),
      "bucket 0 rewritten, untouched bucket 1 preserved")
    assert(!Files.exists(Paths.get(staging)))

    // a crashed FLAT swap (empty bucket list) must replay as a flat rename —
    // bucket-wise replay would no-op the swap and then delete both copies
    val t2 = tmpTarget()
    bucketDf(1 -> 0).write.partitionBy(TableStore.BucketCol).parquet(t2)
    val s2 = t2 + "__graft_staging__"
    bucketDf(10 -> 0, 20 -> 1).write.mode("overwrite")
      .partitionBy(TableStore.BucketCol).parquet(s2)
    Files.write(Paths.get(s2, "_GRAFT_STAGED"), "\n\nEND\n".getBytes("UTF-8"))
    runRecover(t2)
    val got2 = spark.read.parquet(t2)
      .select("v", TableStore.BucketCol).as[(Int, Int)].collect().toSet
    assert(got2 == Set(10 -> 0, 20 -> 1))
    assert(!Files.exists(Paths.get(t2, "_GRAFT_STAGED")))
    assert(!Files.exists(Paths.get(s2)))
  }

  test("flat: crash after old-delete but before marker-delete recovers cleanly") {
    // the exact window the delete ordering protects: dest committed with the
    // marker still inside, old already gone, staging gone
    val target = tmpTarget()
    df(10, 11).write.parquet(target)
    Files.write(Paths.get(target, "_GRAFT_STAGED"), "\n\nEND\n".getBytes("UTF-8"))
    TableStore.append(df(99), target)
    assert(readVals(target) == Set(10, 11, 99))
    assert(!Files.exists(Paths.get(target, "_GRAFT_STAGED")))
  }

  test("flat: successful overwrite leaves no marker and no leftover dirs") {
    val target = tmpTarget()
    TableStore.overwrite(spark, df(1, 2), target)
    TableStore.overwrite(spark, df(3), target)
    assert(readVals(target) == Set(3))
    assert(!Files.exists(Paths.get(target, "_GRAFT_STAGED")))
    assert(!Files.exists(Paths.get(target + "__graft_staging__")))
    assert(!Files.exists(Paths.get(target + "__graft_old__")))
  }

  private def bucketDf(rows: (Int, Int)*): DataFrame =
    rows.toDF("v", TableStore.BucketCol)

  test("bucketed: staged marker rolls an interrupted bucket swap forward") {
    // crash point: marker written, swap not started; buckets 0 (rewrite)
    // and 1 (intentionally emptied)
    val target = tmpTarget()
    TableStore.appendBucketed(bucketDf(1 -> 0, 2 -> 1), target)
    val staging = target + "__graft_staging__"
    bucketDf(10 -> 0).write.mode("overwrite")
      .partitionBy(TableStore.BucketCol).parquet(staging)
    Files.write(Paths.get(staging, "_GRAFT_STAGED"), "0,1\n1\nEND\n".getBytes("UTF-8"))
    TableStore.appendBucketed(bucketDf(99 -> 5), target) // entry runs recovery
    val got = spark.read.parquet(target)
      .select("v", TableStore.BucketCol).as[(Int, Int)].collect().toSet
    assert(got == Set(10 -> 0, 99 -> 5), "bucket 0 rewritten, bucket 1 emptied")
    assert(!Files.exists(Paths.get(staging)))
    assert(!Files.exists(Paths.get(target + "__graft_old__")))
  }

  test("bucketed: three copies of one bucket fails loudly instead of nesting") {
    val target = tmpTarget()
    val part = s"${TableStore.BucketCol}=0"
    bucketDf(1 -> 0).write.partitionBy(TableStore.BucketCol).parquet(target)
    val staging = target + "__graft_staging__"
    bucketDf(10 -> 0).write.partitionBy(TableStore.BucketCol).parquet(staging)
    Files.write(Paths.get(staging, "_GRAFT_STAGED"), "0\n\nEND\n".getBytes("UTF-8"))
    df(5).write.parquet(s"${target}__graft_old__/$part")
    val ex = intercept[IllegalStateException] {
      TableStore.appendBucketed(bucketDf(99 -> 5), target)
    }
    assert(ex.getMessage.contains("three copies"))
    assert(Files.exists(Paths.get(target, part)),
      "dest bucket must be left untouched by the loud failure")
  }

  test("bucketed: old bucket dirs without a marker fail loudly") {
    val target = tmpTarget()
    bucketDf(1 -> 0).write.partitionBy(TableStore.BucketCol).parquet(target)
    df(5).write.parquet(s"${target}__graft_old__/${TableStore.BucketCol}=0")
    val ex = intercept[IllegalStateException] {
      TableStore.appendBucketed(bucketDf(99 -> 5), target)
    }
    assert(ex.getMessage.contains("unrecognized state") ||
      ex.getMessage.contains("only copy"))
  }
}
