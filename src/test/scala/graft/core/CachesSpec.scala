package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Dedup

/** Lifecycle contract of [[Caches]]: a scoped computation's pins — persisted
  * Datasets AND retained localCheckpoint RDDs — are fully released by
  * `pins.release()`, and nothing pinned by OTHER work on the shared context
  * is touched.
  */
class CachesSpec extends SparkTestBase {
  import spark.implicits._

  private def pinnedNow: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def nearDupCorpus = {
    val base = "spark fuse data pipeline with many shared tokens in common sequence order"
    Seq(
      (1L, base),
      (2L, base + " extra"),
      (3L, "completely unrelated content about cooking pasta with tomato sauce basil"),
      (4L, base),
      (5L, "another distinct document mentioning graphs components and stars contraction")
    ).toDF("id", "text")
  }

  test("scoped dedupCorpus releases every pin it took (local components path)") {
    val before = pinnedNow
    val (out, pins) = Caches.collectPins {
      Dedup.dedupCorpus(nearDupCorpus, "id", "text",
        numPerms = 16, bands = 4, shingleSize = 3, threshold = 0.4)
    }
    val ids = out.select("id").as[Long].collect().toSet // materialize FIRST
    assert(ids.contains(1L) && ids.contains(3L) && ids.contains(5L))
    assert(!ids.contains(4L)) // exact dup of 1 removed
    pins.release()
    assert((pinnedNow -- before).isEmpty,
      "dedupCorpus left pinned RDDs behind after scope release")
  }

  test("scoped stars components release loop checkpoints; result stays readable") {
    val before = pinnedNow
    // a 3-chain plus an isolated self-pair — forces >1 contraction round
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L), (9L, 9L))
      .toDF("id_a", "id_b")
    val (labels, pins) = Caches.collectPins {
      Dedup.connectedComponents(pairs, "id_a", "id_b", algorithm = "stars")
    }
    // intermediates (orientation input, per-round state) are already freed
    // DURING the loop; only the finals the result reads may remain pinned
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 9L))
    pins.release()
    assert((pinnedNow -- before).isEmpty,
      "stars loop left pinned RDDs behind after scope release")
  }

  test("scoped labelprop components release loop checkpoints") {
    val before = pinnedNow
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val (labels, pins) = Caches.collectPins {
      Dedup.connectedComponents(pairs, "id_a", "id_b", algorithm = "labelprop")
    }
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
    pins.release()
    assert((pinnedNow -- before).isEmpty,
      "labelprop loop left pinned RDDs behind after scope release")
  }

  test("release touches only the scope's own pins, not a bystander cache") {
    val bystander = Seq((1L, "a")).toDF("k", "v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      bystander.count()
      val (pairsDf, pins) = Caches.collectPins {
        Dedup.minhashLshPairs(nearDupCorpus, "id", "text",
          numPerms = 16, bands = 4, shingleSize = 3, threshold = 0.4)
      }
      assert(pins.size == 1) // the signature cache
      pairsDf.collect()
      pins.release()
      assert(bystander.storageLevel.useMemory,
        "scope release must not unpersist unrelated caches")
    } finally bystander.unpersist()
  }

  test("nested scopes: inner pins stay out of the outer handle") {
    val (outerResult, outerPins) = Caches.collectPins {
      val (_, innerPins) = Caches.collectPins {
        Caches.pin(Seq(1).toDF("x"))
      }
      assert(innerPins.size == 1)
      innerPins.release()
      Caches.pin(Seq(2).toDF("y"))
    }
    assert(outerPins.size == 1)
    outerResult.collect()
    outerPins.release()
  }

  test("a throwing body releases its own pins before propagating") {
    val pinned = Seq((1L, "x")).toDF("k", "v")
    val boom = intercept[RuntimeException] {
      Caches.collectPins {
        val p = Caches.pin(pinned)
        p.count() // materialize so the unpersist has something to drop
        throw new RuntimeException("body failed")
      }
    }
    assert(boom.getMessage == "body failed")
    assert(pinned.storageLevel ==
      org.apache.spark.storage.StorageLevel.NONE,
      "pins taken by a failed scope must not leak into the session")
    // the outer (no-scope) state is restored: pin outside works as before
    val again = Caches.pin(Seq(2).toDF("y"))
    try assert(again.storageLevel.useMemory)
    finally again.unpersist()
  }
}
