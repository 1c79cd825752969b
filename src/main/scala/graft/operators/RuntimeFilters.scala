package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.BloomFunctions

/** Driver-built bloom filters as pre-shuffle join reduction.
  *
  * The 100 TB problem this solves: a shuffle join between a huge fact table
  * and a medium dimension subset moves the ENTIRE fact side through the
  * exchange, even when only a few percent of its rows will find a match.
  * The dimension's keys compressed into a bloom filter (~1.2 MB per million
  * keys at 1% fpp) can be applied AT THE SCAN, so non-matching fact rows
  * never enter the shuffle. False positives only let extra rows through to
  * the join, which then drops them — results are bit-identical to the
  * unpruned join; false negatives are impossible.
  *
  * Spark's adaptive runtime filter (`spark.sql.optimizer.runtime.bloomFilter
  * .enabled`) does this automatically for some plan shapes; this operator is
  * the explicit version for when the optimizer doesn't fire — a reused
  * filter across several queries, a key produced by an expression, or a
  * pruning side that isn't part of the same query plan at all.
  */
object RuntimeFilters {

  /** Build a bloom filter over `keyCol` of `df` (integral or string).
    *
    * `expectedItems < 0` (default) runs a count-distinct-free `count()` on
    * the build side to size the filter — one cheap aggregate job, the same
    * trade Spark's own runtime filter makes. Pass it explicitly to skip
    * that job. Under-sizing degrades the false-positive rate, never
    * correctness.
    */
  def bloomOf(
      df: DataFrame,
      keyCol: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01): BloomFilter = {
    val n = if (expectedItems >= 0) expectedItems else df.count()
    df.stat.bloomFilter(keyCol, math.max(n, 1L), fpp)
  }

  /** `big` reduced to rows whose `bigKey` might be in `small`'s `smallKey`
    * set — a bloom semi-join that supersets the exact semi-join (false
    * positives pass, matches always pass). Compose with the real join:
    * every dropped row is one that could never have matched.
    *
    * Small-side cost: with auto-sizing (`expectedItems < 0`) the small
    * plan is evaluated twice here (sizing count + bloom aggregate), so it
    * is cached for the duration of the call and released before returning
    * — the returned filter never re-reads it. A caller passing
    * `expectedItems` explicitly skips both the count and the cache (one
    * evaluation; typically a side the caller knows is cheap or already
    * cached).
    */
  def bloomSemiFilter(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      expectedItems: Long = -1L,
      fpp: Double = 0.01): DataFrame = {
    val own = expectedItems < 0 &&
      small.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val src = if (own)
      small.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else small
    try {
      val bf = bloomOf(src, smallKey, expectedItems, fpp)
      big.where(BloomFunctions.mightContain(big(bigKey), bf))
    } finally if (own) src.unpersist(false) // bloom is built; small is dead
  }

  /** Bloom-pruned equi-join: prune `big` with `small`'s key bloom, then
    * join. Restricted to join types where unmatched `big` rows are dropped
    * anyway — pruning under `left`/`full` outer joins would delete rows the
    * join contract keeps.
    *
    * Small-side cost: the call is SELF-CONTAINED — with auto-sizing
    * (`expectedItems < 0`) the small plan is cached only while the sizing
    * count and bloom aggregate run (both eager, inside this call) and
    * released before returning; the join then re-evaluates the small
    * lineage once when the result materializes. Two evaluations total, no
    * state outliving the call — a long-lived session (streaming sink,
    * daily driver loop) can call this forever without accumulating cache.
    * Callers who want exactly one evaluation persist `small` themselves
    * (an already-cached side is never re-cached or released here). When
    * `bigKey == smallKey` the join uses the USING form, so the output
    * carries ONE key column instead of an ambiguous duplicate pair.
    */
  def bloomPrunedJoin(
      big: DataFrame,
      bigKey: String,
      small: DataFrame,
      smallKey: String,
      joinType: String = "inner",
      expectedItems: Long = -1L,
      fpp: Double = 0.01): DataFrame = {
    val ok = Set("inner", "leftsemi", "right", "rightouter")
    require(ok.contains(joinType.toLowerCase.replace("_", "")),
      s"joinType '$joinType' keeps unmatched big-side rows; bloom pruning " +
        "would drop them (allowed: inner, left_semi, right_outer)")
    // bloomSemiFilter owns the cache for its two eager reads and releases
    // it before returning; the join below recomputes `small` once instead
    // of reading a pin that would have to outlive the call
    val pruned = bloomSemiFilter(big, bigKey, small, smallKey, expectedItems, fpp)
    if (bigKey == smallKey) pruned.join(small, Seq(bigKey), joinType)
    else pruned.join(small, pruned(bigKey) === small(smallKey), joinType)
  }
}
