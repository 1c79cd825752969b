package graft.io

import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}

/** Wall-clock poll offset for streaming sources over request/response
  * protocols with no change feed (REST, Qdrant scroll, SPARQL). The
  * serialized form is the bare millis value.
  */
final case class PollOffset(poll: Long) extends Offset {
  override def json(): String = poll.toString
}

/** Base for polling micro-batch sources: each micro-batch performs one
  * full poll of the upstream system ([[pollPartitions]] plans it exactly
  * like the batch scan). The offset is a poll stamp, not a server-side
  * cursor — these protocols expose no generic change feed — so records
  * seen in consecutive polls repeat; compose with the streaming dedup
  * operators (`graft.streaming.StreamingOps`) keyed on a record id for
  * incremental semantics. At-least-once; a batch replayed from
  * checkpoint re-polls.
  */
abstract class PollMicroBatchStream extends MicroBatchStream {
  // The offset is the poll's wall-clock stamp, not a counter: Spark compares
  // the committed and latest offsets by serialized value before any
  // deserializeOffset call, so a restarted stream must produce offsets that
  // are greater than the checkpointed one without seeing it first. The
  // max() guard keeps offsets monotonic under clock skew within a run.
  private var latest = 0L

  /** One poll's input partitions — same planning as the batch scan. */
  protected def pollPartitions(): Array[InputPartition]

  override def initialOffset(): Offset = PollOffset(0L)
  override def latestOffset(): Offset = {
    latest = math.max(System.currentTimeMillis(), latest + 1)
    PollOffset(latest)
  }
  override def deserializeOffset(json: String): Offset = {
    val parsed = json.trim.toLong
    // seed monotonicity from the checkpointed offset: restoring onto a
    // machine whose clock is behind the original writer's would otherwise
    // produce latestOffset() values <= the committed one — empty batches
    // until wall-clock catches up
    latest = math.max(latest, parsed)
    PollOffset(parsed)
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    // one poll per micro-batch regardless of how many triggers elapsed
    if (start.asInstanceOf[PollOffset].poll >= end.asInstanceOf[PollOffset].poll)
      Array.empty
    else pollPartitions()
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
