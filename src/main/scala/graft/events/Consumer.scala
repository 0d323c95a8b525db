package graft.events

import org.apache.spark.sql.DataFrame
import scala.collection.concurrent.TrieMap

/** Consumer + error handling (reference: consumer.go,
  * rpatterns/besteffort.go, rpatterns/deadletter.go,
  * rsql/errorstable.go).
  *
  * A consumer processes one micro-batch DataFrame (the canonical event
  * projection) at a time. Default semantics are the reference's
  * fail-fast: any error leaves the cursor untouched and aborts the
  * run; re-running resumes from the last committed cursor
  * (at-least-once).
  */
final case class Consumer(
    name: String,
    fn: DataFrame => Unit,
    errorMode: ErrorMode = FailFast,
    /** reference consumer.go WithRecoverFunction: called when a batch
      * errors; returning None eliminates the error (the batch counts
      * as consumed), Some(e) re-raises into the error mode.
      */
    recover: Option[(Throwable, DataFrame) => Option[Throwable]] = None,
    /** reference consumer.go WithErrorCounter: a custom counter hook
      * ticked when an error SURVIVES recovery (consumer.go:196-200 —
      * recovered errors don't tick it); the built-in Metrics.errors
      * counts every raise regardless.
      */
    errorCounter: Option[() => Unit] = None)

sealed trait ErrorMode
/** reference run.go: error → cursor not updated, run aborts. */
case object FailFast extends ErrorMode
/** rpatterns/besteffort.go: after `retries` attempts, skip the batch. */
final case class BestEffort(retries: Int) extends ErrorMode
/** rpatterns/deadletter.go: after `retries` attempts, record the error
  * and continue; if recording fails, block like FailFast.
  */
final case class DeadLetter(retries: Int, errors: ErrorStore) extends ErrorMode

/** rsql/errorstable.go: persistent record of consumer errors. */
trait ErrorStore {
  def record(consumerName: String, cursor: Long, msg: String): Unit
  def list(consumerName: String): Seq[(Long, String)]
}

final class MemErrorStore extends ErrorStore {
  private val m = TrieMap.empty[String, Vector[(Long, String)]]
  def record(name: String, cursor: Long, msg: String): Unit =
    m.updateWith(name) { v => Some(v.getOrElse(Vector.empty) :+ (cursor, msg)) }
  def list(name: String): Seq[(Long, String)] = m.getOrElse(name, Vector.empty)
}

/** rpatterns/ack.go: explicit-ack consumption — the consumer decides
  * when (and up to which event id) the cursor commits, e.g. only after
  * the last event of a logical batch. Wraps a plain Consumer whose
  * cursor updates flow through `ack` instead of the per-batch commit.
  */
object AckConsumer {
  final case class AckBatch(df: DataFrame, ack: Long => Unit)

  def apply(name: String, store: CursorStore, fn: AckBatch => Unit,
      errorMode: ErrorMode = FailFast): Consumer =
    Consumer(name, df => fn(AckBatch(df, id => { store.set(name, id); store.flush() })),
      errorMode)

  /** rpatterns/ack.go noSetStore: reads pass through, the runner's
    * automatic per-batch commits are DROPPED — under ack semantics
    * only the consumer's explicit acks may move the cursor (a crash
    * after an unacked batch must replay it, even though the runner
    * finished the batch).
    */
  final class NoSetStore(underlying: CursorStore) extends CursorStore {
    def get(name: String): Option[Long] = underlying.get(name)
    def set(name: String, cursor: Long): Unit = ()
    override def getStr(name: String): Option[String] = underlying.getStr(name)
    override def setStr(name: String, cursor: String): Unit = ()
  }

  /** rpatterns/ack.go NewAckSpec: a runnable Spec whose read position
    * comes from the ack store but whose ONLY writer is the consumer's
    * `ack` — the runner's own commit path is a no-op.
    */
  def spec(log: EventLog, store: CursorStore, name: String,
      fn: AckBatch => Unit, batchSize: Int = 1000,
      errorMode: ErrorMode = FailFast): Spec =
    Spec(log, new NoSetStore(store), apply(name, store, fn, errorMode),
      batchSize = batchSize)
}

/** Spec ties stream source, cursor store and consumer together
  * (reference: api.go NewSpec).
  */
final case class Spec(
    log: EventLog,
    store: CursorStore,
    consumer: Consumer,
    filter: Option[EventFilter] = None,
    batchSize: Int = 1000,
    /** rsql/loader.go filterLoader: known pure-noop id ranges; the
      * runner jumps the cursor over them instead of scanning them
      * (build with Patterns.noopRanges).
      */
    noopRanges: Option[Seq[(Long, Long)]] = None)
