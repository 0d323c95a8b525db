package graft.events

import scala.collection.concurrent.TrieMap

/** Per-consumer counters (reference: internal/metrics — consumer
  * latency/error/lag gauges; rsql/metrics.go, rpatterns/metrics.go).
  * The runtime (Runner / ConcurrentRunner) updates these after every
  * batch; `lag` stays a pull-style gauge on Runner since it needs the
  * log head.
  */
final case class ConsumerMetrics(
    batches: Long = 0L,
    /** events successfully consumed */
    processed: Long = 0L,
    /** batch attempts that raised (before any retry succeeded) */
    errors: Long = 0L,
    /** durable cursor writes (reference rsql/cursorstable.go:116
      * WithCursorSetCounter's default metric) — only stores wrapped
      * with CursorStore.withSetCounter tick it
      */
    cursorSets: Long = 0L,
    /** events abandoned by BestEffort/DeadLetter after retries */
    skipped: Long = 0L,
    /** wall-clock of the most recent batch, ms */
    lastBatchMillis: Long = 0L,
    /** last committed cursor */
    lastCursor: Long = -1L,
    /** micro-batches delivered out of id order (streaming PerBatch
      * commit policy freezes durable-cursor advance when this trips)
      */
    disorder: Long = 0L,
    /** wall-clock of the last activity tick (any batch attempt,
      * success OR error — matching the reference's activityGauge,
      * which ticks on every consume call)
      */
    lastActivityMillis: Long = 0L)

object Metrics {
  private val m = TrieMap.empty[String, ConsumerMetrics]

  def get(consumerName: String): ConsumerMetrics =
    m.getOrElse(consumerName, ConsumerMetrics())

  def all: Map[String, ConsumerMetrics] = m.toMap

  def reset(consumerName: String): Unit = { m.remove(consumerName); () }

  private def update(name: String)(f: ConsumerMetrics => ConsumerMetrics): Unit = {
    m.updateWith(name) { cur => Some(f(cur.getOrElse(ConsumerMetrics()))) }
    ()
  }

  private[events] def recordBatch(name: String, consumed: Long, skipped: Long,
      millis: Long, cursor: Long): Unit =
    update(name)(c => c.copy(
      batches = c.batches + 1,
      processed = c.processed + consumed,
      skipped = c.skipped + skipped,
      lastBatchMillis = millis,
      lastCursor = math.max(c.lastCursor, cursor),
      lastActivityMillis = System.currentTimeMillis()))

  private[events] def recordError(name: String): Unit =
    update(name)(c => c.copy(errors = c.errors + 1,
      lastActivityMillis = System.currentTimeMillis()))

  /** default WithCursorSetCounter sink (public so user stores outside
    * this package can adopt the built-in counter too)
    */
  def recordCursorSet(name: String): Unit =
    update(name)(c => c.copy(cursorSets = c.cursorSets + 1))

  /** Consumer-activity gauge (reference consumer.go activityTTL +
    * internal/metrics activityGauge): a consumer is active if it
    * attempted a batch — success or error — within `ttlMs`. A
    * negative TTL disables the check (WithoutConsumerActivityTTL);
    * an unknown consumer is inactive.
    */
  def active(consumerName: String, ttlMs: Long,
      nowMs: Long = System.currentTimeMillis()): Boolean = {
    if (ttlMs < 0) return true
    m.get(consumerName) match {
      case Some(c) => nowMs - c.lastActivityMillis < ttlMs
      case None => false
    }
  }

  private[events] def recordDisorder(name: String): Unit =
    update(name)(c => c.copy(disorder = c.disorder + 1))

  /** BatchConsumer live buffer length per consumer (reference
    * rpatterns/metrics.go:5 `batch_consumer_buffer_length` gauge).
    */
  private val batchBuffer = TrieMap.empty[String, Int]

  def batchBufferLength(consumerName: String): Int =
    batchBuffer.getOrElse(consumerName, 0)

  private[events] def recordBatchBuffer(name: String, len: Int): Unit = {
    batchBuffer.put(name, len)
    ()
  }
}
