package graft.events

import java.util.concurrent.{ScheduledThreadPoolExecutor, ThreadFactory, TimeUnit}
import scala.util.control.NonFatal

/** Buffering batch consumer with a timeout flush (reference:
  * rpatterns/batch.go BatchConsumer).
  *
  * Buffers events and flushes a batch to `consume` when EITHER
  *  - `flushLen` is reached first — synchronous: the flush (and any
  *    error) happens on the enqueue caller's thread, exactly the
  *    reference's capacity path (batch.go:163-170); or
  *  - `flushPeriod` expires first — asynchronous: a PARTIAL batch
  *    flushes from the timer thread and its cursor still commits
  *    (batch.go:171-172 + processBatch). This is the case a bursty
  *    stream hits in its first quiet hour: N-1 events buffered, no
  *    N-th arriving — the period, not the length, releases them.
  *
  * Cursor protocol: the AckConsumer discipline — the cursor commits
  * to `store` AFTER each successfully consumed batch, at the LAST
  * event's id (batch.go:203-206 `last.Ack`). A crash between consume
  * and ack replays the batch (at-least-once).
  *
  * The period timer arms when the FIRST event of a batch arrives and
  * fires at that event's TIMESTAMP + flushPeriod (batch.go:151): a
  * consumer running behind the stream waits only `MinWaitMs`
  * (batch.go:24) instead of adding a full period of latency to
  * already-late events.
  *
  * Error protocol, matching the reference exactly:
  *  - synchronous (capacity) flush error → thrown to the enqueue
  *    caller; the buffer is already cleared (batch.go:186-189 +
  *    :192-193 — the stream is expected to reset to the previous
  *    cursor and replay). The failure ALSO enters the error state
  *    until `reset()`, so a period flush already ticketed behind the
  *    failed batch cannot consume-and-commit past it (in the
  *    reference's single goroutine no later batch can even exist at
  *    that point; reflex Resets the consumer before re-running).
  *  - asynchronous (period) flush error → the consumer enters an
  *    error state; the NEXT enqueue throws BatchStateException
  *    (batch.go ErrBatchState / :178-183). `reset()` clears the state
  *    and returns the stored error (batch.go:70 Reset).
  *  - both flushPeriod == 0 and flushLen == 0 → every enqueue throws
  *    InvalidBatchConfigException (batch.go:30 ErrInvalidBatchConfig,
  *    reported from enqueue like the reference's :104-106).
  *
  * The live buffer length is exported as a per-consumer gauge
  * (Metrics.batchBufferLength — reference rpatterns/metrics.go:5
  * `batch_consumer_buffer_length`).
  *
  * This is deliberately a DRIVER-side runtime, like the reference's:
  * the pattern's whole point is small-batch cadence control (cursor
  * commits every N events or T seconds), which is coordinator state,
  * not data-plane work. The distributed data path stays in the
  * micro-batch DataFrames; `consumer` bridges one into the other for
  * Runner composition.
  */
final class BatchConsumer(
    val name: String,
    store: CursorStore,
    consume: Seq[Event] => Unit,
    flushPeriodMs: Long,
    flushLen: Int) {
  import BatchConsumer._
  require(flushPeriodMs >= 0L && flushLen >= 0, "negative batch config")

  private val lock = new Object
  private var buf = Vector.empty[Event]
  private var failed: Throwable = null
  /** First event id of the failed flush — the replay-coverage mark
    * for the bridge's auto-reset (see `consumer`): a re-delivery
    * starting at or before this id provably replays every event the
    * failed flush lost, so the error state may clear and the retry
    * succeed; one starting after it must keep aborting (committing
    * its cursor would skip the lost events).
    */
  private var failedLowId = Long.MaxValue
  /** bumps on every flush/reset; a pending timer for an older
    * generation is stale and must no-op (the reference discards the
    * timer channel instead, batch.go:194)
    */
  private var generation = 0L
  /** Flush serialization. The reference runs BOTH flush paths in one
    * goroutine's select loop (batch.go:146-175), so a period flush and
    * a capacity flush can never overlap. Here they run on different
    * threads (timer vs enqueue caller), so each batch takes a TICKET
    * under `lock` at batch-formation time and actual flushes proceed
    * in ticket order on `flushMonitor` — buffering stays non-blocking
    * (enqueues of the NEXT batch never wait on `lock` for a flush),
    * but consume delivery is in batch order and the cursor can never
    * regress. A failed flush poisons the queue (`failed`): batches
    * ticketed BEHIND it abort instead of consuming, because their
    * cursor commit would skip the failed batch's events on replay —
    * exactly the at-least-once hole the single-goroutine reference
    * cannot have.
    */
  private val flushMonitor = new Object
  private var nextTicket = 0L
  private var nowServing = 0L
  private var lastAckedId = Long.MinValue
  private val timer = new ScheduledThreadPoolExecutor(1, new ThreadFactory {
    def newThread(r: Runnable): Thread = {
      val t = new Thread(r, s"graft-batch-consumer-$name")
      t.setDaemon(true); t
    }
  })
  timer.setRemoveOnCancelPolicy(true)

  /** Live buffer length (the reference's gauge reads this). */
  def bufferLength: Int = lock.synchronized(buf.size)

  /** Add one event; flushes synchronously when the batch reaches
    * `flushLen`. Throws InvalidBatchConfigException on unusable
    * config and BatchStateException if a period flush failed since
    * the last enqueue/reset.
    */
  def enqueue(e: Event): Unit = {
    if (flushPeriodMs == 0L && flushLen == 0) throw new InvalidBatchConfigException
    var flushNow: Vector[Event] = null
    var ticket = -1L
    lock.synchronized {
      if (failed != null) throw new BatchStateException(failed)
      if (buf.isEmpty && flushPeriodMs != 0L) {
        val byTs = e.ts.getTime + flushPeriodMs - System.currentTimeMillis()
        val wait = if (byTs < 0) MinWaitMs else byTs
        val gen = generation
        timer.schedule(new Runnable { def run(): Unit = timerFlush(gen) },
          wait, TimeUnit.MILLISECONDS)
      }
      buf = buf :+ e
      Metrics.recordBatchBuffer(name, buf.size)
      if (flushLen != 0 && buf.size >= flushLen) {
        flushNow = buf
        buf = Vector.empty
        generation += 1
        ticket = nextTicket
        nextTicket += 1
        Metrics.recordBatchBuffer(name, 0)
      }
    }
    // outside the lock: consume can be slow; buffering of the NEXT
    // batch must not block behind it. The ticket serializes us with
    // any period flush already in flight.
    if (flushNow != null) flush(flushNow, ticket)
  }

  private def timerFlush(gen: Long): Unit = {
    val toFlush = lock.synchronized {
      if (failed != null || generation != gen || buf.isEmpty) null
      else {
        val b = buf
        buf = Vector.empty
        generation += 1
        val t = nextTicket
        nextTicket += 1
        Metrics.recordBatchBuffer(name, 0)
        (b, t)
      }
    }
    if (toFlush != null) {
      // flush records its own failure into `failed`; nothing to do here
      try flush(toFlush._1, toFlush._2)
      catch { case NonFatal(_) => () }
    }
  }

  /** Deliver one batch in ticket order. Waits for all earlier-ticketed
    * flushes to finish first; aborts (without consuming) if one of
    * them failed, since committing this batch's cursor would skip the
    * failed batch's events when the stream replays. Cursor commits
    * are additionally monotone as a second line of defense.
    */
  private def flush(batch: Vector[Event], ticket: Long): Unit = {
    flushMonitor.synchronized {
      while (nowServing != ticket) flushMonitor.wait()
    }
    try {
      val earlier = lock.synchronized(failed)
      if (earlier != null) throw new BatchStateException(earlier)
      try {
        consume(batch)
        val commit = lock.synchronized {
          if (batch.last.id > lastAckedId) { lastAckedId = batch.last.id; true }
          else false
        }
        if (commit) {
          store.set(name, batch.last.id)
          store.flush()
        }
      } catch {
        case NonFatal(t) =>
          lock.synchronized {
            if (failed == null) { failed = t; failedLowId = batch.head.id }
          }
          throw t
      }
    } finally {
      flushMonitor.synchronized { nowServing += 1; flushMonitor.notifyAll() }
    }
  }

  /** Clear buffer + error state for a clean re-run; returns the
    * stored async error, if any (reference Reset, batch.go:66-70 —
    * reflex resets the consumer after a stream error so state never
    * leaks across runs).
    */
  def reset(): Option[Throwable] = lock.synchronized {
    val err = Option(failed)
    failed = null
    failedLowId = Long.MaxValue
    buf = Vector.empty
    generation += 1
    Metrics.recordBatchBuffer(name, 0)
    err
  }

  /** Stop the timer thread (reference Stop, batch.go:95-101). */
  def stop(): Unit = { timer.shutdownNow(); () }

  /** Runner-composable bridge: each micro-batch's events enqueue in
    * id order (the reference's per-event enqueue loop, batch.go:103).
    * Flush boundaries and cursor commits belong to THIS consumer, so
    * the Spec driving it must use a THROWAWAY store for its own
    * read-position bookkeeping (the AckConsumer pattern — the spec
    * store tracks what was READ, `store` here tracks what was
    * PROCESSED). The collect is bounded by Spec.batchSize.
    */
  def consumer: Consumer = {
    import org.apache.spark.sql.functions.col
    Consumer(name, df => {
      val spark = df.sparkSession
      import spark.implicits._
      val evs = df.select(col("id"), col("eventType"), col("foreignId"),
          col("ts"), col("value"), col("metadata"), col("trace"))
        .orderBy(col("id"))
        .as[Event]
        .collect()
      // r17 (r16 advice): reset-before-rerun, made SAFE. The
      // reference clears the error state before re-running a failed
      // stream from the processed cursor; here the state auto-clears
      // exactly when this delivery's first id is at or before the
      // failed flush's first id — i.e. the replay provably covers
      // every event that flush lost. A BestEffort/DeadLetter retry of
      // the failing batch therefore CAN succeed again (the r16
      // regression), while a later-starting delivery still aborts
      // with BatchStateException — committing its cursor would skip
      // the lost events on the eventual rerun.
      if (evs.nonEmpty) lock.synchronized {
        if (failed != null && evs.head.id <= failedLowId) {
          failed = null
          failedLowId = Long.MaxValue
          buf = Vector.empty
          generation += 1
          Metrics.recordBatchBuffer(name, 0)
        }
      }
      evs.foreach(enqueue)
    })
  }
}

object BatchConsumer {
  /** batch.go:24 minWait: floor for a consumer running behind. */
  val MinWaitMs = 100L

  /** batch.go:30 ErrInvalidBatchConfig. */
  final class InvalidBatchConfigException extends IllegalArgumentException(
    "flushPeriod or flushLen must be non-zero")

  /** batch.go:27 ErrBatchState: a period-triggered flush failed in
    * the background; the consumer refuses further events until reset.
    */
  final class BatchStateException(cause: Throwable) extends IllegalStateException(
    "batch error state", cause)

  def apply(name: String, store: CursorStore, consume: Seq[Event] => Unit,
      flushPeriodMs: Long, flushLen: Int): BatchConsumer =
    new BatchConsumer(name, store, consume, flushPeriodMs, flushLen)
}
