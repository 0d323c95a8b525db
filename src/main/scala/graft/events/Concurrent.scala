package graft.events

import java.util.concurrent.{Executors, Semaphore, TimeUnit}
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}
import org.apache.spark.sql.functions._
import scala.collection.mutable
import scala.util.control.NonFatal

/** Tracks the maximum "done" id of a sequence that is STARTED in
  * ascending order but COMPLETED in arbitrary order (reference:
  * rpatterns/sequence.go GapSequence). `currentMax` is the largest
  * done id such that every started id ≤ it is also done — the only id
  * that is safe to commit as a cursor while later events are still in
  * flight.
  *
  * Two min-heaps, exactly the reference's algorithm: when the smallest
  * in-flight id equals the smallest done id, both pop and the cursor
  * advances to that id.
  */
final class GapSequence(start: Long = -1L) {
  private val minOrd = Ordering[Long].reverse // PriorityQueue is a max-heap
  private val doingH = mutable.PriorityQueue.empty[Long](minOrd)
  private val doneH = mutable.PriorityQueue.empty[Long](minOrd)
  private var max = start

  /** Mark `id` in progress. Must be called in ascending id order. */
  def doing(id: Long): Unit = synchronized { doingH.enqueue(id) }

  /** Mark `id` done; advances `currentMax` through every contiguous
    * completed prefix.
    */
  def done(id: Long): Unit = synchronized {
    doneH.enqueue(id)
    while (doingH.nonEmpty && doneH.nonEmpty && doingH.head == doneH.head) {
      doingH.dequeue()
      max = doneH.dequeue()
    }
  }

  /** Largest done id with no smaller id still in flight. */
  def currentMax: Long = synchronized(max)

  def inFlight: Int = synchronized(doingH.size)
}

/** Per-event consumer for the concurrent runner (the reference
  * Consumer interface is per-event; the batch Consumer in
  * Consumer.scala is the Spark-native aggregate form).
  */
final case class EventConsumer(name: String, fn: Event => Unit)

/** rpatterns/concurrent.go ConcurrentConsumer: up to `maxInFlight`
  * events from ONE consumer processed concurrently — for independent,
  * slow, per-event side effects (RPCs, writes). Events of the same
  * entity may complete out of order; the cursor only ever commits to
  * GapSequence.currentMax, so a crash replays every event at or after
  * the first one that was still in flight (at-least-once, never
  * skipping).
  */
object ConcurrentRunner {

  final case class ConcurrentResult(consumed: Long, finalCursor: Long)

  def run(
      log: EventLog,
      store: CursorStore,
      consumer: EventConsumer,
      maxInFlight: Int,
      filter: Option[EventFilter] = None): ConcurrentResult = {
    require(maxInFlight > 0)
    val spark = log.df.sparkSession
    import spark.implicits._

    val start = store.get(consumer.name).getOrElse(-1L)
    val head = log.head()
    val gs = new GapSequence(start)
    val sem = new Semaphore(maxInFlight)
    val pool = Executors.newFixedThreadPool(maxInFlight)
    val firstError = new AtomicReference[Throwable](null)
    val consumed = new AtomicLong(0L)
    // serialize cursor commits; only ever move forward. The store.set
    // must happen inside the same critical section as the monotonic
    // check: with a CAS-only guard, a thread that read an older
    // currentMax can lose the race and still write its SMALLER value
    // to the store after a newer commit, moving the cursor backwards.
    val committed = new AtomicLong(start)
    val commitLock = new Object
    def commit(): Unit = commitLock.synchronized {
      val m = gs.currentMax
      if (m > committed.get()) {
        committed.set(m)
        store.set(consumer.name, m)
      }
    }

    val base = filter.fold(log.df)(f => log.df.filter(f.toColumn))
    // id-ordered stream of events after the cursor; toLocalIterator
    // pulls one partition at a time, so the driver never holds the
    // backlog — only `maxInFlight` events are admitted at once.
    val it = Event.dataset(base)
      .filter(col("id") > start && col("id") <= head)
      .orderBy("id")
      .toLocalIterator()

    val t0 = System.nanoTime()
    try {
      while (it.hasNext && firstError.get() == null) {
        val e = it.next()
        sem.acquire()
        if (firstError.get() == null) {
          gs.doing(e.id) // ascending: the iterator is id-ordered
          pool.execute { () =>
            try {
              consumer.fn(e)
              gs.done(e.id)
              consumed.incrementAndGet()
              commit()
            } catch {
              case NonFatal(t) => firstError.compareAndSet(null, t)
            } finally sem.release()
          }
        } else sem.release()
      }
      pool.shutdown()
      pool.awaitTermination(10, TimeUnit.MINUTES)
      commit()
      val err = firstError.get()
      if (err != null) { Metrics.recordError(consumer.name); throw err }
      Metrics.recordBatch(consumer.name, consumed.get(), 0L,
        (System.nanoTime() - t0) / 1000000L, committed.get())
      ConcurrentResult(consumed.get(), committed.get())
    } finally {
      pool.shutdownNow()
      ()
    }
  }
}
