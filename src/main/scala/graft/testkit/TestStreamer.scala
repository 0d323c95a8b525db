package graft.testkit

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import graft.events.{CursorStore, Event, EventLog, InMemNotifier, MemCursorStore, StreamWatcher}

/** Public test harness for code built on graft's event stream — the
  * analog of the reference's `testmock` package (testmock/stream.go:15
  * `NewTestStreamer`, testmock/CursorStore.go, testmock/await.go
  * `AwaitConsumer`): downstream users of reflex get an
  * insert-and-stream mock AS API, so their consumer tests never build
  * storage by hand. Same surface here: insert events (ids are the
  * CALLER's, exactly like the reference's "you must provide an ID"),
  * get a fresh `EventLog` view per call (the StreamFunc re-query
  * contract — inserts made after a view was taken appear in the next
  * view), a seeded in-memory cursor store, and an await helper for
  * cross-thread consumer assertions.
  *
  * The log lives in driver memory (a test fixture, like the
  * reference's in-memory slice) and becomes a DataFrame via
  * `createDataset` — every graft operator (Runner, filters, windows,
  * servers) runs against it unchanged. A built-in [[InMemNotifier]]
  * fires on every insert so wake-on-insert consumers (A81) are
  * testable through the same fixture.
  */
final class TestStreamer(spark: SparkSession) {

  private[this] val lock = new Object
  private[this] var buf = Vector.empty[Event]
  private[this] val notifier = new InMemNotifier

  /** Insert one event (testmock/stream.go:30 InsertEvent — may be
    * called before or after a consumer starts; the id is the caller's
    * responsibility and is NOT generated).
    */
  def insertEvent(e: Event): Unit = {
    lock.synchronized { buf = buf :+ e }
    notifier.notifyInsert()
  }

  /** Convenience insert; `ts` defaults along the event's insert order
    * so ts-ordered operators see a deterministic timeline.
    */
  def insertEvent(id: Long, eventType: String, foreignId: Long,
      ts: Timestamp = null, value: Double = 0.0, metadata: String = null): Unit =
    insertEvent(Event(id, eventType, foreignId,
      if (ts != null) ts else new Timestamp(1704067200000L + id * 1000L),
      value, metadata))

  /** A FRESH log view over the current buffer — the StreamFunc
    * contract (the reference's stream client reads the shared slice
    * under the mutex; here each call snapshots it, and `Runner`'s
    * freshSpec pattern re-calls this per round).
    */
  def log: EventLog = {
    val snapshot = lock.synchronized(buf)
    import spark.implicits._
    new EventLog(spark.createDataset(snapshot).toDF())
  }

  /** StreamFunc shape for APIs that re-resolve the source per round
    * (Runner.runForever's freshSpec).
    */
  def streamFunc: () => EventLog = () => log

  /** Wake-on-insert watcher wired to `insertEvent` — pass to
    * Poller/Runner/server seams to test notifier-driven consumers.
    */
  def watcher: StreamWatcher = notifier

  /** Current head id, -1 when empty. */
  def head: Long = lock.synchronized(if (buf.isEmpty) -1L else buf.map(_.id).max)

  /** Drop all events (testmock Stop analog — the fixture is inert
    * afterwards; there are no threads to leak on the Spark side).
    */
  def stop(): Unit = lock.synchronized { buf = Vector.empty }
}

object TestStreamer {

  def apply(spark: SparkSession): TestStreamer = new TestStreamer(spark)

  /** The cursor-store mock (testmock/CursorStore.go): graft's
    * MemCursorStore IS the in-memory implementation; this constructor
    * exists so downstream tests depend only on the testkit. Seed it to
    * start a consumer mid-stream (rpatterns WithMemCursor).
    */
  def memCursorStore(seed: Map[String, Long] = Map.empty): MemCursorStore =
    new MemCursorStore(seed)

  /** Wait up to `timeoutMs` for `consumerName`'s committed cursor to
    * reach `eventId` (testmock/await.go:18 AwaitConsumer — 15 s there,
    * same default here). Throws on timeout with the last seen cursor.
    */
  def awaitConsumer(store: CursorStore, consumerName: String, eventId: Long,
      timeoutMs: Long = 15000L): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var last: Option[Long] = None
    while (System.nanoTime() < deadline) {
      last = store.get(consumerName)
      if (last.exists(_ >= eventId)) return
      Thread.sleep(5L)
    }
    throw new AssertionError(
      s"consumer '$consumerName' did not reach event $eventId within ${timeoutMs}ms (cursor: $last)")
  }
}
