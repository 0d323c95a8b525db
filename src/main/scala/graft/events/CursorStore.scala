package graft.events

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import scala.collection.concurrent.TrieMap

/** Durable consumer cursors (reference: api.go CursorStore,
  * rsql/cursorstable.go, rpatterns/cursor.go).
  *
  * `get` on start, `set` after a successfully consumed batch —
  * at-least-once delivery. Implementations must make `set` atomic.
  */
trait CursorStore {
  /** Last committed cursor for the consumer, or None if never set. */
  def get(consumerName: String): Option[Long]
  def set(consumerName: String, cursor: Long): Unit
  /** rpatterns/ack.go Flush is a no-op for synchronous stores. */
  def flush(): Unit = ()

  /** OPAQUE string cursors (reference rsql/cursorstable.go:126
    * WithCursorStrings — reflex cursors are strings in the API;
    * integers are the optimization). Every store persists strings
    * natively; the Long form is the numeric view. Reading a
    * non-numeric cursor through `get` throws (exactly the reference's
    * int-cursor parse failure) — a consumer picks ONE form, and
    * rblob-style `key\|NN\|offset` cursors (JsonBlobSource.cursorString)
    * no longer need to pack into longs.
    */
  def getStr(consumerName: String): Option[String] = get(consumerName).map(_.toString)
  def setStr(consumerName: String, cursor: String): Unit = set(consumerName, cursor.toLong)
}

/** rpatterns/cursor.go MemCursorStore: in-memory cursors, optionally
  * pre-seeded (WithMemCursor). Storage is the string form; the Long
  * API parses (WithCursorStrings duality).
  */
final class MemCursorStore(seed: Map[String, Long] = Map.empty) extends CursorStore {
  private val m = TrieMap.empty[String, String] ++ seed.map { case (k, v) => (k, v.toString) }
  def get(name: String): Option[Long] = m.get(name).map(_.toLong)
  def set(name: String, cursor: Long): Unit = m.put(name, cursor.toString)
  override def getStr(name: String): Option[String] = m.get(name)
  override def setStr(name: String, cursor: String): Unit = m.put(name, cursor)
}

/** File-backed cursors (one file per consumer, atomic rename commit) —
  * the rsql.CursorsTable equivalent when the metastore is a shared
  * filesystem/object store. On a real cluster this directory lives on
  * the checkpoint volume. Files hold the raw cursor string, so the
  * string and Long forms share one representation on disk.
  */
final class FileCursorStore(dir: String) extends CursorStore {
  Files.createDirectories(Paths.get(dir))
  private def path(name: String) = Paths.get(dir, s"$name.cursor")
  def get(name: String): Option[Long] = getStr(name).map(_.toLong)
  def set(name: String, cursor: Long): Unit = setStr(name, cursor.toString)
  override def getStr(name: String): Option[String] = {
    val p = path(name)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim)
    else None
  }
  override def setStr(name: String, cursor: String): Unit = {
    val tmp = Paths.get(dir, s".$name.cursor.tmp")
    Files.write(tmp, cursor.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

/** Async cursor commits (reference: rsql/cursorstable.go
  * WithCursorAsyncPeriod): `set` buffers in memory and a daemon
  * flushes the newest cursor per consumer to the backing store every
  * `periodMs`; `flush()`/`close()` force a write. Trades cursor-write
  * amplification (one durable write per period instead of per batch —
  * the point at 10^9 batches) for a bounded replay window: a crash
  * loses at most `periodMs` of cursor progress, so delivery stays
  * at-least-once, never skipping. Reads are read-your-writes (pending
  * overlays the backing store).
  */
final class AsyncCursorStore(backing: CursorStore, periodMs: Long = 1000L)
    extends CursorStore with AutoCloseable {
  private val pending = TrieMap.empty[String, String]
  @volatile private var running = true
  private val flusher = new Thread(() => {
    while (running) {
      try Thread.sleep(periodMs) catch { case _: InterruptedException => () }
      // A failed durable write must not kill the daemon: the value
      // stays pending (flush removes only after a successful set) and
      // the next period retries.
      if (running) try flush() catch { case scala.util.control.NonFatal(_) => () }
    }
  }, "async-cursor-flush")
  flusher.setDaemon(true)
  flusher.start()

  def get(name: String): Option[Long] = getStr(name).map(_.toLong)
  def set(name: String, cursor: Long): Unit = setStr(name, cursor.toString)
  override def getStr(name: String): Option[String] =
    pending.get(name).orElse(backing.getStr(name))
  override def setStr(name: String, cursor: String): Unit = pending.put(name, cursor)
  /** Synchronized so a daemon flush and a close() flush cannot
    * interleave and write an older cursor after a newer one. Writes
    * backing BEFORE removing from pending (conditionally — a newer
    * set() during the write stays pending), so get() never transiently
    * loses a committed value mid-flush.
    */
  override def flush(): Unit = synchronized {
    var firstErr: Throwable = null
    pending.snapshot().foreach { case (k, v) =>
      try { backing.setStr(k, v); pending.remove(k, v) }
      catch { case scala.util.control.NonFatal(e) => if (firstErr == null) firstErr = e }
    }
    if (firstErr != null) throw firstErr
  }
  override def close(): Unit = { running = false; flusher.interrupt(); flush() }
}

object CursorStore {
  /** rsql/cursorstable.go:116 WithCursorSetCounter: tick a counter on
    * every durable cursor WRITE (the DB-write metric, not the logical
    * ack — compose OUTSIDE AsyncCursorStore to count real writes, or
    * inside to count logical sets). Defaults to the built-in
    * per-consumer metric (Metrics.cursorSets), matching the
    * reference's default prometheus counter.
    */
  def withSetCounter(underlying: CursorStore,
      counter: String => Unit = Metrics.recordCursorSet): CursorStore =
    new CursorStore {
      def get(name: String): Option[Long] = underlying.get(name)
      def set(name: String, cursor: Long): Unit = {
        underlying.set(name, cursor); counter(name)
      }
      override def getStr(name: String): Option[String] = underlying.getStr(name)
      override def setStr(name: String, cursor: String): Unit = {
        underlying.setStr(name, cursor); counter(name)
      }
      override def flush(): Unit = underlying.flush()
    }

  /** rpatterns/cursor.go ReadThroughCursorStore: read falls back,
    * fallback hit is written through, writes go to primary only.
    */
  def readThrough(primary: CursorStore, fallback: CursorStore): CursorStore =
    new CursorStore {
      def get(name: String): Option[Long] = getStr(name).map(_.toLong)
      def set(name: String, cursor: Long): Unit = primary.set(name, cursor)
      override def getStr(name: String): Option[String] = primary.getStr(name) match {
        case some @ Some(_) => some
        case None =>
          val fb = fallback.getStr(name)
          fb.foreach(primary.setStr(name, _))
          fb
      }
      override def setStr(name: String, cursor: String): Unit = primary.setStr(name, cursor)
    }

  /** rpatterns/bootstrap.go: seed an unset cursor so the first run
    * starts from the head (or any chosen offset) instead of genesis.
    */
  def bootstrap(underlying: CursorStore, seedCursor: => Long): CursorStore =
    new CursorStore {
      def get(name: String): Option[Long] =
        underlying.get(name).orElse {
          val c = seedCursor
          underlying.set(name, c)
          Some(c)
        }
      def set(name: String, cursor: Long): Unit = underlying.set(name, cursor)
      // string form passes through un-seeded (the seed is numeric)
      override def getStr(name: String): Option[String] =
        underlying.getStr(name).orElse(get(name).map(_.toString))
      override def setStr(name: String, cursor: String): Unit =
        underlying.setStr(name, cursor)
    }
}
