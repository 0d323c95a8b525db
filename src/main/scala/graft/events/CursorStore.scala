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
}

/** rpatterns/cursor.go MemCursorStore: in-memory cursors, optionally
  * pre-seeded (WithMemCursor).
  */
final class MemCursorStore(seed: Map[String, Long] = Map.empty) extends CursorStore {
  private val m = TrieMap.empty[String, Long] ++ seed
  def get(name: String): Option[Long] = m.get(name)
  def set(name: String, cursor: Long): Unit = m.put(name, cursor)
}

/** File-backed cursors (one file per consumer, atomic rename commit) —
  * the rsql.CursorsTable equivalent when the metastore is a shared
  * filesystem/object store. On a real cluster this directory lives on
  * the checkpoint volume.
  */
final class FileCursorStore(dir: String) extends CursorStore {
  Files.createDirectories(Paths.get(dir))
  private def path(name: String) = Paths.get(dir, s"$name.cursor")
  def get(name: String): Option[Long] = {
    val p = path(name)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong)
    else None
  }
  def set(name: String, cursor: Long): Unit = {
    val tmp = Paths.get(dir, s".$name.cursor.tmp")
    Files.write(tmp, cursor.toString.getBytes(StandardCharsets.UTF_8))
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
  private val pending = TrieMap.empty[String, Long]
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

  def get(name: String): Option[Long] = pending.get(name).orElse(backing.get(name))
  def set(name: String, cursor: Long): Unit = pending.put(name, cursor)
  /** Synchronized so a daemon flush and a close() flush cannot
    * interleave and write an older cursor after a newer one. Writes
    * backing BEFORE removing from pending (conditionally — a newer
    * set() during the write stays pending), so get() never transiently
    * loses a committed value mid-flush.
    */
  override def flush(): Unit = synchronized {
    var firstErr: Throwable = null
    pending.snapshot().foreach { case (k, v) =>
      try { backing.set(k, v); pending.remove(k, v) }
      catch { case scala.util.control.NonFatal(e) => if (firstErr == null) firstErr = e }
    }
    if (firstErr != null) throw firstErr
  }
  override def close(): Unit = { running = false; flusher.interrupt(); flush() }
}

object CursorStore {
  /** rpatterns/cursor.go ReadThroughCursorStore: read falls back,
    * fallback hit is written through, writes go to primary only.
    */
  def readThrough(primary: CursorStore, fallback: CursorStore): CursorStore =
    new CursorStore {
      def get(name: String): Option[Long] = primary.get(name) match {
        case some @ Some(_) => some
        case None =>
          val fb = fallback.get(name)
          fb.foreach(primary.set(name, _))
          fb
      }
      def set(name: String, cursor: Long): Unit = primary.set(name, cursor)
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
    }
}
