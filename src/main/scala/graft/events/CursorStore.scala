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
