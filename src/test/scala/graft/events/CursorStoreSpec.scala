package graft.events

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class CursorStoreSpec extends AnyFunSuite {

  test("MemCursorStore get/set with seed") {
    val cs = new MemCursorStore(Map("seeded" -> 42L))
    assert(cs.get("seeded") === Some(42L))
    assert(cs.get("other") === None)
    cs.set("other", 7L)
    assert(cs.get("other") === Some(7L))
  }

  test("FileCursorStore persists across instances (atomic rename commit)") {
    val dir = Files.createTempDirectory("graft-cursors").toString
    val a = new FileCursorStore(dir)
    a.set("c1", 123L)
    val b = new FileCursorStore(dir)
    assert(b.get("c1") === Some(123L))
    b.set("c1", 456L)
    assert(a.get("c1") === Some(456L))
  }

  test("consumer resumes across 'process restarts' via FileCursorStore") {
    import graft.TestSpark
    val dir = Files.createTempDirectory("graft-resume").toString
    val log = EventLog(TestSpark.spark, TestSpark.sf)
    var n1 = 0L
    // first process: crash after 400 events (simulated via FailFast)
    val crashing = Consumer("resume-c", b => {
      n1 += b.count()
      if (n1 >= 400) throw new RuntimeException("simulated crash")
    })
    intercept[RuntimeException] {
      Runner.runToHead(Spec(log, new FileCursorStore(dir), crashing, batchSize = 200))
    }
    // second process: fresh store instance, same directory
    var n2 = 0L
    val res = Runner.runToHead(Spec(log, new FileCursorStore(dir),
      Consumer("resume-c", b => { n2 += b.count(); () }), batchSize = 200))
    assert(res.finalCursor === 999L)
    // at-least-once: everything from the last committed cursor was
    // replayed; the two runs together covered the full log
    assert(n1 + n2 >= 1000L)
    assert(new FileCursorStore(dir).get("resume-c") === Some(999L))
  }

  test("readThrough falls back, writes through, and writes go to primary") {
    val primary = new MemCursorStore()
    val fallback = new MemCursorStore(Map("c" -> 10L))
    val rt = CursorStore.readThrough(primary, fallback)
    assert(rt.get("c") === Some(10L))      // fallback hit
    assert(primary.get("c") === Some(10L)) // written through
    rt.set("c", 20L)
    assert(primary.get("c") === Some(20L))
    assert(fallback.get("c") === Some(10L)) // fallback untouched
  }

  test("bootstrap seeds an unset cursor from the head") {
    val underlying = new MemCursorStore()
    val bs = CursorStore.bootstrap(underlying, seedCursor = 999L)
    assert(bs.get("new-consumer") === Some(999L))
    assert(underlying.get("new-consumer") === Some(999L))
    bs.set("new-consumer", 1005L)
    assert(bs.get("new-consumer") === Some(1005L))
  }

  test("async cursors: read-your-writes, periodic durable flush, bounded crash replay") {
    val backing = new MemCursorStore(Map("c" -> 5L))
    // long period: the daemon never fires during the test — flushes
    // happen only when forced, so timing is deterministic
    val async = new AsyncCursorStore(backing, periodMs = 3600000L)
    assert(async.get("c") === Some(5L))
    async.set("c", 50L)
    assert(async.get("c") === Some(50L))   // read-your-writes
    assert(backing.get("c") === Some(5L))  // not yet durable
    async.flush()
    assert(backing.get("c") === Some(50L))
    // newer-than-flushed write stays pending until the next flush
    async.set("c", 60L)
    assert(backing.get("c") === Some(50L))
    // "crash" path: discarding the wrapper without flush loses at most
    // the pending window — the consumer replays from 50, never skips
    val resumed = new AsyncCursorStore(backing, periodMs = 3600000L)
    assert(resumed.get("c") === Some(50L))
    // graceful close forces the flush
    async.close()
    assert(backing.get("c") === Some(60L))
    resumed.close()
  }

  test("async cursors survive backing-store failures: value stays pending, daemon retries") {
    @volatile var failing = true
    val inner = new MemCursorStore()
    val flaky = new CursorStore {
      def get(name: String): Option[Long] = inner.get(name)
      def set(name: String, cursor: Long): Unit = {
        if (failing) throw new RuntimeException("disk full")
        inner.set(name, cursor)
      }
    }
    val async = new AsyncCursorStore(flaky, periodMs = 30L)
    async.set("c", 10L)
    // explicit flush surfaces the error BUT keeps the value pending
    intercept[RuntimeException] { async.flush() }
    assert(async.get("c") === Some(10L)) // read-your-writes survives the failure
    // let the daemon hit the failure a few times — it must not die
    Thread.sleep(150)
    failing = false
    // the daemon (still alive) retries and the write lands durably
    val deadline = System.currentTimeMillis() + 10000
    while (inner.get("c").isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    assert(inner.get("c") === Some(10L))
    async.close()
  }

  test("async cursors flush on the period without an explicit call") {
    val backing = new MemCursorStore()
    val async = new AsyncCursorStore(backing, periodMs = 50L)
    async.set("p", 7L)
    val deadline = System.currentTimeMillis() + 10000
    while (backing.get("p").isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    assert(backing.get("p") === Some(7L))
    async.close()
  }

  test("string cursors (WithCursorStrings): non-numeric round-trip through File + Async stores") {
    // an rblob-style cursor in the reference's lexicographic format
    val cur = graft.sources.JsonBlobSource.cursorString("2020/01/01/Test-blob", 123L)
    assert(cur === "2020/01/01/Test-blob|03|123")
    assert(graft.sources.JsonBlobSource.parseCursor(cur) ===
      Some(("2020/01/01/Test-blob", 123L, false)))
    assert(graft.sources.JsonBlobSource.parseCursor("k|eof") === Some(("k", 0L, true)))
    assert(graft.sources.JsonBlobSource.parseCursor("") === None)
    // lexicographic ordering across offset magnitudes (the NN pad)
    assert(graft.sources.JsonBlobSource.cursorString("k", 9L) <
      graft.sources.JsonBlobSource.cursorString("k", 123L))
    assert(graft.sources.JsonBlobSource.cursorString("k", 123L) <
      graft.sources.JsonBlobSource.cursorEof("k"))

    val dir = java.nio.file.Files.createTempDirectory("graft-strcur").toString
    val file = new FileCursorStore(dir)
    file.setStr("blob-consumer", cur)
    assert(file.getStr("blob-consumer") === Some(cur))
    // persists across instances, raw
    assert(new FileCursorStore(dir).getStr("blob-consumer") === Some(cur))
    // the numeric view of a non-numeric cursor fails loudly (the
    // reference's int-cursor parse error), never silently corrupts
    intercept[NumberFormatException] { file.get("blob-consumer") }

    val async = new AsyncCursorStore(new FileCursorStore(dir + "-a"), periodMs = 60000L)
    async.setStr("c", cur)
    assert(async.getStr("c") === Some(cur)) // read-your-writes, pre-flush
    async.flush()
    assert(new FileCursorStore(dir + "-a").getStr("c") === Some(cur))
    async.close()

    // both forms share ONE representation: numeric set reads back as both
    val mem = new MemCursorStore()
    mem.set("n", 42L)
    assert(mem.getStr("n") === Some("42"))
    mem.setStr("n", "43")
    assert(mem.get("n") === Some(43L))
  }
}
