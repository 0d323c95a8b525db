package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._
import graft.TestSpark
import graft.events.{Consumer, MemCursorStore, Runner, Spec}

/** Cross-service transport parity (reference: server.go/client.go):
  * a consumer fed by a NETWORK stream — not the file log — runs the
  * identical cursor protocol through Runner.runStreamFrom.
  */
class SocketStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("socket bus feed drives the same cursor protocol as the file log") {
    val server = new java.net.ServerSocket(0)
    val port = server.getLocalPort
    val ckpt = Files.createTempDirectory("graft-socket-ckpt").toString
    // this consumer already committed cursor 4 against the remote log —
    // the bus redelivers everything; the cursor must prune 0..4
    val store = new MemCursorStore(Map("s-bus" -> 4L))
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val spec = Spec(null, store, Consumer("s-bus",
      b => b.select("id").collect().foreach(r => seen.add(r.getLong(0)))))

    val producer = new Thread(() => {
      try {
        val sock = server.accept()
        val out = new java.io.PrintWriter(sock.getOutputStream, true)
        (0L until 10L).foreach { i =>
          out.println(SocketEventSource.toWire(i, "click", i % 3,
            1704067200000L + i * 60000L, 1.0, "{}"))
        }
        out.flush()
        Thread.sleep(120000) // hold the connection open until the test ends
      } catch { case _: InterruptedException | _: java.net.SocketException => () }
    })
    producer.setDaemon(true)
    producer.start()

    val q = Runner.runStreamFrom(
      SocketEventSource.stream(spark, "localhost", port), spec, ckpt,
      availableNow = false)
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (seen.size < 5 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(200)
      }
      assert(seen.asScala.toSet === (5L until 10L).toSet,
        s"expected ids 5..9 after cursor pruning, got ${seen.asScala.toSet}")
      assert(store.get("s-bus") === Some(9L))
    } finally {
      q.stop()
      server.close()
      producer.interrupt()
    }
  }
}
