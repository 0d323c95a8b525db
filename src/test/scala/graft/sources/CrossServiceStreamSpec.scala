package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._
import graft.TestSpark
import graft.events.{Consumer, MemCursorStore, Runner, Spec}

/** Cross-service streaming parity (reference: server.go serves
  * StreamFunc over gRPC, client.go consumes with its own cursor,
  * grpctest/stream asserts resume): service A SERVES its events table,
  * service B consumes it over the wire with B's own cursor store, and
  * a reconnect resumes mid-stream without the server re-shipping the
  * consumed prefix.
  */
class CrossServiceStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkTable(n: Int): EventsTable = {
    val dir = Files.createTempDirectory("graft-xsvc").resolve("log").toString
    val table = new EventsTable(spark, dir)
    import spark.implicits._
    table.insert((0 until n).map { i =>
      ("click", (i % 3).toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"), 1.0, "{}")
    }.toDF("eventType", "foreignId", "ts", "value", "metadata"))
    table
  }

  test("wire protocol: Stream(after, toHead) serves only events past the cursor, in id order") {
    val table = mkTable(10)
    val server = new EventStreamServer(() => table.log.df)
    try {
      val sock = new java.net.Socket("localhost", server.boundPort)
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      out.println("""{"after":3,"toHead":true}""")
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
      val ids = Iterator.continually(in.readLine()).takeWhile(_ != null)
        .map { line => """"id":(\d+)""".r.findFirstMatchIn(line).get.group(1).toLong }
        .toSeq
      sock.close()
      // server-side cursor filtering: 0..3 never cross the wire
      assert(ids === (4L to 9L))
    } finally server.close()
  }

  test("null event fields cross the wire as JSON null and round-trip through from_json") {
    val dir = Files.createTempDirectory("graft-xsvc-null").resolve("log").toString
    val table = new EventsTable(spark, dir)
    import spark.implicits._
    // value / metadata / eventType all null on one event
    table.insert(Seq(
      (Some("click"), 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some(1.0), Some("{}")),
      (None, 2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), None, None))
      .toDF("eventType", "foreignId", "ts", "value", "metadata"))
    val server = new EventStreamServer(() => table.log.df)
    try {
      val sock = new java.net.Socket("localhost", server.boundPort)
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      out.println("""{"after":-1,"toHead":true}""")
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
      val lines = Iterator.continually(in.readLine()).takeWhile(_ != null).toSeq
      sock.close()
      assert(lines.size === 2, s"null-field event must not kill the stream: $lines")
      // round-trip: the null-field line parses to a row with nulls, id intact
      val parsed = Seq(lines(1)).toDF("value")
        .select(org.apache.spark.sql.functions.from_json(
          org.apache.spark.sql.functions.col("value"),
          SocketEventSource.wireSchema).as("e"))
        .select("e.id", "e.eventType", "e.value", "e.metadata").collect()(0)
      assert(parsed.getLong(0) === 1L)
      assert(parsed.isNullAt(1) && parsed.isNullAt(2) && parsed.isNullAt(3))
    } finally server.close()
  }

  test("watched server wakes a head-parked connection on insert, not pollMs later") {
    // reference rsql/eventstable.go:556 — the notifier is the server's
    // StreamWatcher: with pollMs=60s, a connected client at head only
    // receives a fresh insert promptly if notifyInsert() wakes the park.
    val dir = Files.createTempDirectory("graft-xsvc-notify").resolve("log").toString
    val notifier = new graft.events.InMemNotifier
    val table = new EventsTable(spark, dir, notifier = Some(notifier))
    import spark.implicits._
    table.insert(Seq(("click", 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0, "{}"))
      .toDF("eventType", "foreignId", "ts", "value", "metadata"))
    val server = new EventStreamServer(() => table.log.df,
      pollMs = 60000L, watcher = Some(table.watcher))
    try {
      val sock = new java.net.Socket("localhost", server.boundPort)
      sock.setSoTimeout(45000)
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      out.println("""{"after":0,"toHead":false}""") // at head (id 0) → server parks
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
      Thread.sleep(500) // let the handler reach the park
      val t0 = System.nanoTime()
      table.insert(Seq(("tail", 2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 2.0, "{}"))
        .toDF("eventType", "foreignId", "ts", "value", "metadata"))
      val line = in.readLine() // blocks until the server ships the event
      val wakeMs = (System.nanoTime() - t0) / 1000000L
      sock.close()
      assert(line != null && line.contains("\"id\":1") && line.contains("tail"))
      assert(wakeMs < 30000L,
        s"event took ${wakeMs}ms to arrive — insert did not wake the 60s poll park")
    } finally server.close()
  }

  test("server detects client disconnect during a long poll and frees the handler") {
    val table = mkTable(3)
    val server = new EventStreamServer(() => table.log.df, pollMs = 50L)
    def handlers: Int = {
      val all = new Array[Thread](Thread.activeCount() + 16)
      Thread.enumerate(all)
      all.count(t => t != null && t.getName == s"event-stream-handler-${server.boundPort}" && t.isAlive)
    }
    try {
      val sock = new java.net.Socket("localhost", server.boundPort)
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      out.println("""{"after":100,"toHead":false}""") // past head → long poll
      val deadline0 = System.currentTimeMillis() + 10000
      while (handlers < 1 && System.currentTimeMillis() < deadline0) Thread.sleep(20)
      assert(handlers === 1)
      sock.close() // client goes away mid-poll
      // the peer-watcher read() returns EOF and closes the socket,
      // which the poll loop sees — without it this thread would spin
      // Spark jobs forever
      val deadline = System.currentTimeMillis() + 15000
      while (handlers > 0 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(handlers === 0, "handler thread must exit after peer disconnect")
    } finally server.close()
  }

  test("remote consumer resumes from its own cursor; reconnect continues mid-stream") {
    val table = mkTable(10)
    val server = new EventStreamServer(() => table.log.df, pollMs = 50L)
    val store = new MemCursorStore(Map("remote" -> 3L))
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val spec = Spec(null, store, Consumer("remote",
      b => b.select("id").collect().foreach(r => seen.add(r.getLong(0)))))
    try {
      // --- connection 1: resume from cursor 3, then follow live appends
      val ckpt1 = Files.createTempDirectory("graft-xsvc-ckpt1").toString
      val (q1, close1) = EventStreamClient.consume(
        spark, "localhost", server.boundPort, spec, ckpt1)
      try {
        val deadline = System.currentTimeMillis() + 60000
        while (seen.size < 6 && System.currentTimeMillis() < deadline) {
          q1.processAllAvailable(); Thread.sleep(100)
        }
        assert(seen.asScala.toSet === (4L to 9L).toSet,
          s"server must start after the presented cursor, got ${seen.asScala.toSet}")
        assert(store.get("remote") === Some(9L))
        // producer appends while the consumer is live (long-poll path)
        import spark.implicits._
        table.insert((0 until 3).map { i =>
          ("tail", 1L, java.sql.Timestamp.valueOf(f"2024-01-01 01:0$i%d:00"), 1.0, "{}")
        }.toDF("eventType", "foreignId", "ts", "value", "metadata"))
        while (seen.size < 9 && System.currentTimeMillis() < deadline) {
          q1.processAllAvailable(); Thread.sleep(100)
        }
        assert(seen.asScala.toSet === (4L to 12L).toSet)
        assert(store.get("remote") === Some(12L))
      } finally { q1.stop(); close1() }

      // --- connection 2: a fresh transport + checkpoint presents the
      // committed cursor; only genuinely new events arrive
      seen.clear()
      import spark.implicits._
      table.insert((0 until 2).map { i =>
        ("late", 2L, java.sql.Timestamp.valueOf(f"2024-01-01 02:0$i%d:00"), 1.0, "{}")
      }.toDF("eventType", "foreignId", "ts", "value", "metadata"))
      val ckpt2 = Files.createTempDirectory("graft-xsvc-ckpt2").toString
      val (q2, close2) = EventStreamClient.consume(
        spark, "localhost", server.boundPort, spec, ckpt2)
      try {
        val deadline = System.currentTimeMillis() + 60000
        while (seen.size < 2 && System.currentTimeMillis() < deadline) {
          q2.processAllAvailable(); Thread.sleep(100)
        }
        assert(seen.asScala.toSet === Set(13L, 14L))
        assert(store.get("remote") === Some(14L))
      } finally { q2.stop(); close2() }
    } finally server.close()
  }

  test("relay survives local reconnects, resuming from the last forwarded id") {
    val table = mkTable(10)
    val server = new EventStreamServer(() => table.log.df)
    def readIds(port: Int): Seq[Long] = {
      val sock = new java.net.Socket("localhost", port)
      try {
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
        Iterator.continually(in.readLine()).takeWhile(_ != null)
          .map(l => """"id":(\d+)""".r.findFirstMatchIn(l).get.group(1).toLong)
          .toSeq
      } finally sock.close()
    }
    val (port, closeRelay) = EventStreamClient.relay(
      "localhost", server.boundPort, after = -1L, toHead = true)
    try {
      // first connection drains to the head, then EOFs (toHead)
      assert(readIds(port) === (0L to 9L))
      import spark.implicits._
      table.insert((0 until 4).map { i =>
        ("click", 0L, java.sql.Timestamp.valueOf(f"2024-01-02 00:0$i%d:00"), 1.0, "{}")
      }.toDF("eventType", "foreignId", "ts", "value", "metadata"))
      // a query restart reconnects to the SAME relay port: the relay
      // re-requests from its last forwarded id — the consumed prefix
      // (0..9) must not cross the wire again
      assert(readIds(port) === (10L to 13L))
    } finally { closeRelay(); server.close() }
  }
}
