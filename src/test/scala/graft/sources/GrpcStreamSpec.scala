package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import graft.TestSpark
import graft.events.ReflexPb
import graft.util.{Hpack, Http2}

/** End-to-end gRPC (HTTP/2 + HPACK + gRPC message framing) for
  * `reflexpb.Reflex/Stream` — the reference's actual transport
  * (server.go / client.go / grpctest): resume from a cursor, toHead
  * termination with grpc-status 0 trailers, client cancel via
  * RST_STREAM, UNIMPLEMENTED for unknown methods, flow-control past
  * the 65535-octet initial window, and a Huffman-coded
  * incrementally-indexed request header block (what grpc-go emits).
  */
class GrpcStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkTable(n: Int, metaBytes: Int = 0): EventsTable = {
    val dir = Files.createTempDirectory("graft-grpc").resolve("log").toString
    val table = new EventsTable(spark, dir)
    import spark.implicits._
    val meta = if (metaBytes > 0) "x" * metaBytes else "{}"
    table.insert((0 until n).map { i =>
      ("click", (i % 3).toLong,
        java.sql.Timestamp.valueOf(f"2024-01-01 00:${i % 60}%02d:00"), 1.0, meta)
    }.toDF("eventType", "foreignId", "ts", "value", "metadata"))
    table
  }

  test("Stream(after, toHead): events past the cursor arrive in order, status 0") {
    val table = mkTable(10)
    val server = new GrpcEventServer(() => table.log.df)
    try {
      val got = Seq.newBuilder[ReflexPb.PbEvent]
      val res = GrpcEventClient.stream("localhost", server.boundPort,
        after = 3, toHead = true) { e => got += e; true }
      assert(res.grpcStatus == 0)
      val evs = got.result()
      assert(evs.map(_.id) == (4L to 9L))
      assert(evs.forall(_.eventType == "click"))
      assert(evs.map(_.foreignId) == Seq(1L, 2L, 0L, 1L, 2L, 0L))
    } finally server.close()
  }

  test("live tail: events inserted after connect are streamed; client cancel sends RST") {
    val table = mkTable(4)
    val server = new GrpcEventServer(() => table.log.df, pollMs = 20)
    try {
      val got = new java.util.concurrent.CopyOnWriteArrayList[Long]()
      val t = new Thread(() => {
        GrpcEventClient.stream("localhost", server.boundPort, after = -1) { e =>
          got.add(e.id)
          got.size < 6 // cancel after six events
        }
        ()
      })
      t.start()
      // wait for the initial four, then append two more while live
      val deadline = System.currentTimeMillis() + 10000
      while (got.size < 4 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(got.size == 4)
      import spark.implicits._
      table.insert(Seq(
        ("buy", 7L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 2.0, "{}"),
        ("buy", 8L, java.sql.Timestamp.valueOf("2024-01-01 01:01:00"), 3.0, "{}"))
        .toDF("eventType", "foreignId", "ts", "value", "metadata"))
      t.join(10000)
      assert(!t.isAlive)
      assert(scala.jdk.CollectionConverters.ListHasAsScala(got).asScala.toSeq ==
        (0L to 5L))
    } finally server.close()
  }

  test("flow control: a stream larger than the 65535 initial window completes") {
    // 120 events x ~1.2KB metadata ≈ 150KB >> 65535: requires the
    // client's WINDOW_UPDATEs to be honored and DATA to fragment
    val table = mkTable(120, metaBytes = 1200)
    val server = new GrpcEventServer(() => table.log.df, chunk = 64)
    try {
      var n = 0
      var bytes = 0L
      val res = GrpcEventClient.stream("localhost", server.boundPort,
        after = -1, toHead = true) { e => n += 1; bytes += e.metadata.length; true }
      assert(res.grpcStatus == 0)
      assert(n == 120)
      assert(bytes == 120L * 1200)
    } finally server.close()
  }

  test("relayGrpc bridges the gRPC transport to the socket-source line protocol, resuming on reconnect") {
    val table = mkTable(10)
    val server = new GrpcEventServer(() => table.log.df)
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
    val (port, closeRelay) = EventStreamClient.relayGrpc(
      "localhost", server.boundPort, after = 2L, toHead = true)
    try {
      assert(readIds(port) == (3L to 9L))
      import spark.implicits._
      table.insert((0 until 4).map { i =>
        ("click", 0L, java.sql.Timestamp.valueOf(f"2024-01-02 00:0$i%d:00"), 1.0, "{}")
      }.toDF("eventType", "foreignId", "ts", "value", "metadata"))
      // reconnect: a fresh Stream() call presents the last forwarded id
      assert(readIds(port) == (10L to 13L))
    } finally { closeRelay(); server.close() }
  }

  test("full consume loop over gRPC: durable cursor presented, committed, live tail") {
    import scala.jdk.CollectionConverters._
    val table = mkTable(10)
    val server = new GrpcEventServer(() => table.log.df, pollMs = 50)
    val store = new graft.events.MemCursorStore(Map("remote" -> 3L))
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val spec = graft.events.Spec(null, store, graft.events.Consumer("remote",
      b => b.select("id").collect().foreach(r => seen.add(r.getLong(0)))))
    val ckpt = Files.createTempDirectory("graft-grpc-ckpt").toString
    val (q, closeRelay) = EventStreamClient.consumeGrpc(
      spark, "localhost", server.boundPort, spec, ckpt)
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (seen.size < 6 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(100)
      }
      assert(seen.asScala.toSet == (4L to 9L).toSet,
        s"server must start after the presented cursor, got ${seen.asScala.toSet}")
      assert(store.get("remote").contains(9L))
      // producer appends while the consumer is live (gRPC long-poll)
      import spark.implicits._
      table.insert((0 until 3).map { i =>
        ("tail", 1L, java.sql.Timestamp.valueOf(f"2024-01-01 01:0$i%d:00"), 1.0, "{}")
      }.toDF("eventType", "foreignId", "ts", "value", "metadata"))
      while (seen.size < 9 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(100)
      }
      assert(seen.asScala.toSet == (4L to 12L).toSet)
      assert(store.get("remote").contains(12L))
    } finally { q.stop(); closeRelay(); server.close() }
  }

  test("TLS mode: ALPN negotiates h2 and the stream completes over TLSv1.3") {
    val table = mkTable(8)
    val ksDir = Files.createTempDirectory("graft-grpc-tls").toString
    val ks = GrpcTls.selfSigned(ksDir)
    val server = new GrpcEventServer(() => table.log.df,
      sslContext = Some(GrpcTls.serverContext(ks, "changeit")))
    try {
      val got = Seq.newBuilder[Long]
      val res = GrpcEventClient.stream("localhost", server.boundPort,
        after = 2, toHead = true,
        sslContext = Some(GrpcTls.clientContext(ks, "changeit"))) { e =>
        got += e.id; true
      }
      assert(res.grpcStatus == 0)
      assert(got.result() == (3L to 7L))
    } finally server.close()
  }

  test("unknown method gets grpc-status 12 UNIMPLEMENTED in trailers") {
    val table = mkTable(2)
    val server = new GrpcEventServer(() => table.log.df)
    try {
      val sock = new java.net.Socket("localhost", server.boundPort)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      val in = new java.io.BufferedInputStream(sock.getInputStream)
      out.write(Http2.Preface)
      Http2.writeFrame(out, Http2.Settings, 0, 0, Http2.settingsPayload(Nil))
      Http2.writeFrame(out, Http2.Headers,
        Http2.FlagEndHeaders | Http2.FlagEndStream, 1, Hpack.encode(Seq(
          ":method" -> "POST", ":scheme" -> "http",
          ":path" -> "/some.Other/Method", ":authority" -> "localhost",
          "content-type" -> "application/grpc", "te" -> "trailers")))
      out.flush()
      val hpackIn = new Hpack.Decoder()
      var status = -1
      var open = true
      while (open) Http2.readFrame(in) match {
        case None => open = false
        case Some(f) if f.tpe == Http2.Headers =>
          hpackIn.decode(Http2.unpad(f)).foreach(_.foreach {
            case ("grpc-status", v) => status = v.toInt
            case _ => ()
          })
          if (f.has(Http2.FlagEndStream)) open = false
        case Some(f) if f.tpe == Http2.Settings && !f.has(Http2.FlagAck) =>
          Http2.writeFrame(out, Http2.Settings, Http2.FlagAck, 0); out.flush()
        case _ => ()
      }
      sock.close()
      assert(status == 12)
    } finally server.close()
  }

  test("stock-client handshake fixture: frozen golden bytes drive a full Stream call") {
    // The ENTIRE client side of a grpc-go `Stream` call as literal
    // frozen bytes — hand-derived from RFC 7540/7541 (HPACK static
    // indices; Huffman codes per Appendix B, produced by this repo's
    // Appendix-C-conformance-tested encoder and frozen here so the
    // decode path is tested against bytes NO current code generates):
    //   1. connection preface
    //   2. empty SETTINGS (grpc-go's default client settings frame)
    //   3. connection WINDOW_UPDATE +983041 (grpc-go raises the conn
    //      window to 1 MiB at connect)
    //   4. HEADERS (stream 1, END_HEADERS): :method POST (idx 3),
    //      :scheme http (idx 6), then literal-with-incremental-
    //      indexing Huffman values — :path /reflexpb.Reflex/Stream,
    //      :authority localhost, content-type application/grpc,
    //      user-agent grpc-go/1.60.0, te: trailers (new name)
    //   5. DATA (stream 1, END_STREAM): grpc message framing
    //      (uncompressed flag + u32 length) around the protobuf
    //      StreamRequest{after: "1", toHead: true}
    // What stays untestable without a real grpc-go binary in the
    // container is documented in SURVEY §2 A61.
    def unhex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def frame(tpe: Int, flags: Int, streamId: Int, payload: Array[Byte]): Array[Byte] = {
      val h = Array[Byte](
        ((payload.length >>> 16) & 0xff).toByte,
        ((payload.length >>> 8) & 0xff).toByte,
        (payload.length & 0xff).toByte,
        tpe.toByte, flags.toByte,
        ((streamId >>> 24) & 0x7f).toByte, ((streamId >>> 16) & 0xff).toByte,
        ((streamId >>> 8) & 0xff).toByte, (streamId & 0xff).toByte)
      h ++ payload
    }
    val preface = unhex("505249202a20485454502f322e300d0a0d0a534d0d0a0d0a")
    val settings = frame(0x4, 0, 0, Array.empty)
    val windowUpdate = frame(0x8, 0, 0, unhex("000f0001")) // +983041
    val headersBlock = unhex(
      "8386449162c2cb417cd71afb4b2d05f2c6e4d851d34186a0e41d139d095f8b" +
        "1d75d0620d263d4c4d65647a8a9acac8b4c7602bb805c14082497f864d8335" +
        "05b11f")
    val headers = frame(0x1, 0x4, 1, headersBlock)
    // 00 (uncompressed) + 00000007 (len) + StreamRequest protobuf
    val data = frame(0x0, 0x1, 1, unhex("0000000007" + "120220011a0131"))

    val table = mkTable(5)
    val server = new GrpcEventServer(() => table.log.df)
    try {
      val sock = new java.net.Socket("localhost", server.boundPort)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      val in = new java.io.BufferedInputStream(sock.getInputStream)
      out.write(preface); out.write(settings); out.write(windowUpdate)
      out.write(headers); out.write(data); out.flush()

      val hpackIn = new Hpack.Decoder()
      val ids = Seq.newBuilder[Long]
      val msgBuf = new java.io.ByteArrayOutputStream()
      var status = -1
      var open = true
      while (open) Http2.readFrame(in) match {
        case None => open = false
        case Some(f) if f.tpe == Http2.Settings && !f.has(Http2.FlagAck) =>
          Http2.writeFrame(out, Http2.Settings, Http2.FlagAck, 0); out.flush()
        case Some(f) if f.tpe == Http2.Data =>
          msgBuf.write(Http2.unpad(f))
          if (f.has(Http2.FlagEndStream)) open = false
        case Some(f) if f.tpe == Http2.Headers =>
          hpackIn.decode(Http2.unpad(f)).foreach(_.foreach {
            case ("grpc-status", v) => status = v.toInt
            case _ => ()
          })
          if (f.has(Http2.FlagEndStream)) open = false
        case _ => ()
      }
      sock.close()
      val buf = msgBuf.toByteArray
      var off = 0
      while (buf.length - off >= 5) {
        val len = ((buf(off + 1) & 0xff) << 24) | ((buf(off + 2) & 0xff) << 16) |
          ((buf(off + 3) & 0xff) << 8) | (buf(off + 4) & 0xff)
        ReflexPb.decodeEvent(
          java.util.Arrays.copyOfRange(buf, off + 5, off + 5 + len))
          .foreach(ids += _.id)
        off += 5 + len
      }
      assert(status == 0, s"stock handshake did not complete: grpc-status $status")
      assert(ids.result() == (2L to 4L)) // after=1, toHead
    } finally server.close()
  }

  test("huffman + incremental-indexing request headers decode (grpc-go's encoding)") {
    val table = mkTable(5)
    val server = new GrpcEventServer(() => table.log.df)
    try {
      val sock = new java.net.Socket("localhost", server.boundPort)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      val in = new java.io.BufferedInputStream(sock.getInputStream)
      out.write(Http2.Preface)
      Http2.writeFrame(out, Http2.Settings, 0, 0, Http2.settingsPayload(Nil))
      // hand-built header block in the style grpc-go emits: static
      // indexing where possible, literal-with-INCREMENTAL-indexing +
      // Huffman strings otherwise (exercises the server's dynamic
      // table and Huffman paths, which Hpack.encode never uses)
      val block = new java.io.ByteArrayOutputStream()
      block.write(0x83) // :method POST (static 3)
      block.write(0x86) // :scheme http (static 6)
      def literalInc(nameStaticIdx: Int, name: String, value: String): Unit = {
        if (nameStaticIdx > 0) Hpack.writeInt(block, 0x40, 6, nameStaticIdx)
        else {
          block.write(0x40)
          val nh = Hpack.huffmanEncode(name)
          Hpack.writeInt(block, 0x80, 7, nh.length)
          block.write(nh)
        }
        val vh = Hpack.huffmanEncode(value)
        Hpack.writeInt(block, 0x80, 7, vh.length)
        block.write(vh)
      }
      literalInc(4, null, "/reflexpb.Reflex/Stream") // :path, huffman value
      literalInc(1, null, "localhost") // :authority
      literalInc(31, null, "application/grpc") // content-type
      literalInc(0, "te", "trailers")
      Http2.writeFrame(out, Http2.Headers, Http2.FlagEndHeaders, 1, block.toByteArray)
      val req = ReflexPb.encodeStreamRequest(1, toHead = true)
      val framed = new Array[Byte](5 + req.length)
      framed(3) = ((req.length >>> 8) & 0xff).toByte
      framed(4) = (req.length & 0xff).toByte
      System.arraycopy(req, 0, framed, 5, req.length)
      Http2.writeFrame(out, Http2.Data, Http2.FlagEndStream, 1, framed)
      out.flush()
      val hpackIn = new Hpack.Decoder()
      val ids = Seq.newBuilder[Long]
      val msgBuf = new java.io.ByteArrayOutputStream()
      var status = -1
      var open = true
      while (open) Http2.readFrame(in) match {
        case None => open = false
        case Some(f) if f.tpe == Http2.Settings && !f.has(Http2.FlagAck) =>
          Http2.writeFrame(out, Http2.Settings, Http2.FlagAck, 0); out.flush()
        case Some(f) if f.tpe == Http2.Data =>
          msgBuf.write(Http2.unpad(f))
          if (f.has(Http2.FlagEndStream)) open = false
        case Some(f) if f.tpe == Http2.Headers =>
          hpackIn.decode(Http2.unpad(f)).foreach(_.foreach {
            case ("grpc-status", v) => status = v.toInt
            case _ => ()
          })
          if (f.has(Http2.FlagEndStream)) open = false
        case _ => ()
      }
      sock.close()
      val buf = msgBuf.toByteArray
      var off = 0
      while (buf.length - off >= 5) {
        val len = ((buf(off + 1) & 0xff) << 24) | ((buf(off + 2) & 0xff) << 16) |
          ((buf(off + 3) & 0xff) << 8) | (buf(off + 4) & 0xff)
        ReflexPb.decodeEvent(
          java.util.Arrays.copyOfRange(buf, off + 5, off + 5 + len))
          .foreach(ids += _.id)
        off += 5 + len
      }
      assert(status == 0)
      assert(ids.result() == (2L to 4L)) // after=1, toHead
    } finally server.close()
  }
}
