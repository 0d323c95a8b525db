package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** CSV blob source: RFC 4180 framing (a record is NOT a line),
  * per-blob header drift, gzip, and mid-blob cursor resume through
  * the packed (blob ordinal, record offset) id.
  */
class CsvBlobSourceSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("splitCsv handles quoted commas, embedded newlines, escaped quotes, CRLF, no trailing newline") {
    val blob = "a,b,c\r\n" +
      "1,\"x,y\",plain\r\n" +
      "2,\"line1\nline2\",\"he said \"\"hi\"\"\"\r\n" +
      "3,,last" // no trailing newline, empty middle field
    val recs = CsvBlobSource.splitCsv(blob)
    assert(recs.length == 4)
    assert(recs(0) == IndexedSeq("a", "b", "c"))
    assert(recs(1) == IndexedSeq("1", "x,y", "plain"))
    assert(recs(2) == IndexedSeq("2", "line1\nline2", "he said \"hi\""))
    assert(recs(3) == IndexedSeq("3", "", "last"))
  }

  test("records offset by RECORD (multi-line records), headers resolve by name across blobs") {
    val dir = Files.createTempDirectory("graft-csv")
    // blob-a: a multi-line quoted record BEFORE the one we cursor to —
    // a line-oriented reader would miscount the offset
    Files.writeString(dir.resolve("blob-a.csv"),
      "etype,uid,at\n" +
        "\"pur\nchase\",1,2024-01-01T00:00:00Z\n" +
        "click,2,2024-01-01T00:01:00Z\n")
    // blob-b: SAME fields, different column order (schema drift)
    Files.writeString(dir.resolve("blob-b.csv"),
      "uid,at,etype\n" +
        "3,2024-01-01T00:02:00Z,view\n")
    val log = CsvBlobSource.asEventLog(spark, dir.toString, "etype", "uid", "at")
      .orderBy("id").collect()
    assert(log.length == 3)
    assert(log(0).getAs[String]("eventType") == "pur\nchase")
    assert(log(0).getAs[Long]("foreignId") == 1L)
    assert(log(1).getAs[String]("eventType") == "click")
    // blob-b's reordered header still resolves by name
    assert(log(2).getAs[String]("eventType") == "view")
    assert(log(2).getAs[Long]("foreignId") == 3L)
    // ids: blob-a ordinal 0 offsets 0,1; blob-b ordinal 1 offset 0
    assert(log.map(_.getAs[Long]("id")).toSeq ==
      Seq(0L, 1L, 1L << JsonBlobSource.OffsetBits))
  }

  test("ragged records are flagged and preserved, not silently truncated") {
    val dir = Files.createTempDirectory("graft-csvrag")
    Files.writeString(dir.resolve("blob-a.csv"),
      "etype,uid,at\n" +
        "click,1,2024-01-01T00:00:00Z\n" + // well-formed
        "view,2\n" +                        // missing trailing field
        "buy,3,2024-01-01T00:02:00Z,EXTRA\n") // extra field
    val recs = CsvBlobSource.readRecords(spark, dir.toString)
      .orderBy("off").collect()
    assert(recs.map(_.getAs[Boolean]("ragged")).toSeq ==
      Seq(false, true, true))
    val shortRow = recs(1).getAs[Map[String, String]]("fields")
    assert(!shortRow.contains("at")) // absent, NOT shifted
    assert(shortRow("uid") == "2")
    val longRow = recs(2).getAs[Map[String, String]]("fields")
    assert(longRow("_extra_1") == "EXTRA") // preserved, NOT dropped
    assert(longRow("at") == "2024-01-01T00:02:00Z")
    // dead-letter routing: the event view carries the flag
    val log = CsvBlobSource.asEventLog(spark, dir.toString, "etype", "uid", "at")
    assert(log.filter(!col("ragged")).count() == 1)
    assert(log.filter(col("ragged")).count() == 2)
    // the short row's missing ts resolves to null, its present fields survive
    val shortEv = log.filter(col("foreignId") === 2L).collect().head
    assert(shortEv.getAs[java.sql.Timestamp]("ts") == null)
    assert(shortEv.getAs[String]("eventType") == "view")
  }

  test("gzip blobs + mid-blob cursor resume") {
    val dir = Files.createTempDirectory("graft-csvgz")
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve("blob-a.csv.gz")))
    gz.write("etype,uid,at\nclick,1,2024-01-01T00:00:00Z\nview,2,2024-01-01T00:01:00Z\npurchase,3,2024-01-01T00:02:00Z\n".getBytes)
    gz.close()
    Files.writeString(dir.resolve("blob-b.csv"),
      "etype,uid,at\nclick,4,2024-01-01T00:03:00Z\n")
    val log = CsvBlobSource.asEventLog(spark, dir.toString, "etype", "uid", "at")
    assert(log.count() == 4)
    // a consumer parked at (blob-a, offset 0) — cursor id 0 — sees
    // exactly the remaining three records, across the blob boundary
    val resumed = log.filter(col("id") > 0L).orderBy("id").collect()
    assert(resumed.map(_.getAs[Long]("foreignId")).toSeq == Seq(2L, 3L, 4L))
    // reference string-cursor round-trip for the same position
    val cur = JsonBlobSource.cursorString("blob-a.csv.gz", 0L)
    assert(JsonBlobSource.parseCursor(cur).contains(("blob-a.csv.gz", 0L, false)))
  }
}
