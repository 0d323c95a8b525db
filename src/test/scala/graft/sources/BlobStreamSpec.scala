package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files
import graft.TestSpark

/** Live form of the rblob source: new JSON blobs landing in the
  * bucket directory are streamed as they appear (reference:
  * rblob/blob.go polling with backoff → file-stream discovery with
  * maxFilesPerTrigger).
  */
class BlobStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("JSON blob stream picks up newly landed blobs") {
    val dir = Files.createTempDirectory("graft-blobstream")
    val schema = StructType(Seq(
      StructField("etype", StringType), StructField("uid", LongType)))
    Files.write(dir.resolve("b-001.json"),
      """{"etype":"signup","uid":1}""".getBytes)

    val stream = JsonBlobSource.stream(spark, dir.toString, schema, maxFilesPerTrigger = 4)
    val q = stream.writeStream.format("memory").queryName("blobs")
      .option("checkpointLocation", Files.createTempDirectory("graft-bs-ckpt").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("blobs").count() === 1)
      // a new blob lands in the bucket
      Files.write(dir.resolve("b-002.json"),
        Seq("""{"etype":"click","uid":1}""", """{"etype":"view","uid":2}""").mkString("\n").getBytes)
      q.processAllAvailable()
      assert(spark.table("blobs").count() === 3)
      val keys = spark.table("blobs").select("blob_key").distinct().collect()
        .map(_.getString(0)).sorted
      assert(keys.length === 2 && keys.forall(_.contains("b-00")))
    } finally q.stop()
  }
}
