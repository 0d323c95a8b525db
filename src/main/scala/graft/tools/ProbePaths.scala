package graft.tools

import org.apache.spark.sql.functions._

/** r14 scratch: does a Hadoop FileSystem listing produce the same key
  * strings as input_file_name()? Decides whether blobKeys can switch
  * to a metadata-only listing (r13 ADVICE) without breaking the
  * blob_key join.
  */
object ProbePaths {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session("probe-paths")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("probe").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir, "2020/01/01"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "2020/01/01/a b.json"), """{"x":1}""")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "top.json"), """{"x":2}""")

    val fromSpark = spark.read.option("wholetext", "true")
      .option("recursiveFileLookup", "true").text(dir)
      .select(input_file_name()).distinct().as[String].collect().sorted
    println("SPARK: " + fromSpark.mkString(" | "))

    val hPath = new org.apache.hadoop.fs.Path(dir)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(hPath, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) buf += it.next().getPath.toString
    println("HDFS : " + buf.sorted.mkString(" | "))
    println("HDFSU: " + buf.map(p => new org.apache.hadoop.fs.Path(p).toUri.toString).sorted.mkString(" | "))
    val it2 = fs.listFiles(hPath, true)
    val buf2 = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it2.hasNext) buf2 += org.apache.spark.paths.SparkPath.fromFileStatus(it2.next()).urlEncoded
    println("SPATH: " + buf2.sorted.mkString(" | "))
    println("MATCH: " + (buf2.sorted.toSeq == fromSpark.toSeq))
    spark.stop()
  }
}
