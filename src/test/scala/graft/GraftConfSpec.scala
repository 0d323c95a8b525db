package graft

import org.scalatest.funsuite.AnyFunSuite

/** The spark.graft.* surface stays centralized and documented:
  * every key the code reads resolves through GraftConf.all, and
  * CONFIG.md carries a row per key with the exact shipped default.
  */
class GraftConfSpec extends AnyFunSuite {

  test("registry defaults are the shipped values") {
    val expected = Map(
      "spark.graft.topk.rewrite" -> "true",
      "spark.graft.topk.rewrite.maxK" -> "1000",
      "spark.graft.ann.lsh.tables" -> "2",
      "spark.graft.ann.lsh.probes" -> "2",
      "spark.graft.ann.lsh.maxBucket" -> "10000",
      "spark.graft.seqpack.shards" -> "8",
      "spark.graft.dedup.minhash.targetJ" -> "0.8",
      "spark.graft.prefix.broadcastMaxRows" -> (1L << 22).toString)
    assert(GraftConf.all.map(k => k.key -> k.default).toMap === expected)
    assert(GraftConf.all.map(_.key).distinct.size === GraftConf.all.size)
  }

  test("every conf literal in main source resolves through the registry") {
    // grep the main tree: any "spark.graft.*" string literal outside
    // GraftConf.scala itself (comments excepted) means a call site
    // bypassed the registry and can drift from CONFIG.md
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val lit = """"(spark\.graft\.[a-zA-Z.]+)"""".r
    val strays = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala") &&
        !p.toString.endsWith("GraftConf.scala"))
      .flatMap { p =>
        java.nio.file.Files.readAllLines(p).asScala.zipWithIndex.collect {
          case (line, i) if lit.findFirstIn(line).isDefined &&
            !line.trim.startsWith("//") && !line.trim.startsWith("*") =>
            s"$p:${i + 1}: ${line.trim}"
        }
      }.toList
    assert(strays.isEmpty, s"spark.graft.* literals outside GraftConf:\n${strays.mkString("\n")}")
  }

  test("CONFIG.md documents every key with its default") {
    val doc = java.nio.file.Files.readString(java.nio.file.Paths.get("CONFIG.md"))
    GraftConf.all.foreach { k =>
      assert(doc.contains(s"`${k.key}`"), s"CONFIG.md missing row for ${k.key}")
      assert(doc.contains(s"`${k.key}` | `${k.default}`"),
        s"CONFIG.md default for ${k.key} does not match shipped ${k.default}")
    }
  }

  test("session overrides are visible through the registry") {
    val spark = TestSpark.spark
    val prev = spark.conf.getOption(GraftConf.AnnLshTables.key)
    try {
      assert(GraftConf.getInt(spark, GraftConf.AnnLshTables) === 2)
      spark.conf.set(GraftConf.AnnLshTables.key, "6")
      assert(GraftConf.getInt(spark, GraftConf.AnnLshTables) === 6)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(GraftConf.AnnLshTables.key, v)
        case None => spark.conf.unset(GraftConf.AnnLshTables.key)
      }
    }
  }
}
