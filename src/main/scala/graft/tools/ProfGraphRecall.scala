package graft.tools

import org.apache.spark.sql.functions._

/** r17 scratch: replicate plantedCloneRecall's 32-vector corpus and
  * trace the graph walk for the missing probe — which L1 cells the
  * beam reaches, where the clone's cell actually is, and whether a
  * wider beam / 2-hop arrival would cover it.
  */
object ProfGraphRecall {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Graft.session("prof-graph-recall")
    import spark.implicits._
    val base = spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])]
      .orderBy("vec_id").take(16)
    val rows = base.zipWithIndex.map { case ((_, v), i) =>
      (i.toLong, v.updated(0, v.head + 1e-3f))
    }.toSeq ++ base.map { case (id, v) => (id + 100L, v) }
    val dir = java.nio.file.Files.createTempDirectory("graft-gr")
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")

    val res = graft.SparkEntry.queries("ann_graph_search")(spark, dir.toString)
      .filter("rk = 1").collect()
      .map(r => r.getAs[Long]("probe") -> r.getAs[Long]("neighbor")).toMap
    val misses = base.zipWithIndex.collect {
      case ((id, _), i) if !res.get(i.toLong).contains(id + 100L) =>
        (i.toLong, id + 100L, res.get(i.toLong))
    }
    println(s"MISSES: ${misses.mkString(", ")}")

    // trace the walk for each missing probe
    import graft.ann.AnnOps.{cos4, hierCell}
    val c = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val (seeds, nL1, parentOf, kidsArr) = graft.ann.AnnOps.graphLayers(c)
    val sid = c.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(256).select("vec_id").collect().map(_.getLong(0))
    val vecs = c.as[(Long, Seq[Double])].collect()
      .map { case (id, v) => id -> v.toArray }.toMap
    val gAdj = (0 until nL1).map { a =>
      a -> (0 until nL1).filter(_ != a)
        .map(b => (b, cos4(seeds(a), seeds(b))))
        .sortBy { case (b, cs) => (-cs, b) }.take(4).map(_._1).toSet
    }.toMap
    misses.foreach { case (p, clone, got) =>
      val pv = vecs(p)
      val psm = Array.tabulate(nL1)(i => cos4(pv, seeds(i)))
      var beam = Seq(0)
      (1 to 4).foreach { _ =>
        val cand = (beam ++ beam.flatMap(gAdj.getOrElse(_, Set.empty))).distinct
        beam = cand.sortBy(cid => (-psm(cid), cid)).take(3)
      }
      val arrival = (beam ++ beam.flatMap(gAdj.getOrElse(_, Set.empty))).distinct
      val cloneCell = hierCell(vecs(clone), seeds, kidsArr, nL1)
      val cloneParent = parentOf(cloneCell)
      println(s"PROBE $p: beam=$beam arrival=${arrival.sorted}")
      println(s"  psm ranked=${(0 until nL1).sortBy(i => -psm(i)).take(6)
        .map(i => s"$i:${psm(i)}").mkString(",")}")
      println(s"  clone $clone cell(cid2)=$cloneCell (seed vec ${sid(cloneCell)}) parent(L1)=$cloneParent inArrival=${arrival.contains(cloneParent)}")
      val children = arrival.flatMap(cid =>
        parentOf.zipWithIndex.filter(_._1 == cid).map(_._2)).distinct
      val chosen = children.sortBy(c2 => (-cos4(pv, seeds(c2)), c2)).take(8)
      println(s"  descent chosen=${chosen.map(c2 => s"$c2(${cos4(pv, seeds(c2))})").mkString(",")}")
    }
    spark.stop()
  }
}
