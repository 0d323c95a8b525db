package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** r14 scratch profiler: where does ann_binary_hamming's wall go at
  * sf1, and what does the banded-candidate alternative cost? Verdict
  * item 1 proposed banded Hamming candidate generation; the data says
  * the corpus sign-bit words are near-random (top-20 Hamming ≈ 25 of
  * 64), so an EXACT banded join needs per-band radius ≥ 6 — more
  * candidate rows than the 16×N linear scan it replaces. This measures
  * the real split: word computation, candidate NLJ + top-20, rerank.
  */
object ProfHamming {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1")
    val spark = graft.Graft.session("prof-hamming")
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$d/embeddings.parquet").count()

    def time(label: String)(f: => Long): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"PROF $label%-24s ${runs.map(_._1).min}%7.3f s  rows=${runs.head._2}")
    }

    val emb = graft.Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val word = (0 until 64).map { i =>
      when(element_at(col("embedding"), i + 1) > lit(0.0f), lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    val words = emb.select(col("vec_id"), word.as("w"))

    time("words_scan")(words.count())
    time("words_exchange")(words.repartition(32).count())

    val probeWords = broadcast(words.filter(col("vec_id") < 16)
      .select(col("vec_id").as("probe"), col("w").as("pw")))
    val ham = probeWords
      .join(words.repartition(32)
        .select(col("vec_id").as("neighbor"), col("w").as("nw")))
      .filter(col("probe") =!= col("neighbor"))
      .select(col("probe"), col("neighbor"),
        expr("cast(bit_count(pw ^ nw) as int)").as("hamming"))
    time("nlj_only")(ham.count())
    val wH = Window.partitionBy("probe").orderBy(col("hamming").asc, col("neighbor").asc)
    val top20 = ham.withColumn("hrk", row_number().over(wH)).filter(col("hrk") <= 20)
      .select("probe", "neighbor", "hamming")
    time("nlj_top20")(top20.count())
    // top-20 hamming values: how tight would a banded radius need to be?
    val stats = top20.groupBy("probe").agg(max("hamming").as("d20"))
      .agg(min("d20"), max("d20")).collect()(0)
    println(s"PROF d20 range: ${stats.get(0)} .. ${stats.get(1)}")

    // r14 kernel pipeline sub-stages
    import spark.implicits._
    time("probe_collect") {
      words.filter(col("vec_id") < 16).as[(Long, Long)].collect().length.toLong
    }
    val kTop20 = top20 // placeholder to keep old path alive
    time("kernel_top20") {
      val probes = words.filter(col("vec_id") < 16).as[(Long, Long)].collect().sortBy(_._1)
      val nP = probes.length; val pids = probes.map(_._1); val pws = probes.map(_._2)
      val kTop = 20
      val partTop = words.as[(Long, Long)].mapPartitions { it =>
        val hH = Array.fill(nP)(new Array[Int](kTop))
        val hN = Array.fill(nP)(new Array[Long](kTop))
        val sz = new Array[Int](nP)
        while (it.hasNext) {
          val (id, w) = it.next()
          var p = 0
          while (p < nP) {
            if (id != pids(p)) {
              val h = java.lang.Long.bitCount(w ^ pws(p))
              val n = sz(p)
              if (n < kTop || h < hH(p)(n - 1) || (h == hH(p)(n - 1) && id < hN(p)(n - 1))) {
                var i = n - (if (n < kTop) 0 else 1)
                while (i > 0 && (hH(p)(i - 1) > h || (hH(p)(i - 1) == h && hN(p)(i - 1) > id))) {
                  hH(p)(i) = hH(p)(i - 1); hN(p)(i) = hN(p)(i - 1); i -= 1
                }
                hH(p)(i) = h; hN(p)(i) = id
                if (n < kTop) sz(p) = n + 1
              }
            }
            p += 1
          }
        }
        (0 until nP).iterator.flatMap { p =>
          (0 until sz(p)).iterator.map(i => (pids(p), hN(p)(i), hH(p)(i)))
        }
      }.toDF("probe", "neighbor", "hamming")
      val w2 = Window.partitionBy("probe").orderBy(col("hamming").asc, col("neighbor").asc)
      partTop.withColumn("hrk", row_number().over(w2)).filter(col("hrk") <= 20).count()
    }
    // rerank cost in isolation: exact-cosine top-5 over a pre-made 320-row frame
    val t20c = top20.collect()
    val t20df = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(t20c.toIndexedSeq, 1), top20.schema))
    time("rerank_only") {
      val probeVecs = broadcast(emb.filter(col("vec_id") < 16)
        .select(col("vec_id").as("probe"), col("embedding").cast("array<double>").as("pv")))
      val cand = emb.join(t20df, col("vec_id") === col("neighbor"))
        .select(col("probe"), col("neighbor"), col("hamming"),
          col("embedding").cast("array<double>").as("nv"))
        .join(probeVecs, "probe")
      val wC = Window.partitionBy("probe").orderBy(col("cos4").desc, col("neighbor").asc)
      cand.selectExpr("probe", "neighbor", "hamming", "round(cosine_sim(pv, nv), 4) AS cos4")
        .withColumn("rk", row_number().over(wC)).filter(col("rk") <= 5).count()
    }
    time("full_query")(graft.SparkEntry.queries("ann_binary_hamming")(spark, d).count())
    spark.stop()
  }
}
