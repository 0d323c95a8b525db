package graft.tools

/** Diagnose AQE exchange/stage reuse over a shared typed-kernel frame:
  * build one mapPartitions frame, aggregate it two ways, join — then
  * count how many times the kernel stage actually ran. Mirrors the
  * tx_pmi / tx_kn_surprisal shape.
  */
object ProfReuse {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Graft.session("graft-profreuse")
    sys.env.get("PROFREUSE_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("="); spark.conf.set(k, v) })
    println(s"== exchange.reuse=${spark.conf.get("spark.sql.exchange.reuse")} aqe=${spark.conf.get("spark.sql.adaptive.enabled")}")
    import org.apache.spark.sql.functions._
    val kernelRuns = new java.util.concurrent.atomic.AtomicInteger(0)
    val acc = spark.sparkContext.longAccumulator("kernelTasks")
    import spark.implicits._
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it => acc.add(1L); kernelRuns.incrementAndGet(); it.map { case (id, t) =>
        (id, if (t == null) 0L else t.length.toLong) } }
      .toDF("doc_id", "len")
    val c2 = base.groupBy("len").agg(count(lit(1)).as("n"))
    val left = c2.groupBy(expr("len % 10").as("m")).agg(sum("n").as("a"))
    val right = c2.groupBy(expr("len % 7").as("m")).agg(sum("n").as("b"))
    val q = left.join(right, "m")
    q.count()
    println(s"== kernel task invocations (accumulator): ${acc.value}")
    println(s"== default parallelism: ${spark.sparkContext.defaultParallelism}")
    // single branch control: expect exactly #scan-partitions
    acc.reset()
    c2.count()
    println(s"== single-branch kernel invocations: ${acc.value}")
    // pure-SQL shared frame: does reuse fire without typed kernels?
    val acc2 = spark.sparkContext.longAccumulator("sqlTasks")
    val probe = udf((x: Long) => { acc2.add(1L); x })
    val sbase = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), probe(length(col("text")).cast("long")).as("len"))
    val sc2 = sbase.groupBy("len").agg(count(lit(1)).as("n"))
    val sleft = sc2.groupBy(expr("len % 10").as("m")).agg(sum("n").as("a"))
    val sright = sc2.groupBy(expr("len % 7").as("m")).agg(sum("n").as("b"))
    sleft.join(sright, "m").count()
    println(s"== sql-frame probe rows evaluated: ${acc2.value} (5000 = once, 10000 = twice)")
    spark.stop()
  }
}
