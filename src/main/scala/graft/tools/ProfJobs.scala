package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Decompose a query's wall into its Spark jobs: for each job, wall
  * time, stage count, task count and the dominant stage's name. The
  * fastest way to tell a many-small-jobs floor (collects, checkpoint
  * materializations, measure passes) from one genuinely slow stage.
  *
  * Usage: runMain graft.tools.ProfJobs <sfDir> <query>[,<query>...]
  */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val spark = graft.Graft.session("graft-profjobs")
    // A/B knob: GRAFT_PROF_CONFS="k=v;k2=v2" applies runtime confs
    // before profiling (e.g. spark.sql.adaptive.enabled=false) so a
    // conf's effect on the job/gap decomposition is measurable in one
    // JVM without touching the shipped session.
    sys.env.get("GRAFT_PROF_CONFS").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
        System.err.println(s"[profjobs] conf $k=$v")
      })
    Seq("lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val done = scala.collection.mutable.ArrayBuffer[(Int, Double)]()
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Double)]()
    val stageMetrics = new java.util.concurrent.ConcurrentHashMap[Int, (Double, Double, Double, Double)]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val jobSpans = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time, js.stageInfos.size))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val st = Option(jobs.get(je.jobId)).map(_._1).getOrElse(je.time)
        done.synchronized { done += ((je.jobId, (je.time - st) / 1e3)) }
        jobSpans.put(je.jobId, (st, je.time))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield (c - s) / 1e3).getOrElse(0.0)
        stageTasks.put(si.stageId, (si.numTasks, wall))
        stageNames.put(si.stageId, si.name.take(120))
        val m = si.taskMetrics
        if (m != null) stageMetrics.put(si.stageId,
          (m.executorRunTime / 1e3, m.executorDeserializeTime / 1e3,
            m.jvmGCTime / 1e3, m.executorCpuTime / 1e9))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    names.split(",").foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm run first so JIT/codegen doesn't pollute the decomposition
      fn(spark, sfDir).count()
      done.synchronized { done.clear() }; jobs.clear(); stageTasks.clear()
      jobSpans.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      val rows = done.synchronized { done.toVector }.sortBy(_._1)
      println(f"==== $name wall=$wall%.3f s jobs=${rows.size}")
      // driver-side gaps: time between one job's end and the next
      // job's start (planning/codegen/collect processing)
      locally {
        import scala.jdk.CollectionConverters._
        val spans = jobSpans.asScala.toVector.sortBy(_._2._1)
        var gap = 0.0
        spans.sliding(2).foreach {
          case Vector((_, (_, e1)), (_, (s2, _))) if s2 > e1 => gap += (s2 - e1) / 1e3
          case _ =>
        }
        println(f"  driver gap between jobs: $gap%.3f s")
      }
      jobSpans.clear()
      rows.foreach { case (id, sec) =>
        val nStages = Option(jobs.get(id)).map(_._2).getOrElse(-1)
        println(f"  job $id%3d  $sec%7.3f s  stages=$nStages")
      }
      val st = {
        import scala.jdk.CollectionConverters._
        stageTasks.asScala.toVector.sortBy(-_._2._2).take(8)
      }
      st.foreach { case (sid, (nt, w)) =>
        val (run, deser, gc, cpu) = Option(stageMetrics.get(sid)).getOrElse((0.0, 0.0, 0.0, 0.0))
        val nm = Option(stageNames.get(sid)).getOrElse("")
        println(f"  stage $sid%4d  $w%7.3f s  tasks=$nt  sumRun=$run%6.3f deser=$deser%5.3f gc=$gc%5.3f cpu=$cpu%6.3f  $nm")
      }
    }
    spark.stop()
  }
}
