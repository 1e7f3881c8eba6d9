package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Optimization-round tooling: run queries once and report DETERMINISTIC
  * plan-execution counters (jobs, stages, tasks, shuffle bytes, input
  * bytes) — the noise-immune before/after evidence for structural changes
  * (wall clock on this box swings ±2× with host contention).
  *
  * Usage: runMain graft.StageCount <q_a,q_b,...>
  */
object StageCount {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufR = new AtomicLong; val shufW = new AtomicLong
    val input = new AtomicLong
    val traceJobs = sys.env.contains("SC_TRACE_JOBS")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (traceJobs) {
          val d = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          val cs = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
          System.err.println(s"[job] ${j.jobId} stages=${j.stageInfos.size} cs=$cs desc=${d.take(80)}")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        val m = s.stageInfo.taskMetrics
        shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        input.addAndGet(m.inputMetrics.bytesRead)
      }
    })
    names.foreach { n =>
      // one warm pass absorbs codegen/JIT bring-up; the counted pass is
      // steady-state
      try { SparkEntry.queries(n)(spark, sfDir).count() } catch { case _: Throwable => () }
      spark.catalog.clearCache(); System.gc()
      Thread.sleep(300)
      jobs.set(0); stages.set(0); tasks.set(0)
      shufR.set(0); shufW.set(0); input.set(0)
      val t0 = System.nanoTime()
      val rc = try { SparkEntry.queries(n)(spark, sfDir).count() }
               catch { case e: Throwable => System.err.println(s"$n FAILED: $e"); -1L }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      println(f"[stagecount] $n%-28s jobs=${jobs.get}%4d stages=${stages.get}%4d tasks=${tasks.get}%6d shufR=${shufR.get / 1024}%8dKB shufW=${shufW.get / 1024}%8dKB input=${input.get / 1024}%8dKB rows=$rc%8d wall=$wall%7.2f")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
