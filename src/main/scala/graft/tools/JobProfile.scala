package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Empirical per-job profile of a SparkEntry query (guide §1: the UI is
  * disabled in this harness, so a listener supplies the Jobs/Stages
  * view): runs the query `reps` times and prints, for the LAST rep
  * (steady state), every Spark job with wall duration, stage count,
  * task count and shuffle read/write bytes — plus the gaps BETWEEN jobs
  * (driver-side work: planning, collects, fit numerics).
  * `sbt "runMain graft.tools.JobProfile <name> [sfDir] [reps]"` */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class Job(id: Int, t0: Long, var t1: Long = 0L,
        var stages: Int = 0, var tasks: Int = 0,
        var shufRead: Long = 0L, var shufWrite: Long = 0L,
        var input: Long = 0L, desc: String, var names: List[String] = Nil)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val stageToJob = mutable.Map[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.synchronized {
          jobs(e.jobId) = Job(e.jobId, System.nanoTime(), desc = d)
          e.stageIds.foreach(s => stageToJob(s) = e.jobId)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(e.jobId).foreach(_.t1 = System.nanoTime())
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val si = e.stageInfo
          stageToJob.get(si.stageId).flatMap(jobs.get).foreach { j =>
            j.stages += 1
            j.tasks += si.numTasks
            j.shufRead += si.taskMetrics.shuffleReadMetrics.totalBytesRead
            j.shufWrite += si.taskMetrics.shuffleWriteMetrics.bytesWritten
            j.input += si.taskMetrics.inputMetrics.bytesRead
            j.names ::= si.name
          }
        }
    })

    // batch mode: comma-separated names → one compact summary line per
    // query's steady rep (wall, in-job seconds, job count) — the
    // driver-bound-query scan
    if (name.contains(",")) {
      for (n <- name.split(",").filter(_.nonEmpty)) {
        val f = graft.SparkEntry.queries(n)
        var wall = 0.0
        for (_ <- 1 to reps) {
          jobs.synchronized { jobs.clear(); stageToJob.clear() }
          val t0 = System.nanoTime()
          f(spark, dir).count()
          wall = (System.nanoTime() - t0) / 1e9
        }
        Thread.sleep(300)
        val (jobSum, nJobs) = jobs.synchronized {
          (jobs.values.map(j => math.max(0L, j.t1 - j.t0)).sum / 1e9, jobs.size)
        }
        println(f"[summary] $n wall=$wall%.2f injob=$jobSum%.2f jobs=$nJobs")
      }
      spark.stop()
      return
    }
    val fn = graft.SparkEntry.queries(name)
    for (r <- 1 to reps) {
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      val t0 = System.nanoTime()
      val cnt = fn(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"== rep $r: $dt%.2f s ($cnt rows), ${jobs.size} jobs")
      if (r == reps) {
        // settle listener events
        Thread.sleep(500)
        var prevEnd = t0
        var jobSum = 0.0
        jobs.values.toSeq.sortBy(_.t0).foreach { j =>
          val gap = (j.t0 - prevEnd) / 1e9
          val dur = (j.t1 - j.t0) / 1e9
          jobSum += dur
          prevEnd = math.max(prevEnd, j.t1)
          val d = (j.desc +: j.names.reverse).filter(_.nonEmpty)
            .mkString("; ").take(90)
          println(f"  gap ${gap}%6.3f s | job ${j.id}%3d ${dur}%6.3f s " +
            f"stages=${j.stages}%2d tasks=${j.tasks}%4d " +
            f"in=${j.input / 1024}%7dK sr=${j.shufRead / 1024}%6dK " +
            f"sw=${j.shufWrite / 1024}%6dK | $d")
        }
        val tail = (System.nanoTime() - 500L * 1000000L - prevEnd) / 1e9
        println(f"  job time $jobSum%.2f s of $dt%.2f s wall; tail gap $tail%.3f s")
      }
    }
    spark.stop()
  }
}
