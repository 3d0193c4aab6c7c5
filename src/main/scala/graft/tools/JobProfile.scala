package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Where does a query's wall time go? Runs one registry query with a
  * listener that aggregates per-job wall, stage count, task count and
  * summed task time. The gap between wall and max(task concurrency
  * usage) is scheduler/driver/planning overhead — the thing to cut at
  * bench scale, and a proxy for per-round fixed costs at any scale.
  *
  * sbt -batch "runMain graft.tools.JobProfile <query> [sfDir] [reps]"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    @volatile var jobWallMs = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs += 1; starts.put(e.jobId, e.time)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.getOrDefault(e.jobId, e.time)
        jobWallMs += (e.time - s)
        if (sys.env.contains("GRAFT_JOB_LOG"))
          println(f"[job] ${e.jobId}%4d ${e.time - s}%6d ms")
      }
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        if (sys.env.contains("GRAFT_JOB_LOG")) {
          val site = e.stageInfo.details.linesIterator
            .filterNot(_.contains("org.apache.spark"))
            .filterNot(_.contains("java.")).take(2).mkString(" | ")
          println(s"[stage] ${e.stageInfo.stageId} ${e.stageInfo.name} :: $site")
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += e.stageInfo.numTasks
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null) taskMs += e.taskInfo.duration
    }
    spark.sparkContext.addSparkListener(listener)

    (1 to reps).foreach { i =>
      graft.core.OpCache.releaseAll()
      spark.catalog.clearCache()
      jobs = 0; stages = 0; tasks = 0; taskMs = 0L; jobWallMs = 0L
      val t0 = System.nanoTime()
      val df = Registry.byName(name).run(spark, sfDir)
      val tc = System.nanoTime()
      val n = df.count()
      val t1 = System.nanoTime()
      Thread.sleep(300) // let the listener bus drain
      println(f"[prof] $name rep$i: wall=${(t1 - t0) / 1e9}%.2f s " +
        f"(construct=${(tc - t0) / 1e9}%.2f) rows=$n " +
        f"jobs=$jobs stages=$stages tasks=$tasks " +
        f"taskTime=${taskMs / 1e3}%.1f s jobWall=${jobWallMs / 1e3}%.1f s")
    }
    spark.stop()
  }
}
