package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query scheduling profile: jobs / stages / tasks and total task
  * time for each named catalog entry — the numbers that explain
  * anti-scaling (an entry whose 32-core time exceeds its 8-core time
  * is paying fan-out, and this shows exactly how many tasks it
  * launches for how little per-task work).
  * `sbt 'Test/runMain graft.JobStatsQ s03_ivf_ann ...'` */
object JobStatsQ {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Tables(spark, dir, "lineitem").count()

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    val perStageMs =
      new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        stageNames.put(s.stageInfo.stageId, s.stageInfo.name.take(90))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null) {
          taskMs += t.taskInfo.duration
          perStageMs.merge(t.stageId, Long.box(t.taskInfo.duration),
            (a: java.lang.Long, b: java.lang.Long) => Long.box(a + b))
        }
    }
    spark.sparkContext.addSparkListener(listener)
    args.foreach { name =>
      // warm once so fixture builds / codegen don't pollute the tally
      Catalog.byName(name).build(spark, dir)
        .write.format("noop").mode("overwrite").save()
      org.apache.spark.sql.graft.Bridge
        .drainListenerBus(spark.sparkContext, 30000)
      jobs = 0; stages = 0; tasks = 0; taskMs = 0L
      perStageMs.clear(); stageNames.clear()
      val t0 = System.nanoTime()
      Catalog.byName(name).build(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.Bridge
        .drainListenerBus(spark.sparkContext, 30000)
      println(f"STATS $name%-26s wall=$wall%6.2fs jobs=$jobs%3d " +
        f"stages=$stages%3d tasks=$tasks%5d taskTime=${taskMs / 1000.0}%7.2fs")
      if (sys.env.get("SPARK_GRAFT_STAGE_DETAIL").contains("1")) {
        import scala.jdk.CollectionConverters._
        perStageMs.asScala.toSeq.sortBy(-_._2).take(8).foreach {
          case (sid, ms) =>
            println(f"  stage $sid%4d ${ms / 1000.0}%7.2fs  " +
              stageNames.getOrDefault(sid, "?"))
        }
      }
    }
    spark.stop()
  }
}
