package graft
// Temporary per-stage attribution for optimization A/Bs (not library
// surface): runs declared queries with a listener printing every
// stage's task count, wall and cumulative executor CPU, so the task
// budget of a many-stage pipeline is visible without the UI.
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

object ProfQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfQ <sfDir> <name>[,...]")
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 262144)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cpuByStage = new ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val jobOfStage = new ConcurrentHashMap[Int, String]()
    val listener = new SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        js.stageIds.foreach(s => jobOfStage.put(s, s"j${js.jobId} $desc"))
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          cpuByStage.computeIfAbsent(te.stageId,
            _ => new java.util.concurrent.atomic.AtomicLong)
            .addAndGet(te.taskMetrics.executorCpuTime)
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime}
          yield (c - s) / 1e3).getOrElse(-1.0)
        val cpu = Option(cpuByStage.get(i.stageId))
          .map(_.get / 1e9).getOrElse(0.0)
        val job = Option(jobOfStage.get(i.stageId)).getOrElse("")
        System.err.println(f"[stage] id=${i.stageId}%-4d tasks=${i.numTasks}%-4d " +
          f"wall=$wall%6.2fs cpu=$cpu%6.2fs  [$job] ${i.name.linesIterator.next()}")
      }
    }

    // untimed warmup (JIT, codegen)
    try { SparkEntry.queries("q01_pricing_summary")(spark, dir).count() }
    catch { case _: Throwable => }
    spark.catalog.clearCache(); System.gc()
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      System.err.println(s"===== $name =====")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      System.err.println(f"[prof] $name wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
