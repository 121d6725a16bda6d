package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Deterministic(ish) per-query execution metrics — the wall-noise-free
  * complement to Bench for optimization A/Bs (r17): stage/task counts
  * and shuffle/spill bytes move only when the PLAN moves, while
  * wall-clock on this box swings 2-3x across back-to-back JVMs.
  *
  * Usage: runMain graft.Meter <sfDir> <name>[,<name>...]
  * Prints one line per query:
  *   [meter] <name> stages=N tasks=N shuffleRead=N shuffleWrite=N
  *           spill=N wall=S
  */
object Meter {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Meter <sfDir> <name>[,...]")
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

    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    val spill = new AtomicLong
    val cpuNs = new AtomicLong
    val runMs = new AtomicLong
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = te.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spill.addAndGet(m.diskBytesSpilled)
          cpuNs.addAndGet(m.executorCpuTime)
          runMs.addAndGet(m.executorRunTime)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // one untimed warmup against the tiny dir (JIT, codegen)
    try {
      SparkEntry.queries("q01_pricing_summary")(spark, dir).count()
    } catch { case _: Throwable => }
    spark.catalog.clearCache(); System.gc()

    names.foreach { name =>
      stages.set(0); tasks.set(0); shufRead.set(0); shufWrite.set(0); spill.set(0)
      cpuNs.set(0); runMs.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // let straggler task-end events drain before reading counters
      Thread.sleep(500)
      println(f"[meter] $name stages=${stages.get} tasks=${tasks.get} " +
        f"shuffleRead=${shufRead.get} shuffleWrite=${shufWrite.get} " +
        f"spill=${spill.get} cpuSec=${cpuNs.get / 1e9}%.2f " +
        f"runSec=${runMs.get / 1e3}%.2f wall=$wall%.2f")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
