package graft

import org.apache.spark.sql.functions._

import graft.operators.{ExtendedQueries, VectorQueries}
import graft.plans.Pins

/** The pin durability dial (VERDICT r15 #6): every library
  * lineage-cut routes through Pins.pin — executor-block
  * localCheckpoint by default, a RELIABLE checkpoint when
  * `spark.graft.checkpointDir` is set. Both modes must return
  * identical rows (the dial trades durability for pin latency, never
  * semantics), and the reliable mode must actually write under the
  * dial's directory. */
class PinsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0 until 300).map { i =>
    (i.toLong, Array.tabulate(8)(j => math.sin(i * 2.3 + j * 1.1)), i % 4)
  }.toDF("vec_id", "v", "label")

  test("pin: both modes return identical rows; reliable mode writes under the dial") {
    val df = corpus
    val local = Pins.pin(df).collect().map(_.toString).sorted
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(Pins.CheckpointDirKey, dir)
    try {
      val reliable = Pins.pin(df)
      assert(reliable.collect().map(_.toString).sorted.sameElements(local),
        "reliable and local pins must return the same rows")
      // the SparkContext dir was adopted from the dial and files landed
      val ckptDir = spark.sparkContext.getCheckpointDir
      assert(ckptDir.exists(_.contains(dir.stripPrefix("file:"))),
        s"checkpoint dir $ckptDir not under the dial $dir")
      val found = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(found > 0, "reliable pin wrote no checkpoint files")
    } finally spark.conf.unset(Pins.CheckpointDirKey)
  }

  test("pinned entries return the same rows under both modes (e01c, v15)") {
    val e = corpus
    val e01cLocal = ExtendedQueries.knnClassifyCellBlocked(spark, e)
      .collect().map(_.toString).sorted
    val v15Local = VectorQueries.knnBatchIvf(spark, e, k = 3)
      .collect().map(_.toString).sorted
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt2").toString
    spark.conf.set(Pins.CheckpointDirKey, dir)
    try {
      val e01cRel = ExtendedQueries.knnClassifyCellBlocked(spark, e)
        .collect().map(_.toString).sorted
      assert(e01cRel.sameElements(e01cLocal), "e01c rows differ across pin modes")
      val v15Rel = VectorQueries.knnBatchIvf(spark, e, k = 3)
        .collect().map(_.toString).sorted
      assert(v15Rel.sameElements(v15Local), "v15 rows differ across pin modes")
    } finally spark.conf.unset(Pins.CheckpointDirKey)
  }
}
