package graft.plans

import org.apache.spark.sql.Dataset

/** The repo's one lineage-cut / cache-release pin, with a DURABILITY
  * DIAL (VERDICT r15 #6).
  *
  * Convention: a bounded intermediate that (a) is consumed more than
  * once in one action (exchange reuse dedups the shuffle, not the
  * agg/join above it — the measured twice-consumed-subtree lesson),
  * or (b) must outlive a scoped cache it was derived from, is pinned
  * eagerly. `localCheckpoint(true)` does that with EXECUTOR-stored
  * blocks — correct and cheap on local masters, but the blocks have
  * NO lineage and NO replication: on a real cluster an executor loss
  * after the pin permanently breaks every frame derived from it.
  *
  * The dial: set `spark.graft.checkpointDir` (a Hadoop-compatible
  * path — HDFS/S3A/local) and every pin in the library becomes a
  * RELIABLE checkpoint there instead, surviving executor churn at
  * the cost of a filesystem round-trip per pin. Unset (the default)
  * keeps the executor-block behavior, byte-identical to every prior
  * round. Both modes return the same rows (PinsSpec pins it) — the
  * dial trades pin latency for durability, never semantics.
  *
  * The SparkContext checkpoint dir is set from the conf on first
  * use and left alone afterwards (Spark appends a per-context UUID
  * subdirectory; re-setting per pin would scatter files) — change
  * the conf before the first pinned action of a session, not
  * mid-flight. Checkpoint files accumulate for the session's life;
  * a serving deployment points the dial at a TTL'd scratch path.
  */
object Pins {

  /** The conf key the dial reads. */
  val CheckpointDirKey = "spark.graft.checkpointDir"

  /** Eagerly pin `ds`: reliable `checkpoint` when the dial is set,
    * `localCheckpoint` (executor blocks) otherwise. */
  def pin[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.getOption(CheckpointDirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        ds.checkpoint(eager = true)
      case None => ds.localCheckpoint(eager = true)
    }
  }

  /** Postfix form — `df.pinned` reads like the `localCheckpoint`
    * call sites it replaces. */
  implicit class Pinned[T](private val ds: Dataset[T]) extends AnyVal {
    def pinned: Dataset[T] = pin(ds)
  }
}
