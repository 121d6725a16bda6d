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
    * `localCheckpoint` (executor blocks) otherwise. If the
    * application already established a DIFFERENT SparkContext
    * checkpoint dir, that one wins (Spark's checkpoint dir is
    * context-global and append-only in spirit — re-setting per pin
    * would scatter files) and a warning names both paths, so a
    * deployment that set the dial expecting TTL'd scratch placement
    * is never silently surprised by checkpoints landing elsewhere. */
  def pin[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.getOption(CheckpointDirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        sc.getCheckpointDir match {
          case None => sc.setCheckpointDir(dir)
          case Some(est) if !est.startsWith(dir) &&
              !est.stripPrefix("file:").startsWith(dir) =>
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"Pins.pin: $CheckpointDirKey=$dir is set, but the " +
              s"SparkContext checkpoint dir was already established at " +
              s"$est — reliable checkpoints will land there, not at the " +
              "dial's path (set the dial before the first checkpointed " +
              "action, or clear the pre-set dir)")
          case _ => // established from this dial (UUID subdir) — quiet
        }
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
