package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.CoreQueries
import graft.sources.Tables
import graft.streaming.StreamOps

/** The stateful streaming ops under the RocksDB state store
  * (VERDICT r9 #5): st02/st13/st15 hold per-key state in
  * flatMapGroupsWithState, and the DEFAULT HDFS-backed provider keeps
  * every key's state on the executor HEAP — at 100 TB user-key
  * cardinality that is an OOM, not a slowdown. RocksDB spills state
  * to local disk with a bounded block cache, which is the production
  * configuration for high-cardinality state (SURVEY §4 sizing note).
  *
  * These tests re-run the exact-parity contracts of the three
  * stateful kernels with
  * `spark.sql.streaming.stateStore.providerClass =
  * RocksDBStateStoreProvider` (set per-suite, restored after): the
  * provider must be a pure storage swap — byte-identical outputs —
  * and the on-disk artifact check pins that RocksDB actually ran
  * (its checkpoints are version.zip + changelog, where the HDFS
  * provider writes version.delta).
  */
class RocksDbStreamingSpec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private var oldProvider: Option[String] = None

  override def beforeAll(): Unit = {
    super.beforeAll()
    oldProvider = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksProvider)
  }

  override def afterAll(): Unit = {
    oldProvider match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
    super.afterAll()
  }

  private def eventsBatch = Tables.events(spark, sf0001).limit(400).cache()

  test("st13 funnel parity holds under RocksDB, and the checkpoint carries RocksDB artifacts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = eventsBatch
      .select(col("user_id"), col("ts").cast("timestamp"), col("event_type"))
      .as[StreamOps.FEv].collect().toSeq.sortBy(_.ts.getTime)
    val ckpt = java.nio.file.Files.createTempDirectory("rocks_st13").toString

    val stream = MemoryStream[StreamOps.FEv]
    val (first, second) = evs.splitAt(evs.length / 2)
    stream.addData(first)
    val q = StreamOps.funnelStream(spark, stream.toDS())
      .writeStream.format("memory").queryName("rocks_st13_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      stream.addData(second)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("rocks_st13_out").select("user_id", "stage", "ts")
    val batch = CoreQueries.funnelStageRows(
      eventsBatch.select(col("user_id"), col("event_type"), col("ts").cast("timestamp")))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      s"RocksDB provider changed funnel rows: streamed=${streamed.count()} batch=${batch.count()}")

    // the state checkpoint must be RocksDB's (version.zip/changelog),
    // not the HDFS provider's version.delta — proof the swap took
    val stateFiles = {
      val dir = java.nio.file.Paths.get(ckpt, "state")
      val it = java.nio.file.Files.walk(dir).iterator()
      val names = scala.collection.mutable.ListBuffer.empty[String]
      while (it.hasNext) names += it.next().getFileName.toString
      names.toList
    }
    assert(stateFiles.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")),
      s"no RocksDB artifacts under $ckpt/state: ${stateFiles.take(20)}")
    assert(!stateFiles.exists(_.endsWith(".delta")),
      "HDFS-provider .delta files present — the provider swap did not take")
  }

  test("st15 anomaly parity is bit-exact under RocksDB") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1700002800000L
    def hour(h: Int, i: Int) = new Timestamp(base + h * 3600000L + i * 1000L)
    def bucket(h: Int, n: Int) = (0 until n).map(i => StreamOps.AEv("tickk", hour(h, i)))
    val counts = (0 until 14).map(h => if (h % 2 == 0) 12 else 8) :+ 30
    val evs = counts.zipWithIndex.flatMap { case (n, h) => bucket(h, n) }
    val sentinel = StreamOps.AEv("zzmark", hour(50, 0))

    val stream = MemoryStream[StreamOps.AEv]
    val q = StreamOps.anomalyStream(spark, stream.toDS())
      .writeStream.format("memory").queryName("rocks_st15_out")
      .outputMode("append").start()
    try {
      val (c1, c2) = evs.splitAt(evs.length / 2)
      stream.addData(c1); q.processAllAvailable()
      stream.addData(c2 :+ sentinel); q.processAllAvailable()
      stream.addData(Seq(StreamOps.AEv("zzmark", hour(51, 0)))); q.processAllAvailable()
    } finally q.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getString(0), r.getTimestamp(1).getTime) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)), r.getInt(7)))
    }.toMap
    val streamed = rows(spark.table("rocks_st15_out"))
    val batch = rows(CoreQueries.rollingAnomaly(
      (evs :+ sentinel).toDS().select(col("event_type"), col("ts"))))
    assert(streamed == batch, s"RocksDB provider changed anomaly rows")
    assert(streamed.values.count(_._6 == 1) == 1)
  }

  test("st02 sessionization contract holds under RocksDB") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = eventsBatch
      .select(col("user_id"), col("ts").cast("timestamp"), col("value"))
      .as[StreamOps.Ev].collect().toSeq.sortBy(_.ts.getTime)

    val stream = MemoryStream[StreamOps.Ev]
    stream.addData(evs)
    val q = StreamOps.sessionize(spark, stream.toDS())
      .writeStream.format("memory").queryName("rocks_st02_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(120000) finally q.stop()

    val streamed = spark.table("rocks_st02_out")
      .select("user_id", "session_id", "n_events", "session_start")
    val all = StreamOps.openSessions(spark,
      eventsBatch.select(col("user_id"), col("ts").cast("timestamp"), col("value")).as[StreamOps.Ev])
    val lastPerUser = all.groupBy("user_id").agg(max("session_id").as("last_sid"))
    val closedBatch = all.join(lastPerUser, "user_id")
      .filter(col("session_id") =!= col("last_sid"))
      .select("user_id", "session_id", "n_events", "session_start")
    assert(closedBatch.exceptAll(streamed).isEmpty,
      "a gap-closed session is missing under the RocksDB provider")
    assert(streamed.exceptAll(all.select("user_id", "session_id", "n_events", "session_start")).isEmpty,
      "RocksDB run emitted a session the batch mirror does not contain")
    assert(streamed.count() >= closedBatch.count() && closedBatch.count() > 0)
  }
}
