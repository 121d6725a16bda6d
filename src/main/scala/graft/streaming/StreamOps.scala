package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY.md §2 st01–st02).
  *
  * The SAME column expressions work under `read` and `readStream`;
  * q08/q09 are the batch mirrors the driver oracle-checks, these are
  * the streaming forms (spec-driven through MemoryStream).
  *
  * Scale notes: windowed counts shuffle once on (window, event_type)
  * with watermark-bounded state; sessionization state is per user_id
  * (high cardinality → spreads across executors) and is dropped via
  * event-time timeout once the watermark passes the session gap, so
  * state size is bounded by users active inside the horizon.
  */
object StreamOps {

  /** st01: watermarked tumbling-window event counts. */
  def windowedCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** st20: STREAMING WINDOWED CARDINALITY — approximate DISTINCT
    * users per tumbling hour per event type, the "unique actors"
    * signal next to st01's row counts: at 100 TB key cardinality an
    * exact streaming distinct would hold every user id in state,
    * while the HLL sketch keeps 2¹² ints per open window — the q22b
    * swap, always-on. The sketch registers as a udaf
    * (functions.udaf over the SAME HllSketch aggregator the batch
    * q22b path and graft_hll SQL use), so it partial-aggregates
    * map-side and merges in the streaming state store; being a
    * deterministic function of the VALUE SET, the stream estimate
    * equals the batch estimate on the same window EXACTLY (the spec
    * asserts equality, no tolerance), regardless of arrival order or
    * chunking. One function under read and readStream. */
  def cardinalityStream(events: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val hll = udaf(new graft.functions.HllSketch(12))
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), hll(col("user_id")).as("approx_users"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("approx_users"))
  }

  /** st14: SLIDING (hopping) window counts — q18's streaming form,
    * the continuous smoothing/alerting view (1h windows every 15min;
    * a boundary-straddling spike that tumbling st01 halves shows
    * whole in the hop). Calls q18's OWN cell kernel
    * (CoreQueries.slidingCells — parity by construction); the only
    * streaming additions are the watermark and the 4× state fan-out:
    * each event updates its length/slide = 4 open hop cells, so the
    * state store holds 4 rows per (active window, type) — still
    * bounded by the watermark horizon, and the per-event Expand is
    * map-side constant work exactly as in batch. */
  def slidingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    graft.operators.CoreQueries.slidingCells(
      events.withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", watermark))

  final case class AEv(event_type: String, ts: Timestamp)
  /** Per-type anomaly state: open (not-yet-watermark-closed) hour
    * buckets and the trailing CLOSED bucket history (≤ AnomalyWindow
    * entries) — a few dozen longs per event type, regardless of
    * rate. openH/openN are parallel arrays (Spark's state encoder
    * handles flat product types; a Map would need a custom codec). */
  final case class AnomState(openH: Seq[Long], openN: Seq[Long],
      histH: Seq[Long], histN: Seq[Long])
  final case class AnomOut(event_type: String, hour: Timestamp, n: Long,
      hist_n: Long, mean24: Double, std24: Double, z: Option[Double],
      is_anomaly: Int)

  private val HourMs = 3600000L

  /** Spark's round() semantics (BigDecimal HALF_UP over the
    * canonical decimal rendering) — the stream must round exactly as
    * the batch kernel's round() does or parity breaks on the last
    * digit. */
  private def roundLikeSpark(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** st15: STREAMING ROLLING-ANOMALY DETECTION — q19's always-on
    * form, the "error rate just tripled" alert computed as events
    * arrive instead of in a nightly batch. Keyed by event_type via
    * flatMapGroupsWithState: state = open hour buckets + the trailing
    * ≤ 24 CLOSED bucket counts; a bucket CLOSES when the watermark
    * passes its end (event-time timeout), at which point it scores
    * against the history exactly as the batch kernel scores a grid
    * row against its trailing window — same integer sums, same IEEE
    * float sequence, same HALF_UP rounding — and then joins the
    * history itself. Emission at close is what makes the alert
    * exact: an in-flight bucket's count is still growing, so scoring
    * it early would alert on partial data (the watermark is the
    * alert latency dial).
    *
    * Scale shape: state per key is O(AnomalyWindow) longs — bounded
    * regardless of event rate — and Spark drops behind-watermark
    * events before the operator (the st02 late-data contract). The
    * event_type key is low-cardinality, so each type's micro-batch
    * slice funnels through one task: at extreme per-type rates,
    * pre-aggregate (type, hour) partial counts upstream in the same
    * micro-batch (the batch kernel's reduce-before-window rule);
    * the state machine is unchanged. */
  def anomalyStream(spark: SparkSession, events: Dataset[AEv],
      watermarkDelay: String = "1 hour"): Dataset[AnomOut] = {
    import spark.implicits._
    import graft.operators.CoreQueries.{AnomalyMinHist, AnomalyWindow, AnomalyZ}
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomState, AnomOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (typ: String, evs: Iterator[AEv], state: GroupState[AnomState]) =>
          val st = state.getOption.getOrElse(AnomState(Nil, Nil, Nil, Nil))
          val open = scala.collection.mutable.SortedMap.empty[Long, Long]
          st.openH.zip(st.openN).foreach { case (h, n) => open(h) = n }
          var hist = st.histH.zip(st.histN).toVector
          val out = scala.collection.mutable.ListBuffer.empty[AnomOut]

          if (!state.hasTimedOut)
            evs.foreach { e =>
              val hr = e.ts.getTime - java.lang.Math.floorMod(e.ts.getTime, HourMs)
              open(hr) = open.getOrElse(hr, 0L) + 1L
            }

          val wm = state.getCurrentWatermarkMs()
          // close every open bucket the watermark has passed, in hour
          // order — each scores against the history BEFORE it joins it
          // (the batch window's "current row excluded" frame)
          open.keys.toSeq.filter(_ + HourMs <= wm).foreach { hr =>
            val n = open.remove(hr).get
            val tail = hist.takeRight(AnomalyWindow)
            val c = tail.length.toLong
            if (c >= AnomalyMinHist) {
              val s1 = tail.map(_._2).sum
              val s2 = tail.map(t => t._2 * t._2).sum
              val mean = s1.toDouble / c
              val varr = (s2.toDouble - c * mean * mean) / (c - 1)
              val std = math.sqrt(math.max(varr, 0.0))
              val z = if (std > 0) Some(roundLikeSpark((n - mean) / std, 4)) else None
              out += AnomOut(typ, new Timestamp(hr), n, c,
                roundLikeSpark(mean, 4), roundLikeSpark(std, 4), z,
                if (math.abs(z.getOrElse(0.0)) >= AnomalyZ) 1 else 0)
            }
            hist = (hist :+ (hr, n)).takeRight(AnomalyWindow)
          }

          state.update(AnomState(open.keys.toSeq, open.values.toSeq,
            hist.map(_._1), hist.map(_._2)))
          if (open.nonEmpty)
            state.setTimeoutTimestamp(math.max(open.firstKey + HourMs, wm + 1L))
          out.iterator
      }
  }

  final case class Ev(user_id: Long, ts: Timestamp, value: Double)
  /** Open session per user, plus an optional still-open PRE-session
    * chain (in-horizon events older than the open session by more
    * than the gap — preN == 0 means none). The pre chain must live in
    * STATE, not flush at batch end: a later in-horizon event can
    * still fall within its gap, and the batch mirror would then emit
    * ONE merged earlier session. */
  final case class SessionState(lastTs: Long, nEvents: Long, startTs: Long,
      preLast: Long = 0L, preN: Long = 0L, preStart: Long = 0L)
  final case class SessionOut(user_id: Long, session_id: Long, n_events: Long, session_start: Timestamp)

  val GapMs: Long = 30 * 60 * 1000

  /** st02: stateful sessionization with flatMapGroupsWithState —
    * emits a session row whenever a 30-min gap closes it (the
    * streaming form of q09's lag-window sessionizer).
    *
    * Per-user state is EVICTED via EVENT-time timeout: once the
    * WATERMARK passes lastTs + gap, the open session is emitted and
    * the state removed — so the gap that closes a session is the
    * same event-time gap the batch mirror uses (a processing-time
    * timeout would spuriously split sessions on lagging or replayed
    * sources), and long-running streams hold state only for users
    * inside the watermark horizon.
    *
    * Late-data contract: under an event-time timeout Spark DROPS
    * rows older than the watermark before this operator, so the
    * tolerated event-time disorder equals `watermarkDelay` (default:
    * the session gap). A delay LONGER than the gap admits events
    * that predate an open session by more than the gap — those become
    * their own earlier session(s), exactly as the batch mirror
    * sessionizes them, never folded into the open state. Replays
    * lagging beyond the delay belong on the batch mirror
    * (q09/openSessions), which has no horizon.
    *
    * session_id is derived from the session's START TIME (epoch ms),
    * not a per-user counter: state eviction must not recycle ids, and
    * (user_id, start-derived id) stays unique and monotonic across
    * evict/return cycles. */
  def sessionize(spark: SparkSession, events: Dataset[Ev],
      watermarkDelay: String = "30 minutes"): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          def emit(start: Long, n: Long) =
            SessionOut(user, start, n, new Timestamp(start))
          if (state.hasTimedOut) {
            // The timeout fires when the watermark passes the EARLIEST
            // still-open chain's lastTs + gap. The pre chain (if any)
            // is always due first (preLast < startTs - gap <= lastTs);
            // the main session may still be mergeable, in which case
            // it stays with a re-armed timeout.
            val st = state.get
            val wm = state.getCurrentWatermarkMs()
            val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
            var cur = st
            if (cur.preN > 0L && wm > cur.preLast + GapMs) {
              out += emit(cur.preStart, cur.preN)
              cur = cur.copy(preLast = 0L, preN = 0L, preStart = 0L)
            }
            if (cur.preN == 0L && wm > cur.lastTs + GapMs) {
              if (cur.nEvents > 0L) out += emit(cur.startTs, cur.nEvents)
              state.remove()
            } else {
              state.update(cur)
              val due = if (cur.preN > 0L) cur.preLast + GapMs else cur.lastTs + GapMs
              state.setTimeoutTimestamp(math.max(due, wm + 1L))
            }
            out.iterator
          } else {
            // Events within a micro-batch may be unordered; order here.
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            val loaded = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
            var st = loaded.copy(preLast = 0L, preN = 0L, preStart = 0L)
            val closed = scala.collection.mutable.ListBuffer.empty[SessionOut]
            // Late events still inside the watermark can predate the
            // carried session by MORE than the gap (the global
            // watermark is held back by the max ts across ALL users, so
            // a quiet user admits arbitrarily old in-horizon events).
            // The batch mirror puts those in their OWN earlier
            // session(s) — folding them into the open state via
            // min(startTs, t) would emit a merged session the batch
            // form never produces. Accumulate them in a pre-session
            // chain instead (carried ACROSS batches in state — a later
            // in-horizon event may still extend it); it closes only
            // when provably unreachable (a newer event beyond its gap,
            // or the watermark passing it via the timeout), unless a
            // bridging event merges it into the main session first.
            var pre: Option[SessionState] =
              if (loaded.preN > 0L)
                Some(SessionState(loaded.preLast, loaded.preN, loaded.preStart))
              else None
            // Closing here is safe ONLY from the event path: events
            // arrive ascending, so a chain is flushed exactly when the
            // current event already lies beyond its gap.
            def flushPre(): Unit = pre.foreach { p =>
              closed += emit(p.startTs, p.nEvents)
              pre = None
            }
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (st.nEvents == 0L) {
                st = SessionState(t, 1L, t)
              } else if (t < st.startTs - GapMs) {
                pre = pre match {
                  case Some(p) if t - p.lastTs <= GapMs =>
                    Some(SessionState(t, p.nEvents + 1, p.startTs))
                  case _ =>
                    flushPre()
                    Some(SessionState(t, 1L, t))
                }
              } else if (t - st.lastTs > GapMs) {
                flushPre()
                closed += SessionOut(user, st.startTs, st.nEvents, new Timestamp(st.startTs))
                st = SessionState(t, 1L, t)
              } else {
                // An in-watermark event from a LATER micro-batch can be
                // older than the carried state — lastTs/startTs must
                // stay monotone (a regressed lastTs would fake a gap
                // against the next event; a late head event inside the
                // gap moves the session START back, matching the batch
                // mirror).
                st = SessionState(math.max(st.lastTs, t), st.nEvents + 1,
                  math.min(st.startTs, t))
                // The pulled-back start may now sit within the gap of
                // the pre-session chain — in the batch mirror they are
                // then ONE session, so merge instead of closing.
                pre match {
                  case Some(p) if st.startTs - p.lastTs <= GapMs =>
                    st = SessionState(st.lastTs, st.nEvents + p.nEvents, p.startTs)
                    pre = None
                  case _ => ()
                }
              }
            }
            // Do NOT flush the pre chain at batch end — carry it in
            // state; the timeout below evicts it once the watermark
            // provably passes its gap.
            val withPre = pre match {
              case Some(p) =>
                st.copy(preLast = p.lastTs, preN = p.nEvents, preStart = p.startTs)
              case None => st
            }
            state.update(withPre)
            val due =
              if (withPre.preN > 0L) withPre.preLast + GapMs
              else withPre.lastTs + GapMs
            state.setTimeoutTimestamp(math.max(due, state.getCurrentWatermarkMs() + 1L))
            closed.iterator
          }
      }
  }

  /** st03: incremental annotation — a STREAM of documents appended to
    * a parquet-backed HippoDb one micro-batch at a time (foreachBatch
    * runs the same batch annotate plan per trigger; the streaming
    * form of annotator.py:221's per-document loop). Entities
    * accumulate with duplicates across batches; readers distinct()
    * them (or compact periodically) — same trade the reference makes
    * by re-saving entities.json. */
  def annotateStream(
      spark: SparkSession,
      docsStream: DataFrame,
      api: graft.api.Graft,
      dir: String): org.apache.spark.sql.streaming.StreamingQuery =
    annotateStream(spark, docsStream, api, dir, compactEvery = 0)

  /** st03 with TABLE MAINTENANCE scheduled into the ingest: every
    * `compactEvery` micro-batches (0 = never), store components that
    * have accumulated at least `minSmallFiles` sub-target files are
    * rewritten by HippoDb.compactFiles — incremental ingest
    * otherwise accumulates one small file per micro-batch per
    * partition and scan cost degrades to file opens + footer reads,
    * so at 100 TB the compaction cadence (not the stream's lifetime)
    * is what bounds file counts. The pass runs INSIDE foreachBatch,
    * between micro-batches, so no concurrent writer races the swap;
    * concurrent READERS stay correct throughout because the
    * crash-safe backup-rename swap keeps a readable directory at
    * every intermediate step. Cadence is keyed to the deterministic
    * batchId, so a restart from the checkpoint keeps the same
    * schedule.
    *
    * Write-amplification contract: each pass rewrites the WHOLE
    * component, so total maintenance bytes grow quadratically with
    * stream lifetime divided by the trigger threshold — the
    * `minSmallFiles` gate keeps passes rare, and a long-lived
    * PRODUCTION ingest should date/bucket-partition its store so
    * each pass touches only the partitions still receiving small
    * files (the ivf_vectors layout precedent), rather than raising
    * the cadence here. */
  def annotateStream(
      spark: SparkSession,
      docsStream: DataFrame,
      api: graft.api.Graft,
      dir: String,
      compactEvery: Int,
      targetBytes: Long = 128L << 20,
      minSmallFiles: Int = 8,
      checkpoint: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = docsStream.writeStream.outputMode(OutputMode.Append)
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) graft.store.HippoDb.append(api.annotate(batch), dir)
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
          val hconf = spark.sparkContext.hadoopConfiguration
          Seq("facts", "edges", "entities", "fact_emb", "sources").foreach { c =>
            val p = new org.apache.hadoop.fs.Path(s"$dir/$c")
            val fs = p.getFileSystem(hconf)
            if (fs.exists(p)) {
              val small = fs.listStatus(p).count(f => f.isFile &&
                f.getPath.getName.startsWith("part-") && f.getLen < targetBytes)
              if (small >= minSmallFiles) {
                val (before, after) =
                  graft.store.HippoDb.compactFiles(spark, s"$dir/$c", targetBytes)
                System.err.println(s"[st03] batch $batchId compacted $c: $before -> $after files")
              }
            }
          }
        }
      }
      .start()
  }

  /** st04: STREAMING exact dedup — the streaming form of d01 for an
    * always-on ingest pipeline: only the first occurrence of a text
    * (by content hash) within the watermark horizon passes.
    * dropDuplicatesWithinWatermark keys state on the narrow 64-bit
    * hash and EVICTS entries once they age past the watermark, so
    * dedup state is bounded by the horizon's arrival rate, not the
    * stream's lifetime. */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("text_hash", xxhash64(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  /** st05: stream-stream INTERVAL join — each purchase joined to the
    * same user's views within the preceding `interval` (the always-on
    * form of q11's ranged join; a self-join of the event stream
    * filtered by type). Both sides carry watermarks and the join
    * condition bounds view_ts to [purchase_ts - interval,
    * purchase_ts], which is what lets Spark EVICT buffered rows once
    * the watermark passes the interval — stream-stream join state is
    * otherwise unbounded. State ≈ horizon × arrival rate per side,
    * keyed by user_id (high cardinality → spreads across executors).
    *
    * The watermark DEFAULTS TO the join interval and must never be
    * shorter: a view evicted before its interval closes would
    * silently drop in-interval matches, so the two are one parameter
    * unless a caller explicitly widens disorder tolerance. */
  def purchaseViewJoin(events: DataFrame, interval: String = "1 hour",
      watermark: Option[String] = None): DataFrame = {
    val wm = watermark.getOrElse(interval)
    val typed = events.withColumn("ts", col("ts").cast("timestamp"))
    val p = typed.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", wm)
    val v = typed.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", wm)
    p.join(v, col("user_id") === col("v_user") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $interval"))
      .select("purchase_id", "user_id", "purchase_ts", "view_id", "view_ts")
  }

  /** st06: STREAMING decontamination — the stream-static join form
    * of t09: incoming documents are checked against a STATIC
    * eval-gram table (a fixed benchmark suite). A stream-static
    * equi-join is STATELESS on the stream side — the static side
    * replans per micro-batch (AQE broadcasts a tiny eval set) and
    * nothing is buffered across batches, so an always-on ingest pays
    * O(micro-batch), never O(stream lifetime). The per-doc tallies
    * group on (ts, doc_id) — the WATERMARK column in the key lets
    * append mode finalize a doc's row once the watermark passes its
    * event time and evict the agg state (collect_set, not
    * count(DISTINCT): distinct aggregates are unsupported on
    * streams, and the set is bounded by one doc's gram count). */
  def decontaminateStream(docs: DataFrame, evalDocs: DataFrame,
      gramSize: Int = graft.operators.TextQueries.ContamGram,
      watermark: String = "1 hour"): DataFrame = {
    // Gram construction is the SHARED t09 kernel — batch/stream
    // parity depends on one tokenization/gram rule, not two copies.
    import graft.operators.TextQueries.wordGramRows
    val ev = wordGramRows(evalDocs, gramSize,
      Seq(col("doc_id").as("eval_doc"))).distinct()
    wordGramRows(
      docs.withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", watermark),
      gramSize, Seq(col("ts"), col("doc_id")))
      .join(ev, "gram")
      .groupBy(col("ts"), col("doc_id"))
      .agg(size(collect_set(col("gram"))).as("n_shared_grams"),
        size(collect_set(col("eval_doc"))).as("n_eval_docs"))
      .select("doc_id", "n_shared_grams", "n_eval_docs", "ts")
  }

  /** st08: STREAMING incremental span dedup — d12's always-on form:
    * incoming documents are checked against a PERSISTED history
    * span-bloom (SketchIndex.buildSpanBloom, built once per corpus
    * version) plus the static exact-verify hash table. The stream
    * side is a narrow typed flatMap to span hashes (the SHARED
    * d08/d11/d12 kernel — parity by construction) followed by a
    * STATELESS broadcast-bloom filter at scan speed; only the
    * bloom-positive sliver reaches the stream-static verify join
    * (stateless on the stream side — the static table replans per
    * micro-batch). Per-doc tallies finalize by watermark — the
    * (ts, doc_id) group key is st06's recipe, collect_set bounded by
    * one doc's window count. An always-on ingest pays O(micro-batch)
    * against 100 TB of indexed history, never a history scan. */
  def spanDedupStream(docs: DataFrame, histHashes: DataFrame,
      bloom: org.apache.spark.util.sketch.BloomFilter,
      watermark: String = "1 hour"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.operators.DedupQueries
    val bc = spark.sparkContext.broadcast(bloom)
    docs
      .select(col("ts").cast("timestamp").as("ts"), col("doc_id"), col("text"))
      .as[(java.sql.Timestamp, Long, String)]
      .flatMap { case (ts, id, t) =>
        val hits = DedupQueries.spanWindowHashes(t,
            DedupQueries.SpanWindow, DedupQueries.SpanStride)
          .iterator.filter { case (_, h) => bc.value.mightContainLong(h) }
          .map { case (_, h) => (ts, id, Option(h)) }
        // SENTINEL row (null hash) when a doc yields no bloom hits:
        // the watermark node sits downstream of this flatMap and only
        // advances on rows that REACH it — without the sentinel, a
        // stream of clean/short documents would never advance the
        // watermark and already-grouped tallies would never finalize.
        // Sentinels die in the inner verify join (null joins nothing).
        if (hits.hasNext) hits
        else Iterator((ts, id, Option.empty[Long]))
      }
      .toDF("ts", "doc_id", "whash")
      // Watermark AFTER the typed transform: event-time metadata
      // attaches to THIS plan's ts attribute (a typed map re-creates
      // attributes, so marking earlier would be lost).
      .withWatermark("ts", watermark)
      // LEFT join, not inner: an inner join's IsNotNull(whash)
      // constraint gets PUSHED BELOW the watermark node by Catalyst,
      // silently dropping the sentinel rows before event-time stats
      // are collected — the watermark then never advances on clean
      // micro-batches (observed: batch rows=1, eventTime={} — no
      // min/max). The left join carries sentinels and bloom false
      // positives through; only MATCHED spans tally (hit marker) and
      // zero-tally docs drop after the aggregation, so the output
      // contract stays d12's.
      .join(histHashes.select(col("whash")).distinct().withColumn("hit", lit(true)),
        Seq("whash"), "left")
      .groupBy(col("ts"), col("doc_id"))
      // cast to LONG: d12's countDistinct emits bigint, and "the
      // output contract stays d12's" must include the schema (a
      // union/backfill between batch and stream forms would
      // otherwise type-mismatch)
      .agg(size(collect_set(when(col("hit"), col("whash")))).cast("long")
        .as("n_shared_spans"))
      .filter(col("n_shared_spans") > 0)
      .select("doc_id", "n_shared_spans", "ts")
  }

  /** st07: STREAMING stratified sampling — t10's always-on form for
    * ingest-time data mixing. Membership is a PURE ROW FUNCTION
    * (md5 nibble vs the stratum threshold), so the operator is a
    * stateless codegen'd filter: no watermark, no state store, and
    * the SAME rows survive whether the corpus is replayed through
    * the stream or read as a batch — the property that makes
    * ingest-time sampling reproducible/auditable. Works unchanged
    * under read and readStream (spec proves batch/stream parity). */
  def stratifiedSampleStream(docs: DataFrame,
      thresholds: Map[String, String] =
        graft.operators.TextQueries.SampleThresholds): DataFrame = {
    val th = thresholds.toSeq.sortBy(_._1).foldLeft(lit("1")) {
      case (acc, (l, t)) => when(col("lang") === l, lit(t)).otherwise(acc)
    }
    docs
      .withColumn("bucket", substring(md5(col("doc_id").cast("string")), 1, 1))
      .filter(col("bucket") < th)
  }

  /** st09: STREAMING CURATION — p01's stateless subset (normalize →
    * quality band → stratified sample) on an ingest stream, by
    * CALLING the pipeline's own builder: batch and stream forms are
    * one function, so parity holds by construction, not by test
    * alone. Every stage is a pure row function — the native NFC
    * expression, the quality predicate and the md5-coin sample fuse
    * into one stateless codegen'd pass (no watermark, no state
    * store, no shuffle): an always-on ingest curates at scan speed and leaves
    * the stateful stages — dedup, decontamination — to st04/st06/
    * st08 downstream (composed via foreachBatch like st03). */
  def curationStream(docs: DataFrame): DataFrame =
    graft.operators.PipelineQueries.curateStateless(docs)

  /** st10: STREAMING bigram quality scoring — t15's signal at ingest
    * time, scored against a STATIC history LM rather than the batch
    * itself (an always-on pipeline cannot retrain per micro-batch;
    * it scores arrivals against the corpus LM and refreshes the
    * model per corpus version, the SketchIndex cadence). The model
    * comes from the SHARED TextQueries.bigramModel, so batch and
    * stream scoring use one estimation rule; the stream side is the
    * shared wordGramRows explode + a stream-static LEFT join
    * (stateless on the stream side — the d02/st06 precedent) and a
    * watermark-finalized per-doc reduction.
    *
    * Unlike the self-trained t15, a history LM has OOV bigrams:
    * unmatched grams are EXCLUDED from the mean (avg ignores nulls)
    * and surfaced as n_bigrams vs n_known — novelty is a signal of
    * its own (high OOV = out-of-domain or garbled), and the
    * downstream filter policy decides with both numbers visible.
    * Works unchanged under read and readStream (spec proves exact
    * batch/stream parity).
    *
    * Watermark caveat (shared with st06, same root cause as st08):
    * wordGramRows' size filter is pushed below the watermark node,
    * so a micro-batch consisting ENTIRELY of sub-2-token documents
    * does not advance the watermark; finalization waits for the
    * next batch carrying a gram-bearing document. */
  def bigramScoreStream(docs: DataFrame, model: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    import graft.operators.TextQueries.wordGramRows
    wordGramRows(
        docs.withColumn("ts", col("ts").cast("timestamp"))
          .withWatermark("ts", watermark),
        2, Seq(col("ts"), col("doc_id")))
      .join(model, Seq("gram"), "left")
      .groupBy(col("ts"), col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        count(col("lp")).as("n_known"),
        round(avg(col("lp")), 4).as("logprob"))
      .select("doc_id", "n_bigrams", "n_known", "logprob", "ts")
  }

  /** st11: STREAMING ANN INDEX INGEST — the persisted IVFADC index
    * (graft.store.VectorIndex) maintained by an always-on embedding
    * stream: each micro-batch is assigned + residual-encoded against
    * the FROZEN centroid/codebook models and appended into the
    * cell-partitioned code layout (VectorIndex.appendIvfPq). The
    * st03/SketchIndex division of labor, applied to ANN serving:
    * models refresh per corpus VERSION (a rebuild), arrivals append
    * between versions — per batch the work is one narrow typed map
    * over the batch, never a corpus re-stream, and queries see new
    * vectors as soon as their micro-batch commits.
    *
    * Pass `checkpoint` in production: foreachBatch under a
    * checkpoint gives effectively-once appends across restarts
    * (appendIvfPq itself is at-least-once under replay). Empty
    * batches never touch the artifact. */
  def ivfPqIngestStream(emb: DataFrame, dir: String,
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = emb.writeStream.outputMode(OutputMode.Append)
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val n = graft.store.VectorIndex.appendIvfPq(
            batch.sparkSession, dir, batch)
          System.err.println(s"[st11] batch $batchId appended $n vectors")
        }
      }
      .start()
  }

  /** st11b: the PLAIN-IVF twin of [[ivfPqIngestStream]] — streaming
    * ingest into the uncompressed IVF artifact via
    * VectorIndex.appendIvf (nearest FROZEN cell, appended into the
    * cell-partitioned layout). Same cadence (models refresh per
    * corpus version, arrivals append between) and the same
    * checkpointed-foreachBatch effectively-once contract; unlike the
    * coded rung there is no quantization drift to track — the stored
    * vectors are exact. Use this rung while the probed cells' float
    * vectors still fit the scan budget; step down to ivfPqIngestStream
    * when they don't. */
  def ivfIngestStream(emb: DataFrame, dir: String,
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = emb.writeStream.outputMode(OutputMode.Append)
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val n = graft.store.VectorIndex.appendIvf(
            batch.sparkSession, dir, batch)
          System.err.println(s"[st11b] batch $batchId appended $n vectors")
        }
      }
      .start()
  }

  /** st21: STREAMING RETRIEVAL SERVING (r17) — the reference's
    * interactive retrieval loop (retrieval.py:15-78 blocks on one
    * query at a time) as an always-on serving stream: queries
    * (vec_id, v) arrive on a stream, each micro-batch is answered by
    * ONE partition-pruned [[graft.store.VectorIndex.annIvfBatch]]
    * job against the PERSISTED index (build once per corpus version,
    * never a refit — the serving premise), and the per-query top-k
    * appends under `outDir` tagged by batch id (foreachBatch under a
    * checkpoint = effectively-once appends, the st08/st12
    * convention). The batch facade's exactness contract carries over
    * verbatim: with probes covering the model each micro-batch's
    * rows equal the one-shot annIvfBatch on the same queries
    * (StreamingSpec pins it); serving probe depths trade recall for
    * scan bytes. Retrieval is STATELESS per query — no watermark, no
    * state store; a replayed micro-batch re-appends under its batch
    * id and a duplicate query is just a re-ask. At 100 TB this is
    * the serving tier's shape: the index lives on shared storage,
    * the stream brings only (id, vector) rows, and each trigger's
    * cost is the pruned scan its probe set implies. */
  def retrievalServeStream(queries: DataFrame, indexDir: String,
      outDir: String, k: Int = 5,
      nProbe: Int = graft.operators.VectorQueries.IvfProbe,
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = queries.writeStream.outputMode(OutputMode.Append)
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.store.VectorIndex.annIvfBatch(batch.sparkSession, indexDir,
              batch.select("vec_id", "v"), k, nProbe, reprobeMax = 0)
            .withColumn("batch_id", lit(batchId))
            .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(outDir)
        }
      }
      .start()
  }

  /** st12: STREAMING MEDIA NEAR-DUP — m05's perceptual-hash check on
    * an always-on media ingest: each micro-batch phash-encodes ONLY
    * ITSELF (a narrow typed map) and pays a band-keyed equi-join +
    * exact Hamming verify against the PERSISTED phash index
    * (SketchIndex.buildPhashIndex — built once per corpus version,
    * the d13/st08 division of labor), never re-hashing history.
    * Per-batch results append under `outDir` tagged by batch id;
    * foreachBatch under a checkpoint gives effectively-once appends.
    * The multimodal twin of st08's span dedup. */
  def phashCheckStream(docs: DataFrame, indexDir: String, outDir: String,
      checkpoint: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = docs.writeStream.outputMode(OutputMode.Append)
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.store.SketchIndex.checkBatchPhash(batch.sparkSession, indexDir, batch)
            .withColumn("batch_id", lit(batchId))
            .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(outDir)
        }
      }
      .start()
  }

  final case class FEv(user_id: Long, ts: Timestamp, event_type: String)
  /** stage: -1 = nothing yet, 0 = view, 1 = click, 2 = purchase;
    * stageTs = event-time ms of the stage-reaching event. */
  final case class FunnelState(stage: Int, stageTs: Long)
  final case class FunnelOut(user_id: Long, stage: String, ts: Timestamp)

  private val FunnelStages = Vector("1_view", "2_click", "3_purchase")
  private val FunnelTypes = Vector("view", "click", "purchase")
  /** Funnel state horizon: a user idle this long (event time) can no
    * longer progress; their state evicts. */
  val FunnelHorizonMs: Long = 7L * 24 * 3600 * 1000

  /** st13: STREAMING CONVERSION FUNNEL — q16's strictly-after
    * view → click → purchase as per-user state on an always-on
    * stream: a row is EMITTED THE MOMENT a user reaches a new stage
    * (batch q16 only ever sees completed history), so the live stage
    * counts are one downstream `groupBy(stage)` away.
    *
    * State is two numbers per in-horizon user (stage index + its
    * event-time), evicted via EVENT-time timeout once the watermark
    * passes stageTs + [[FunnelHorizonMs]]. COMPLETED funnels keep
    * their state until that horizon too — evicting on completion
    * would let a later view open a second funnel and re-emit stages
    * the batch kernel counts once per user (the parity spec caught
    * exactly that); after the horizon a returning user legitimately
    * starts a fresh funnel. Micro-batches sort by (ts, stage-order)
    * so same-batch disorder is repaired and an equal-timestamp next
    * stage correctly fails the STRICTLY-after check.
    *
    * Ordering contract (the st02 convention, stricter): exact parity
    * with the batch kernel (CoreQueries.funnelStageRows — the SAME
    * rows q16 aggregates, asserted by StreamingSpec) holds when each
    * user's CROSS-batch arrival respects event-time order; the
    * watermark bounds and drops older disorder. A replayed/backfill
    * source belongs on the batch mirror — funnel progress is
    * forward-only state, and an old view arriving after a dropped
    * click cannot resurrect it. */
  def funnelStream(spark: SparkSession, events: Dataset[FEv],
      watermarkDelay: String = "30 minutes"): Dataset[FunnelOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[FEv], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = evs.toSeq
              .sortBy(e => (e.ts.getTime, FunnelTypes.indexOf(e.event_type)))
            var st = state.getOption.getOrElse(FunnelState(-1, Long.MinValue))
            val out = scala.collection.mutable.ListBuffer.empty[FunnelOut]
            sorted.foreach { e =>
              val idx = FunnelTypes.indexOf(e.event_type)
              if (idx == st.stage + 1 &&
                  (st.stage == -1 || e.ts.getTime > st.stageTs)) {
                st = FunnelState(idx, e.ts.getTime)
                out += FunnelOut(user, FunnelStages(idx), e.ts)
              }
            }
            // COMPLETED state stays (until the horizon evicts it):
            // removing it would let a later view open a SECOND funnel
            // and re-emit stages the batch kernel counts once per
            // user — the parity spec caught exactly that.
            if (st.stage >= 0 || state.exists) {
              state.update(st)
              state.setTimeoutTimestamp(math.max(
                st.stageTs + FunnelHorizonMs, state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
  }

  // ------------------------------------------------------------ st18

  /** st18: STREAMING INGEST-QUALITY REPORT — t21's Gopher signals on
    * an always-on stream, rolled up per event-time hour: doc count,
    * pass rate, mean word count/length — the live health panel that
    * shows a feed going bad (pass rate collapsing, docs shortening)
    * WHILE it happens rather than at the next batch audit. The
    * per-row signals are the SHARED QualityQueries.withGopherCols
    * projection (one formula with t21/p02 — parity by construction);
    * the rollup is one watermark-bounded windowed agg, state = one
    * row per open hour. */
  def qualityReportStream(docs: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    graft.operators.QualityQueries.withGopherCols(
        docs.withColumn("ts", col("ts").cast("timestamp"))
          .withWatermark("ts", watermark))
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(when(col("pass"), 1.0).otherwise(0.0)), 4).as("pass_rate"),
        round(avg(col("n_words")), 4).as("mean_words"),
        round(avg(col("mean_wlen")), 4).as("mean_wlen"))
      .select(col("window.start").as("hour"), col("n_docs"),
        col("pass_rate"), col("mean_words"), col("mean_wlen"))

  // ------------------------------------------------------------ st17

  /** st17: STREAMING INGEST NOVELTY — t23's freshness gate as an
    * always-on stream: each arriving document scores the share of
    * its word-3-grams the history corpus has never seen (novelty
    * collapsing live ⇒ the feed started repackaging the corpus).
    *
    * The stream side is the SHARED gram kernel
    * (QualityQueries.gramRowsKeyed — parity with t23 by
    * construction) with a STATELESS stream-static left join against
    * the history's distinct-gram table (at 100 TB a persisted
    * artifact built once per corpus version, the SketchIndex
    * precedent — the static side replans per micro-batch); per-doc
    * tallies finalize by watermark via the st06 (ts, doc_id) +
    * collect_set recipe (the in-group dedup that replaces the
    * stateful distinct a streaming plan cannot afford), so state is
    * bounded by docs inside the watermark horizon. */
  def noveltyStream(docs: DataFrame, histDocs: DataFrame,
      watermark: String = "1 hour"): DataFrame = {
    import graft.operators.QualityQueries.{gramRows, gramRowsKeyed}
    val hist = gramRows(histDocs).select("gram").distinct()
      .withColumn("seen", lit(1))
    gramRowsKeyed(
      docs.withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", watermark),
      Seq(col("ts"), col("doc_id")))
      .join(hist, Seq("gram"), "left")
      .groupBy(col("ts"), col("doc_id"))
      .agg(size(collect_set(col("gram"))).cast("long").as("n_grams"),
        size(collect_set(when(col("seen").isNull, col("gram"))))
          .cast("long").as("n_new"))
      .withColumn("novelty",
        round(col("n_new").cast("double") / col("n_grams"), 4))
      .select("doc_id", "n_grams", "n_new", "novelty", "ts")
  }

  // ------------------------------------------------------------ st16

  final case class TEv(user_id: Long, event_id: Long, ts: Timestamp,
    event_type: String)
  final case class TransState(lastTs: Long, lastId: Long, lastType: String)
  final case class TransOut(user_id: Long, from_type: String,
    to_type: String, to_ts: Timestamp)

  /** How long a user's last-event state outlives its event time
    * before eviction (the FunnelHorizonMs convention: 7 days). A
    * destination event arriving after the horizon starts a fresh
    * path — by design, and the ONLY divergence from the batch
    * kernel, which sees completed history and has no horizon; parity
    * holds for per-user gaps under the horizon. */
  val TransHorizonMs: Long = 7L * 24 * 3600 * 1000

  /** st16: STREAMING PATH TRANSITIONS — q20's adjacent-pair kernel
    * as per-user state on an always-on stream: each arriving event
    * emits the (from → to) edge from the user's previous event, so
    * the live Markov matrix is one downstream `groupBy(from, to)`
    * away. State is THREE scalars per in-horizon user (last event's
    * ts, id, type), evicted via event-time timeout once the
    * watermark passes lastTs + [[TransHorizonMs]].
    *
    * Micro-batches sort by (ts, event_id) — the batch kernel's
    * EXACT tie-break (AnalyticsQueries.transitionRows), so parity
    * with q20 is by construction when cross-batch arrival respects
    * per-user event-time order (the st13 ordering contract; replay/
    * backfill belongs on the batch mirror). */
  def transitionStream(spark: SparkSession, events: Dataset[TEv],
      watermarkDelay: String = "30 minutes",
      horizonMs: Long = TransHorizonMs): Dataset[TransOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, TransOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[TEv], state: GroupState[TransState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.orNull
            val out = scala.collection.mutable.ListBuffer.empty[TransOut]
            sorted.foreach { e =>
              if (st != null)
                out += TransOut(user, st.lastType, e.event_type, e.ts)
              st = TransState(e.ts.getTime, e.event_id, e.event_type)
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(math.max(
                st.lastTs + horizonMs, state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
  }

  // ------------------------------------------------------------ st19

  /** st19: STREAMING BPE token counting — t25's per-doc (n_words,
    * n_bpe) at ingest time under the frozen merge table: the token
    * budget every training-data feed meters arrivals against (pair
    * it with st09's curation and st17's novelty for the full ingest
    * report). The whole merge-replace chain is ONE stateless
    * codegen'd HOF projection via the SHARED Bpe.encode kernel —
    * batch and stream are one function (the st09
    * parity-by-construction pattern): no watermark, no state store,
    * no shuffle; works unchanged under read and readStream. */
  def bpeStream(docs: DataFrame): DataFrame =
    graft.operators.Bpe.encode(docs, graft.operators.Bpe.T25Merges)

  /** Flush helper for specs/batch use: ALL sessions (incl. the
    * still-open last one per user), with the same start-time-derived
    * session ids the streaming form emits. */
  def openSessions(spark: SparkSession, events: Dataset[Ev]): DataFrame = {
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (user, evs) =>
      val sorted = evs.toSeq.sortBy(_.ts.getTime)
      var lastTs = Long.MinValue
      var n = 0L; var startTs = 0L
      val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
      sorted.foreach { e =>
        val t = e.ts.getTime
        if (n == 0L || t - lastTs > GapMs) {
          if (n > 0L) out += SessionOut(user, startTs, n, new Timestamp(startTs))
          n = 1L; startTs = t
        } else n += 1
        lastTs = t
      }
      if (n > 0L) out += SessionOut(user, startTs, n, new Timestamp(startTs))
      out.iterator
    }.toDF()
  }
}
