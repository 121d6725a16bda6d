package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing (SURVEY.md §2 m01–m02): media as opaque
  * `binary` columns with typed metadata.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub (graft.functions.MediaDecoder);
  * everything Spark-side is real: binary column handling, partition-
  * wise batch processing via mapPartitions (the JVM analog of a
  * Pandas-UDF/mapInPandas batch), schema, and the frame-sampling
  * arithmetic. At 100 TB both ops are narrow map transforms.
  */
object MultimodalQueries {

  /** m01: synthesize a binary media column, run the stub decoder
    * partition-wise, emit typed metadata. */
  def m01MediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.MediaDecoder
    Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("text").cast("binary").as("media_bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => // batch-style: one decoder per partition
        val decoder = MediaDecoder.stub
        it.map { case (id, bytes) =>
          val m = decoder.decode(bytes)
          (id, m.nBytes, m.width, m.height, m.channels)
        }
      }
      .toDF("doc_id", "n_bytes", "width", "height", "channels")
      .orderBy("doc_id")
  }

  val FrameStride = 256
  val FrameSize = 64

  /** m02: deterministic frame sampling — a FrameSize-byte "frame"
    * every FrameStride bytes of the binary blob, fingerprinted. */
  def m02FrameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("media_bytes"),
        length(col("text")).as("len"))
      .filter(col("len") >= FrameSize)
      .withColumn("frame_idx",
        explode(sequence(lit(0), ((col("len") - FrameSize) / FrameStride).cast("int"))))
      .withColumn("offset", col("frame_idx") * FrameStride)
      .withColumn("frame",
        decode(expr(s"substring(media_bytes, offset + 1, $FrameSize)"), "UTF-8"))
      .selectExpr("doc_id", "frame_idx", "offset",
        "aggregate(transform(split(frame, ''), c -> ascii(c)), 0L, (acc, c) -> (acc * 131 + c) % 1000000007) AS frame_fp")
      .orderBy("doc_id", "frame_idx")

  /** m03: "resize" — the downsampling transform of an image pipeline
    * with the codec stubbed: stride-2 byte sampling stands in for
    * pixel decimation (deterministic, so the oracle can restate it),
    * while everything Spark-side is the real shape — binary in,
    * binary-derived digest + halved dimensions out, partition-wise
    * batches, narrow map. */
  def m03Resize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.MediaDecoder
    Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val decoder = MediaDecoder.stub
        it.map { case (id, text) =>
          val m = decoder.decode(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // Stride-2 sample + rolling digest of the "resized" payload.
          // Digest runs over CODE POINTS — codePointAt, not charAt:
          // DuckDB's length()/substr()/unicode() count code points, so
          // UTF-16 surrogate pairs (astral chars) must advance as ONE
          // position with their real code point folded in, or the two
          // engines disagree on stride alignment and values.
          var h = 0L; var n = 0L; var i = 0; var cpIdx = 0L
          while (i < text.length) {
            val cp = text.codePointAt(i)
            if (cpIdx % 2 == 0) { h = (h * 131 + cp) % 1000000007L; n += 1 }
            cpIdx += 1; i += Character.charCount(cp)
          }
          (id, m.width, m.height, m.width / 2, m.height / 2, n, h)
        }
      }
      .toDF("doc_id", "in_w", "in_h", "out_w", "out_h", "out_bytes", "out_fp")
      .orderBy("doc_id")
  }

  val FeatBins = 16

  /** m04: feature extraction — a fixed-width feature vector from the
    * decoded payload (here a 16-bin code-point histogram standing in
    * for e.g. a color histogram, the codec being stubbed), emitted as
    * a csv string for the representation-stable cross-engine compare.
    * Completes the multimodal verb set (decode / frame-sample /
    * resize / feature-extract); partition-wise narrow map, the
    * feature array is bounded (16 ints) regardless of payload size. */
  def m04Features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val bins = new Array[Long](FeatBins)
        var n = 0L
        var i = 0
        while (i < text.length) {
          val cp = text.codePointAt(i)
          bins(cp % FeatBins) += 1; n += 1
          i += Character.charCount(cp)
        }
        (id, n, bins.mkString(","))
      })
      .toDF("doc_id", "n_cps", "feat")
      .orderBy("doc_id")
  }

  val PhashSegments = 64
  val PhashBandBits = 16 // 4 bands of 16 bits
  val PhashMaxHamming = 3 // pigeonhole: <= 3 flips always share a band

  /** m05: PERCEPTUAL HASH — the average-hash (aHash) of the image-
    * dedup literature computed over the stub-decoded payload: the
    * code-point stream splits into 64 equal segments, each bit says
    * whether its segment's mean intensity exceeds the global mean,
    * and the 64 bits ship as 4×16-bit bands — the blocking keys of
    * the near-dup pair join (pigeonhole: two hashes within Hamming
    * distance 3 agree on at least one of 4 bands, so the band
    * equi-join is LOSSLESS for the dedup threshold). The multimodal
    * twin of d03's SimHash: robust to small local edits because
    * segment MEANS, not positions, carry the signature.
    *
    * Engine-exactness: the mean comparison is the integer
    * cross-multiply ssum·n > tot·scnt — no doubles anywhere, so the
    * DuckDB oracle hash-matches bit-for-bit. Segments index as
    * (cpIdx·64)/n in integer division over CODE POINTS (the
    * m03/m04 convention — DuckDB's string functions are code-point
    * functions). Narrow map, one row per doc; the pair join
    * (phashPairs, MultimodalSpec) blocks on band values and never
    * goes all-pairs. */
  def m05Phash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val b = phashBands(text)
        (id, b(0), b(1), b(2), b(3))
      })
      .toDF("doc_id", "b0", "b1", "b2", "b3")
      .orderBy("doc_id")
  }

  /** The aHash kernel: 4×16-bit bands of segment-mean bits. */
  private[graft] def phashBands(text: String): Array[Long] = {
    val bands = new Array[Long](PhashSegments / PhashBandBits)
    val n = text.codePointCount(0, text.length).toLong
    if (n == 0) return bands
    val segSum = new Array[Long](PhashSegments)
    val segCnt = new Array[Long](PhashSegments)
    var i = 0; var cpIdx = 0L; var tot = 0L
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val s = ((cpIdx * PhashSegments) / n).toInt
      segSum(s) += cp; segCnt(s) += 1; tot += cp
      cpIdx += 1; i += Character.charCount(cp)
    }
    var s = 0
    while (s < PhashSegments) {
      // segment mean > global mean, as an exact integer cross-multiply
      if (segSum(s) * n > tot * segCnt(s))
        bands(s / PhashBandBits) |= 1L << (s % PhashBandBits)
      s += 1
    }
    bands
  }

  /** Band-blocked perceptual near-dup pairs over any (doc_id, text)
    * relation: candidates share at least one band (an equi-join on
    * (band_idx, value) — lossless for hamming <= PhashMaxHamming by
    * pigeonhole, never all-pairs), then verify with the exact
    * 64-bit Hamming distance (codegen'd bit_count over the band
    * xors). MultimodalSpec proves the blocking equals brute force at
    * the threshold. */
  def phashPairs(spark: SparkSession, docs: DataFrame, maxHamming: Int = PhashMaxHamming): DataFrame = {
    import spark.implicits._
    val sigs = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, phashBands(t)) })
      .toDF("doc_id", "bands")
    val byBand = sigs.select(col("doc_id"), col("bands"),
      posexplode(col("bands")).as(Seq("band_idx", "bval")))
    byBand.as("l")
      .join(byBand.as("r"),
        col("l.band_idx") === col("r.band_idx") &&
          col("l.bval") === col("r.bval") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        col("l.bands").as("ba"), col("r.bands").as("bb"))
      .distinct() // a close pair may collide in several bands
      .select(col("doc_a"), col("doc_b"),
        expr("aggregate(zip_with(ba, bb, (x, y) -> bit_count(x ^ y)), 0, (acc, h) -> acc + h)")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** m06 cut dial: L1 histogram distance (∈ [0, 2·FrameSize]) at or
    * above which a frame boundary counts as a scene cut. */
  val CutL1 = 32 // ~p70 of boundary distances on the synthetic corpus

  /** m06: SCENE-CUT DETECTION — the shot-boundary primitive of a
    * video curation pipeline (sample frames → per-frame feature →
    * distance between CONSECUTIVE frames → cut where it spikes),
    * with the codec stubbed exactly as m02-m04: frames are m02's
    * byte-window rule, the per-frame feature is m04's 16-bin
    * code-point histogram computed on the frame, and the distance is
    * integer L1 — so the whole operator is codegen'd HOFs + one
    * lag() window keyed by high-cardinality doc_id, and every value
    * is integer until nothing (exact cross-engine compare). Emits
    * one row per frame BOUNDARY (frame_idx ≥ 1). Spark's split('') +
    * ascii operate on CODE POINTS (UTF8String, astral chars
    * included) and so match the oracle's string_split + unicode();
    * UnicodeCorpusSpec pins that parity on an astral corpus. */
  def m06SceneCuts(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .filter(col("len") >= FrameSize)
      .withColumn("frame_idx",
        explode(sequence(lit(0), ((col("len") - FrameSize) / FrameStride).cast("int"))))
      .withColumn("frame",
        expr(s"substring(text, frame_idx * $FrameStride + 1, $FrameSize)"))
      // codes hoisted out of the per-bin lambda (r17): the original
      // expression recomputed split(frame,'') + ascii per BIN — 16
      // char-array materializations per frame; one withColumn makes
      // it a single pass, the bin counting then scans ints only.
      // Same values bin-for-bin (the oracle is untouched).
      .withColumn("codes", expr(
        s"transform(split(frame, ''), c -> ascii(c) % $FeatBins)"))
      .withColumn("hist", expr(
        s"""transform(sequence(0, ${FeatBins - 1}),
           |  b -> size(filter(codes, x -> x = b)))""".stripMargin))
      .drop("codes") // explicit prune: codes must not ride the window exchange
      .withColumn("prev_hist", lag("hist", 1).over(w))
      .filter(col("prev_hist").isNotNull)
      .withColumn("dist", expr(
        "aggregate(zip_with(hist, prev_hist, (a, b) -> abs(a - b)), 0, (acc, x) -> acc + x)"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * FrameStride).as("offset"),
        col("dist").cast("long").as("l1_dist"),
        (col("dist") >= CutL1).as("is_cut"))
      .orderBy("doc_id", "frame_idx")
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "m06_scene_cuts" -> (m06SceneCuts _),
    "m01_media_meta" -> (m01MediaMeta _),
    "m05_phash" -> (m05Phash _),
    "m02_frame_sample" -> (m02FrameSample _),
    "m03_resize" -> (m03Resize _),
    "m04_features" -> (m04Features _))

  val oracles: Map[String, String] = Map(
    // m05: the segment-mean bits via the SAME integer cross-multiply
    // (ssum*tcnt > tsum*scnt) — float-free, so the compare is exact;
    // docs shorter than 64 cps leave their missing segments at bit 0
    // on both sides (absent group rows contribute nothing to the
    // band sum); empty docs left-join back as all-zero bands.
    "m05_phash" ->
      s"""WITH cps AS (
         |  SELECT doc_id,
         |    list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT)) AS l
         |  FROM documents),
         |pos AS (
         |  SELECT doc_id, CAST(len(l) AS BIGINT) AS n, CAST(i AS BIGINT) AS i,
         |    l[CAST(i AS INT) + 1] AS cp
         |  FROM cps CROSS JOIN unnest(range(0, len(l))) AS t(i)),
         |segs AS (
         |  SELECT doc_id, (i * $PhashSegments) // n AS s,
         |    sum(cp) AS ssum, count(*) AS scnt
         |  FROM pos GROUP BY 1, 2),
         |tot AS (SELECT doc_id, sum(cp) AS tsum, count(*) AS tcnt FROM pos GROUP BY 1),
         |bits AS (
         |  SELECT segs.doc_id, segs.s,
         |    CASE WHEN segs.ssum * tot.tcnt > tot.tsum * segs.scnt
         |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
         |  FROM segs JOIN tot USING (doc_id)),
         |bands AS (
         |  SELECT doc_id, s // $PhashBandBits AS band,
         |    sum(bit << CAST(s % $PhashBandBits AS INT)) AS bval
         |  FROM bits GROUP BY 1, 2)
         |SELECT d.doc_id,
         |  CAST(coalesce(max(CASE WHEN band = 0 THEN bval END), 0) AS BIGINT) AS b0,
         |  CAST(coalesce(max(CASE WHEN band = 1 THEN bval END), 0) AS BIGINT) AS b1,
         |  CAST(coalesce(max(CASE WHEN band = 2 THEN bval END), 0) AS BIGINT) AS b2,
         |  CAST(coalesce(max(CASE WHEN band = 3 THEN bval END), 0) AS BIGINT) AS b3
         |FROM documents d LEFT JOIN bands USING (doc_id)
         |GROUP BY d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // The stub decoder's metadata formulas, restated over the utf-8
    // source text (bytes == ascii chars for this corpus).
    // First-char hash = CODE POINT on both engines (Stubs.scala
    // MediaDecoder.stub decodes it from the utf-8 bytes); empty text
    // CASE-guards to 0 because DuckDB unicode('') is -1.
    "m01_media_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(octet_length(encode(text)) % 640 AS INT) AS width,
        |  CAST((CASE WHEN text = '' THEN 0 ELSE unicode(substr(text, 1, 1)) END * 7) % 480 AS INT) AS height,
        |  CAST(3 AS INT) AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,
    // m06: the same frame rule + histogram + integer L1, mirrored
    "m06_scene_cuts" ->
      s"""WITH frames AS (
         |  SELECT doc_id, CAST(i AS INT) AS frame_idx,
         |    list_transform(range(0, $FeatBins), b -> CAST(len(list_filter(
         |      list_transform(string_split(substr(text, CAST(i AS INT) * $FrameStride + 1, $FrameSize), ''),
         |        c -> unicode(c) % $FeatBins),
         |      x -> x = b)) AS INT)) AS hist
         |  FROM documents
         |  CROSS JOIN unnest(range(0, (length(text) - $FrameSize) // $FrameStride + 1)) AS t(i)
         |  WHERE length(text) >= $FrameSize),
         |lagged AS (
         |  SELECT doc_id, frame_idx, hist,
         |    lag(hist) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS prev_hist
         |  FROM frames)
         |SELECT doc_id, frame_idx, frame_idx * $FrameStride AS offset,
         |  CAST(list_sum(list_transform(range(1, $FeatBins + 1),
         |    j -> abs(hist[j] - prev_hist[j]))) AS BIGINT) AS l1_dist,
         |  list_sum(list_transform(range(1, $FeatBins + 1),
         |    j -> abs(hist[j] - prev_hist[j]))) >= $CutL1 AS is_cut
         |FROM lagged WHERE prev_hist IS NOT NULL
         |ORDER BY doc_id, frame_idx""".stripMargin,
    "m02_frame_sample" ->
      s"""SELECT doc_id, CAST(i AS INT) AS frame_idx,
         |  CAST(i AS INT) * $FrameStride AS offset,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(string_split(substr(text, CAST(i AS INT) * $FrameStride + 1, $FrameSize), ''),
         |      c -> CAST(unicode(c) AS BIGINT))),
         |    (acc, c) -> (acc * 131 + c) % 1000000007) AS frame_fp
         |FROM documents
         |CROSS JOIN unnest(range(0, (length(text) - $FrameSize) // $FrameStride + 1)) AS t(i)
         |WHERE length(text) >= $FrameSize
         |ORDER BY doc_id, frame_idx""".stripMargin,
    "m03_resize" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) % 640 AS INT) AS in_w,
        |  CAST((CASE WHEN text = '' THEN 0 ELSE unicode(substr(text, 1, 1)) END * 7) % 480 AS INT) AS in_h,
        |  CAST((octet_length(encode(text)) % 640) // 2 AS INT) AS out_w,
        |  CAST(((CASE WHEN text = '' THEN 0 ELSE unicode(substr(text, 1, 1)) END * 7) % 480) // 2 AS INT) AS out_h,
        |  CAST((length(text) + 1) // 2 AS BIGINT) AS out_bytes,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(0, CAST(length(text) AS BIGINT), 2),
        |      i -> CAST(unicode(substr(text, CAST(i AS INT) + 1, 1)) AS BIGINT))),
        |    (acc, c) -> (acc * 131 + c) % 1000000007) AS out_fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Histogram bins over CODE POINTS on both engines (DuckDB length/
    // unicode are code-point functions; the Scala side iterates
    // codePointAt) — csv string for a representation-stable compare.
    "m04_features" ->
      s"""SELECT doc_id, CAST(length(text) AS BIGINT) AS n_cps,
         |  array_to_string(
         |    list_transform(range(0, $FeatBins),
         |      b -> len(list_filter(
         |        list_transform(string_split(text, ''), c -> unicode(c) % $FeatBins),
         |        x -> x = b))), ',') AS feat
         |FROM documents ORDER BY doc_id""".stripMargin)
}
