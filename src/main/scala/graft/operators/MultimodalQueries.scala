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

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "m01_media_meta" -> (m01MediaMeta _),
    "m02_frame_sample" -> (m02FrameSample _),
    "m03_resize" -> (m03Resize _),
    "m04_features" -> (m04Features _))

  val oracles: Map[String, String] = Map(
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
