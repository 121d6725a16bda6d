package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text splitters with character positions — Spark re-expression of
  * the reference's splitters.py (Chunk = text + (start, end)).
  *
  * naive/paragraph are pure column expressions (narrow, codegen'd,
  * no shuffle — except paragraph's per-doc cumulative position which
  * windows by doc_id, a high-cardinality key). recursive carries the
  * reference's genuinely recursive separator-priority semantics
  * (splitters.py:64 RecursiveTextSplitter) and runs as a typed
  * flatMap — still a narrow per-row transform, just not expressible
  * as a Column tree.
  */
object Splitters {

  /** Fixed-size chunks (splitters.py:46 NaiveTextSplitter). The
    * sequence stop is clamped at 0: for an EMPTY doc,
    * ceil(0/cs)-1 = -1 and Spark's sequence(0, -1) DESCENDS, which
    * would fabricate a phantom chunk_idx = -1 with a negative start —
    * clamped, an empty doc yields one empty chunk (idx 0, start 0,
    * end 0), matching the recursive splitter. */
  def naive(docs: DataFrame, chunkSize: Int): DataFrame =
    docs.select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .withColumn("chunk_idx",
        explode(sequence(lit(0),
          greatest(ceil(col("len") / chunkSize.toDouble) - 1, lit(0)).cast("int"))))
      .select(col("doc_id"), col("chunk_idx"),
        expr(s"substring(text, chunk_idx * $chunkSize + 1, $chunkSize)").as("chunk"),
        (col("chunk_idx") * chunkSize).as("start"),
        least(col("chunk_idx") * chunkSize + chunkSize, col("len")).as("end"))

  /** Delimiter split with positions (splitters.py:80
    * ParagraphTextSplitter generalized to any literal delimiter).
    * Positions derive from cumulative chunk lengths via a window
    * partitioned by doc_id. */
  def paragraph(docs: DataFrame, delim: String): DataFrame = {
    val dl = delim.length
    val w = Window.partitionBy("doc_id").orderBy("chunk_idx")
    docs.select(col("doc_id"),
        posexplode(split(col("text"), java.util.regex.Pattern.quote(delim), -1))
          .as(Seq("chunk_idx", "chunk")))
      .withColumn("start",
        coalesce(sum(length(col("chunk")) + dl).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0)).cast("long"))
      .select(col("doc_id"), col("chunk_idx"), col("chunk"), col("start"),
        (col("start") + length(col("chunk"))).as("end"))
  }

  /** Separator-priority recursive chunking (splitters.py:64): try the
    * highest-priority separator; greedily pack pieces into chunks of
    * at most chunkSize; recurse into any piece still too large with
    * the next separator; character-split as the last resort. Pure
    * function — used per-row from recursiveDf.
    *
    * Positions/sizes count Java UTF-16 units (the reference's Python
    * counts code points; the two agree on all BMP text, and astral
    * chunks are kept valid — never split mid-surrogate-pair — by the
    * hard-split boundary nudge). `naive` above counts code points
    * because Spark SQL substring/length do. */
  def recursiveSplit(text: String, chunkSize: Int,
      separators: List[String] = List("\n\n", "\n", ". ", "? ", "! ", "; ", ", ", " ")): List[(String, Int, Int)] = {
    // chunkSize reaches here from user config (AnnotatorConfig); the
    // hard-split loop below would spin forever on a non-positive
    // value (the pre-fix Range-based code threw on step 0) — fail
    // fast instead of hanging an executor task.
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")

    // Work on (start, end) spans of the ORIGINAL text so positions stay
    // exact; chunk text is always text.substring(start, end).
    def splitRec(start: Int, end: Int, seps: List[String]): List[(Int, Int)] =
      if (end - start <= chunkSize) List((start, end))
      else seps match {
        case Nil =>
          // Last resort: hard character split. A boundary that lands
          // on a LOW surrogate would tear a supplementary character
          // (emoji, rare CJK) into two lone surrogates — invalid
          // strings that UTF-8 sinks (parquet) corrupt to U+FFFD, so
          // concat(chunks) would no longer reconstruct the document
          // after a round trip. Nudge such a boundary forward one
          // code unit (that chunk carries chunkSize+1 units — the
          // size contract here is approximate by nature).
          val out = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
          var s = start
          while (s < end) {
            var e = math.min(s + chunkSize, end)
            if (e < end && Character.isLowSurrogate(text.charAt(e))) e += 1
            out += ((s, e))
            s = e
          }
          out.toList
        case sep :: rest =>
          val pieces = pieceSpans(start, end, sep)
          if (pieces.length == 1) splitRec(start, end, rest)
          else mergeGreedy(pieces).flatMap { case (s, e) =>
            if (e - s <= chunkSize) List((s, e)) else splitRec(s, e, rest)
          }
      }

    // Spans between occurrences of sep inside [start, end).
    def pieceSpans(start: Int, end: Int, sep: String): List[(Int, Int)] = {
      val out = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
      var i = start
      var idx = text.indexOf(sep, i)
      while (idx >= 0 && idx < end) {
        out += ((i, idx)); i = idx + sep.length
        idx = text.indexOf(sep, i)
      }
      out += ((i, end))
      out.toList
    }

    // Greedily extend the current span over following pieces (separator
    // text included) while it stays within chunkSize.
    def mergeGreedy(pieces: List[(Int, Int)]): List[(Int, Int)] =
      pieces.tail.foldLeft(List(pieces.head)) { case (acc, (s, e)) =>
        val (cs, _) = acc.head
        if (e - cs <= chunkSize) (cs, e) :: acc.tail else (s, e) :: acc
      }.reverse

    splitRec(0, text.length, separators)
      .collect { case (s, e) if e > s => (text.substring(s, e), s, e) }
  }

  /** Semantic splitting (splitters.py:99 SemanticTextSplitter): break
    * where the embedding similarity of adjacent pieces drops below a
    * threshold. The reference uses SentenceTransformers via
    * SemanticChunker; here the embedder is injected (deterministic
    * stub by default) and "sentences" are fixed word windows since
    * the corpus has no punctuation. Pure function per doc. */
  def semanticSplit(
      text: String,
      embedder: graft.functions.Embedder,
      windowWords: Int = 10,
      threshold: Double = 0.3): List[(String, Int, Int)] = {
    // word spans (start, end) over the original text
    val words = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
    var i = 0
    while (i < text.length) {
      val e = text.indexOf(' ', i) match { case -1 => text.length; case j => j }
      if (e > i) words += ((i, e))
      i = e + 1
    }
    if (words.isEmpty) return Nil
    val pieces = words.grouped(windowWords).map(g => (g.head._1, g.last._2)).toList
    if (pieces.length == 1) return pieces.map { case (s, e) => (text.substring(s, e), s, e) }

    def cos(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var na = 0.0; var nb = 0.0; var d = 0
      while (d < a.length) { s += a(d) * b(d); na += a(d) * a(d); nb += b(d) * b(d); d += 1 }
      s / (math.sqrt(na) * math.sqrt(nb) max 1e-12)
    }
    val embs = pieces.map { case (s, e) => embedder.embed(text.substring(s, e)) }
    // merge adjacent pieces while similarity stays above threshold
    val out = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
    var (cs, ce) = pieces.head
    for (k <- 1 until pieces.length) {
      if (cos(embs(k - 1), embs(k)) >= threshold) ce = pieces(k)._2
      else { out += ((cs, ce)); cs = pieces(k)._1; ce = pieces(k)._2 }
    }
    out += ((cs, ce))
    out.toList.map { case (s, e) => (text.substring(s, e), s, e) }
  }

  /** DataFrame wrapper for the semantic splitter. */
  def semanticDf(spark: SparkSession, docs: DataFrame,
      embedder: graft.functions.Embedder): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        semanticSplit(text, embedder).zipWithIndex.map {
          case ((chunk, s, e), i) => (id, i, chunk, s.toLong, e.toLong)
        }
      }
      .toDF("doc_id", "chunk_idx", "chunk", "start", "end")
  }

  /** DataFrame wrapper for the recursive splitter. */
  def recursiveDf(spark: SparkSession, docs: DataFrame, chunkSize: Int): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        recursiveSplit(text, chunkSize).zipWithIndex.map {
          case ((chunk, s, e), i) => (id, i, chunk, s.toLong, e.toLong)
        }
      }
      .toDF("doc_id", "chunk_idx", "chunk", "start", "end")
  }
}
