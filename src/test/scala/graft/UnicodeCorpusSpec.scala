package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupQueries, Splitters, TextQueries}

/** Unicode/multibyte hardening — the third adversarial corpus next to
  * DegenerateInputSpec (empty/tiny) and SkewCorpusSpec (boilerplate):
  * CJK text and astral-plane emoji (surrogate PAIRS in Java strings,
  * 3–4 byte sequences in UTF-8). Two failure classes are pinned:
  *
  *  1. Validity — no kernel may emit a LONE surrogate (a torn emoji).
  *     Such strings silently corrupt to U+FFFD on any UTF-8 sink
  *     (parquet), so concat-of-chunks stops reconstructing the doc.
  *  2. Unit semantics — span/window/fingerprint positions must count
  *     CODE POINTS (what the DuckDB oracle's substr/unicode() counts
  *     and what the Python reference counts), not UTF-16 units.
  */
class UnicodeCorpusSpec extends SparkSpec {

  /** True iff s survives a UTF-8 round trip byte-identically — i.e.
    * contains no lone surrogate. */
  private def utf8Clean(s: String): Boolean =
    new String(s.getBytes("UTF-8"), "UTF-8") == s

  private val EmojiTen = "😀😁😂🤣" +
    "😃😄😅😆😉😊" // 10 astral cps

  test("recursive hard split never tears a surrogate pair; chunks reconstruct the doc") {
    val text = EmojiTen * 5 // 50 code points / 100 UTF-16 units, no separators at all
    val chunks = Splitters.recursiveSplit(text, 7) // odd size: every naive boundary would tear
    assert(chunks.nonEmpty)
    // spans are contiguous and exact (no separators -> full coverage)
    assert(chunks.head._2 == 0 && chunks.last._3 == text.length)
    chunks.sliding(2).foreach { case Seq((_, _, e), (_, s, _)) => assert(s == e); case _ => }
    chunks.foreach { case (c, s, e) =>
      assert(c == text.substring(s, e))
      assert(utf8Clean(c), s"chunk [$s,$e) contains a lone surrogate")
    }
    assert(chunks.map(_._1).mkString == text)
  }

  test("recursive chunks of an emoji corpus survive a parquet round trip byte-identically") {
    import spark.implicits._
    val docs = Seq((1L, EmojiTen * 9), (2L, "plain ascii text " * 12))
      .toDF("doc_id", "text")
    val out = Splitters.recursiveDf(spark, docs, 13)
    val tmp = java.nio.file.Files.createTempDirectory("uni_s03").toString
    out.write.parquet(s"$tmp/chunks.parquet")
    val back = spark.read.parquet(s"$tmp/chunks.parquet")
      .orderBy("doc_id", "chunk_idx").collect()
    val reconstructed = back.filter(_.getLong(0) == 1L).map(_.getString(2)).mkString
    assert(reconstructed == EmojiTen * 9, "parquet round trip corrupted a chunk (U+FFFD)")
    assert(!back.exists(_.getString(2).contains('�')))
  }

  test("s01 naive (SQL substring) splits astral text by code points, chunks stay valid") {
    import spark.implicits._
    val text = EmojiTen * 4 // 40 code points
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val rows = Splitters.naive(docs, 7).orderBy("chunk_idx").collect()
    assert(rows.length == 6) // ceil(40/7)
    rows.foreach(r => assert(utf8Clean(r.getString(2))))
    assert(rows.map(_.getString(2)).mkString == text)
    // positions are code-point units: last end == 40, not 80
    assert(rows.last.getAs[Number](4).longValue == 40L)
  }

  /** CJK + emoji mini-corpus through the Tables.documents schema. */
  private lazy val uniDir: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("uni_corpus").toString
    Seq(
      (1L, "你好世界 数据处理", "zh", "uni", 9L), // "hello world data-processing", 2 words of 4 cps
      (2L, EmojiTen, "en", "uni", 10L), // one 10-cp emoji word
      (3L, "contact me at alice@example.com 谢谢", "en", "uni", 34L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("t03 token counts are code-point based on CJK and emoji words") {
    val rows = TextQueries.t03TokenCount(spark, uniDir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    // doc 1: two 4-cp words -> 2 ws tokens, ceil(4/4)*2 = 2 bpe tokens
    assert(rows(1L) == ((2, 2L)))
    // doc 2: one 10-cp word -> ceil(10/4) = 3 bpe tokens (UTF-16 length 20 would give 5)
    assert(rows(2L) == ((1, 3L)))
  }

  test("t04 fingerprint gram count is code-point based and deterministic on astral text") {
    val a = TextQueries.t04Fingerprint(spark, uniDir).collect()
    val b = TextQueries.t04Fingerprint(spark, uniDir).collect()
    assert(a.toSeq == b.toSeq)
    val byId = a.map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 2 has 10 code points -> 10 - 8 + 1 = 3 grams (UTF-16 would give 13)
    assert(byId(2L) == 3L)
  }

  test("PiiScrub redacts an email embedded in CJK text without touching the CJK") {
    import spark.implicits._
    val out = Seq((3L, "contact me at alice@example.com 谢谢"))
      .toDF("doc_id", "text")
      .select(graft.functions.PiiScrub.scrub(col("text")).as("t"))
      .head().getString(0)
    assert(out == "contact me at [EMAIL] 谢谢")
  }

  test("d02/d13 on a spaceless-CJK corpus: no shingles, no crash, no candidates") {
    assert(DedupQueries.d02MinhashLsh(spark, uniDir).collect().isEmpty)
    assert(DedupQueries.d13IncrementalNeardup(spark, uniDir).collect().isEmpty)
  }

  test("t14 normalize: NFC folds decomposed accents so hash-keyed dedup sees equal texts") {
    import spark.implicits._
    val decomposed = "Cafe\u0301  du \t Parc" // e + COMBINING ACUTE, messy whitespace
    val precomposed = "Café du Parc"
    val out = TextQueries.normalize(
        Seq((1L, decomposed), (2L, precomposed), (3L, EmojiTen)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // both spellings normalize to the SAME string (the dedup precondition)
    assert(out(1L) == out(2L) && out(1L)._1 == precomposed)
    // n_chars_norm counts code points: "Café du Parc" = 12
    assert(out(1L)._2 == 12L)
    // astral text is already NFC and survives untouched (fast path)
    assert(out(3L) == ((EmojiTen, 10L)))
    // idempotent: normalizing the normalized output is the identity
    val again = TextQueries.normalize(
        Seq((1L, out(1L)._1)).toDF("doc_id", "text")).head()
    assert(again.getString(1) == out(1L)._1)
  }

  test("t14 collapses the explicit ASCII whitespace class (incl. U+000B, where Java \\s and RE2 \\s disagree)") {
    import spark.implicits._
    val out = TextQueries.normalize(
        Seq((1L, "ab\t c \r\n d")).toDF("doc_id", "text"))
      .head()
    assert(out.getString(1) == "a b c d")
    assert(out.getLong(2) == 7L)
  }

  /** Span-surgery corpus: two docs = 64 unique CJK-filler code points
    * (stride-aligned) + one SHARED 96-cp emoji span; one unique doc. */
  private lazy val spanDir: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("uni_span").toString
    val shared = EmojiTen * 9 + "😀" * 6 // 96 astral cps
    def filler(c: Char) = c.toString * 64
    Seq(
      (1L, filler('甲') + shared, "zh", "uni", 160L),
      (2L, filler('乙') + shared, "zh", "uni", 160L),
      (3L, filler('丙') + "丁".toString * 96, "zh", "uni", 160L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("d08 finds the shared astral span at code-point positions") {
    val rows = DedupQueries.d08SpanDedup(spark, spanDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // shared windows start at stride-aligned cp offsets 64/80/96 in both docs
    assert(rows.toSet == Set(1L, 2L).flatMap(d => Set(64L, 80L, 96L).map(p => (d, p))))
  }

  test("d11 splices the astral span out of the non-canonical doc, output stays valid") {
    val rows = DedupQueries.d11SpanDedupApply(spark, spanDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val shared = EmojiTen * 9 + "😀" * 6
    // canonical (min doc_id) untouched; docs 3 untouched
    assert(rows(1L) == ((("甲".toString * 64) + shared, 0L)))
    assert(rows(3L)._2 == 0L)
    // doc 2: merged cut [64,160) -> 96 code points removed, filler remains
    assert(rows(2L) == ((("乙".toString * 64), 96L)))
    rows.values.foreach { case (t, _) =>
      assert(utf8Clean(t) && !t.contains('�'))
    }
  }

  test("t21/t22/s05 on a CJK + astral corpus: code-point word lengths, untorn window chunks") {
    import spark.implicits._
    import graft.operators.{QualityQueries, SplitterQueries}
    val tmp = java.nio.file.Files.createTempDirectory("uni_r10b").toString
    // Each emoji "word" is ONE code point but TWO UTF-16 units — a
    // charAt-based length would double every word measurement.
    val emojiWords = (1 to 40).map(_ => "😀😁😂").mkString(" ") // 40 words × 3 cps
    val cjk = (1 to 35).map(_ => "中文词汇").mkString(" ")
    docsUni(tmp, Seq(emojiWords, cjk))
    val q = QualityQueries.t21GopherQuality(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(q(0L).getLong(1) == 40L && q(0L).getDouble(2) == 3.0,
      s"emoji words must measure 3 CODE POINTS, not 6 UTF-16 units: ${q(0L)}")
    assert(q(1L).getLong(1) == 35L && q(1L).getDouble(2) == 4.0, s"${q(1L)}")
    // both fail alpha (no [A-Za-z]) — the rule, not a crash
    assert(!q(0L).getBoolean(8) && !q(1L).getBoolean(8))
    // t22: repeated 3-word shingles dedup within doc; all grams of
    // doc 0 are novel (first), doc 1 disjoint vocabulary also novel
    val nov = QualityQueries.t22GramNovelty(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(nov == Map(0L -> 1.0, 1L -> 1.0), nov.toString)
    // s05: windows slice TOKENS, so no surrogate can tear; chunks
    // survive UTF-8 round-trips byte-identically
    val chunks = SplitterQueries.s05TokenWindow(spark, tmp).collect()
    assert(chunks.nonEmpty)
    chunks.foreach { r =>
      val c = r.getString(2)
      assert(utf8Clean(c) && !c.contains('�'), s"torn chunk: $r")
    }
  }

  test("m06 scene-cut histograms bin CODE POINTS on astral text (ascii/unicode parity)") {
    import graft.operators.MultimodalQueries._
    val tmp = java.nio.file.Files.createTempDirectory("uni_m06").toString
    // 404 cps: an all-emoji first frame, ascii middle, CJK tail — 2
    // frames, 1 boundary. If Spark binned UTF-16 units instead of
    // code points, frame 0's bins would hold 32 surrogate halves
    // (0xD83D % 16 = 13), not 16 copies each of bins 0-3, and the
    // frame windows themselves would slice at different offsets —
    // either way the L1 below diverges from the code-point recompute
    // (what the DuckDB oracle's string_split + unicode() measures).
    val text = "😀😁😂🤣" * 16 + ("the quick brown fox " * 13) + "中文数据" * 20
    docsUni(tmp, Seq(text))
    val rows = m06SceneCuts(spark, tmp).collect()
    val cps = text.codePoints.toArray
    val nFrames = (cps.length - FrameSize) / FrameStride + 1
    assert(cps.length == 404 && nFrames == 2 && rows.length == nFrames - 1)
    def hist(f: Int): Array[Int] = {
      val h = new Array[Int](FeatBins)
      cps.slice(f * FrameStride, f * FrameStride + FrameSize)
        .foreach(cp => h(cp % FeatBins) += 1)
      h
    }
    rows.foreach { r =>
      val fi = r.getAs[Number]("frame_idx").intValue
      val exp = hist(fi - 1).zip(hist(fi)).map { case (a, b) => math.abs(a - b) }.sum
      assert(r.getAs[Long]("l1_dist") == exp.toLong,
        s"frame $fi: got ${r.getAs[Long]("l1_dist")}, code-point recompute $exp")
    }
  }

  private def docsUni(tmp: String, texts: Seq[String]): Unit = {
    import spark.implicits._
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "zh", "planted", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
  }
}
