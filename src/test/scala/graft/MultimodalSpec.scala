package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.functions.MediaDecoder
import graft.operators.MultimodalQueries

/** m01–m03: the stub decoder and the DuckDB oracle SQL must hash the
  * SAME quantity — the first CODE POINT, not the first utf-8 byte —
  * so the cross-engine compare stays green beyond the all-ASCII
  * driver corpus (where the two quantities happen to coincide). */
class MultimodalSpec extends SparkSpec {

  test("decoder stub hashes the first CODE POINT, not the first utf-8 byte") {
    val d = MediaDecoder.stub
    // 'é' U+00E9: code point 233, utf-8 bytes (195, 169). First-BYTE
    // hashing would give 195*7%480; the oracle's unicode() gives 233.
    assert(d.decode("éclair".getBytes(UTF_8)).height == (233 * 7) % 480)
    // Astral plane: ONE code point spanning two UTF-16 chars / 4 bytes.
    val rocket = new String(Character.toChars(0x1F680))
    assert(d.decode((rocket + "x").getBytes(UTF_8)).height == (0x1F680 * 7) % 480)
    // Empty payload: 0 on both engines (the oracles CASE-guard
    // DuckDB's unicode('') = -1).
    assert(d.decode(Array.empty[Byte]).height == 0)
    // nBytes/width stay BYTE-counted (octet_length on the oracle side).
    val m = d.decode("é".getBytes(UTF_8))
    assert(m.nBytes == 2L && m.width == 2)
  }

  test("m01/m03 match the oracle formulas on a non-ASCII corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "éclair au café"), // latin accents (2-byte utf-8 head)
      (2L, "日本語のテキスト"), // CJK (3-byte utf-8 head)
      (3L, new String(Character.toChars(0x1F680)) + " launch"), // astral head
      (4L, "plain ascii text"),
      (5L, "")) // empty doc
    val tmp = java.nio.file.Files.createTempDirectory("mmdocs").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("xx")).withColumn("source", lit("spec"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    // Expected values mirror the SQL oracle's quantities, computed
    // independently here: code points via codePointAt, byte lengths
    // via utf-8 encode.
    def firstCp(s: String): Int = if (s.isEmpty) 0 else s.codePointAt(0)
    def nBytes(s: String): Long = s.getBytes(UTF_8).length.toLong

    val m01 = MultimodalQueries.m01MediaMeta(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getInt(3)))).toMap
    docs.foreach { case (id, text) =>
      val (nb, w, h) = m01(id)
      assert(nb == nBytes(text), s"doc $id n_bytes")
      assert(w == (nBytes(text) % 640).toInt, s"doc $id width")
      assert(h == (firstCp(text) * 7) % 480, s"doc $id height: $h")
    }

    val m03 = MultimodalQueries.m03Resize(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    docs.foreach { case (id, text) =>
      val r = m03(id)
      assert(r.getInt(2) == (firstCp(text) * 7) % 480, s"doc $id in_h")
      assert(r.getInt(4) == ((firstCp(text) * 7) % 480) / 2, s"doc $id out_h")
      // Stride-2 CODE-POINT digest (the SQL restates it with
      // range(0, length, 2) + unicode(substr(..)) over char positions).
      var h = 0L; var n = 0L; var i = 0; var cpIdx = 0L
      while (i < text.length) {
        val cp = text.codePointAt(i)
        if (cpIdx % 2 == 0) { h = (h * 131 + cp) % 1000000007L; n += 1 }
        cpIdx += 1; i += Character.charCount(cp)
      }
      assert(r.getLong(5) == n && r.getLong(6) == h, s"doc $id out digest")
    }

    val m04 = MultimodalQueries.m04Features(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    docs.foreach { case (id, text) =>
      val bins = new Array[Long](MultimodalQueries.FeatBins)
      var n = 0L; var i = 0
      while (i < text.length) {
        val cp = text.codePointAt(i)
        bins(cp % MultimodalQueries.FeatBins) += 1; n += 1
        i += Character.charCount(cp)
      }
      assert(m04(id) == ((n, bins.mkString(","))), s"doc $id features")
      assert(m04(id)._2.split(",").map(_.toLong).sum == n, s"doc $id bin sum")
    }
  }

  test("m05 phash: band blocking equals brute force at the hamming threshold") {
    import spark.implicits._
    import MultimodalQueries.{phashBands, phashPairs, PhashMaxHamming}
    val rnd = new scala.util.Random(11)
    def randText(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    // planted: an exact copy (hamming 0) and a lightly edited copy of
    // doc 0; the rest independent random docs
    val base = randText(800)
    val edited = base.updated(100, 'z').updated(500, 'q')
    val docs = Seq((0L, base), (1L, base), (2L, edited)) ++
      (3L until 40L).map(i => (i, randText(700 + rnd.nextInt(200))))
    val df = docs.toDF("doc_id", "text")

    val pairs = phashPairs(spark, df)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    // the exact copy collides at hamming 0
    assert(pairs.get((0L, 1L)).contains(0), s"copy pair missing: $pairs")

    // pigeonhole exactness: blocked pairs == brute-force pairs at the
    // threshold (computed independently from the kernel signatures)
    def ham(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    val sigs = docs.map { case (id, t) => id -> phashBands(t) }
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = ham(sa, sb) if h <= PhashMaxHamming
    } yield (ia, ib) -> h).toMap
    assert(pairs == brute,
      s"blocking diverges from brute: extra=${pairs.keySet -- brute.keySet} missing=${brute.keySet -- pairs.keySet}")
    // the signature separates: random pairs sit far above the threshold
    val randHams = for { (ia, sa) <- sigs.drop(3); (ib, sb) <- sigs.drop(3) if ia < ib }
      yield ham(sa, sb)
    val avg = randHams.sum.toDouble / randHams.size
    info(s"planted-copy hamming 0, edited ${ham(phashBands(base), phashBands(edited))}, random avg $avg")
    assert(avg > 4 * PhashMaxHamming, s"random pairs too close: $avg")
  }

  test("m06: a planted two-scene payload cuts exactly at the scene boundary") {
    import spark.implicits._
    import graft.operators.MultimodalQueries
    val tmp = java.nio.file.Files.createTempDirectory("m06").toString
    // 640 chars: 'a'×320 then 'z'×320. Frames (size 64, stride 256)
    // sample offsets 0/256/512 → histograms all-'a', all-'a', all-'z':
    // boundary 1 has L1 = 0 (same scene), boundary 2 has L1 = 128
    // (64 counts leave bin a%16, 64 arrive at bin z%16) → one cut.
    val twoScene = "a" * 320 + "z" * 320
    // 100 chars: only one frame → no boundary row at all
    val oneFrame = "b" * 100
    Seq((0L, twoScene, "en", "p", twoScene.length.toLong),
        (1L, oneFrame, "en", "p", oneFrame.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = MultimodalQueries.m06SceneCuts(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3), r.getBoolean(4)))
    assert(rows.toSeq == Seq((0L, 1, 0L, false), (0L, 2, 128L, true)), rows.toSeq.toString)
  }
}
