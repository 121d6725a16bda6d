package graft

import graft.operators.DedupQueries

/** SimHash (rows-only op) property: planted near-dup pairs — found
  * independently by exact Jaccard — must sit at much lower Hamming
  * distance than random pairs. */
class DedupSpec extends SparkSpec {

  test("simhash separates near-dups from random pairs") {
    val sigs = DedupQueries.d03Simhash(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nearDups = DedupQueries.d02MinhashLsh(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nearDups.nonEmpty, "no planted near-dup pairs found")

    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val dupDist = nearDups.map { case (a, b) => hamming(sigs(a), sigs(b)) }
    val rnd = new scala.util.Random(3)
    val ids = sigs.keys.toArray
    val randDist = Seq.fill(200) {
      val (a, b) = (ids(rnd.nextInt(ids.length)), ids(rnd.nextInt(ids.length)))
      hamming(sigs(a), sigs(b))
    }
    val avgDup = dupDist.sum.toDouble / dupDist.size
    val avgRand = randDist.sum.toDouble / randDist.size
    info(s"avg hamming: near-dups $avgDup vs random $avgRand (n=${nearDups.size} pairs)")
    assert(avgDup < avgRand / 2,
      s"simhash does not separate: $avgDup vs $avgRand")
  }

  test("d17: each affected doc reports its STRONGEST partner, ties to the lowest id") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("d17corpus").toString
    val base = (1 to 12).map(i => s"w$i").mkString(" ") // 10 word-3-shingles
    val texts = Seq(
      base,                                             // 0
      base,                                             // 1: exact copy, J(0,1)=1
      (1 to 11).map(i => s"w$i").mkString(" ") + " zz", // 2: J(2,0)=J(2,1)=9/11≈0.8182
      "totally different words that never overlap")     // 3: no pair
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "planted", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = DedupQueries.d17NearestDup(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(rows.keySet == Set(0L, 1L, 2L), s"doc 3 must be absent: $rows")
    assert(rows(0L) == ((1L, 1.0)), "0's copy outranks the 9/11 partner")
    assert(rows(1L) == ((0L, 1.0)))
    // J(2,0) == J(2,1) == round(9/11, 4): the tie must break to doc 0
    assert(rows(2L) == ((0L, math.rint(9.0 / 11.0 * 1e4) / 1e4)), s"${rows(2L)}")
  }

  test("d06 ANN-blocked near-dup recalls >= 0.9 of d05's exact pairs") {
    val exact = DedupQueries.d05EmbedNeardup(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "no exact near-dup pairs at sf0.01")
    val ann = DedupQueries.d06EmbedNeardupAnn(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH candidates verify with the exact cosine → no false positives
    assert(ann.subsetOf(exact), s"ANN produced non-exact pairs: ${ann -- exact}")
    val recall = ann.intersect(exact).size.toDouble / exact.size
    info(s"d06 recall vs exact: $recall (${ann.size}/${exact.size} pairs)")
    assert(recall >= 0.9, s"recall $recall below 0.9")
  }

  test("connectedComponents labels chains, stars and cliques to the component min") {
    import spark.implicits._
    // chain 1-2-3-4-5, star 10<-{11,12,13}, clique {20,21,22}, pair 30-31
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (11L, 10L), (12L, 10L), (13L, 10L),
      (20L, 21L), (21L, 22L), (20L, 22L),
      (31L, 30L)).toDF("u", "v")
    val got = DedupQueries.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L)
    assert(got == want, s"components differ: $got")
  }

  test("d07 clusters cover every d02 pair with canonical = cluster min") {
    val pairs = DedupQueries.d02MinhashLsh(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val rows = DedupQueries.d07DedupClusters(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val cluster = rows.map { case (c, d, _) => d -> c }.toMap
    // every near-dup pair landed in one cluster
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
    // canonical flag is exactly "doc is its cluster's min id"
    rows.groupBy(_._1).foreach { case (c, members) =>
      val min = members.map(_._2).min
      assert(min == c, s"cluster id $c is not the member min $min")
      members.foreach { case (_, d, canon) =>
        assert((canon == 1) == (d == min), s"canonical flag wrong for doc $d")
      }
    }
  }

  test("d07 canonical policy dial: longest / best_quality pick the metric max per cluster") {
    import org.apache.spark.sql.functions.col
    val minId = DedupQueries.dedupClusters(spark, sf001, DedupQueries.CanonicalMinId)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // min_id form is byte-identical to the oracle-anchored d07 entry
    val d07 = DedupQueries.d07DedupClusters(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(minId == d07)
    val nChars = graft.sources.Tables.documents(spark, sf001)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val quality = graft.operators.TextQueries.t02QualityScore(spark, sf001)
      .select(col("doc_id"), col("quality")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((policy, metric) <- Seq(
        DedupQueries.CanonicalLongest -> nChars.andThen(_.toDouble),
        DedupQueries.CanonicalBestQuality -> quality)) {
      val rows = DedupQueries.dedupClusters(spark, sf001, policy)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      // same cluster membership as min_id, different survivor
      assert(rows.map(t => (t._1, t._2)).toSet == minId.map(t => (t._1, t._2)),
        s"$policy changed cluster membership")
      rows.groupBy(_._1).foreach { case (c, members) =>
        val canon = members.filter(_._3 == 1)
        assert(canon.length == 1, s"$policy: cluster $c has ${canon.length} canonicals")
        val best = members.map(m => metric(m._2)).max
        assert(metric(canon.head._2) == best,
          s"$policy: canonical of cluster $c is not the metric max")
      }
    }
    intercept[IllegalArgumentException] {
      DedupQueries.dedupClusters(spark, sf001, "nope")
    }
  }

  test("d09 dedup-apply keeps canonicals + singletons, drops the rest, under every policy") {
    val nDocs = graft.sources.Tables.documents(spark, sf001).count()
    val clusters = DedupQueries.d07DedupClusters(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val nonCanonical = clusters.filter(_._3 == 0).map(_._2).toSet
    assert(nonCanonical.nonEmpty)
    for (policy <- Seq(DedupQueries.CanonicalMinId,
        DedupQueries.CanonicalLongest, DedupQueries.CanonicalBestQuality)) {
      val kept = DedupQueries.dedupApply(spark, sf001, policy)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // every policy drops exactly |cluster|-1 docs per cluster
      assert(kept.size == nDocs - nonCanonical.size, s"$policy kept ${kept.size}")
      // each cluster contributes exactly one survivor
      clusters.groupBy(_._1).foreach { case (c, members) =>
        assert(members.count(m => kept.contains(m._2)) == 1,
          s"$policy: cluster $c has != 1 survivor")
      }
    }
    // min_id survivors are exactly corpus minus non-canonical members
    val keptMin = DedupQueries.d09DedupApply(spark, sf001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(nonCanonical.intersect(keptMin).isEmpty)
  }

  test("winnowing guarantee: any shared run >= gram+w-1 yields a shared fingerprint") {
    import DedupQueries.{winnowSelect, WinnowGram, WinnowWindow}
    val g = WinnowGram; val w = WinnowWindow
    val rnd = new scala.util.Random(7)
    def junk(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    // The guarantee window: a shared substring of gram+w-1 code
    // points contains a full w-gram window, whose minimum is selected
    // in BOTH documents (Schleimer et al. 2003, property W1).
    val shared = junk(g + w - 1)
    val a = junk(40) + shared + junk(40)
    val b = junk(55) + shared + junk(25)
    val fa = winnowSelect(a, g, w).toSet
    val fb = winnowSelect(b, g, w).toSet
    assert(fa.intersect(fb).nonEmpty, "guaranteed shared fingerprint missing")
    // Density: winnowing selects a small fraction of the gram stream
    // (expected ~2/(w+1)), never more than one per window position.
    assert(fa.size <= a.length - g + 1 - w + 1)
    assert(fa.size < (a.length - g + 1) / 2, s"selected ${fa.size} of ${a.length - g + 1} grams")
    // Degenerate inputs select nothing instead of throwing.
    assert(winnowSelect(junk(g - 1), g, w).isEmpty)     // shorter than one gram
    assert(winnowSelect(junk(g + w - 2), g, w).isEmpty) // fewer than w grams
    // Disjoint random texts share nothing at this gram size.
    assert(winnowSelect(junk(200), g, w).toSet.intersect(
      winnowSelect(junk(200), g, w).toSet).isEmpty)
  }

  test("d15 semdedup flags planted within-cluster copies, keeps the earliest") {
    import spark.implicits._
    // 12 mutually-orthogonal one-hot base vectors (pairwise cos 0,
    // far below the 0.45 threshold) + two near-identical copies of
    // vector 0 at later ids (cos ≈ 1 with it and each other).
    val dim = 16
    def oneHot(i: Int, eps: Double = 0.0): Seq[Double] =
      Seq.tabulate(dim)(d => (if (d == i) 1.0 else 0.0) + (if (d == i + 1) eps else 0.0))
    val base = (0 until 12).map(i => (i.toLong, oneHot(i)))
    val copies = Seq((100L, oneHot(0, 0.01)), (101L, oneHot(0, 0.02)))
    val e = (base ++ copies).toDF("vec_id", "v")
    val out = DedupQueries.semDedup(spark, e, k = 4)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(out.size == 14)
    // the planted copies are the ONLY duplicates, and the original
    // (lowest vec_id of the relation) survives
    assert(out(100L)._2 && out(101L)._2, s"copies not flagged: $out")
    assert(out.filter(_._2._2).keySet == Set(100L, 101L))
    // near-identical vectors landed in one cell (the SemDeDup premise)
    assert(Set(out(0L)._1, out(100L)._1, out(101L)._1).size == 1)
  }

  test("d15 semdedup == d05 exact pairs restricted to within-cluster, on the real corpus") {
    val out = DedupQueries.d15SemDedup(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    val cluster = out.view.mapValues(_._1).toMap
    val flagged = out.collect { case (id, (_, true)) => id }.toSet
    // d05 is the independent exact all-pairs computation; d15's
    // definition says: b is a duplicate iff some exact pair (a, b),
    // a < b, has cluster(a) == cluster(b). Check both directions.
    val withinClusterLater = DedupQueries.d05EmbedNeardup(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => cluster(a) == cluster(b) }
      .map(_._2).toSet
    assert(flagged == withinClusterLater,
      s"flag set diverges: extra=${flagged -- withinClusterLater} missing=${withinClusterLater -- flagged}")
    // clustering is genuinely partitioning the corpus (more than one cell)
    assert(out.values.map(_._1).toSet.size > 1)
  }
}
