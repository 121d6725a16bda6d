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
}
