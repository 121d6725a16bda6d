package graft

import graft.functions.{HashEmbedder, HllSketch, TextHelpers}
import graft.operators.DedupQueries

/** Property tests (seeded random inputs) for the JVM kernels the
  * similarity operators rely on, plus partition-invariance of the
  * typed aggregators — the merge path must give identical answers
  * however the data is split, which is what makes them safe map-side
  * combiners on a cluster. */
class KernelPropSpec extends SparkSpec {

  private val rnd = new scala.util.Random(20260812L)
  private def randLongs(max: Int) =
    List.fill(rnd.nextInt(max))(rnd.nextLong() % 100)
  private def randWord() =
    List.fill(1 + rnd.nextInt(8))(('a' + rnd.nextInt(26)).toChar).mkString
  private def randWords(max: Int) = List.fill(1 + rnd.nextInt(max))(randWord())

  test("sortedIntersectionAtLeast: exact when reachable, -1 only below alpha") {
    (1 to 500).foreach { _ =>
      val sa = randLongs(40).distinct.sorted.toArray
      val sb = randLongs(40).distinct.sorted.toArray
      val exact = sa.toSet.intersect(sb.toSet).size
      val alpha = rnd.nextInt(45)
      val got = DedupQueries.sortedIntersectionAtLeast(sa, sb, alpha)
      if (exact >= alpha) assert(got == exact, s"alpha=$alpha exact=$exact")
      else assert(got == -1, s"alpha=$alpha exact=$exact got=$got")
    }
  }

  test("sortedIntersectionSize == exact set-intersection size") {
    (1 to 300).foreach { _ =>
      val sa = randLongs(40).distinct.sorted.toArray
      val sb = randLongs(40).distinct.sorted.toArray
      assert(DedupQueries.sortedIntersectionSize(sa, sb) ==
        sa.toSet.intersect(sb.toSet).size)
    }
  }

  test("charGramHashes: sorted, distinct, correct count") {
    (1 to 300).foreach { _ =>
      val s = List.fill(rnd.nextInt(60))(('a' + rnd.nextInt(4)).toChar).mkString
      val g = DedupQueries.charGramHashes(s)
      assert(g.toSeq == g.toSeq.distinct.sorted)
      val expected = (0 to math.max(s.length - 5, -1))
        .map(i => s.substring(i, i + 5)).distinct.size
      assert(g.length == expected)
    }
  }

  test("minhash of a union is the elementwise min of the signatures") {
    val params = DedupQueries.hashParams(DedupQueries.NumHashes, seed = 7L)
    (1 to 100).foreach { _ =>
      val a = randWords(20)
      val b = randWords(20)
      val sa = DedupQueries.minhashSig(a.distinct, params)
      val sb = DedupQueries.minhashSig(b.distinct, params)
      val su = DedupQueries.minhashSig((a ++ b).distinct, params)
      assert(su.toSeq == sa.zip(sb).map { case (x, y) => math.min(x, y) }.toSeq)
    }
  }

  test("embedder output is unit-norm for any nonempty text") {
    val e = new HashEmbedder(32)
    (1 to 100).foreach { _ =>
      val v = e.embed(randWords(10).mkString(" "))
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-4)
    }
  }

  test("parseBulletPoints inverts itemizeList") {
    (1 to 100).foreach { _ =>
      val items = randWords(10)
      assert(TextHelpers.parseBulletPoints(TextHelpers.itemizeList(items)) == items)
    }
  }

  test("HLL sketch estimate is invariant to how the data is partitioned") {
    import spark.implicits._
    val data = spark.range(50000).as[Long]
    val est1 = data.repartition(1).select(new HllSketch(12).toColumn.name("e")).head()
    val est7 = data.repartition(7).select(new HllSketch(12).toColumn.name("e")).head()
    assert(est1 == est7, s"merge path changed the estimate: $est1 vs $est7")
  }

  test("TopKAggregator result is invariant to how the data is partitioned") {
    import spark.implicits._
    val rows = Seq.tabulate(5000)(i => (i % 7L, rnd.nextDouble(), i.toLong))
    def topk(parts: Int) = {
      val top = new graft.functions.TopKAggregator(5).toColumn
      rows.toDS().repartition(parts)
        .groupByKey(_._1).mapValues(t => (t._2, t._3))
        .agg(top.name("top")).collect().sortBy(_._1).toSeq
        .map { case (k, vs) => (k, vs.toSeq) }
    }
    assert(topk(1) == topk(13))
  }
}
