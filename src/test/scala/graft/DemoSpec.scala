package graft

/** User-acceptance smoke: the FULL story — load → curate → annotate
  * (save/load round-trip) → persisted-index build → ANN + hybrid
  * retrieval → view payload — runs end-to-end on real test data and
  * every stage's outcome is sane. This is the closest thing to "a
  * user switched their whole workflow onto the library and it
  * worked". */
class DemoSpec extends SparkSpec {

  test("the full user story runs end-to-end at sf0.001") {
    val s = Demo.fullStory(spark, sf0001)

    // curation kept a meaningful, strictly-proper slice
    assert(s.nCurated > 0 && s.nCurated < s.nLoaded,
      s"curation must filter: ${s.nCurated} of ${s.nLoaded}")

    // the store round-tripped consistent
    assert(s.nFacts > 0 && s.nEntities > 0)
    val (nF, nE, missing) = s.integrity
    assert(nF == s.nFacts && nF == nE && missing == 0,
      s"store integrity after save/load: $nF facts, $nE embeddings, $missing missing")

    // the persisted-index serving path, probing ALL cells, must equal
    // the brute ranking exactly (same rounding, same tiebreak)
    assert(s.annFactIds.length == 3 && s.annFactIds == s.bruteFactIds,
      s"all-probe ANN must match brute: ${s.annFactIds} vs ${s.bruteFactIds}")

    // hybrid retrieval bounded by k and nonempty; the indexed hybrid
    // (all-probe) reproduced the brute rows exactly
    assert(s.hybridRows > 0 && s.hybridRows <= 5)
    assert(s.hybridIndexedMatches,
      "indexed hybrid must equal brute hybrid at all-probe in the user story")

    // the token meter over the curated slice is a real positive count
    assert(s.bpeTokens > 0)

    // the view payload is real JSON with the D3 contract's shape
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(s.viewJson)
    assert(root.has("nodes") && root.has("links"), s.viewJson.take(200))
    assert(root.get("nodes").size() > 0, "entity graph must seed nodes")

    // the governance step reads sane: rates in [0,1], the funnel
    // monotone view >= click >= purchase, a real top transition
    assert(s.passRate >= 0.0 && s.passRate <= 1.0)
    assert(s.meanNovelty > 0.0 && s.meanNovelty <= 1.0)
    assert(s.funnel.keySet == Set("1_view", "2_click", "3_purchase"), s.funnel.toString)
    assert(s.funnel("1_view") >= s.funnel("2_click") &&
      s.funnel("2_click") >= s.funnel("3_purchase"), s.funnel.toString)
    assert(s.topTransition._3 > 0)

    // the takedown chapter: the top retrieved fact's document was
    // erased — cascade counts exact, nothing serves its facts, and
    // the store is still integrity-green
    assert(s.takedownFacts > 0 && s.takedownClean,
      s"takedown left residue (facts=${s.takedownFacts}, clean=${s.takedownClean})")

    // the maintenance gauges around the takedown: a fresh index is
    // healthy; the takedown's tombstones register as measured debt
    // (the dial an operator reads to schedule compaction)
    assert(s.healthBefore.healthy,
      s"fresh index should read healthy: ${s.healthBefore}")
    assert(s.healthAfter.tombstoneDebt.exists(_ > 0.0),
      s"takedown tombstones must register as debt: ${s.healthAfter}")
    assert(!s.healthAfter.needsRebuild,
      "a takedown alone must not demand a model rebuild")
  }
}
