package graft

import org.apache.spark.sql.functions._

import graft.api.{Graft, GraftView}
import graft.functions.HashEmbedder
import graft.store.HippoDb

/** hippoview's data surface (reference hippoview app.py Search):
  * fact-mode co-occurrence graphs, entity-mode bounded exploration
  * with shared-fact links, maxRelations fan-out cap, JSON payload. */
class GraftViewSpec extends SparkSpec {

  private lazy val db: HippoDb = {
    import spark.implicits._
    val facts = Seq((1L, "f one"), (2L, "f two"), (3L, "f three"), (4L, "f four"))
      .toDF("fact_id", "fact_text")
    val edges = Seq(
      (1L, "A"), (1L, "B"), (4L, "A"), (4L, "B"), // A,B share facts 1 and 4
      (2L, "B"), (2L, "C"),                       // B-C share fact 2
      (3L, "C"), (3L, "D"))                       // C-D share fact 3
      .toDF("fact_id", "entity")
    val entities = Seq(("A", "alpha"), ("B", "beta"), ("C", ""), ("D", ""))
      .toDF("entity", "description")
    val emb = new HashEmbedder(64)
    val factEmb = facts.select("fact_id", "fact_text").as[(Long, String)]
      .map { case (id, t) => (id, emb.embed(t)) }.toDF("fact_id", "embedding")
    HippoDb(facts, edges, entities, factEmb)
  }

  private lazy val view = new GraftView(spark, new Graft(spark))

  test("fact mode: retrieved fact's entities become nodes, co-occurrence the link") {
    // Query text == fact 1's text → its embedding matches exactly.
    val (nodes, links) = view.factGraph(db, "f one", k = 1)
    assert(nodes.collect().map(_.getString(0)).toSeq == Seq("A", "B"))
    val l = links.collect()
    assert(l.length == 1)
    assert(l.head.getString(0) == "A" && l.head.getString(1) == "B")
    assert(l.head.getLong(2) == 1L && l.head.getSeq[Long](3) == Seq(1L))
  }

  test("entity mode: 2-hop exploration links carry shared fact ids, pairs canonical") {
    // Stored repr of A is "A (alpha)" — query it verbatim for an
    // exact-match seed.
    val (nodes, links) = view.entityGraph(db, "A (alpha)", k = 1, depth = 2)
    assert(nodes.collect().map(_.getString(0)).toSeq == Seq("A", "B", "C"),
      "2 hops from A must reach B then C, not D")
    val got = links.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getSeq[Long](3))).toSeq
    // Round 2 rediscovers (B,A) from the B side; it must collapse
    // into ONE canonical (A,B) row.
    assert(got == Seq(("A", "B", 2L, Seq(1L, 4L)), ("B", "C", 1L, Seq(2L))))
  }

  test("entity mode: maxRelations keeps the top-p neighbours by shared-fact count") {
    val (_, links) = view.entityGraph(db, "B (beta)", k = 1, depth = 1,
      maxRelations = Some(1))
    val got = links.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // B's neighbours: A (2 shared) and C (1 shared) — top-1 is A.
    assert(got == Seq(("A", "B", 2L)))
  }

  test("toJson renders the reference's {nodes, links} payload with fact texts") {
    val json = view.toJson(db, view.factGraph(db, "f one", k = 1))
    assert(json.startsWith("""{"nodes":["""))
    assert(json.contains(""""id":"A","description":"alpha""""))
    assert(json.contains(""""source":"A","target":"B","value":1"""))
    assert(json.contains(""""facts":{"1":"f one"}"""))
  }

  test("entity mode runs end-to-end on a real annotated store") {
    import graft.sources.Tables
    val api = new Graft(spark)
    val real = api.annotate(Tables.documents(spark, sf0001).limit(20))
    // Seed with an entity that HAS neighbours (shares a fact), via
    // its stored "name ()" repr so the hash embedder matches exactly.
    val e = real.edges.as("a")
      .join(real.edges.as("b"), "fact_id")
      .filter(org.apache.spark.sql.functions.col("a.entity") =!=
        org.apache.spark.sql.functions.col("b.entity"))
      .select("a.entity").head().getString(0)
    val (nodes, links) = view.entityGraph(
      real, Graft.entityStoredRepr(e, ""), k = 1, depth = 1)
    assert(nodes.collect().map(_.getString(0)).contains(e))
    val l = links.collect()
    assert(l.nonEmpty, s"entity '$e' shares a fact but produced no links")
    assert(l.forall(_.getSeq[Long](3).nonEmpty))
    val json = view.toJson(real, (nodes, links))
    assert(json.startsWith("""{"nodes":[""") && json.contains(""""links":["""))
  }

  test("entity mode: depth 3 walks the full A-B-C-D chain") {
    val (nodes, links) = view.entityGraph(db, "A (alpha)", k = 1, depth = 3)
    assert(nodes.collect().map(_.getString(0)).toSeq == Seq("A", "B", "C", "D"))
    val got = links.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("A", "B", 2L), ("B", "C", 1L), ("C", "D", 1L)))
  }

  test("entity mode: deep exploration keeps the plan bounded (lineage cut per round)") {
    // d07 lesson: without a per-round localCheckpoint the analyzed
    // plan grows geometrically with depth and the driver hangs
    // stringifying it. With the cut, every round starts from
    // LogicalRDD leaves — depth 5 must both finish promptly and
    // carry a flat, small plan.
    val (nodes, links) = view.entityGraph(db, "A (alpha)", k = 1, depth = 5)
    val planChars = links.queryExecution.analyzed.toString.length
    assert(planChars < 20000, s"depth-5 links plan is $planChars chars — lineage not cut?")
    // exhausted graph: depth 5 finds nothing beyond the depth-3 set
    assert(nodes.collect().map(_.getString(0)).toSeq == Seq("A", "B", "C", "D"))
    assert(links.count() == 3)
  }

  test("toJson keeps a link whose fact_ids array is EMPTY (explode_outer contract)") {
    import spark.implicits._
    val links = Seq(("A", "B", 0L, Seq.empty[Long]))
      .toDF("source", "target", "value", "fact_ids")
    val nodes = Seq(("A", "alpha"), ("B", "beta")).toDF("entity", "description")
    val json = view.toJson(db, (nodes, links))
    assert(json.contains(""""source":"A","target":"B","value":0,"facts":{}"""),
      s"empty-fact_ids link must still emit a row: $json")
  }

  test("toJson keeps dangling-fact links and escapes control characters") {
    import spark.implicits._
    // fact 9 exists only in edges (pre-restoreIntegrity store);
    // description carries a tab, fact text a newline.
    val facts = Seq((1L, "line one\nline two")).toDF("fact_id", "fact_text")
    val edges = Seq((1L, "A"), (1L, "B"), (9L, "A"), (9L, "B")).toDF("fact_id", "entity")
    val ents = Seq(("A", "has\ttab"), ("B", "")).toDF("entity", "description")
    val emb = new HashEmbedder(64)
    val fe = facts.as[(Long, String)].map { case (id, t) => (id, emb.embed(t)) }
      .toDF("fact_id", "embedding")
    val db2 = HippoDb(facts, edges, ents, fe)
    import org.apache.spark.sql.functions.{array, col, lit}
    val links = edges.sparkSession.createDataFrame(Seq(("A", "B", 2L, Seq(1L, 9L))))
      .toDF("source", "target", "value", "fact_ids")
    val nodes = ents
    val json = view.toJson(db2, (nodes.select(col("entity"), col("description")), links))
    // The link survives with value 2; only the resolvable fact text
    // appears in the facts map; control chars are JSON-escaped.
    assert(json.contains(""""source":"A","target":"B","value":2"""))
    assert(json.contains(""""facts":{"1":"line one\nline two"}"""))
    assert(json.contains(""""description":"has\ttab""""))
    assert(!json.exists(c => c == '\t' || c == '\n'))
  }
}
