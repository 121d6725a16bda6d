package graft.api

import graft.plans.Pins.Pinned

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.store.HippoDb

/** hippoview's DATA surface, Spark-first (reference
  * hippoview/src/hippoview/app/app.py:22-172 — Search.__call__ and
  * Search.explore). The reference serves a {nodes, links} graph
  * payload to a D3 front end; the Flask/HTML/CSS part is
  * presentation and stays out of scope — what the ENGINE owes is the
  * payload computation:
  *
  *  - FACT mode (app.py:84-93,140-160): top-k facts by cosine to the
  *    query; nodes are the facts' entities, links connect entities
  *    co-occurring in a retrieved fact (value = co-occurrence count,
  *    fact ids attached).
  *  - ENTITY mode (app.py:96-137): top-k seed entities by cosine,
  *    then bounded-depth neighbour expansion with the shared-fact
  *    list per link — the reference's RECURSIVE explore() loop
  *    re-expressed as ITERATIVE frontier-expansion joins (the h09
  *    shape): per round, the frontier (tiny, broadcast) semi-joins
  *    edges to its facts, facts fan back out to neighbour entities,
  *    and the visited set grows; `maxRelations` keeps the top-p
  *    neighbours per origin by shared-fact count (a per-origin
  *    window rank, as app.py:47-49 sorts and slices).
  *
  * A view payload is HUMAN-scale output (it feeds a visualization),
  * so `toJson` collecting the final nodes/links is correct — the
  * exploration itself never collects the corpus, and every join is
  * keyed (entity / fact_id) with the probe side broadcast.
  *
  * Divergence, documented: the reference may emit a link in both
  * directions across recursion branches; links here are ONE row per
  * unordered entity pair (D3 renders them identically), with
  * lexicographic (source, target) order for determinism.
  */
final class GraftView(spark: SparkSession, api: Graft) {

  private def nodesFor(db: HippoDb, ents: DataFrame): DataFrame = {
    val desc =
      if (db.entities.columns.contains("description"))
        db.entities.select(col("entity"), col("description"))
      else db.entities.select(col("entity"), lit("").as("description"))
    ents.select("entity").distinct()
      .join(desc, Seq("entity"), "left")
      .na.fill("", Seq("description"))
      .orderBy("entity")
  }

  /** Fact mode: (nodes(entity, description), links(source, target,
    * value, fact_ids)). */
  def factGraph(db: HippoDb, query: String, k: Int = 5): (DataFrame, DataFrame) = {
    val hits = api.closestFacts(db, query, k).select("fact_id")
    val fe = db.edges.join(broadcast(hits), "fact_id")
    val links = fe.select(col("fact_id"), col("entity").as("source"))
      .join(fe.select(col("fact_id"), col("entity").as("target")), "fact_id")
      .filter(col("source") < col("target"))
      .groupBy("source", "target")
      .agg(countDistinct("fact_id").as("value"),
        sort_array(collect_set("fact_id")).as("fact_ids"))
      .orderBy("source", "target")
    (nodesFor(db, fe.select("entity")), links)
  }

  /** Entity mode: seeds = top-k entities to the query, expanded
    * `depth` hops; links carry the shared fact ids per neighbour
    * pair. `maxRelations` bounds the fan-out per origin (top-p by
    * shared-fact count, count-desc then entity tie-break — the
    * app.py:47-49 slice). */
  def entityGraph(db: HippoDb, query: String, k: Int = 3, depth: Int = 1,
      maxRelations: Option[Int] = None): (DataFrame, DataFrame) = {
    val seeds = api.closestEntities(db, query, k).select("entity")
    // Iterative expansion MUST cut lineage each round (the d07
    // lesson): frontier feeds the next round's join and visited is
    // referenced twice per round, so without an eager localCheckpoint
    // the analyzed plan grows geometrically with depth — fine at the
    // UI's depth 1-2, a driver-side plan-stringification hang by
    // depth ~5. Each checkpointed leg is human-scale (entity lists,
    // per-round link rows), so the materialization is trivial.
    // localCheckpoint is the right cut for this interactive, human-
    // scale surface; a fault-tolerant batch caller wants checkpoint()
    // to reliable storage instead (the connectedComponents note) —
    // local blocks have no lineage to recompute from after an
    // executor loss.
    var visited = seeds.pinned
    var frontier = visited
    var links: Option[DataFrame] = None
    var round = 0
    var exhausted = false
    while (round < depth && !exhausted) {
      val originFacts = db.edges
        .join(broadcast(frontier.select(col("entity").as("origin"))),
          col("entity") === col("origin"))
        .select(col("origin"), col("fact_id"))
      val nb = db.edges.join(originFacts, "fact_id")
        .filter(col("entity") =!= col("origin"))
        .groupBy("origin", "entity")
        .agg(countDistinct("fact_id").as("value"),
          sort_array(collect_set("fact_id")).as("fact_ids"))
      val kept = (maxRelations match {
        case Some(p) =>
          val w = Window.partitionBy("origin")
            .orderBy(col("value").desc, col("entity"))
          nb.withColumn("rk", row_number().over(w)).filter(col("rk") <= p).drop("rk")
        case None => nb
      }).pinned
      links = Some(links.map(_.unionByName(kept)).getOrElse(kept))
      frontier = kept.select(col("entity")).exceptAll(visited).distinct().pinned
      visited = visited.unionByName(frontier).distinct().pinned
      // The frontier is already materialized — isEmpty is a cheap
      // local check, and without it every post-exhaustion round
      // would run (and eagerly checkpoint) real edge-join/window
      // jobs against an empty probe set.
      exhausted = frontier.isEmpty
      round += 1
    }
    val linkRows = links.getOrElse(
        spark.emptyDataFrame.select(lit("").as("origin"), lit("").as("entity"),
          lit(0L).as("value"), array().cast("array<long>").as("fact_ids")))
      // Canonical unordered pair; across rounds the same pair can
      // surface from both ends — keep the max shared-fact payload.
      .select(least(col("origin"), col("entity")).as("source"),
        greatest(col("origin"), col("entity")).as("target"),
        col("value"), col("fact_ids"))
      .groupBy("source", "target")
      .agg(max(struct(col("value"), col("fact_ids"))).as("m"))
      .select(col("source"), col("target"),
        col("m.value").as("value"), col("m.fact_ids").as("fact_ids"))
      .orderBy("source", "target")
    (nodesFor(db, visited), linkRows)
  }

  /** Render a (nodes, links) pair as the {"nodes":[...],"links":[...]}
    * payload the reference endpoint serves (app.py:163,178-183) —
    * fact texts attached to links as the reference's `facts` map. */
  def toJson(db: HippoDb, graph: (DataFrame, DataFrame)): String = {
    val (nodes, links) = graph
    def esc(s: String) = graft.functions.TextHelpers.escapeJson(s)
    val nodeJson = nodes.collect().map { r =>
      s"""{"id":"${esc(r.getString(0))}","description":"${esc(r.getString(1))}"}"""
    }
    val texts = db.facts.select(col("fact_id"), col("fact_text"))
    // explode_OUTER + LEFT join: a link must survive even if some (or
    // all) of its fact ids dangle OR its fact_ids array is empty —
    // the stores this views can be mid-ingest or
    // pre-restoreIntegrity, and silently dropping a link the graph
    // DataFrames contain would desynchronize payload and graph. An
    // inner explode would swallow the empty-array row outright
    // (ADVICE r7); unmatched/null ids just contribute nothing to the
    // facts map (collect_list skips the null structs).
    val withTexts = links
      .select(col("source"), col("target"), col("value"),
        explode_outer(col("fact_ids")).as("fact_id"))
      .join(texts, Seq("fact_id"), "left")
      .groupBy("source", "target", "value")
      .agg(sort_array(collect_list(
        when(col("fact_text").isNotNull, struct(col("fact_id"), col("fact_text")))))
        .as("fs"))
      .orderBy("source", "target")
    val linkJson = withTexts.collect().map { r =>
      val fs = r.getSeq[org.apache.spark.sql.Row](3)
        .map(f => s""""${f.getLong(0)}":"${esc(f.getString(1))}"""").mkString(",")
      s"""{"source":"${esc(r.getString(0))}","target":"${esc(r.getString(1))}","value":${r.getLong(2)},"facts":{$fs}}"""
    }
    s"""{"nodes":[${nodeJson.mkString(",")}],"links":[${linkJson.mkString(",")}]}"""
  }
}
