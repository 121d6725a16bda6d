package graft.operators

import graft.plans.Pins.Pinned

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.HippoGraph
import graft.operators.{DedupQueries => DQ}

/** Graph-store queries (SURVEY.md §2 h01–h07) — the EntityStore graph
  * surface of the reference re-expressed as declarative DataFrame ops.
  *
  * Scale notes: `edges` is the big table; every query below either
  * aggregates it with map-side partial aggregation or joins it against
  * a BROADCAST side (an entity probe set, or the tiny entity dim).
  * Nothing collects to the driver; neighbour expansion is a self-join
  * on fact_id (co-partitioned on the shuffle key, single exchange).
  */
object GraphQueries {
  import HippoGraph._

  /** Probe entities used by the parameterized lookups (reference calls
    * take runtime args; the oracle needs them baked in). */
  val ProbeEntity = "window"
  val ProbeUnion: Seq[String] = Seq("window", "spark")

  /** h01: the fact→entity adjacency itself (storage.py:227 add_fact's
    * entity linking, done corpus-wide in one pass). */
  def h01Edges(spark: SparkSession, dir: String): DataFrame =
    edges(spark, dir).orderBy("fact_id", "entity")

  /** h02: neighbours of an entity = entities co-occurring in a shared
    * fact (storage.py:213 get_neighbours), with shared-fact counts.
    * The probe side is a filtered broadcast → no big-big shuffle. */
  def h02EntityNeighbours(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir)
    val probe = e.filter(col("entity") === ProbeEntity).select(col("fact_id").as("pf"))
    e.join(broadcast(probe), col("fact_id") === col("pf"))
      .filter(col("entity") =!= ProbeEntity)
      .groupBy("entity")
      .agg(countDistinct("fact_id").as("n_shared_facts"))
      .orderBy("entity")
  }

  /** h03: facts involving ANY probe entity (storage.py:286). */
  def h03FactsUnion(spark: SparkSession, dir: String): DataFrame = {
    val matching = edges(spark, dir)
      .filter(col("entity").isin(ProbeUnion: _*))
      .select("fact_id").distinct()
    facts(spark, dir)
      .join(matching, Seq("fact_id"), "left_semi")
      .select("fact_id", "doc_id", "fact_text")
      .orderBy("fact_id")
  }

  /** h04: facts involving ALL probe entities (storage.py:299) —
    * count-distinct-match instead of iterated set intersection. */
  def h04FactsIntersection(spark: SparkSession, dir: String): DataFrame = {
    val all = edges(spark, dir)
      .filter(col("entity").isin(ProbeUnion: _*))
      .groupBy("fact_id")
      .agg(countDistinct("entity").as("n"))
      .filter(col("n") === ProbeUnion.size)
      .select("fact_id")
    facts(spark, dir)
      .join(all, Seq("fact_id"), "left_semi")
      .select("fact_id", "doc_id", "fact_text")
      .orderBy("fact_id")
  }

  /** h05: degree distribution — facts and docs per entity. doc_id
    * comes from JOINING the facts table (co-partitioned equi-join on
    * fact_id — the key saveEdgesBucketed buckets by), NOT from the
    * synthetic fact_id/100 arithmetic: the query works unchanged on
    * Graft.annotate's xxhash64-derived fact ids, where no id
    * arithmetic recovers the doc. */
  def h05EntityDegree(spark: SparkSession, dir: String): DataFrame =
    edges(spark, dir)
      .join(facts(spark, dir).select("fact_id", "doc_id"), "fact_id")
      .groupBy("entity")
      .agg(countDistinct("fact_id").as("n_facts"),
        countDistinct("doc_id").as("n_docs"))
      .orderBy("entity")

  /** h06: prune lone entities (storage.py:171) — dim entities that
    * survive = have at least one fact; anti-join side reported too. */
  def h06PruneLoneEntities(spark: SparkSession, dir: String): DataFrame = {
    val linked = edges(spark, dir).select("entity").distinct()
    entityDim(spark, dir)
      .join(linked, Seq("entity"), "left_anti")
      .orderBy("entity")
  }

  /** h07: integrity check (storage.py:136) — graph-side facts missing
    * from a (simulated) vector store; mirrors _restore_integrity's
    * reconciliation as one anti-join + count. */
  def h07IntegrityCheck(spark: SparkSession, dir: String): DataFrame = {
    val f = facts(spark, dir)
    val vectorSide = f.filter(col("fact_id") % 10 =!= 7).select("fact_id")
    val missing = f.join(vectorSide, Seq("fact_id"), "left_anti")
    missing.agg(
      count(lit(1)).as("n_missing"),
      min("fact_id").as("first_missing"),
      max("fact_id").as("last_missing"))
  }

  /** h08: get_neighbours(return_facts=True) (storage.py:213-224) —
    * each neighbour of the probe entity with the SORTED shared-fact
    * id list, not just the count. collect_set stays bounded by the
    * true fan-in (the reference materializes the same per-neighbour
    * list); emitted as a csv string so the cross-engine compare is
    * representation-stable. */
  def h08NeighbourFacts(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir)
    val probe = e.filter(col("entity") === ProbeEntity).select(col("fact_id").as("pf"))
    e.join(broadcast(probe), col("fact_id") === col("pf"))
      .filter(col("entity") =!= ProbeEntity)
      .groupBy("entity")
      .agg(array_join(sort_array(collect_set("fact_id")), ",").as("fact_ids"))
      .orderBy("entity")
  }

  /** h09: bounded k-hop neighbourhood (k=2) with MIN hop distance —
    * get_neighbours (storage.py:213) iterated one hop further. Each
    * hop is a frontier expansion: entities → their facts → the facts'
    * other entities, minus everything already reached. Both hops are
    * co-partitioned equi-joins on the edge keys (fact_id then
    * entity — the keys saveEdgesBucketed buckets by), so a k-hop
    * query is k joins in one declarative plan, not a driver loop; the
    * frontier sets stay small relative to the edge table and AQE
    * broadcasts them. */
  def h09KhopNeighbours(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir)
    val f1 = e.filter(col("entity") === ProbeEntity).select("fact_id").distinct()
    // n1 is consumed three times (f2's expansion, the hop-2 anti-join,
    // and the final union) — cache it so the hop-1 expansion join runs
    // once per action, not three times (r17, the h12 lesson).
    val n1 = e.join(f1, "fact_id")
      .filter(col("entity") =!= ProbeEntity)
      .select("entity").distinct()
      .cache()
    val f2 = e.join(n1, "entity").select("fact_id").distinct()
    val n2 = e.join(f2, "fact_id")
      .filter(col("entity") =!= ProbeEntity)
      .join(n1.withColumnRenamed("entity", "seen"),
        col("entity") === col("seen"), "left_anti")
      .select("entity").distinct()
    n1.withColumn("hops", lit(1))
      .union(n2.withColumn("hops", lit(2)))
      .orderBy("hops", "entity")
  }

  val RankDamping = 0.85
  val RankTeleport = 0.15 // literal, NOT 1-0.85: both engines must parse the same double
  val RankIters = 3

  /** h10: entity IMPORTANCE — PageRank over the entity co-occurrence
    * graph (entities adjacent iff they share a fact; the h02
    * neighbour relation made global). The capability a graph memory
    * wants for ranking retrieval candidates and pruning noise
    * entities: a fixed 3-iteration power method with damping 0.85,
    * exact (the DuckDB oracle unrolls the same three iterations).
    *
    * Scale shape: pair generation is the fact-keyed self-join (per-
    * fact entity counts are small, so a fact contributes bounded
    * pairs — h02's shape); each iteration is one edge-keyed join +
    * one map-side-combining agg, with the MODEL fully distributed —
    * the only driver value is the node-count scalar. The symmetric
    * graph has no dangling nodes, so every node receives inflow and
    * no left-join backfill is needed (mirrored in the oracle).
    * Iterations are a fixed small count, so the linear plan growth
    * needs no lineage cut (the d07 rule kicks in for fixpoint loops,
    * not k=3). g/deg cache across the three uses. */
  def h10EntityRank(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir)
    val g = e.select(col("fact_id"), col("entity").as("src"))
      .join(e.select(col("fact_id"), col("entity").as("dst")), "fact_id")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
      .cache()
    val deg = g.groupBy("src").agg(count(lit(1)).as("deg")).cache()
    val n = deg.count() // node-count scalar — the only driver traffic
    // g ⋈ deg is LOOP-INVARIANT (r17, guide §2.4): attaching deg
    // inside the round re-joined the full edge list every iteration.
    // Cached once, each round is ONE keyed join + the agg. Join
    // re-association only — the per-edge contribution rank/deg and
    // the summed multiset are unchanged (deg covers every src by
    // construction, both orders are inner equi-joins on src).
    val gd = g.join(deg, "src").cache()
    var rank = deg.select(col("src").as("entity"), lit(1.0 / n).as("rank"))
    for (_ <- 0 until RankIters) {
      rank = gd.join(rank.withColumnRenamed("entity", "src"), "src")
        .groupBy(col("dst"))
        .agg((lit(RankTeleport / n) +
          lit(RankDamping) * sum(col("rank") / col("deg"))).as("rank"))
        .withColumnRenamed("dst", "entity")
    }
    rank.select(col("entity"), round(col("rank"), 6).as("rank"))
      .orderBy("entity")
  }

  val CommIters = 3

  /** h11: COMMUNITY DETECTION — synchronous label propagation
    * (Raghavan et al. 2007) over the same entity co-occurrence graph
    * h10 ranks. The complement of PageRank for a graph memory:
    * rank says which entities matter, communities say which belong
    * TOGETHER (topic clusters for retrieval scoping, candidate
    * blocks for entity resolution). Each entity starts as its own
    * label; each round it adopts the most frequent label among its
    * neighbours, ties broken by the lexicographically smallest label
    * — that tie-break makes synchronous LPA fully deterministic, so
    * the DuckDB oracle (the same rounds unrolled with a row_number
    * pick) hash-matches exactly, no floats involved.
    *
    * Scale shape: pair generation is h02's bounded fact-keyed
    * self-join; each round is one edge-keyed join plus two keyed
    * aggs with map-side partials (the per-(node,label) count, then
    * the per-node argmax via min(struct(-cnt, label)) — no window,
    * no skew pile-up on one task). Labels live in a DataFrame, never
    * on the driver; a fixed small round count (3, the h10
    * convention) keeps the linear plan growth under the
    * no-lineage-cut threshold the d07 rule sets for fixpoint loops. */
  def h11Communities(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir)
    val g = e.select(col("fact_id"), col("entity").as("src"))
      .join(e.select(col("fact_id"), col("entity").as("dst")), "fact_id")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
      .cache()
    var lab = g.select(col("src").as("entity")).distinct()
      .withColumn("label", col("entity"))
    for (_ <- 0 until CommIters) {
      lab = g.join(lab.withColumnRenamed("entity", "dst"), "dst")
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("src")
        .agg(min(struct((-col("cnt")).as("nc"), col("label").as("l"))).as("m"))
        .select(col("src").as("entity"), col("m.l").as("label"))
    }
    lab.select(col("entity"), col("label").as("community"))
      .orderBy("entity")
  }

  val PathHops = 3

  /** h12: SHORTEST PATHS with WITNESS — BFS from the probe entity over
    * the co-occurrence graph, emitting for every entity within
    * `PathHops` hops its hop distance AND one concrete shortest path
    * (the lexicographically least, as a '>'-joined entity chain). The
    * graph-memory "how is X related to Y" query: h09 says WHICH
    * entities are near, this says WHY — the witness chain a retrieval
    * layer surfaces as provenance.
    *
    * Determinism: per frontier round each newly reached entity keeps
    * min(path). That per-round min composes to the global min because
    * all candidate paths in a round have the same hop count and the
    * separator '>' (0x3E) sorts below every entity character
    * (entities are [a-z]+, checked by the corpus; a same-hop prefix
    * pair like "x>a" / "x>ab" then still orders the same after the
    * common suffix is appended) — so the DuckDB oracle's unrolled
    * min() agrees exactly, no floats anywhere.
    *
    * Scale shape: frontier expansion is one edge-keyed join + one
    * map-side-combining min agg per round (path strings are bounded
    * at hops×max-entity-length); visited-set exclusion is a left-anti
    * join on the entity key. Fixed small round count (3, the h09/h10
    * convention) keeps the linear plan growth under the d07
    * lineage-cut threshold. The frontier is small relative to the
    * edge table, so AQE broadcasts it into each expansion join. */
  def h12PathBfs(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir)
    val g = e.select(col("fact_id"), col("entity").as("src"))
      .join(e.select(col("fact_id"), col("entity").as("dst")), "fact_id")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
      .cache()
    var visited = spark.range(1)
      .select(lit(ProbeEntity).as("entity"), lit(0).as("hops"),
        lit(ProbeEntity).as("path"))
    var frontier = visited
    for (h <- 1 to PathHops) {
      // CACHE each round's frontier (r17): the loop consumes
      // frontier_h twice (next round's expansion join AND the visited
      // union) and visited_h twice (the anti-join AND the next union),
      // so without materialization the assembled plan's subtree count
      // DOUBLES per hop — at 3 hops the expansion join ran ~4-8 times
      // per action (guide §2.4: remove recomputed shuffles). A lazy
      // cache is enough: within the one action the first consumer
      // computes each round, the second reads it back; frontiers are
      // k-hop balls, tiny beside g. Bench's clearCache() releases.
      frontier = g
        .join(frontier.select(col("entity").as("src"), col("path")), "src")
        .select(col("dst").as("entity"),
          concat(col("path"), lit(">"), col("dst")).as("path"))
        .join(visited.select(col("entity").as("seen")),
          col("entity") === col("seen"), "left_anti")
        .groupBy("entity")
        .agg(min("path").as("path"))
        .select(col("entity"), lit(h).as("hops"), col("path"))
        .cache()
      // Eager fill (r18, the d14 lesson): the two consumers of each
      // round's frontier/visited are independent subtrees of the one
      // final action, so they race the lazy cache and recompute the
      // expansion join concurrently (measured: 773 tasks for ~3
      // CPU-s at sf0.1). One tiny count per round serializes each
      // fill; rounds are few (PathHops) and frontiers k-hop-ball
      // sized, so the extra jobs are cheap beside the duplicated
      // expansion subtrees they remove.
      frontier.count()
      visited = visited.union(frontier).cache()
    }
    visited.orderBy("hops", "entity")
  }

  /** h13: TRIANGLES and CLUSTERING COEFFICIENT per entity — the
    * cohesion signal of the co-occurrence graph (a high-coefficient
    * entity lives in one tight topic clique; a low one bridges
    * contexts — the complement of h10's importance and h11's
    * membership). coeff = 2·tri / (deg·(deg−1)), rounded; deg < 2
    * pins 0.
    *
    * Scale shape: edges orient FORWARD by the (degree, entity) order
    * — the classic skew cure (Suri & Vassilvitskii 2011): every
    * vertex's forward-degree is O(√m) regardless of how hot the
    * vertex is, so the wedge join (fwd ⋈ fwd on the pivot) never
    * explodes on a celebrity entity the way an id-ordered orientation
    * does. Wedges close against a third fwd edge via one more
    * equi-join; per-vertex counts are one explode + map-side-
    * combining agg. The ORIENTATION is internal — the triangle SET
    * is orientation-independent, so the DuckDB oracle uses the plain
    * id order and must agree exactly (float-free until the final
    * rounded division). */
  def h13Triangles(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir)
    // und / deg / fwd are each consumed 2-3 times below (deg's union
    // reads und twice, fwd feeds both wedge sides AND the closing
    // semi-join, deg attaches twice and reports once) — cache them so
    // the fact-keyed self-join + distinct runs once per action, not
    // ~3x (r17, the h12 lesson; guide §2.4).
    val und = e.select(col("fact_id"), col("entity").as("u"))
      .join(e.select(col("fact_id"), col("entity").as("v")), "fact_id")
      .filter(col("u") < col("v"))
      .select("u", "v").distinct()
      .cache()
    val deg = und.select(col("u").as("entity"))
      .union(und.select(col("v").as("entity")))
      .groupBy("entity").agg(count(lit(1)).as("deg"))
      .cache()
    // orient u→v iff (deg(u), u) < (deg(v), v)
    val fwd = und
      .join(deg.select(col("entity").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("entity").as("v"), col("deg").as("dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("dst"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("dv"))
          .otherwise(col("du")).as("ddst"))
      .cache()
    val wedges = fwd.select(col("src"), col("dst").as("b"), col("ddst").as("db"))
      .join(fwd.select(col("src"), col("dst").as("c"), col("ddst").as("dc")), "src")
      .filter(struct(col("db"), col("b")) < struct(col("dc"), col("c")))
    val tris = wedges
      .join(fwd.select(col("dst").as("c"), col("src").as("b")), Seq("b", "c"), "left_semi")
      .select(col("src").as("a"), col("b"), col("c"))
    val perVertex = tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("entity"))
      .groupBy("entity").agg(count(lit(1)).as("n_tri"))
    deg.join(perVertex, Seq("entity"), "left")
      .select(col("entity"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") < 2, lit(0.0))
          .otherwise(round(coalesce(col("n_tri"), lit(0L)) * 2.0 /
            (col("deg") * (col("deg") - 1)), 6)).as("coeff"))
      .orderBy("entity")
  }

  /** h14 dials: a pair must share ≥ MinSharedFacts facts to be scored
    * (1-fact co-occurrence is noise at corpus scale) and clear a
    * Jaccard floor to be emitted (bounds output to genuinely similar
    * pairs). */
  val MinSharedFacts = 2
  val MinJaccard = 0.2

  /** h14: ENTITY SIMILARITY by fact-set Jaccard — J(a,b) =
    * |facts(a) ∩ facts(b)| / |facts(a) ∪ facts(b)|. The
    * set-similarity complement of h02's raw co-occurrence counts:
    * two entities are SIMILAR when they appear in mostly the SAME
    * facts, not merely when a hot entity appears everywhere (the
    * normalization h02 lacks). The entity-resolution candidate signal
    * (Graft.resolveEntities uses name-LSH; this is the structural
    * alternative).
    *
    * Scale shape: candidates generate ONLY from co-occurrence — the
    * self-join is keyed by fact_id, and a fact holds at most
    * ChunkSize/MinEntityLen entities, so per-key fan-out is a small
    * constant (≤ ~17² here) and total candidate volume is linear in
    * facts — never |entities|² and never keyed by a hot entity. The
    * pair count and both degree joins are map-side-combining
    * hash-aggs on high-cardinality keys; |union| derives from the
    * inclusion-exclusion identity da + db − shared, so the union set
    * is never materialized. Float appears only in the final rounded
    * division (the h13 convention). */
  def h14EntityJaccard(spark: SparkSession, dir: String): DataFrame =
    entityJaccardPairs(edges(spark, dir)).orderBy("a", "b")

  /** The h14 kernel on an arbitrary (fact_id, entity) adjacency —
    * rows must be distinct per (fact, entity), as HippoGraph.edges
    * and HippoDb stores guarantee. Shared with
    * Graft.resolveEntities' structural candidate strategy, where
    * fact-set similarity proposes merge candidates that name-LSH
    * cannot see (a renamed entity shares facts, not tokens). */
  def entityJaccardPairs(e: DataFrame): DataFrame = {
    val deg = e.groupBy("entity").agg(count(lit(1)).as("deg"))
    val pairs = e.select(col("fact_id"), col("entity").as("a"))
      .join(e.select(col("fact_id"), col("entity").as("b")), "fact_id")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= MinSharedFacts)
    pairs
      .join(deg.select(col("entity").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("entity").as("b"), col("deg").as("db")), "b")
      .withColumn("jaccard",
        round(col("n_shared") / (col("da") + col("db") - col("n_shared")), 6))
      .filter(col("jaccard") >= MinJaccard)
      .select("a", "b", "n_shared", "jaccard")
  }

  /** h15: CO-OCCURRENCE PMI — pointwise mutual information per
    * entity pair, ln(n_shared · N / (da · db)) (Church & Hanks
    * 1990): h14's Jaccard asks "how much do these entities overlap",
    * PMI asks "is this overlap MORE than chance given how common
    * both are" — the association measure that stays meaningful when
    * degrees are wildly skewed (a rare pair sharing 2 of 3 facts
    * scores high; two stopword-like hub entities sharing hundreds
    * scores near 0). The edge-weighting signal for the h10/h11
    * graph algorithms and a collocation detector on the text side.
    *
    * Scale shape: identical to h14 (fact_id-keyed candidates,
    * map-side-combining degree/pair aggs) plus ONE scalar — the
    * distinct fact count — carried as a broadcast 1-row cross join
    * (the t12 lazy-total convention, never collected). The products
    * run in DOUBLE (bigint would overflow at corpus scale:
    * n_shared·N can pass 2⁶³ when N ~ 10¹²); both engines execute
    * the same IEEE ops in the same order, so round-6 compares
    * exactly. */
  def h15EntityPmi(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir)
    val n = e.select(countDistinct("fact_id").as("n_facts"))
    val deg = e.groupBy("entity").agg(count(lit(1)).as("deg"))
    val pairs = e.select(col("fact_id"), col("entity").as("a"))
      .join(e.select(col("fact_id"), col("entity").as("b")), "fact_id")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= MinSharedFacts)
    pairs
      .join(deg.select(col("entity").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("entity").as("b"), col("deg").as("db")), "b")
      .crossJoin(broadcast(n))
      .withColumn("pmi",
        round(log((col("n_shared").cast("double") * col("n_facts")) /
          (col("da").cast("double") * col("db"))), 6))
      .select("a", "b", "n_shared", "pmi")
      .orderBy("a", "b")
  }

  /** h16: CONNECTED COMPONENTS of the entity co-occurrence graph —
    * every entity labelled with its component's lexicographic-min
    * member, singletons their own label. The partition-of-the-graph
    * view beside h11's communities (LPA finds dense sub-groups
    * INSIDE a component; this finds the hard reachability islands —
    * disconnected knowledge-base fragments, per-domain shards).
    *
    * Scale shape: the pair relation is the h14 fact_id-keyed
    * candidate shape; the fixpoint is the ONE shared
    * min-label-propagation kernel (DedupQueries.connectedComponents:
    * pointer jumping, O(log diameter) rounds, per-round
    * localCheckpoint lineage cuts) — nothing iterates on the driver.
    * The oracle re-derives the same partition with a recursive CTE
    * (label-reachability closure + min per entity), so the
    * iterated-to-fixpoint kernel is for the first time ORACLE-pinned
    * end-to-end, not just spec'd. */
  def h16Components(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir)
    val pairs = e.select(col("fact_id"), col("entity").as("a"))
      .join(e.select(col("fact_id"), col("entity").as("b")), "fact_id")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val comp = DQ.connectedComponents(pairs)
      .withColumnsRenamed(Map("id" -> "entity", "comp" -> "component"))
    e.select("entity").distinct()
      .join(comp, Seq("entity"), "left")
      .select(col("entity"),
        coalesce(col("component"), col("entity")).as("component"))
      .orderBy("entity")
  }

  /** h17 dials: pivots (common neighbours) with degree above
    * [[AaHubCap]] are excluded from wedge generation — their per-wedge
    * weight is already ≤ 1/ln(cap) and their fan-out is deg², so the
    * cap is both the skew guard and a documented recall dial (weak
    * hub evidence is dropped, strong rare evidence kept — the
    * standard practice for Adamic-Adar at scale). [[AaMinScore]]
    * bounds the emitted pair set to predictions with real evidence
    * (≥ one rare witness or several weak ones), the h14 MinJaccard
    * convention. */
  val AaHubCap = 64L
  val AaMinScore = 0.5

  /** h17: LINK PREDICTION by Adamic-Adar — for entity pairs NOT yet
    * co-occurring in any fact, score = Σ_z 1/ln(deg(z)) over their
    * common neighbours z (Adamic & Adar 2003; Liben-Nowell &
    * Kleinberg 2003 established it as the strongest simple
    * common-neighbour predictor). The FORWARD-looking complement of
    * h14/h15: those score pairs that already share facts; this ranks
    * the missing edges a knowledge graph should expect next — which
    * entities an annotation pipeline will likely connect, which
    * retrieval expansions are structurally plausible. Rare shared
    * neighbours count more than hubs (1/ln damping), which is what
    * separates it from raw common-neighbour counting.
    *
    * Scale shape: wedges generate from the PIVOT side — g(z→a) ⋈
    * g(z→b) keyed by z — so per-key fan-out is deg(z)², bounded by
    * [[AaHubCap]]² through the hub exclusion (the d10/q15 guard
    * family: a celebrity entity would otherwise put a quadratic
    * wedge set on one join key; its evidence value per wedge is the
    * lowest in the graph, so the guard drops the least information
    * per row of any cap). Degree attach, pair agg and the
    * adjacency anti-join are all map-side-combining hash operations
    * on high-cardinality keys; the float sum appears only inside
    * bounded per-pair groups (the h10 precedent), rounded then
    * floored in the same order on both engines. */
  def h17AdamicAdar(spark: SparkSession, dir: String): DataFrame =
    adamicAdarPairs(edges(spark, dir), AaHubCap).orderBy("a", "b")

  /** The h17 kernel on an arbitrary (fact_id, entity) adjacency —
    * rows distinct per (fact, entity), the entityJaccardPairs
    * contract. `hubCap` exposed for the SkewCorpusSpec dial proof. */
  def adamicAdarPairs(e: DataFrame, hubCap: Long): DataFrame = {
    // g feeds deg, the capped wedge relation AND the adjacency
    // anti-join side; gw feeds both wedge sides — cache both so the
    // fact-keyed self-join + distinct runs once per action (r17, the
    // h12/h13 lesson; guide §2.4).
    val g = e.select(col("fact_id"), col("entity").as("src"))
      .join(e.select(col("fact_id"), col("entity").as("dst")), "fact_id")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
      .cache()
    val deg = g.groupBy("src").agg(count(lit(1)).as("deg"))
    val piv = deg.filter(col("deg") <= hubCap)
    val gw = g.join(piv, "src").cache()
    val wedges = gw.select(col("src").as("z"), col("dst").as("a"), col("deg"))
      .join(gw.select(col("src").as("z"), col("dst").as("b")), "z")
      .filter(col("a") < col("b"))
    val und = g.filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
    wedges.groupBy("a", "b")
      .agg(count(lit(1)).as("n_common"),
        round(sum(lit(1.0) / log(col("deg"))), 6).as("aa_score"))
      .join(und, Seq("a", "b"), "left_anti")
      .filter(col("aa_score") >= AaMinScore)
      .select("a", "b", "n_common", "aa_score")
  }

  /** h19: PERSONALIZED PageRank from the probe entities — the
    * graph-side relevance ranker retrieval stacks (GraphRAG-style)
    * use to expand context AROUND a query's entities, where h10's
    * global rank answers "important overall": teleport mass
    * restricts to the seed set S (rank = (1−d)·1[v∈S]/|S| +
    * d·Σ_{u→v} rank(u)/deg(u)), so score decays with graph distance
    * from the probes. Same per-round shape as h10 (edge-keyed
    * equi-join + map-side-combining agg); the seed relation is a
    * |S|-row broadcast; only touched entities carry rows, so the
    * frontier grows with the k-hop ball, never the node count. */
  def h19PersonalizedRank(spark: SparkSession, dir: String): DataFrame =
    personalizedRankOn(spark, edges(spark, dir), ProbeUnion)

  /** The h19 kernel on an arbitrary (fact_id, entity) adjacency with
    * caller-chosen seeds — SHARED with the facade's graph-boosted
    * retrieval (Graft.closestFactsGraphRanked), so the entry and the
    * facade cannot drift. */
  /** `release = false` (the h19 ENTRY's one-shot shape, the h10
    * precedent) returns the lazy iterative plan — auditable end to
    * end by the EXPLAIN needles. `release = true` is the
    * REPEATED-QUERY contract (Graft.closestFactsGraphRanked): the
    * result materializes via localCheckpoint (the d07 pointer-jump
    * precedent — it is the seeds' 3-hop ball, not k rows, so it
    * stays distributed) and g/deg unpersist in a finally block, so a
    * retrieval call no longer pins two fresh cached frames until
    * clearCache (ADVICE r9 — the annPq release contract). */
  def personalizedRankOn(spark: SparkSession, e: DataFrame,
      seedEntities: Seq[String], release: Boolean = false): DataFrame = {
    import spark.implicits._
    require(seedEntities.nonEmpty, "personalized rank needs >= 1 seed")
    val g = e.select(col("fact_id"), col("entity").as("src"))
      .join(e.select(col("fact_id"), col("entity").as("dst")), "fact_id")
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
      .cache()
    val deg = g.groupBy("src").agg(count(lit(1)).as("deg")).cache()
    // loop-invariant deg attach hoisted out of the rounds — the h10
    // change, same argument (join re-association, identical per-edge
    // contribution and summed multiset).
    val gd = g.join(deg, "src").cache()
    try {
      val tele = RankTeleport / seedEntities.length
      val seeds = seedEntities.toDF("entity")
        .withColumn("tele", lit(tele))
      var rank = seeds.select(col("entity"),
        (lit(1.0) / seedEntities.length).as("rank"))
      for (_ <- 0 until RankIters) {
        val contrib = gd.join(rank.withColumnRenamed("entity", "src"), "src")
          .groupBy(col("dst"))
          .agg(sum(col("rank") / col("deg")).as("c"))
          .withColumnRenamed("dst", "entity")
        rank = contrib.join(seeds, Seq("entity"), "full_outer")
          .select(col("entity"),
            (coalesce(col("tele"), lit(0.0)) +
              lit(RankDamping) * coalesce(col("c"), lit(0.0))).as("rank"))
      }
      val out = rank.select(col("entity"), round(col("rank"), 6).as("rank"))
        .filter(col("rank") > 0)
        .orderBy("entity")
      if (release) out.pinned else out
    } finally if (release) { g.unpersist(); deg.unpersist(); gd.unpersist() }
  }

  /** h18: DEGREE-DISTRIBUTION POWER-LAW FIT — is the entity graph
    * scale-free? Histogram n(d) of entity fact-degrees, then the
    * t18 machinery (regr_slope/regr_r2 builtins over ln n vs ln d):
    * slope ≈ −γ with high r² says hub-dominated (plan h10's damping
    * and h17's hub cap accordingly); flat/low-r² says homogeneous.
    * Two map-side-combining aggs (entity-keyed, then the tiny
    * degree-keyed histogram) + a scalar regression over ≤ max_degree
    * rows — nothing wider than h05 anywhere. */
  def h18DegreePowerlaw(spark: SparkSession, dir: String): DataFrame = {
    val deg = edges(spark, dir)
      .groupBy("entity").agg(countDistinct("fact_id").as("deg"))
    deg.groupBy("deg").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).cast("int").as("n_degrees"),
        sum("n").as("n_entities"),
        max("deg").as("max_degree"),
        round(regr_slope(log(col("n")), log(col("deg"))), 4).as("plaw_slope"),
        round(regr_r2(log(col("n")), log(col("deg"))), 4).as("plaw_r2"))
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "h19_personalized_rank" -> (h19PersonalizedRank _),
    "h18_degree_powerlaw" -> (h18DegreePowerlaw _),
    "h17_adamic_adar" -> (h17AdamicAdar _),
    "h16_components" -> (h16Components _),
    "h15_entity_pmi" -> (h15EntityPmi _),
    "h14_entity_jaccard" -> (h14EntityJaccard _),
    "h01_fact_entity_edges" -> (h01Edges _),
    "h02_entity_neighbours" -> (h02EntityNeighbours _),
    "h03_facts_union" -> (h03FactsUnion _),
    "h04_facts_intersection" -> (h04FactsIntersection _),
    "h05_entity_degree" -> (h05EntityDegree _),
    "h06_prune_lone_entities" -> (h06PruneLoneEntities _),
    "h07_integrity_check" -> (h07IntegrityCheck _),
    "h08_neighbour_facts" -> (h08NeighbourFacts _),
    "h09_khop_neighbours" -> (h09KhopNeighbours _),
    "h10_entity_rank" -> (h10EntityRank _),
    "h11_communities" -> (h11Communities _),
    "h12_path_bfs" -> (h12PathBfs _),
    "h13_triangles" -> (h13Triangles _))

  private val probeList = ProbeUnion.map(e => s"'$e'").mkString(", ")

  val oracles: Map[String, String] = Map(
    // h19: the same three PPR rounds unrolled; seed teleport via a
    // FULL JOIN per round (Spark's full_outer + coalesce, verbatim)
    "h19_personalized_rank" -> {
      val ns = ProbeUnion.length
      def round_(prev: String, out: String) =
        s"""c$out AS (SELECT g.dst AS entity, sum($prev.rank / deg.deg) AS c
           |      FROM g JOIN $prev ON g.src = $prev.entity
           |      JOIN deg ON g.src = deg.src GROUP BY g.dst),
           |$out AS (SELECT coalesce(c$out.entity, s.entity) AS entity,
           |        coalesce(s.tele, CAST(0 AS DOUBLE)) +
           |        CAST($RankDamping AS DOUBLE) * coalesce(c$out.c, CAST(0 AS DOUBLE)) AS rank
           |      FROM c$out FULL JOIN s ON c$out.entity = s.entity)""".stripMargin
      s"""WITH e AS ($edgesSql),
         |g AS (SELECT DISTINCT a.entity AS src, b.entity AS dst
         |      FROM e a JOIN e b ON a.fact_id = b.fact_id AND a.entity <> b.entity),
         |deg AS (SELECT src, count(*) AS deg FROM g GROUP BY src),
         |s AS (SELECT unnest([$probeList]) AS entity,
         |       CAST($RankTeleport AS DOUBLE) / $ns AS tele),
         |r0 AS (SELECT entity, CAST(1.0 AS DOUBLE) / $ns AS rank FROM s),
         |${round_("r0", "r1")},
         |${round_("r1", "r2")},
         |${round_("r2", "r3")}
         |SELECT entity, round(rank, 6) AS rank FROM r3
         |WHERE round(rank, 6) > 0 ORDER BY entity""".stripMargin
    },
    // h18: same histogram + the same ln/ln regression builtins
    "h18_degree_powerlaw" ->
      s"""WITH e AS ($edgesSql),
         |deg AS (SELECT entity, count(DISTINCT fact_id) AS deg FROM e GROUP BY entity),
         |h AS (SELECT deg, count(*) AS n FROM deg GROUP BY deg)
         |SELECT CAST(count(*) AS INT) AS n_degrees,
         |  CAST(sum(n) AS BIGINT) AS n_entities,
         |  max(deg) AS max_degree,
         |  round(regr_slope(ln(n), ln(deg)), 4) AS plaw_slope,
         |  round(regr_r2(ln(n), ln(deg)), 4) AS plaw_r2
         |FROM h""".stripMargin,
    // h17: same pivot-keyed wedge generation with the hub cap and
    // score floor mirrored; NOT EXISTS on the symmetric g relation =
    // the left-anti adjacency exclusion; round-then-floor in the
    // same order as the Spark side.
    "h17_adamic_adar" ->
      s"""WITH e AS ($edgesSql),
         |g AS (SELECT DISTINCT a.entity AS src, b.entity AS dst
         |      FROM e a JOIN e b ON a.fact_id = b.fact_id AND a.entity <> b.entity),
         |deg AS (SELECT src, count(*) AS deg FROM g GROUP BY src),
         |piv AS (SELECT src, deg FROM deg WHERE deg <= $AaHubCap),
         |w AS (SELECT g1.dst AS a, g2.dst AS b, p.deg
         |      FROM piv p JOIN g g1 ON g1.src = p.src JOIN g g2 ON g2.src = p.src
         |      WHERE g1.dst < g2.dst),
         |s AS (SELECT a, b, count(*) AS n_common,
         |        round(sum(1.0 / ln(deg)), 6) AS aa_score
         |      FROM w GROUP BY a, b)
         |SELECT a, b, n_common, aa_score FROM s
         |WHERE aa_score >= $AaMinScore
         |  AND NOT EXISTS (SELECT 1 FROM g WHERE g.src = s.a AND g.dst = s.b)
         |ORDER BY a, b""".stripMargin,
    // h16: label-reachability closure via WITH RECURSIVE (the d07
    // precedent): labels flow across symmetric co-occurrence edges,
    // UNION dedups, min per entity = the component's lexicographic
    // min — the same partition the Spark fixpoint computes.
    "h16_components" ->
      s"""WITH RECURSIVE e AS ($edgesSql),
         |pairs AS (SELECT DISTINCT e1.entity AS a, e2.entity AS b
         |          FROM e e1 JOIN e e2
         |            ON e1.fact_id = e2.fact_id AND e1.entity <> e2.entity),
         |reach(entity, label) AS (
         |  SELECT entity, entity FROM (SELECT DISTINCT entity FROM e)
         |  UNION
         |  SELECT p.a, r.label FROM reach r JOIN pairs p ON r.entity = p.b
         |  WHERE r.label < p.a)
         |SELECT entity, min(label) AS component FROM reach
         |GROUP BY entity ORDER BY entity""".stripMargin,
    // h15: same candidate/degree CTEs as h14; the ratio is computed
    // in the SAME IEEE op order as the Spark side (double·int
    // product each side, one division, then ln) so both engines
    // round identical doubles.
    "h15_entity_pmi" ->
      s"""WITH e AS ($edgesSql),
         |n AS (SELECT count(DISTINCT fact_id) AS n_facts FROM e),
         |deg AS (SELECT entity, count(*) AS deg FROM e GROUP BY entity),
         |p AS (SELECT e1.entity AS a, e2.entity AS b, count(*) AS n_shared
         |      FROM e e1 JOIN e e2 ON e1.fact_id = e2.fact_id AND e1.entity < e2.entity
         |      GROUP BY 1, 2 HAVING count(*) >= $MinSharedFacts)
         |SELECT a, b, n_shared,
         |  round(ln((CAST(n_shared AS DOUBLE) * n_facts) /
         |           (CAST(da.deg AS DOUBLE) * db.deg)), 6) AS pmi
         |FROM p JOIN deg da ON p.a = da.entity JOIN deg db ON p.b = db.entity
         |CROSS JOIN n
         |ORDER BY a, b""".stripMargin,
    // h14: inclusion-exclusion Jaccard over fact sets; DOUBLE cast
    // before the division (DuckDB int/int is DOUBLE, but explicit
    // beats depending on it), round-then-filter in the same order as
    // the Spark side.
    "h14_entity_jaccard" ->
      s"""WITH e AS ($edgesSql),
         |deg AS (SELECT entity, count(*) AS deg FROM e GROUP BY entity),
         |p AS (SELECT e1.entity AS a, e2.entity AS b, count(*) AS n_shared
         |      FROM e e1 JOIN e e2 ON e1.fact_id = e2.fact_id AND e1.entity < e2.entity
         |      GROUP BY 1, 2 HAVING count(*) >= $MinSharedFacts),
         |j AS (SELECT a, b, n_shared,
         |        round(CAST(n_shared AS DOUBLE) / (da.deg + db.deg - n_shared), 6) AS jaccard
         |      FROM p JOIN deg da ON p.a = da.entity JOIN deg db ON p.b = db.entity)
         |SELECT a, b, n_shared, jaccard FROM j
         |WHERE jaccard >= $MinJaccard
         |ORDER BY a, b""".stripMargin,
    "h01_fact_entity_edges" ->
      s"""SELECT fact_id, entity FROM ($edgesSql)
         |ORDER BY fact_id, entity""".stripMargin,
    "h02_entity_neighbours" ->
      s"""WITH e AS ($edgesSql)
         |SELECT e2.entity AS entity, count(DISTINCT e2.fact_id) AS n_shared_facts
         |FROM e e1 JOIN e e2 ON e1.fact_id = e2.fact_id
         |WHERE e1.entity = '$ProbeEntity' AND e2.entity <> '$ProbeEntity'
         |GROUP BY e2.entity
         |ORDER BY entity""".stripMargin,
    "h03_facts_union" ->
      s"""WITH e AS ($edgesSql), f AS ($factsSql)
         |SELECT fact_id, doc_id, fact_text FROM f
         |WHERE fact_id IN (SELECT fact_id FROM e WHERE entity IN ($probeList))
         |ORDER BY fact_id""".stripMargin,
    "h04_facts_intersection" ->
      s"""WITH e AS ($edgesSql), f AS ($factsSql)
         |SELECT fact_id, doc_id, fact_text FROM f
         |WHERE fact_id IN (
         |  SELECT fact_id FROM e WHERE entity IN ($probeList)
         |  GROUP BY fact_id HAVING count(DISTINCT entity) = ${ProbeUnion.size})
         |ORDER BY fact_id""".stripMargin,
    "h05_entity_degree" ->
      s"""WITH e AS ($edgesSql), f AS ($factsSql)
         |SELECT entity, count(DISTINCT e.fact_id) AS n_facts,
         |  count(DISTINCT f.doc_id) AS n_docs
         |FROM e JOIN f ON e.fact_id = f.fact_id
         |GROUP BY entity
         |ORDER BY entity""".stripMargin,
    "h06_prune_lone_entities" ->
      s"""SELECT entity FROM ($entityDimSql)
         |WHERE entity NOT IN (SELECT DISTINCT entity FROM ($edgesSql))
         |ORDER BY entity""".stripMargin,
    "h07_integrity_check" ->
      s"""WITH f AS ($factsSql),
         |  missing AS (SELECT fact_id FROM f WHERE fact_id % 10 = 7)
         |SELECT count(*) AS n_missing, min(fact_id) AS first_missing,
         |  max(fact_id) AS last_missing
         |FROM missing""".stripMargin,
    "h08_neighbour_facts" ->
      s"""WITH e AS ($edgesSql)
         |SELECT e2.entity AS entity,
         |  string_agg(DISTINCT e2.fact_id, ',' ORDER BY e2.fact_id) AS fact_ids
         |FROM e e1 JOIN e e2 ON e1.fact_id = e2.fact_id
         |WHERE e1.entity = '$ProbeEntity' AND e2.entity <> '$ProbeEntity'
         |GROUP BY e2.entity
         |ORDER BY entity""".stripMargin,
    "h09_khop_neighbours" ->
      s"""WITH e AS ($edgesSql),
         |f1 AS (SELECT DISTINCT fact_id FROM e WHERE entity = '$ProbeEntity'),
         |n1 AS (SELECT DISTINCT entity FROM e JOIN f1 USING (fact_id)
         |       WHERE entity <> '$ProbeEntity'),
         |f2 AS (SELECT DISTINCT fact_id FROM e WHERE entity IN (SELECT entity FROM n1)),
         |n2 AS (SELECT DISTINCT e.entity FROM e JOIN f2 USING (fact_id)
         |       WHERE entity <> '$ProbeEntity'
         |         AND entity NOT IN (SELECT entity FROM n1))
         |SELECT entity, CAST(1 AS INT) AS hops FROM n1
         |UNION ALL
         |SELECT entity, CAST(2 AS INT) AS hops FROM n2
         |ORDER BY hops, entity""".stripMargin,
    // h10: the SAME three power iterations unrolled; all arithmetic
    // forced to DOUBLE so both engines round the same values.
    "h10_entity_rank" ->
      s"""WITH e AS ($edgesSql),
         |g AS (SELECT DISTINCT a.entity AS src, b.entity AS dst
         |      FROM e a JOIN e b ON a.fact_id = b.fact_id AND a.entity <> b.entity),
         |deg AS (SELECT src, count(*) AS deg FROM g GROUP BY src),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
         |r0 AS (SELECT src AS entity, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM deg),
         |r1 AS (SELECT g.dst AS entity,
         |         CAST($RankTeleport AS DOUBLE) / (SELECT n FROM nn) +
         |         CAST($RankDamping AS DOUBLE) * sum(r0.rank / deg.deg) AS rank
         |       FROM g JOIN r0 ON g.src = r0.entity JOIN deg ON g.src = deg.src
         |       GROUP BY g.dst),
         |r2 AS (SELECT g.dst AS entity,
         |         CAST($RankTeleport AS DOUBLE) / (SELECT n FROM nn) +
         |         CAST($RankDamping AS DOUBLE) * sum(r1.rank / deg.deg) AS rank
         |       FROM g JOIN r1 ON g.src = r1.entity JOIN deg ON g.src = deg.src
         |       GROUP BY g.dst),
         |r3 AS (SELECT g.dst AS entity,
         |         CAST($RankTeleport AS DOUBLE) / (SELECT n FROM nn) +
         |         CAST($RankDamping AS DOUBLE) * sum(r2.rank / deg.deg) AS rank
         |       FROM g JOIN r2 ON g.src = r2.entity JOIN deg ON g.src = deg.src
         |       GROUP BY g.dst)
         |SELECT entity, round(rank, 6) AS rank FROM r3
         |ORDER BY entity""".stripMargin,
    // h11: the SAME three label-propagation rounds unrolled; the
    // row_number pick (cnt DESC, label ASC) is exactly Spark's
    // min(struct(-cnt, label)) argmax — pure strings/ints, so the
    // hash compare is float-free.
    "h11_communities" ->
      s"""WITH e AS ($edgesSql),
         |g AS (SELECT DISTINCT a.entity AS src, b.entity AS dst
         |      FROM e a JOIN e b ON a.fact_id = b.fact_id AND a.entity <> b.entity),
         |l0 AS (SELECT src AS entity, src AS label FROM (SELECT DISTINCT src FROM g)),
         |c1 AS (SELECT g.src, l0.label, count(*) AS cnt
         |       FROM g JOIN l0 ON g.dst = l0.entity GROUP BY 1, 2),
         |l1 AS (SELECT src AS entity, label FROM (
         |         SELECT src, label, row_number() OVER (
         |           PARTITION BY src ORDER BY cnt DESC, label) AS rn FROM c1)
         |       WHERE rn = 1),
         |c2 AS (SELECT g.src, l1.label, count(*) AS cnt
         |       FROM g JOIN l1 ON g.dst = l1.entity GROUP BY 1, 2),
         |l2 AS (SELECT src AS entity, label FROM (
         |         SELECT src, label, row_number() OVER (
         |           PARTITION BY src ORDER BY cnt DESC, label) AS rn FROM c2)
         |       WHERE rn = 1),
         |c3 AS (SELECT g.src, l2.label, count(*) AS cnt
         |       FROM g JOIN l2 ON g.dst = l2.entity GROUP BY 1, 2),
         |l3 AS (SELECT src AS entity, label FROM (
         |         SELECT src, label, row_number() OVER (
         |           PARTITION BY src ORDER BY cnt DESC, label) AS rn FROM c3)
         |       WHERE rn = 1)
         |SELECT entity, label AS community FROM l3
         |ORDER BY entity""".stripMargin,
    "h12_path_bfs" ->
      s"""WITH e AS ($edgesSql),
         |g AS (SELECT DISTINCT a.entity AS src, b.entity AS dst
         |      FROM e a JOIN e b ON a.fact_id = b.fact_id AND a.entity <> b.entity),
         |v0 AS (SELECT '$ProbeEntity' AS entity, 0 AS hops, '$ProbeEntity' AS path),
         |f1 AS (SELECT g.dst AS entity, 1 AS hops,
         |         min(v0.path || '>' || g.dst) AS path
         |       FROM g JOIN v0 ON g.src = v0.entity
         |       WHERE g.dst NOT IN (SELECT entity FROM v0) GROUP BY g.dst),
         |v1 AS (SELECT * FROM v0 UNION ALL SELECT entity, hops, path FROM f1),
         |f2 AS (SELECT g.dst AS entity, 2 AS hops,
         |         min(f1.path || '>' || g.dst) AS path
         |       FROM g JOIN f1 ON g.src = f1.entity
         |       WHERE g.dst NOT IN (SELECT entity FROM v1) GROUP BY g.dst),
         |v2 AS (SELECT * FROM v1 UNION ALL SELECT entity, hops, path FROM f2),
         |f3 AS (SELECT g.dst AS entity, 3 AS hops,
         |         min(f2.path || '>' || g.dst) AS path
         |       FROM g JOIN f2 ON g.src = f2.entity
         |       WHERE g.dst NOT IN (SELECT entity FROM v2) GROUP BY g.dst),
         |v3 AS (SELECT * FROM v2 UNION ALL SELECT entity, hops, path FROM f3)
         |SELECT entity, hops, path FROM v3
         |ORDER BY hops, entity""".stripMargin,
    // h13 oracle: plain id-ordered triangle join — the triangle SET
    // is orientation-independent, so it must equal the Spark side's
    // degree-ordered computation exactly.
    "h13_triangles" ->
      s"""WITH e AS ($edgesSql),
         |und AS (SELECT DISTINCT a.entity AS u, b.entity AS v
         |        FROM e a JOIN e b ON a.fact_id = b.fact_id AND a.entity < b.entity),
         |deg AS (SELECT entity, count(*) AS deg FROM (
         |          SELECT u AS entity FROM und UNION ALL SELECT v AS entity FROM und)
         |        GROUP BY 1),
         |tri AS (SELECT ab.u AS a, ab.v AS b, bc.v AS c
         |        FROM und ab JOIN und bc ON ab.v = bc.u
         |        JOIN und ac ON ac.u = ab.u AND ac.v = bc.v),
         |pv AS (SELECT entity, count(*) AS n_tri FROM (
         |         SELECT a AS entity FROM tri
         |         UNION ALL SELECT b AS entity FROM tri
         |         UNION ALL SELECT c AS entity FROM tri)
         |       GROUP BY 1)
         |SELECT deg.entity, deg.deg,
         |  CAST(coalesce(pv.n_tri, 0) AS BIGINT) AS n_tri,
         |  CASE WHEN deg.deg < 2 THEN 0.0
         |    ELSE round(coalesce(pv.n_tri, 0) * 2.0 / (deg.deg * (deg.deg - 1)), 6)
         |  END AS coeff
         |FROM deg LEFT JOIN pv USING (entity)
         |ORDER BY entity""".stripMargin)
}
