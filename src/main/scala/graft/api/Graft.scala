package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Embedder, HashEmbedder, NliModel, HeuristicNli, VectorFunctions}
import graft.operators.Splitters
import graft.store.HippoDb

/** User-facing facade — the complete hippollm surface, Spark-first.
  *
  * Reference mapping:
  *   annotate           ~ annotator.py:221 annotate() (batch, corpus-wide)
  *   closestFacts       ~ storage.py:266 get_closest_facts
  *   closestEntities    ~ storage.py:255 get_closest_entities
  *   neighbours         ~ storage.py:213 get_neighbours
  *   factsByEntities    ~ storage.py:286/299 union/intersection
  *   closestFactsWith   ~ storage.py:325/332 hybrid retrieval
  *   retrieve           ~ retrieval.py query loop (top-k + context)
  *
  * The embedding/NLI models are injected traits (deterministic stubs
  * by default — no model runtimes in this container); every query is
  * a declarative Spark plan: query vectors broadcast, corpus never
  * collected, top-k via TakeOrderedAndProject.
  */
final class Graft(
    spark: SparkSession,
    embedder: Embedder = new HashEmbedder(64),
    nli: NliModel = new HeuristicNli) extends Serializable {

  import VectorFunctions._

  /** Batch annotation: documents(doc_id, text) → graph+vector store.
    * Facts come from the recursive splitter (annotator.py's chunk
    * loop); entities from the long-word heuristic (LLM stub);
    * near-identical facts are deduplicated by NLI entailment against
    * their exact-duplicate group (the batch analog of
    * annotator.py:126 _compare_fact). */
  def annotate(docs: DataFrame, chunkSize: Int = 100): HippoDb = {
    import spark.implicits._
    val emb = embedder
    val facts = Splitters.recursiveDf(spark, docs, chunkSize)
      .select(
        // hash-derived: stable, collision-safe for ARBITRARY doc ids
        // (a doc_id*k+i scheme overflows for hash-derived doc ids)
        xxhash64(col("doc_id"), col("chunk_idx")).as("fact_id"),
        col("doc_id"), col("chunk_idx"),
        col("chunk").as("fact_text"), col("start"), col("end"))
    val edges = facts
      .select(col("fact_id"), explode(split(col("fact_text"), " ")).as("entity"))
      .filter(length(col("entity")) >= 5)
      .distinct()
    val entities = edges.select("entity").distinct()
    val factEmb = facts.select(col("fact_id"), col("fact_text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, emb.embed(t)) })
      .toDF("fact_id", "embedding")
    HippoDb(facts, edges, entities, factEmb)
  }

  /** annotate + NLI dedup-on-ingest (batch analog of annotator.py:126
    * _compare_fact): facts are blocked by a text prefix, and within a
    * block a fact entailed by an earlier-id fact is dropped (its
    * sources would merge onto the survivor in the reference). The NLI
    * call runs inside flatMapGroups — distributed, per-block. */
  def annotateDeduped(docs: DataFrame, chunkSize: Int = 100): HippoDb =
    annotateDedupedWithSources(docs, chunkSize)._1

  /** Like annotateDeduped, but also returns the SOURCES table
    * (fact_id, doc_id, start, end): every original fact — including
    * the dropped duplicates — contributes one source span, attached
    * to its surviving fact. This is storage.py:250 add_fact_source:
    * when the reference finds a fact already known, it appends the
    * new source to the existing fact instead of inserting. */
  def annotateDedupedWithSources(
      docs: DataFrame, chunkSize: Int = 100): (HippoDb, DataFrame) = {
    import spark.implicits._
    val full = annotate(docs, chunkSize)
    val nliLocal = nli
    // (survivor_id, original_id): identity rows for survivors, and a
    // redirect row for every dropped duplicate.
    val mapping = full.facts
      .select(col("fact_id"), col("fact_text"),
        substring(col("fact_text"), 1, 40).as("blk"))
      .as[(Long, String, String)]
      .groupByKey(_._3)
      .flatMapGroups { (_, it) =>
        val sorted = it.toSeq.sortBy(_._1)
        val survivors = scala.collection.mutable.ListBuffer.empty[(Long, String)]
        val out = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
        sorted.foreach { case (id, text, _) =>
          survivors.find { case (_, s) => nliLocal.entails(s, text) } match {
            case Some((sid, _)) => out += ((sid, id))
            case None => survivors += ((id, text)); out += ((id, id))
          }
        }
        out.iterator
      }
      .toDF("survivor_id", "original_id")
    val kept = mapping.filter(col("survivor_id") === col("original_id"))
      .select(col("survivor_id").as("fact_id"))
    val sources = mapping
      .join(full.facts.select(col("fact_id").as("original_id"),
        col("doc_id"), col("start"), col("end")), "original_id")
      .select(col("survivor_id").as("fact_id"), col("doc_id"), col("start"), col("end"))
    val db = HippoDb(
      facts = full.facts.join(kept, Seq("fact_id"), "left_semi"),
      edges = full.edges.join(kept, Seq("fact_id"), "left_semi"),
      entities = full.edges.join(kept, Seq("fact_id"), "left_semi")
        .select("entity").distinct(),
      factEmb = full.factEmb.join(kept, Seq("fact_id"), "left_semi"))
    (db, sources)
  }

  private def queryVec(text: String) =
    array(embedder.embed(text).map(x => lit(x.toDouble)): _*)

  /** Top-k facts by cosine to a natural-language query. */
  def closestFacts(db: HippoDb, query: String, k: Int = 5): DataFrame =
    db.factEmb
      .select(col("fact_id"), cosine6(toDouble(col("embedding")), queryVec(query)).as("cos"))
      .orderBy(col("cos").desc, col("fact_id"))
      .limit(k)
      .join(db.facts, "fact_id")
      .select("fact_id", "fact_text", "cos")
      .orderBy(col("cos").desc, col("fact_id"))

  /** Top-k entities by cosine of their name embedding. */
  def closestEntities(db: HippoDb, query: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    val emb = embedder
    val entEmb = db.entities.select(col("entity")).as[String]
      .mapPartitions(_.map(e => (e, emb.embed(e))))
      .toDF("entity", "embedding")
    entEmb.select(col("entity"), cosine6(toDouble(col("embedding")), queryVec(query)).as("cos"))
      .orderBy(col("cos").desc, col("entity"))
      .limit(k)
  }

  /** Entities sharing a fact with `entity`, with shared-fact counts. */
  def neighbours(db: HippoDb, entity: String): DataFrame = {
    val probe = db.edges.filter(col("entity") === entity).select(col("fact_id").as("pf"))
    db.edges.join(broadcast(probe), col("fact_id") === col("pf"))
      .filter(col("entity") =!= entity)
      .groupBy("entity").agg(countDistinct("fact_id").as("n_shared_facts"))
  }

  /** Facts involving ANY (union=true) or ALL of the given entities. */
  def factsByEntities(db: HippoDb, entities: Seq[String], union: Boolean = true): DataFrame = {
    val m = db.edges.filter(col("entity").isin(entities: _*))
    val ids =
      if (union) m.select("fact_id").distinct()
      else m.groupBy("fact_id").agg(countDistinct("entity").as("n"))
        .filter(col("n") === entities.size).select("fact_id")
    db.facts.join(ids, Seq("fact_id"), "left_semi")
  }

  /** Hybrid retrieval: top-k by cosine among facts passing the
    * entity filter (graph semi-join first, then vector scoring). */
  def closestFactsWithEntities(
      db: HippoDb, query: String, entities: Seq[String],
      union: Boolean = true, k: Int = 5): DataFrame = {
    val filtered = factsByEntities(db, entities, union).select("fact_id")
    db.factEmb.join(filtered, Seq("fact_id"), "left_semi")
      .select(col("fact_id"), cosine6(toDouble(col("embedding")), queryVec(query)).as("cos"))
      .orderBy(col("cos").desc, col("fact_id"))
      .limit(k)
      .join(db.facts, "fact_id")
      .select("fact_id", "fact_text", "cos")
      .orderBy(col("cos").desc, col("fact_id"))
  }

  /** retrieval.py's loop body: top-k facts + an answer-context blob
    * (the RAG prompt the reference would send to an LLM). */
  def retrieve(db: HippoDb, query: String, k: Int = 10): (DataFrame, String) = {
    val top = closestFacts(db, query, k)
    val context = top.collect() // k rows only — bounded by k, not corpus
      .map(r => s"- ${r.getAs[String]("fact_text")}").mkString("\n")
    (top, s"Facts:\n$context\nQuestion: $query")
  }

  /** NLI-based fact comparison (annotator.py:126): does an existing
    * fact entail the candidate? Used for dedup-on-ingest. */
  def entails(existing: String, candidate: String): Boolean =
    nli.entails(existing, candidate)
}
