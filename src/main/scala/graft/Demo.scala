package graft

import org.apache.spark.sql.SparkSession

/** Example driver for the user-facing facade: annotate a corpus, run
  * the retrieval surface, and show that the native dot-product
  * expression participates in the physical plan.
  *
  * Usage: runMain graft.Demo [sfDir]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val api = new graft.api.Graft(spark)
    val db = api.annotate(graft.sources.Tables.documents(spark, dir))
    println(s"[demo] store: ${db.facts.count()} facts, ${db.entities.count()} entities")

    println("[demo] closestFacts('spark window join', k=3):")
    api.closestFacts(db, "spark window join", 3).show(3, truncate = 60)

    println("[demo] hybrid closestFactsWithEntities(query='stream', entities=[window]):")
    api.closestFactsWithEntities(db, "stream", Seq("window"), union = true, k = 3)
      .show(3, truncate = 60)

    val (_, prompt) = api.retrieve(db, "stream processing", 2)
    println(s"[demo] RAG prompt:\n${prompt.linesIterator.take(4).mkString("\n")}")

    val deduped = api.annotateDeduped(graft.sources.Tables.documents(spark, dir))
    println(s"[demo] annotateDeduped: ${deduped.facts.count()} facts kept of ${db.facts.count()}")

    val tmp = java.nio.file.Files.createTempDirectory("demo_corpus")
    java.nio.file.Files.writeString(tmp.resolve("c.jsonl"),
      """{"text": "loaded via jsonl", "lang": "en"}
        |{"text": "second jsonl row"}""".stripMargin)
    val loaded = graft.sources.Loaders.loadJsonl(spark, s"$tmp/*.jsonl")
    println(s"[demo] loadJsonl: ${loaded.count()} docs, schema ${loaded.columns.mkString(",")}")

    val (_, centroids, inertias) = graft.operators.KMeans.fit(spark,
      graft.sources.Tables.embeddings(spark, dir)
        .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v"),
      k = 4, iters = 3)
    println(s"[demo] kmeans: ${centroids.length} centroids, inertia ${inertias.map(i => f"$i%.1f").mkString(" -> ")}")

    // Streaming ingest: documents arriving as files -> incremental store
    val inDir = java.nio.file.Files.createTempDirectory("stream_in")
    val storeDir = java.nio.file.Files.createTempDirectory("stream_store").toString
    val docsStream = spark.readStream
      .option("wholetext", "true").text(inDir.toString)
      .selectExpr("abs(xxhash64(input_file_name())) AS doc_id", "value AS text")
    val sq = graft.streaming.StreamOps.annotateStream(spark, docsStream, api, storeDir)
    java.nio.file.Files.writeString(inDir.resolve("d1.txt"), "stream one arrives with window and spark words")
    sq.processAllAvailable()
    java.nio.file.Files.writeString(inDir.resolve("d2.txt"), "stream two arrives later with stream batch words")
    sq.processAllAvailable()
    sq.stop()
    val streamed = graft.store.HippoDb.load(spark, storeDir)
    println(s"[demo] streaming ingest: ${streamed.facts.count()} facts from 2 file arrivals, integrity=${streamed.integrity}")

    val d = spark.sql("SELECT graft_dot(array(1.0d,2.0d), array(3.0d,4.0d)) AS d").head().getDouble(0)
    println(s"[demo] SQL graft_dot(1,2 · 3,4) = $d")
    val arityErr = try { spark.sql("SELECT graft_dot(array(1.0d))"); "NO ERROR" }
      catch { case e: Exception => e.getMessage.linesIterator.next().take(80) }
    println(s"[demo] graft_dot wrong arity -> $arityErr")

    val plan = graft.operators.DedupQueries
      .d05EmbedNeardup(spark, dir).queryExecution.executedPlan.toString
    println(s"[demo] d05 WholeStageCodegen spans: ${"WholeStageCodegen".r.findAllIn(plan).length}")
    println(s"[demo] d05 plan uses native dotproduct: ${plan.toLowerCase.contains("dotproduct")}")

    // The end-to-end curation pipeline + the native NFC expression
    val curated = graft.operators.PipelineQueries.p01CurationPipeline(spark, dir)
    println(s"[demo] p01 curation pipeline survivors: ${curated.count()} docs")
    val folded = spark.sql("SELECT graft_nfc('Cafe\u0301') = 'Caf\u00e9' AS ok").head().getBoolean(0)
    println(s"[demo] SQL graft_nfc folds decomposed accents: $folded")
    spark.stop()
  }
}
