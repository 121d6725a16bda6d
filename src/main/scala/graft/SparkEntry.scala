package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AnalyticsQueries, CoreQueries, DedupQueries, ExtendedQueries, GraphQueries, MultimodalQueries, PipelineQueries, QualityQueries, SplitterQueries, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Hybrid retrieval is THE signature hippollm operation:
    * graph filter (facts containing probe entities) + vector ranking
    * (cosine top-k to the query embedding) in one declarative plan. */
  def entry(spark: SparkSession): DataFrame =
    VectorQueries.v03HybridUnion(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ GraphQueries.queries ++ VectorQueries.queries ++
      SplitterQueries.queries ++ TextQueries.queries ++ DedupQueries.queries ++
      MultimodalQueries.queries ++ ExtendedQueries.queries ++
      PipelineQueries.queries ++ AnalyticsQueries.queries ++
      QualityQueries.queries ++
      Map[String, (SparkSession, String) => DataFrame](
        "e02_kmeans" -> (graft.operators.KMeans.e02Kmeans _),
        "e03_cluster_sample" -> (graft.operators.KMeans.e03ClusterSample _),
        "e04_silhouette" -> (graft.operators.KMeans.e04Silhouette _),
        "v09_ann_pq" -> (graft.operators.Pq.v09AnnPq _),
        "v10_ann_ivfpq" -> (graft.operators.IvfPq.v10AnnIvfPq _),
        "v13_ann_sq8" -> (graft.operators.Sq.v13AnnSq _),
        "v14_ann_binary" -> (graft.operators.Bq.v14AnnBinary _),
        "t24_bpe_train" -> (graft.operators.Bpe.t24BpeTrain _),
        "t25_bpe_encode" -> (graft.operators.Bpe.t25BpeEncode _),
        "t28_shard_manifest" -> (graft.store.ShardWriter.t28ShardManifest _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ GraphQueries.oracles ++ VectorQueries.oracles ++
      SplitterQueries.oracles ++ TextQueries.oracles ++ DedupQueries.oracles ++
      MultimodalQueries.oracles ++ ExtendedQueries.oracles ++
      PipelineQueries.oracles ++ AnalyticsQueries.oracles ++
      QualityQueries.oracles ++
      Map("t25_bpe_encode" -> graft.operators.Bpe.t25OracleSql,
        "t28_shard_manifest" -> graft.store.ShardWriter.t28OracleSql)
}
