package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scale-conditional scan parallelization (r18, VERDICT r17 #1).
  *
  * Small-SF inputs arrive as ONE parquet split, which serializes an
  * expensive map stage (64-hash MinHash signatures, tokenize passes,
  * cell hashing, all-pairs scoring) on a single core. r17 fixed that
  * with an UNCONDITIONAL round-robin repartition(defaultParallelism)
  * — scale-unsafe: a 100 TB scan already yields ~800k 128 MB splits,
  * and repartitioning DOWN to cluster-core count would force the
  * whole corpus through one full-width exchange into ~50 GB
  * partitions (guide §2.2/§5: guaranteed spill, and the keyless
  * repartition additionally pays a per-task sort).
  *
  * The conditional: probe the input's physical partition count and
  * repartition ONLY when it is below defaultParallelism. For the
  * scan-shaped inputs these sites feed (FileSourceScan /
  * LocalTableScan plus narrow projections) the probe plans the query
  * but runs no job — the partition count comes from the (cached)
  * file listing. An input whose plan is AQE-wrapped (i.e. contains
  * exchanges) is left alone outright: its upstream shuffle already
  * spread the rows, and probing it would materialize query stages.
  */
object Par {

  /** `df` repartitioned round-robin to defaultParallelism when its
    * scan yields fewer partitions; `df` itself (same reference — no
    * plan change) otherwise. */
  def ensureParallelism(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    df.queryExecution.executedPlan match {
      case _: AdaptiveSparkPlanExec => df
      case _ if df.queryExecution.toRdd.getNumPartitions < p =>
        df.repartition(p)
      case _ => df
    }
  }
}
