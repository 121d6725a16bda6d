package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated TPC-H-ish test data.
  *
  * At 100 TB these reads stay efficient because every query selects
  * columns explicitly (column pruning reaches the parquet scan) and
  * filters are plain `Column` predicates (pushed to the reader).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** events.ts is parquet TIMESTAMP(NANOS). How Spark surfaces that
    * column changed across versions, so the conversion is DTYPE-
    * CONDITIONAL rather than version-pinned:
    *
    *  - Spark ≤ 4.0: the vectorized reader rejects NANOS unless
    *    `spark.sql.legacy.parquet.nanosAsLong=true`, which reads the
    *    raw nanos as BIGINT → we floor-divide to micros (the same
    *    truncation DuckDB applies) and cast to TIMESTAMP_NTZ.
    *  - Spark 4.1+: NANOS reads natively as TIMESTAMP_NTZ (micros
    *    precision, nanos truncated — identical values to the DIV
    *    1000 path) and the legacy flag is ignored → use as-is.
    *
    * The flag is still set first (a no-op on 4.1+) because on older
    * Sparks it must be in effect at schema resolution. It is SESSION-
    * level and one-way, but behavior-neutral for every other table:
    * events is the sole nanos column in this layout. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts",
        org.apache.spark.sql.functions.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
