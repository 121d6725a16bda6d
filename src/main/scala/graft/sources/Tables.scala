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
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read nanos as long and floor-divide to micros
    * (same truncation DuckDB applies), yielding TIMESTAMP_NTZ.
    *
    * nanosAsLong is a SESSION-level flag (Spark has no per-read
    * option for it) consulted at execution, not just schema
    * resolution, so it cannot be restored after the read. Setting it
    * here is one-way but behavior-neutral for every other table: the
    * flag only changes how TIMESTAMP(NANOS) parquet columns read, and
    * events is the sole nanos table in this layout. Documented rather
    * than scoped — a save/restore would break this read's own
    * execution. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events").withColumn("ts",
      org.apache.spark.sql.functions.expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
