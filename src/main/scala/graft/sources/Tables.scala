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
    *    raw nanos as BIGINT → we FLOOR-divide to micros (the same
    *    floor truncation DuckDB's epoch_us and Spark 4.1's native
    *    read apply — `DIV` alone truncates toward zero, which would
    *    diverge by 1us on pre-1970 timestamps with sub-micro nanos)
    *    and cast to TIMESTAMP_NTZ. The floor is computed in integer
    *    arithmetic, not FLOOR(ts/1000.0): nanos exceed 2^53, so the
    *    double round-trip would lose precision.
    *  - Spark 4.1+: NANOS reads natively as TIMESTAMP_NTZ (micros
    *    precision, nanos floor-truncated — identical values to the
    *    legacy path) and the legacy flag is ignored → use as-is.
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
        org.apache.spark.sql.functions.expr(
          // integer floor division: ts DIV 1000, minus 1 when a
          // negative ts has a nonzero remainder (toward-zero → floor)
          "CAST(timestamp_micros((ts DIV 1000) - CASE WHEN ts < 0 AND ts % 1000 != 0 THEN 1 ELSE 0 END) AS TIMESTAMP_NTZ)"))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
