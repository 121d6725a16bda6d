package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udaf

/** Session-level SQL registration for the typed aggregators, so plain
  * `spark.sql` users get the sketches too (the codegen expressions —
  * graft_dot — register through GraftExtensions instead, which
  * injects at session build; udaf registration needs a live session).
  *
  *   SqlFunctions.register(spark)
  *   spark.sql("SELECT graft_hll(user_id) FROM events")
  */
object SqlFunctions {
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_hll", udaf(new HllSketch(12)))
  }
}
