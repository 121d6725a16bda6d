package graft
// Measurement harness for the DRIVER-RESIDENT serving model at the
// 10⁶-cell decade (VERDICT r16 #7, the ProfVec convention — not
// library surface): annIvfBatch's per-session driver loads — cell
// bounds (nCells × (dim+1) doubles), the explicit children index
// (nCells (grp, cell) rows), and the derived group bounds
// (O(cells × dim) driver arithmetic) — are measured at a SYNTHETIC
// artifact of the cell count a 100 TB corpus implies (10⁶ cells at
// ~250 members ≈ 2.5×10⁸ vectors per shard-group), so the ceiling is
// a number, not an extrapolation. Usage:
//   runMain graft.ProfModelLoad [nCells] [dim]
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

object ProfModelLoad {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    System.err.println(f"[profmodel] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
  }

  def main(args: Array[String]): Unit = {
    val nCells = args.headOption.map(_.toInt).getOrElse(1000000)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val k2 = 1000
    val k1 = (nCells + k2 - 1) / k2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("profmodel").toString
    t(s"synthesize bounds+children ($nCells cells, dim $dim, k1 $k1 x k2 $k2)") {
      spark.range(nCells)
        .select(col("id").cast("int").as("cluster"),
          transform(sequence(lit(0), lit(dim - 1)),
            j => (col("id") % 97 + j).cast("double") / 100.0).as("nc"),
          lit(0.25).as("rhat"))
        .repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/ivf_cellbounds")
      spark.range(nCells)
        .select((col("id") / k2).cast("int").as("grp"),
          col("id").cast("int").as("cell"))
        .repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/ivf_children")
    }
    val coarse = Array.fill(k1)(new Array[Double](dim))
    val children = t(s"loadChildrenIndex ($nCells rows -> $k1 groups)") {
      graft.store.VectorIndex.loadChildrenIndex(spark, dir, nCells, coarse)
    }
    val (means, radii) = t(s"loadCellBoundArrays ($nCells x (dim+1) doubles)") {
      graft.store.VectorIndex.loadCellBoundArrays(spark, dir, nCells)
    }
    val (gm, gr) = t(s"groupBoundsFromCells (driver arithmetic, $nCells x $dim)") {
      graft.operators.VectorQueries.groupBoundsFromCells(children, means, radii)
    }
    val rt = Runtime.getRuntime
    System.err.println(s"[profmodel] resident: children=${children.length} groups, " +
      s"means=${means.count(_ != null)} cells, groupBounds=${gm.count(_ != null)}, " +
      s"radii sample=${radii.take(2).mkString(",")} gr=${gr.take(2).mkString(",")}, " +
      f"heapUsed=${(rt.totalMemory - rt.freeMemory) / 1e9}%.1f GB")
    spark.stop()
  }
}
