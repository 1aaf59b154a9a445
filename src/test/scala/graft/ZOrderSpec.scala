package graft

import graft.functions.ZOrder
import org.apache.spark.sql.functions._

/** The morton Column expression must match the JVM reference bit for
  * bit, and the z-ordered layout must actually prune: for a band
  * predicate on either dimension, far fewer files overlap than under a
  * single-column sort.
  */
class ZOrderSpec extends SparkSpec {

  test("morton16 Column expression matches the JVM reference on a bit-heavy grid") {
    import spark.implicits._
    // corners, alternating patterns, and a deterministic pseudo-random walk
    val vals = Seq(0L, 1L, 2L, 3L, 0x5555L, 0xAAAAL, 0xFFFFL, 0x8000L, 0x7FFFL) ++
      (0 until 64).map(i => ((i * 2654435761L) >>> 7) & 0xFFFFL)
    val pairs = for (a <- vals; b <- vals) yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.morton16(col("a"), col("b")).as("z"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) === ZOrder.morton16Ref(a, b), s"morton16($a, $b)")
    }
  }

  test("morton16 interleaves: (x, 0) and (0, x) occupy disjoint bit lanes") {
    for (x <- Seq(1L, 0x00FFL, 0xFFFFL, 0x1234L)) {
      val even = ZOrder.morton16Ref(x, 0)
      val odd = ZOrder.morton16Ref(0, x)
      assert((even & 0xAAAAAAAAL) === 0L) // a-lanes are the even bits
      assert((odd & 0x55555555L) === 0L)  // b-lanes are the odd bits
      assert((even | odd) === ZOrder.morton16Ref(x, x))
    }
  }

  test("z-order layout prunes band predicates on both dimensions; linear layout only on its own") {
    import spark.implicits._
    // synthetic uniform grid so the rectangles have room to matter
    val n = 1 << 14
    val grid = (0 until n).map { i =>
      val u = (i * 2654435761L >>> 5) & 0x0FFFL
      val d = (i * 40503L >>> 3) & 0x0FFFL
      (i.toLong, u, d)
    }.toDF("id", "u16", "d16")

    val nFiles = 16
    // Deterministic layout: exact ntile bucketing over the sort key
    // (a sampling-based repartitionByRange draws boundaries from a
    // reservoir seeded by the RDD id, so the rectangles — and the
    // overlap counts below — shifted with suite execution order). The
    // single-partition window is fine at 2^14 rows, and the
    // partitionBy write keeps a real parquet write/read in the loop
    // with exactly nFiles pruning units.
    def fileRects(df: org.apache.spark.sql.DataFrame,
                  order: org.apache.spark.sql.Column): Array[(Long, Long, Long, Long)] = {
      import org.apache.spark.sql.expressions.Window
      val dir = java.nio.file.Files.createTempDirectory("graft-zspec").toString
      // id tiebreak: the grid formulas can collide, and ntile over a
      // tied order would otherwise bucket tied rows arbitrarily
      df.withColumn("bucket", ntile(nFiles).over(Window.orderBy(order, col("id"))))
        .write.mode("overwrite").partitionBy("bucket").parquet(dir)
      val rects = spark.read.parquet(dir)
        .groupBy("bucket")
        .agg(min("u16").as("mu"), max("u16").as("xu"),
             min("d16").as("md"), max("d16").as("xd"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val root = new org.apache.hadoop.fs.Path(dir)
      root.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(root, true)
      rects
    }

    val zRects = fileRects(
      grid.withColumn("z", ZOrder.morton16(col("u16"), col("d16"))), col("z"))
    val dRects = fileRects(grid, col("d16"))
    assert(zRects.length === nFiles && dRects.length === nFiles)

    // band predicate u16 in [1024, 1279) — 1/16 of the u domain
    def uOverlap(rects: Array[(Long, Long, Long, Long)]): Int =
      rects.count { case (mu, xu, _, _) => xu >= 1024 && mu < 1280 }
    // the d-sorted layout knows nothing about u: every file overlaps
    assert(uOverlap(dRects) === nFiles)
    // the z layout confines u per file: at most half the files survive
    assert(uOverlap(zRects) <= nFiles / 2,
      s"z layout pruned too little: ${uOverlap(zRects)}/$nFiles files overlap")

    // and the z layout still prunes its co-dimension d too
    def dOverlap(rects: Array[(Long, Long, Long, Long)]): Int =
      rects.count { case (_, _, md, xd) => xd >= 1024 && md < 1280 }
    assert(dOverlap(zRects) <= nFiles / 2,
      s"z layout should also prune d bands: ${dOverlap(zRects)}/$nFiles files overlap")
  }
}
