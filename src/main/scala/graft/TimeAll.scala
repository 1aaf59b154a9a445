package graft
object TimeAll {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("time-all")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch { case e: Throwable => println(s"$name ERROR ${e.getMessage.take(100)}"); -1L }
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%8.2fs $n%8d rows")
    }
    spark.stop()
  }
}
