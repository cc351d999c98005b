package graft

import org.apache.spark.sql.SparkSession

/** r22 probe: time q_retrieval_e2e's construction phases to find where the
  * ~3 s goes (it is the most expensive non-deliberate query).  Runs the
  * gate twice (warm the second) and prints phase timings using the query's
  * own public seams. */
object RetrievalProbe22 {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q_retrieval_e2e")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[rprobe] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    (1 to 3).foreach { pass =>
      println(s"[rprobe] === pass $pass ===")
      t("whole query") {
        val df = SparkEntry.queries(q)(spark, sfDir)
        t("  action only")(df.queryExecution.toRdd.count())
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
