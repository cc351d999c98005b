package graft

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of named gate queries (test scope;
  * used to audit shuffle/join choices at sf0.01). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
        .toString.linesIterator.take(60).mkString("\n"))
    }
    spark.stop()
  }
}
