package graft

import org.apache.spark.sql.SparkSession

/** One-off phase timing for the q_nlq_* gates (verdict r5, What's wrong #4):
  * separates DataFrame CONSTRUCTION (planner + validation + fake-LLM round
  * trips + executor lowering) from EXECUTION (the Catalyst job). */
object NlqPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("q_nlq_topk", "q_nlq_summarize").foreach { name =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.toRdd.count()
        val t2 = System.nanoTime()
        println(f"[nlq] $name run$i construct=${(t1-t0)/1e9}%.3f execute=${(t2-t1)/1e9}%.3f")
      }
    }
    spark.stop()
  }
}
