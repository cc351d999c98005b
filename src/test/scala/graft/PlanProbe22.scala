package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r22 probe (test scope): print the physical plan of ONE PageRank round's
  * two joins — the final gate plan hides them behind the per-round
  * localCheckpoints, so join strategy / sort claims need this to be
  * auditable. Mirrors PageRank.run's round body over the q_pagerank edges. */
object PlanProbe22 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    val edges = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(col("l_suppkey").as("s"), col("o_custkey").as("d"))
    // one round, PageRank.run's shape; PR_MODE=persist caches e/nodes
    // (InMemoryTableScan preserves outputPartitioning) instead of
    // localCheckpoint (LogicalRDD reports UnknownPartitioning in 4.1)
    val persistMode = sys.env.get("PR_MODE").contains("persist")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def pin(df: org.apache.spark.sql.DataFrame) =
      if (persistMode) df.persist(lvl) else df.localCheckpoint()
    val e0 = edges.select(col("s").as("_s"), col("d").as("_d")).distinct()
    val outdeg = e0.groupBy(col("_s")).agg(count(lit(1)).as("_deg"))
    val e = pin(e0.join(outdeg, Seq("_s")).repartition(col("_s")))
    val nodes = pin(e.select(col("_s").as("_n")).union(e.select(col("_d").as("_n")))
      .distinct())
    val scores = nodes.select(col("_n"), lit(1000000L).as("_score"))
      .localCheckpoint()
    val hint = sys.env.get("PR_HINT") // e.g. "shuffle_hash"
    val scoresJ = hint.foldLeft(scores.withColumnRenamed("_n", "_s"))(_ hint _)
    val contrib = e
      .join(scoresJ, Seq("_s"))
      .select(col("_d"), (col("_score") / col("_deg")).cast("long").as("_c"))
      .groupBy(col("_d")).agg(sum(col("_c")).as("_in"))
    val contribJ = hint.foldLeft(contrib.withColumnRenamed("_d", "_n"))(_ hint _)
    val next = nodes
      .join(contribJ, Seq("_n"), "left")
      .select(col("_n"), coalesce(col("_in"), lit(0L)).as("_score"))
    println("=== one-round plan (hint=" + hint.getOrElse("none") + ") ===")
    println(next.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
