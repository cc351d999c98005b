package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: where does q_groupby_count_unique's 0.66s go (vs r1's 0.23s)?
  * Times the raw scan, the exact plan, and candidate reshapes at sf0.1. */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def time(name: String)(f: => Unit): Unit = {
      (1 to 2).foreach(_ => f) // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s median=${ts.sorted.apply(2)}%.3fs runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("scan 2 cols") {
      li.select("l_returnflag", "l_orderkey").queryExecution.toRdd.count(); ()
    }
    time("current countDistinct") {
      li.groupBy(col("l_returnflag").as("key"))
        .agg(countDistinct(col("l_orderkey")).as("count"))
        .orderBy(col("key")).queryExecution.toRdd.count(); ()
    }
    time("two-stage distinct+count") {
      li.select(col("l_returnflag").as("key"), col("l_orderkey")).distinct()
        .groupBy(col("key")).agg(count(lit(1)).as("count"))
        .orderBy(col("key")).queryExecution.toRdd.count(); ()
    }
    time("count_distinct partkey") {
      li.agg(countDistinct(col("l_partkey")).as("cnt")).queryExecution.toRdd.count(); ()
    }
    time("shuffle.partitions=8 variant") {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      li.groupBy(col("l_returnflag").as("key"))
        .agg(countDistinct(col("l_orderkey")).as("count"))
        .orderBy(col("key")).queryExecution.toRdd.count()
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    li.groupBy(col("l_returnflag").as("key"))
      .agg(countDistinct(col("l_orderkey")).as("count"))
      .orderBy(col("key")).explain("formatted")
    spark.stop()
  }
}
