package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r22 probe: how much of q_moments' aggregate is the decimal(38,0) power
  * sums? Times the real decimal formulation against a LONG-only stand-in
  * (inexact for s3/s4 — ceiling measurement only, never shipped). */
object MomentsProbe22 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag").as("g"),
        (round(col("l_extendedprice") * 100)).cast("long").as("v"))
    li.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    def t(name: String)(f: => Unit): Unit = (1 to 4).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"[mprobe] $name iter $i ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val dec = "decimal(38,0)"
    val vd = col("v").cast(dec)
    t("decimal s1..s4") {
      li.groupBy(col("g")).agg(count(lit(1)), sum(vd),
        sum(vd * vd).cast(dec), sum(vd * vd * vd).cast(dec),
        sum(vd * vd * vd * vd).cast(dec))
        .queryExecution.toRdd.count(); ()
    }
    val vl = col("v")
    t("long s1..s4 (inexact)") {
      li.groupBy(col("g")).agg(count(lit(1)), sum(vl),
        sum(vl * vl), sum(vl * vl * vl), sum(vl * vl * vl * vl))
        .queryExecution.toRdd.count(); ()
    }
    spark.stop()
  }
}
