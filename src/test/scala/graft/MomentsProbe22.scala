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
    // mixed: v^2 multiplied in LONG (exact: v<=1.1e7 cents so v^2<=1.2e14),
    // decimal only where a per-row product tops int64 (s3, s4) and for the
    // overflow-prone SUMS — same integer summands, bit-identical results
    val wd = (col("v") * col("v")).cast(dec)
    t("mixed long/dec s1..s4") {
      li.groupBy(col("g")).agg(count(lit(1)), sum(vd),
        sum(wd).cast(dec), sum(wd * vd).cast(dec),
        sum(wd * wd).cast(dec))
        .queryExecution.toRdd.count(); ()
    }
    // ols shape: x = epoch days (<=1.2e4), y = cents (<=1.1e7) — ALL cross
    // products fit long per row; decimal enters only at the sums
    val ols = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag").as("g"),
        expr("DATEDIFF(CAST(l_shipdate AS DATE), DATE '1970-01-01')").cast("long").as("x"),
        (round(col("l_extendedprice") * 100)).cast("long").as("y"))
    ols.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    val xd = col("x").cast(dec); val yd = col("y").cast(dec)
    t("ols decimal") {
      ols.groupBy(col("g")).agg(count(lit(1)), sum(xd), sum(yd),
        sum(xd * yd).cast(dec), sum(xd * xd).cast(dec), sum(yd * yd).cast(dec))
        .queryExecution.toRdd.count(); ()
    }
    t("ols long products") {
      ols.groupBy(col("g")).agg(count(lit(1)), sum(xd), sum(yd),
        sum((col("x") * col("y")).cast(dec)).cast(dec),
        sum((col("x") * col("x")).cast(dec)).cast(dec),
        sum((col("y") * col("y")).cast(dec)).cast(dec))
        .queryExecution.toRdd.count(); ()
    }
    spark.stop()
  }
}
