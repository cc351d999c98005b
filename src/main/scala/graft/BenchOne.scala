package graft

import org.apache.spark.sql.SparkSession

/** Micro-bench: run ONE named query from SparkEntry.queries N times and
  * print per-iteration seconds — for settling regressions where the full
  * bench's single shot sits inside its own noise band.
  *
  * usage: runMain graft.BenchOne <queryName> [iters=5]
  * env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: BenchOne <query> [iters]"))
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val times = (1 to iters).map { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).queryExecution.toRdd.count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[benchone] $name iter $i: $t%.3f s ($n rows)")
      t
    }
    // first iteration absorbs JIT ramp; report tail stats too
    val tail = if (times.size > 1) times.tail else times
    println(f"[benchone] $name min=${times.min}%.3f median=${tail.sorted.apply(tail.size / 2)}%.3f (n=$iters)")
    spark.stop()
  }
}
