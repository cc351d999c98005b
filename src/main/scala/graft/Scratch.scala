package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.gf

object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"TIMER $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    val shingled = docs.select(col("doc_id").as("_id"),
        explode(array_distinct(gf.wordShingles(col("text"), 5))).as("_sh"))
      .repartition(col("_sh"))
    time("shingled")(println("shingles=" + shingled.count()))
    val freq = shingled.groupBy("_sh").agg(count(lit(1)).as("_freq"))
      .where(col("_freq") <= 1000).select("_sh")
    time("freq")(freq.count())
    val filtered = shingled.join(freq, Seq("_sh"), "left_semi")
    time("filtered")(filtered.count())
    val a = filtered.select(col("_sh"), col("_id").as("idA"))
    val b = filtered.select(col("_sh"), col("_id").as("idB"))
    val shared = a.join(b, Seq("_sh")).where(col("idA") < col("idB"))
      .groupBy("idA", "idB").agg(count(lit(1)).as("_shared"))
    time("shared")(println("pairs=" + shared.count()))
    time("full")(graft.dedup.Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
