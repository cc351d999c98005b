package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Layout, ZValueExpr}

/** Z-order layout: interleave correctness, codegen/interpreted agreement,
  * determinism, and the actual point — parquet footer min/max stats prune
  * most files under a multi-dimensional box predicate. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("ZValueExpr interleaves bits; clamps null, negative, and overflow") {
    // 2 cols, 4 bits: col0 -> even bit positions, col1 -> odd
    assert(ZValueExpr.compute(Array(0L, 0L), 4) == 0L)
    assert(ZValueExpr.compute(Array(1L, 0L), 4) == 1L)
    assert(ZValueExpr.compute(Array(0L, 1L), 4) == 2L)
    assert(ZValueExpr.compute(Array(15L, 15L), 4) == 255L)
    assert(ZValueExpr.compute(Array(0x5L, 0x3L), 4) == ((1L << 0) | (1L << 3) | (1L << 1) | (1L << 4)))
    // monotone-ish locality: close buckets give close z prefixes
    assert(ZValueExpr.compute(Array(-7L, 2L), 4) == ZValueExpr.compute(Array(0L, 2L), 4), "negative clamps to 0")
    assert(ZValueExpr.compute(Array(16L, 0L), 4) == 0L, "overflow keeps low bits")
    // 3 cols
    assert(ZValueExpr.compute(Array(1L, 1L, 1L), 2) == 7L)

    // codegen path (DataFrame eval) matches the static compute
    val df = Seq((3L, 9L), (12L, 5L), (0L, 15L)).toDF("a", "b")
      .withColumn("z", Layout.zvalueCol(Seq(col("a"), col("b")), 4))
    val got = df.select("a", "b", "z").as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == ZValueExpr.compute(Array(a, b), 4)) }
    // null bucket behaves as 0
    val withNull = Seq((Some(3L), Option.empty[Long])).toDF("a", "b")
      .withColumn("z", Layout.zvalueCol(Seq(col("a"), col("b")), 4))
      .select("z").as[Long].head()
    assert(withNull == ZValueExpr.compute(Array(3L, 0L), 4))
  }

  test("zvalue is a deterministic pure function of the data") {
    val df = spark.range(2000).select(
      concat(lit("id"), col("id")).as("k"),
      (col("id") * 37 % 1000).as("x"),
      (col("id") * 91 % 1000).as("y"))
    def run() = Layout.zvalue(df, Seq("x", "y"), "k", bits = 6)
      .select("k", "zvalue").as[(String, Long)].collect().toMap
    val a = run(); val b = run()
    assert(a == b, "same data -> same z-values, any partitioning")
    assert(a.values.max < (1L << 12) && a.values.min >= 0L)
  }

  /** Files whose footer min/max on BOTH x and y intersect the box. */
  private def filesMatchingBox(dir: String, lo: Long, hi: Long): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val files = fs.listStatus(new Path(dir)).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet"))
    var matching = 0
    files.foreach { p =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        val blocks = reader.getFooter.getBlocks
        import scala.jdk.CollectionConverters._
        val hit = blocks.asScala.exists { b =>
          def overlaps(colName: String): Boolean = {
            val c = b.getColumns.asScala.find(_.getPath.toDotString == colName).get
            val st = c.getStatistics
            val mn = st.genericGetMin.asInstanceOf[java.lang.Long]
            val mx = st.genericGetMax.asInstanceOf[java.lang.Long]
            mx >= lo && mn < hi
          }
          overlaps("x") && overlaps("y")
        }
        if (hit) matching += 1
      } finally reader.close()
    }
    (matching, files.length)
  }

  test("z-ordered parquet prunes a 2-D box predicate via footer stats; random layout cannot") {
    val base = Files.createTempDirectory("graft_zorder").toString
    // two independent uniform dims — the layout-hostile case for plain sort
    val df = spark.range(20000).select(
      concat(lit("id"), col("id")).as("k"),
      (col("id") * 7919 % 1000).as("x"),
      (col("id") * 104729 % 1000).as("y"))

    df.repartition(16, col("k")).write.mode("overwrite").parquet(s"$base/random")
    Layout.zorderWrite(df, Seq("x", "y"), "k", s"$base/zorder", bits = 8, numFiles = 16)

    // content identical — layout is the only thing that changed
    val back = spark.read.parquet(s"$base/zorder")
    assert(back.count() == 20000)
    assert(back.select("k", "x", "y").exceptAll(df).isEmpty &&
      df.exceptAll(back.select("k", "x", "y")).isEmpty)

    // 10% x 10% box: x,y in [100, 200)
    val (randHit, randTotal) = filesMatchingBox(s"$base/random", 100L, 200L)
    val (zHit, zTotal) = filesMatchingBox(s"$base/zorder", 100L, 200L)
    assert(randTotal == 16 && zTotal == 16)
    assert(randHit >= 14, s"hash layout files span the full range (got $randHit/16)")
    assert(zHit <= 6, s"z-order should confine the box to few files (got $zHit/16)")
    assert(zHit >= 1, "the box rows exist somewhere")
  }
}
