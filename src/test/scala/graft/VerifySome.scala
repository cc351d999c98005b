package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Subset correctness dump for fast iteration (test scope only — the
  * driver-facing dump stays graft.Verify). Dumps only the NAMED queries and
  * a filtered oracle_sql.json so tools/check_oracle.py checks just those.
  * Usage:
  *   sbt "Test/runMain graft.VerifySome q_tfidf q_rrf_fusion"
  *   python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_some
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01), VERIFY_OUT (default /tmp/verify_some).
  */
object VerifySome {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = sys.env.getOrElse("VERIFY_OUT", "/tmp/verify_some")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = new java.io.File(outDir)
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
    dir.mkdirs()
    args.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val dynamic = try SparkEntry.oracleSqlDynamic(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify-some] dynamic oracles failed: ${e.getMessage}")
        Map.empty[String, String]
      }
    val json = (SparkEntry.oracleSql ++ dynamic).filter(kv => args.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
