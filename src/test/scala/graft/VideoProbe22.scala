package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** r22 probe: per-stage timing of q_video_e2e's action (the union arms),
  * over the same persisted frames the gate uses. Ceiling measurement only —
  * identifies which arm dominates the ~3.3 s warm action. */
object VideoProbe22 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val vc = graft.operators.VideoCorpus
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), vc.bytesCol(col("doc_id")).as("bytes"))
      .persist(lvl)
    val frames = graft.operators.VideoOps
      .frames(corpus, "doc_id", "bytes", everyN = vc.SampleEvery)
      .persist(lvl)
    val dec = frames
      .select(col("doc_id"), col("fidx"), col("frame"),
        graft.operators.MediaOps.dHash(col("frame")).as("dhash"))
      .where(col("dhash").isNotNull)
      .persist(lvl)
    def t(name: String)(f: => Unit): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime(); f
      println(f"[vprobe] $name%-16s iter $i ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    t("corpus count") { corpus.agg(count(lit(1))).queryExecution.toRdd.count(); () }
    t("frames count") { frames.agg(count(lit(1)), count_distinct(col("doc_id"))).queryExecution.toRdd.count(); () }
    t("dec count") { dec.agg(count(lit(1)), count_distinct(col("dhash"))).queryExecution.toRdd.count(); () }
    t("cuts") {
      graft.operators.VideoOps.sceneCuts(dec, "doc_id", "fidx", "dhash", threshold = vc.CutThreshold)
        .agg(coalesce(sum(col("is_cut")), lit(0L)), coalesce(sum(col("hamming").cast("long")), lit(0L)))
        .queryExecution.toRdd.count(); ()
    }
    val sigs = graft.operators.VideoOps.bitMajoritySignature(dec, "doc_id", "dhash").persist(lvl)
    t("sigs") { sigs.agg(count(lit(1)), count_distinct(col("signature"))).queryExecution.toRdd.count(); () }
    t("pairs") {
      graft.operators.VideoOps.videoNearDupPairs(sigs, "doc_id", "signature", maxHamming = 6)
        .agg(count(lit(1)), coalesce(sum(col("hamming").cast("long")), lit(0L)))
        .queryExecution.toRdd.count(); ()
    }
    // cardinality diagnostics for the pairs join
    println(s"[vprobe] n_docs=${corpus.count()} n_frames=${frames.count()} " +
      s"n_sigs=${sigs.count()} n_distinct_sigs=${sigs.select(col("signature")).distinct().count()}")
    val grouped = sigs.groupBy(col("signature")).agg(count(lit(1)).as("c"))
    grouped.orderBy(col("c").desc).limit(10).collect()
      .foreach(r => println(s"[vprobe] hot sig ${r.getLong(0)} x ${r.getLong(1)}"))
    val pairsDf = graft.operators.VideoOps.videoNearDupPairs(sigs, "doc_id", "signature", maxHamming = 6)
    println(s"[vprobe] n_pairs=${pairsDf.count()}")
    val plan = pairsDf.queryExecution.executedPlan.toString
    println("[vprobe] pairs plan ops: " + plan.linesIterator
      .map(_.trim.dropWhile(c => !c.isLetter).takeWhile(c => c.isLetterOrDigit))
      .filter(_.nonEmpty).toSeq.groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy(-_._2).take(18).mkString(", "))
    val w = new java.io.PrintWriter("/tmp/vpairs_plan.txt"); w.println(plan); w.close()
    t("keyframe hist") {
      dec.withColumn("_rn", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("fidx"))))
        .where(col("_rn") === 1)
        .select(col("doc_id"), graft.operators.MediaOps.colorHistogramCol(col("frame")).as("emb"))
        .queryExecution.toRdd.count(); ()
    }
    spark.stop()
  }
}
