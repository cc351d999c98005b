package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

/** Proof that bucketed layout removes the join shuffle (the 100 TB
  * fact-fact join pattern): both sides bucketed on the key -> SortMergeJoin
  * with no Exchange operator in the plan. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  import spark.implicits._

  test("bucketed-bucketed join plans without an Exchange") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = (0 until 1000).map(i => (i.toLong % 100, s"order$i"))
        .toDF("custkey", "order_info")
      val customers = (0 until 100).map(i => (i.toLong, s"cust$i"))
        .toDF("custkey", "cust_info")
      Bucketing.writeBucketed(orders, "bkt_orders", "custkey", 8)
      Bucketing.writeBucketed(customers, "bkt_customers", "custkey", 8)

      val joined = Bucketing.cogroupJoin(spark, "bkt_orders", "bkt_customers", "custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)

      // contrast: the same join over unbucketed data shuffles both sides
      val unbucketed = orders.join(customers, Seq("custkey"))
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_customers")
    }
  }
}
