package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.docset.{DocAggregation, DocSet}
import graft.model.Document

/** Aggregation contract: commutativity/associativity fuzz (the reference
  * enforces the same law by randomizing accumulate order in local mode,
  * transforms/aggregation.py:140-162) + grouped verbs. */
class AggregationSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  /** Sum of properties.v with count, like the reference's example aggs. */
  object SumAgg extends DocAggregation {
    override def zero: Document = Document.of("agg", properties = Map("sum" -> "0", "n" -> "0"))
    override def accumulate(acc: Document, doc: Document): Document = {
      val s = acc.prop("sum").get.toLong + doc.prop("v").map(_.toLong).getOrElse(0L)
      val n = acc.prop("n").get.toLong + 1
      acc.withProps("sum" -> s.toString, "n" -> n.toString)
    }
    override def combine(a: Document, b: Document): Document =
      a.withProps(
        "sum" -> (a.prop("sum").get.toLong + b.prop("sum").get.toLong).toString,
        "n" -> (a.prop("n").get.toLong + b.prop("n").get.toLong).toString)
    override def finish(acc: Document): Document =
      acc.withProp("avg",
        (acc.prop("sum").get.toDouble / math.max(1, acc.prop("n").get.toLong)).toString)
  }

  test("combine is commutative/associative under shuffled accumulate order (fuzz)") {
    val prop = Prop.forAll(Gen.listOfN(24, Gen.chooseNum(0L, 1000L)),
        Gen.chooseNum(1, 6)) { (vals: List[Long], pieces: Int) =>
      val docs = vals.zipWithIndex.map { case (v, i) =>
        Document.of(s"d$i", properties = Map("v" -> v.toString))
      }
      // straight fold
      val direct = SumAgg.finish(docs.foldLeft(SumAgg.zero)(SumAgg.accumulate))
      // random partition split + shuffled combine order
      val shuffled = scala.util.Random.shuffle(docs).grouped(
        math.max(1, docs.size / pieces)).toSeq
      val partials = scala.util.Random.shuffle(
        shuffled.map(_.foldLeft(SumAgg.zero)(SumAgg.accumulate)))
      val combined = SumAgg.finish(partials.reduce(SumAgg.combine))
      combined.prop("sum") == direct.prop("sum") && combined.prop("n") == direct.prop("n")
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("groupby.aggregate runs distributed with partial aggregation") {
    val docs = (0 until 20).map(i => Document.of(s"d$i",
      properties = Map("v" -> i.toString, "g" -> (i % 2).toString)))
    val out = DocSet.of(spark, docs)
      .groupby(_.prop("g").get)
      .aggregate(SumAgg)
      .takeAll()
    val byKey = out.map(d => d.prop("key").get -> d.prop("sum").get.toLong).toMap
    assert(byKey == Map("0" -> 90L, "1" -> 100L))
  }

  test("reduce is deterministic via doc_id sort; collect gathers group docs") {
    val docs = Seq(
      Document.of("c", text = "3"), Document.of("a", text = "1"), Document.of("b", text = "2"))
    val reduced = DocSet.of(spark, docs)
      .reduce(ds => Document.of("r", text = ds.map(_.text).mkString("|")), _ => "all")
      .takeAll()
    assert(reduced.head.text == "1|2|3")

    val collected = DocSet.of(spark, docs).groupby(_ => "g").collect().takeAll()
    assert(collected.head.elements.size == 3)
    assert(collected.head.elements.map(_.prop("doc_id").get).sorted == Seq("a", "b", "c"))
  }

  test("whole-docset aggregate") {
    val docs = (1 to 5).map(i => Document.of(s"d$i", properties = Map("v" -> i.toString)))
    val out = DocSet.of(spark, docs).aggregate(SumAgg).takeAll()
    assert(out.size == 1)
    assert(out.head.prop("sum").contains("15"))
    assert(out.head.prop("avg").contains("3.0"))
  }
}
