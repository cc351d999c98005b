package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.plan._

/** Algebraic laws of the plan layer (the reference only spot-checks these;
  * SURVEY §5 calls for property-based coverage). */
class PlanPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  /** A random linear plan: source -> a few unary ops. */
  private val genPlan: Gen[QPlan] = for {
    n <- Gen.choose(0, 4)
    ops <- Gen.listOfN(n, Gen.oneOf[Int => QNode](
      (id: Int) => QLimit(id, None, Nil, 10),
      (id: Int) => QSort(id, None, Nil, "properties.lang", descending = true, None),
      (id: Int) => QBasicFilter(id, None, Nil, "properties.lang", rangeFilter = false,
        Some(org.json4s.JString("en")), None, None, isDate = false),
      (id: Int) => QTopK(id, None, Nil, "properties.source", None, Some(3),
        descending = true, llmCluster = false, None),
      (id: Int) => QUnroll(id, None, Nil, "properties.source")))
  } yield {
    val source: QNode = QQueryDatabase(0, Some("src"), Nil, "documents", None)
    val nodes = ops.zipWithIndex.map { case (mk, i) =>
      (i + 1) -> QPlanJson.withMeta(mk(i + 1), i + 1, Seq(i))
    }.toMap + (0 -> source)
    QPlan("generated", nodes, nodes.keys.max)
  }

  test("JSON round-trip preserves logical equality, cache keys, validity") {
    check(Prop.forAll(genPlan) { p =>
      val p2 = QPlan.fromJson(p.toJson)
      p.validate(); p2.validate()
      p.logicalCompare(p2) && p.cacheKey(p.resultNode) == p2.cacheKey(p.resultNode)
    })
  }

  test("insertNode preserves validity, size, and source reachability") {
    check(Prop.forAll(genPlan, Gen.choose(1, 5)) { (p, at) =>
      val id = math.min(at, p.nodes.keys.max + 1)
      val inserted = p.insertNode(id, QLimit(id, None, Nil, 7))
      inserted.validate()
      def reachable(pl: QPlan, from: Int): Set[Int] =
        pl.node(from).inputs.toSet.flatMap((i: Int) => reachable(pl, i) + i)
      inserted.nodes.size == p.nodes.size + 1 &&
        (inserted.resultNode == 0 || reachable(inserted, inserted.resultNode).contains(0))
    })
  }

  test("cache keys ignore descriptions but track payload changes") {
    check(Prop.forAll(genPlan) { p =>
      val redescribed = QPlan(p.query, p.nodes.map { case (id, n) =>
        id -> QPlanJson.parseNode(QPlanJson.nodeJson(n) match {
          case org.json4s.JObject(fs) => org.json4s.JObject(
            fs.filterNot(_._1 == "description") :+
              ("description" -> org.json4s.JString("changed")))
          case other => other
        })
      }, p.resultNode)
      p.cacheKey(p.resultNode) == redescribed.cacheKey(p.resultNode)
    })
  }

  test("simhash chunking finds every pair within maxHamming (pigeonhole law)") {
    // pure-logic mirror of Dedup.simhashPairs bucketing: for random 64-bit
    // pairs at hamming distance d <= maxHamming, at least one derived chunk
    // must match (the recall guarantee the round-1 fixed chunking violated)
    check(Prop.forAll(Gen.choose(0L, Long.MaxValue), Gen.choose(0, 10),
        Gen.long) { (base, d, seed) =>
      val rnd = new scala.util.Random(seed)
      val flipped = (1 to d).foldLeft(base)((v, _) => v ^ (1L << rnd.nextInt(64)))
      val dActual = java.lang.Long.bitCount(base ^ flipped)
      val maxH = math.max(dActual, 1)
      val chunks = math.min(maxH + 1, 64)
      val widths = Array.tabulate(chunks)(q => 64 / chunks + (if (q < 64 % chunks) 1 else 0))
      val offsets = widths.scanLeft(0)(_ + _)
      def chunkVals(v: Long) = (0 until chunks).map(q =>
        (v >>> offsets(q)) & ((1L << widths(q)) - 1L))
      chunkVals(base).zip(chunkVals(flipped)).exists(p => p._1 == p._2)
    })
  }
}
