package graft.docset

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.model.Document

/**
 * Generic document aggregation contract, identical in shape to the
 * reference's Aggregation{zero_factory, accumulate, combine, finalize}
 * (reference: lib/sycamore/sycamore/transforms/aggregation.py:14-253) and to
 * Spark's Aggregator[IN, BUF, OUT] — zero/reduce/merge/finish.
 *
 * `combine` MUST be commutative and associative: shuffle order is
 * nondeterministic (the reference asserts the same contract by randomizing
 * accumulate order in local mode, aggregation.py:140-162; our ScalaCheck
 * spec fuzzes it the same way).
 *
 * The reference's `reduce` (groupwise fn over all docs, sorted by doc_id for
 * determinism, aggregation.py:221) is on GroupedDocSet.reduce — implemented
 * with mapGroups, which streams each group.
 */
trait DocAggregation extends Serializable {
  def zero: Document
  def accumulate(acc: Document, doc: Document): Document
  def combine(a: Document, b: Document): Document
  def finish(acc: Document): Document
}

object DocAggregation {
  implicit val docEncoder: Encoder[Document] = Encoders.product[Document]

  /** Lift the contract into a Spark typed Aggregator — hash-aggregated with
    * map-side partial aggregation (the reference's block-level accumulate,
    * aggregation.py:65, is the same idea but without codegen). */
  def toAggregator(agg: DocAggregation): Aggregator[Document, Document, Document] =
    new Aggregator[Document, Document, Document] {
      override def zero: Document = agg.zero
      override def reduce(b: Document, a: Document): Document = agg.accumulate(b, a)
      override def merge(b1: Document, b2: Document): Document = agg.combine(b1, b2)
      override def finish(reduction: Document): Document = agg.finish(reduction)
      override def bufferEncoder: Encoder[Document] = docEncoder
      override def outputEncoder: Encoder[Document] = docEncoder
    }
}
