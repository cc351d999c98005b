package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra-Gries frequent-items sketch as a TypedImperativeAggregate — the
 * distributed heavy-hitters primitive (Misra & Gries 1982; merge rule from
 * Agarwal et al., "Mergeable Summaries", PODS'12).
 *
 * Guarantee: with capacity m, every item whose true frequency exceeds
 * N/(m+1) is present in the final sketch — under arbitrary partitioning
 * and merge order, because the merge (counter-wise sum, then subtract the
 * (m+1)-th largest count and drop <= 0) preserves the per-item
 * undercount bound (<= N/(m+1)) additively. So a two-pass heavy-hitters
 * query (sketch -> candidate set -> exact recount of candidates only) is
 * EXACT: the sketch can never lose a true heavy hitter, and the recount
 * discards any false positives. See HeavyHitters.topTokens.
 *
 * State is a bounded hash map (m entries max), merged tree-wise by Spark's
 * partial aggregation — the whole corpus is never shuffled, only m-entry
 * sketches. Returns array<string> of surviving items (candidates).
 */
case class MisraGriesAgg(child: Expression, capacity: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"misra_gries needs string, got $other")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow)
      : mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    // UTF8String buffers are reused by unsafe rows — materialize a String key
    MisraGries.add(buf, v.asInstanceOf[UTF8String].toString, capacity)
    buf
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything, drop <= 0
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      decrementAll(a, cut)
    }
    a
  }

  private def decrementAll(buf: mutable.HashMap[String, Long], by: Long): Unit =
    MisraGries.decrementAll(buf, by)

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keys.toArray.sorted.map(UTF8String.fromString(_): Any))

  // length-prefixed raw UTF-8, not writeUTF: writeUTF throws on keys whose
  // encoding exceeds 64 KB, and uncurated corpora DO contain single
  // unbroken >64KB tokens (base64 blobs, minified JS)
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "misra_gries"
}

/** The Misra-Gries update discipline, shared by the batch aggregate above
  * and the streaming heavy-hitters state (DocStream.heavyHittersStream). */
object MisraGries {

  /** Count if tracked, insert if room, else decrement every counter. */
  def add(buf: mutable.HashMap[String, Long], key: String, capacity: Int): Unit =
    buf.get(key) match {
      case Some(c) => buf.update(key, c + 1)
      case None =>
        if (buf.size < capacity) buf.update(key, 1L)
        else decrementAll(buf, 1L)
    }

  def decrementAll(buf: mutable.HashMap[String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    buf.foreach { case (k, c) => if (c - by <= 0) dead += k else buf.update(k, c - by) }
    dead.foreach(buf.remove)
  }
}
