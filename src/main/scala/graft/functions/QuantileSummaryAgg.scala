package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * One-pass mergeable ε-approximate quantile summary (the
 * Greenwald-Khanna / "Mergeable Summaries" family, Agarwal et al.
 * PODS'12) as a TypedImperativeAggregate — the SKETCH path for
 * quantiles at 100 TB. The exact machinery elsewhere in this engine
 * (Packing.rankBins / Calibration.winsorize) pays a range-partition
 * exchange of every row; this summary reads each row once where it
 * sits and only k-entry sketches ride the shuffle — the right trade
 * when quantiles feed monitoring/heuristics rather than an oracle-
 * checked transform (which is why it is unit-bounded, not
 * DuckDB-gated: partial-aggregation merge ORDER is engine-scheduled,
 * so results are within-ε stable, not bit-stable).
 *
 * State: a rank-bounded coreset — sorted (value, rmin, rmax) triples.
 * Raw values buffer up to 2k then fold in (sorted batch = exact
 * summary); merge is the PODS'12 rule (combined rmin adds the
 * predecessor's rmin from the other side, rmax adds the successor's
 * rmax − 1) followed by a prune back to k + 1 entries at evenly spaced
 * target ranks, keeping global min/max exact. Each prune adds ≤ n/(2k)
 * rank error and merging preserves bounds, so with L merge levels the
 * rank error is ≤ L·n/(2k) — k = 256 at any realistic tree depth keeps
 * it well under 1% (asserted empirically in the spec).
 *
 * eval: values at the requested permille ranks (midpoint-rank nearest
 * entry), as array<long> aligned with `permilles`.
 */
case class QuantileSummaryAgg(child: Expression, k: Int, permilles: Seq[Int],
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummary] {

  require(k >= 16, s"k must be >= 16, got $k")
  require(permilles.nonEmpty && permilles.forall(p => p >= 0 && p <= 1000),
    s"permilles must lie in [0, 1000], got $permilles")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"quantile_summary needs bigint, got $other")
  }

  override def createAggregationBuffer(): QuantileSummary = new QuantileSummary(k)

  override def update(buf: QuantileSummary, input: InternalRow): QuantileSummary = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: QuantileSummary, b: QuantileSummary): QuantileSummary = {
    a.mergeWith(b); a
  }

  override def eval(buf: QuantileSummary): Any =
    new GenericArrayData(permilles.map(p => buf.query(p): Any).toArray)

  override def serialize(buf: QuantileSummary): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): QuantileSummary =
    QuantileSummary.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSummaryAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSummaryAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
  override def prettyName: String = "quantile_summary"
}

/** Mutable summary: sorted coreset + raw-value spill buffer. */
final class QuantileSummary(val k: Int) {
  // parallel arrays, sorted by value: entry i covers true ranks [rmin(i), rmax(i)]
  var values: Array[Long] = Array.emptyLongArray
  var rmin: Array[Long] = Array.emptyLongArray
  var rmax: Array[Long] = Array.emptyLongArray
  var n: Long = 0L
  private var buffer: Array[Long] = new Array[Long](2 * k)
  private var bufLen: Int = 0

  def add(v: Long): Unit = {
    buffer(bufLen) = v
    bufLen += 1
    n += 1
    if (bufLen == buffer.length) flush()
  }

  /** Sorted batch -> exact summary -> merge in. */
  def flush(): Unit = {
    if (bufLen == 0) return
    val batch = java.util.Arrays.copyOf(buffer, bufLen)
    java.util.Arrays.sort(batch)
    val br = Array.tabulate(bufLen)(i => (i + 1).toLong)
    mergeArrays(batch, br, br.clone())
    bufLen = 0
  }

  def mergeWith(o: QuantileSummary): Unit = {
    o.flush()
    flush()
    n += o.n
    mergeArrays(o.values, o.rmin, o.rmax)
  }

  /** PODS'12 combine of this coreset with another sorted coreset, then
    * prune back to k+1 entries. */
  private def mergeArrays(ov: Array[Long], ormin: Array[Long], ormax: Array[Long]): Unit = {
    if (ov.isEmpty) { prune(); return }
    if (values.isEmpty) { values = ov.clone(); rmin = ormin.clone(); rmax = ormax.clone(); prune(); return }
    val m = values.length + ov.length
    val mv = new Array[Long](m); val mrmin = new Array[Long](m); val mrmax = new Array[Long](m)
    var i = 0; var j = 0; var t = 0
    while (t < m) {
      val takeA = j >= ov.length || (i < values.length && values(i) <= ov(j))
      if (takeA) {
        // other-side predecessor's rmin; other-side successor's rmax - 1
        val predMin = if (j == 0) 0L else ormin(j - 1)
        val succMax = if (j < ov.length) ormax(j) - 1 else ormax(ov.length - 1)
        mv(t) = values(i); mrmin(t) = rmin(i) + predMin; mrmax(t) = rmax(i) + succMax
        i += 1
      } else {
        val predMin = if (i == 0) 0L else rmin(i - 1)
        val succMax = if (i < values.length) rmax(i) - 1 else rmax(values.length - 1)
        mv(t) = ov(j); mrmin(t) = ormin(j) + predMin
        mrmax(t) = ormax(j) + succMax
        j += 1
      }
      t += 1
    }
    values = mv; rmin = mrmin; rmax = mrmax
    prune()
  }

  /** Keep k+1 entries at evenly spaced target ranks (min/max exact). */
  private def prune(): Unit = {
    val m = values.length
    if (m <= k + 1) return
    val total = rmax(m - 1)
    val keep = new Array[Int](k + 1)
    var w = 0
    var last = -1
    var idx = 0
    var i = 0
    while (i <= k) {
      val target = if (i == 0) 1L else if (i == k) total else 1L + i.toLong * (total - 1) / k
      // advance to the first entry whose midpoint rank >= target
      while (idx < m - 1 && (rmin(idx) + rmax(idx)) / 2 < target) idx += 1
      if (idx != last) { keep(w) = idx; w += 1; last = idx }
      i += 1
    }
    val nv = new Array[Long](w); val nmin = new Array[Long](w); val nmax = new Array[Long](w)
    i = 0
    while (i < w) { nv(i) = values(keep(i)); nmin(i) = rmin(keep(i)); nmax(i) = rmax(keep(i)); i += 1 }
    values = nv; rmin = nmin; rmax = nmax
  }

  /** Value whose midpoint rank is nearest the permille target. */
  def query(permille: Int): Long = {
    flush()
    if (values.isEmpty) return 0L
    val target = 1L + permille.toLong * (n - 1) / 1000L
    var best = 0
    var bestD = Long.MaxValue
    var i = 0
    while (i < values.length) {
      val mid = (rmin(i) + rmax(i)) / 2
      val d = math.abs(mid - target)
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    values(best)
  }

  def toBytes: Array[Byte] = {
    flush()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(n)
    out.writeInt(values.length)
    var i = 0
    while (i < values.length) {
      out.writeLong(values(i)); out.writeLong(rmin(i)); out.writeLong(rmax(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }
}

object QuantileSummary {
  def fromBytes(k: Int, bytes: Array[Byte]): QuantileSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new QuantileSummary(k)
    s.n = in.readLong()
    val m = in.readInt()
    s.values = new Array[Long](m); s.rmin = new Array[Long](m); s.rmax = new Array[Long](m)
    var i = 0
    while (i < m) { s.values(i) = in.readLong(); s.rmin(i) = in.readLong(); s.rmax(i) = in.readLong(); i += 1 }
    s
  }
}
