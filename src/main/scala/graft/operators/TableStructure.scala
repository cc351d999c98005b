package graft.operators

import graft.model.{Bbox, TableCell}

/** One detected table on a page: the structured cell grid, the covered
  * region, and the indices (into the provider's input) of the text blocks
  * the table consumed — so the caller can replace exactly those blocks. */
final case class TableRegion(bbox: Option[Bbox], cells: Seq[TableCell],
                             blockIdx: Seq[Int])

/**
 * Pluggable table-structure recognition for PDFs (reference:
 * lib/sycamore/sycamore/transforms/table_structure/extract.py — the
 * TableTransformer model stack; detr_partitioner.py:779 wires it into the
 * Aryn partitioner). Model inference is plugin I/O, not engine: this trait
 * is the same contract as OcrProvider/LlmClient/Embedder — the engine
 * hands over one PAGE's text blocks (text + bbox in normalized top-down
 * page coordinates, reading order) and an implementation returns
 * structured TableRegions. Implementations MUST be Serializable and
 * per-call pure: the engine invokes them inside partition-parallel maps
 * with no cross-document state, so table extraction scales like every
 * other per-row operator at 100 TB (model weights load once per executor
 * via lazy init in the implementation, never per document).
 */
trait TableStructureProvider extends Serializable {

  /** Detect table structure among one page's text blocks. Returned
    * regions must have disjoint `blockIdx` sets. */
  def detect(blocks: Seq[(String, Option[Bbox])], pageNo: Int): Seq[TableRegion]
}

/**
 * Deterministic geometric baseline (no model): detects grids from bbox
 * alignment alone. Rows are maximal y-overlap bands (interval merge over
 * the blocks' vertical extents); each band's column structure is its
 * clustered set of LEFT edges; a table is a maximal run of >= minRows
 * consecutive bands sharing one column-left set of >= minCols columns.
 * Left-edge alignment (not x-range overlap) is the signal because real
 * cells vary in width — a wide cell's range overlaps its neighbor column,
 * but left edges stay put. Blocks landing in the same (band, column) cell
 * concatenate in (y, x) order — multi-line cell content folds into one
 * TableCell, the same tolerance the HTML table parser applies to
 * implied-close rows.
 *
 * This is the honest offline half of the seam: a production deployment
 * plugs a TableTransformer-backed provider into the SAME trait, exactly
 * like OcrProvider's model-backed implementations.
 */
final class GeomTableProvider(colTol: Double = 0.02,
                              minRows: Int = 2,
                              minCols: Int = 2) extends TableStructureProvider {
  require(colTol > 0 && minRows >= 2 && minCols >= 2,
    s"bad GeomTableProvider config: colTol=$colTol minRows=$minRows minCols=$minCols")

  private final case class Blk(idx: Int, text: String, box: Bbox)

  override def detect(blocks: Seq[(String, Option[Bbox])],
                      pageNo: Int): Seq[TableRegion] = {
    val bs = blocks.zipWithIndex.collect {
      case ((t, Some(b)), i) if t.trim.nonEmpty => Blk(i, t, b)
    }
    if (bs.size < minRows * minCols) return Nil
    // 1. y-bands: interval merge over vertical extents, top-down
    val sorted = bs.sortBy(b => (b.box.y1, b.box.x1, b.idx))
    val bands = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Blk]]()
    var bandMaxY = Double.NegativeInfinity
    sorted.foreach { b =>
      if (bands.nonEmpty && b.box.y1 <= bandMaxY) {
        bands.last += b
        bandMaxY = math.max(bandMaxY, b.box.y2)
      } else {
        bands += scala.collection.mutable.ArrayBuffer(b)
        bandMaxY = b.box.y2
      }
    }
    // 2. per-band column lefts (clustered within colTol, ascending)
    def lefts(band: Seq[Blk]): Seq[Double] = {
      val xs = band.map(_.box.x1).sorted
      val out = scala.collection.mutable.ArrayBuffer[Double]()
      xs.foreach { x => if (out.isEmpty || x - out.last > colTol) out += x }
      out.toSeq
    }
    val bandLefts = bands.map(b => lefts(b.toSeq))
    def compatible(a: Seq[Double], b: Seq[Double]): Boolean =
      a.size == b.size && a.size >= minCols &&
        a.zip(b).forall { case (x, y) => math.abs(x - y) <= colTol }
    // 3. maximal runs of compatible consecutive bands
    val out = scala.collection.mutable.ArrayBuffer[TableRegion]()
    var i = 0
    while (i < bands.length) {
      var j = i
      while (j + 1 < bands.length && compatible(bandLefts(j), bandLefts(j + 1))) j += 1
      if (j - i + 1 >= minRows && bandLefts(i).size >= minCols) {
        val cols = bandLefts(i)
        def colOf(b: Blk): Int = {
          val k = cols.lastIndexWhere(l => b.box.x1 >= l - colTol)
          if (k < 0) 0 else k
        }
        val cells = scala.collection.mutable.ArrayBuffer[TableCell]()
        val used = scala.collection.mutable.ArrayBuffer[Int]()
        (i to j).zipWithIndex.foreach { case (bi, r) =>
          bands(bi).toSeq.groupBy(colOf).toSeq.sortBy(_._1).foreach { case (c, blks) =>
            val ordered = blks.sortBy(b => (b.box.y1, b.box.x1, b.idx))
            cells += TableCell(
              content = ordered.map(_.text.trim).mkString(" "),
              rows = Array(r), cols = Array(c), isHeader = false,
              bbox = Some(ordered.map(_.box).reduce(_ union _)))
            used ++= ordered.map(_.idx)
          }
        }
        val bbox = (i to j).flatMap(bands(_)).map(_.box).reduce(_ union _)
        out += TableRegion(Some(bbox), cells.toSeq, used.toSeq.sorted)
        i = j + 1
      } else i += 1
    }
    out.toSeq
  }
}
