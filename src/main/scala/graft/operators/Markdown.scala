package graft.operators

import graft.model.{Document, Element, TableCell}

/** Rewrite all elements as one markdown blob in text_representation
  * (reference: lib/sycamore/sycamore/transforms/markdown.py:8,
  * utils/markdown.py). */
object Markdown {

  def toMarkdown(d: Document): Document = {
    val body = d.elements.sortBy(_.elementIndex).map(render).filter(_.nonEmpty).mkString("\n\n")
    d.withText(body).copy(elements = Nil)
  }

  private def render(e: Element): String = e.elementType.toLowerCase match {
    case "title"                      => s"# ${e.text}"
    case "section-header" | "header"  => s"## ${e.text}"
    case "list-item"                  => s"- ${e.text}"
    case "table" if e.tableCells.nonEmpty => renderTable(e.tableCells)
    case "image"                      => e.prop("caption").map(c => s"![image]($c)").getOrElse("")
    case "footnote" | "caption"       => s"*${e.text}*"
    case _                            => e.text
  }

  /** Cell matrix -> GitHub-style markdown table (spans flattened: a cell
    * repeats into each of its row/col slots, like reference Table.to_csv). */
  private[graft] def renderTable(cells: Seq[TableCell]): String = {
    if (cells.isEmpty) return ""
    val nRows = cells.flatMap(_.rows).max + 1
    val nCols = cells.flatMap(_.cols).max + 1
    val grid = Array.fill(nRows, nCols)("")
    for (c <- cells; r <- c.rows; k <- c.cols) grid(r)(k) = c.content
    val header = cells.exists(_.isHeader)
    val sb = new StringBuilder
    for ((row, i) <- grid.zipWithIndex) {
      sb.append(row.mkString("| ", " | ", " |")).append('\n')
      if (i == 0 && header) sb.append(Seq.fill(nCols)("---").mkString("| ", " | ", " |")).append('\n')
    }
    sb.toString.stripLineEnd
  }
}
