package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Document
import graft.operators.{FakeOcrProvider, PdfPartitioner, PdfText}

/** Scanned-PDF OCR fallback: the pluggable OcrProvider contract
  * (reference: transforms/detr_partitioner.py's DETR+OCR stack is a model
  * service; here the engine-side plumbing is tested with the deterministic
  * fake — image XObject extraction, element assembly, provenance, and the
  * partitionAuto wiring). */
class OcrSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  /** Minimal image-only PDF: one page, one JPEG-ish image XObject, a content
    * stream that only paints the image — no BT..ET text layer at all. */
  private def scannedPdf(imageBytes: Array[Byte]): Array[Byte] = {
    val content = "q 612 0 0 792 0 0 cm /Im1 Do Q".getBytes("ISO-8859-1")
    ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /XObject << /Im1 4 0 R >> >> /Contents 5 0 R >> endobj\n" +
      "4 0 obj << /Subtype /Image /Width 8 /Height 8 /BitsPerComponent 8 " +
      "/ColorSpace /DeviceRGB /Filter /DCTDecode /Length " + imageBytes.length +
      " >>\nstream\n").getBytes("ISO-8859-1") ++
      imageBytes ++
      ("\nendstream\nendobj\n" +
        "5 0 obj << /Length " + content.length + " >>\nstream\n").getBytes("ISO-8859-1") ++
      content ++ "\nendstream\nendobj\ntrailer\n%%EOF".getBytes("ISO-8859-1")
  }

  private val fakeJpeg: Array[Byte] =
    Array(0xff, 0xd8, 0xff, 0xe0, 1, 2, 3, 4, 5, 6, 7, 8, 0xff, 0xd9).map(_.toByte)

  test("imageStreams finds image XObjects, skips content streams") {
    val pdf = scannedPdf(fakeJpeg)
    val imgs = PdfText.imageStreams(pdf)
    assert(imgs.size == 1)
    assert(imgs.head.sameElements(fakeJpeg))
  }

  test("image-only PDF yields zero elements without OCR, elements via the fake") {
    val doc = Document.of("scan.pdf").copy(binaryRepresentation = Some(scannedPdf(fakeJpeg)))
    assert(new PdfPartitioner().partition(doc).elements.isEmpty,
      "no text layer, no provider -> no elements (the pre-OCR behavior)")

    val out = new PdfPartitioner(Some(new FakeOcrProvider(regionsPerImage = 2)))
      .partition(doc)
    assert(out.elements.size == 2)
    assert(out.elements.map(_.elementIndex) == Seq(0, 1))
    out.elements.foreach { e =>
      assert(e.prop("ocr").contains("true"))
      assert(e.prop("page_number").contains("1"))
      assert(e.prop("page_number_approximate").contains("true"))
      assert(e.bbox.isDefined)
    }
    // deterministic: same bytes -> same text, pinned shape
    val again = new PdfPartitioner(Some(new FakeOcrProvider(regionsPerImage = 2)))
      .partition(doc)
    assert(again.elements.map(_.text) == out.elements.map(_.text))
    assert(out.elements.head.text.startsWith("ocr:p1:r0:"))
  }

  test("text-layer PDFs never invoke OCR even when a provider is present") {
    val content = "BT /F1 12 Tf 1 0 0 1 50 700 Tm (Real text here) Tj ET".getBytes("ISO-8859-1")
    val pdf = ("%PDF-1.4\n1 0 obj << /MediaBox [0 0 600 800] >> endobj\n" +
      "2 0 obj << /Length " + content.length + " >>\nstream\n").getBytes("ISO-8859-1") ++
      content ++ "\nendstream\nendobj\ntrailer\n%%EOF".getBytes("ISO-8859-1")
    val doc = Document.of("text.pdf").copy(binaryRepresentation = Some(pdf))
    val out = new PdfPartitioner(Some(new FakeOcrProvider())).partition(doc)
    assert(out.elements.size == 1)
    assert(out.elements.head.text == "Real text here")
    assert(out.elements.head.prop("ocr").isEmpty)
  }

  test("partitionAuto routes scanned PDFs through the provider") {
    val doc = Document.of("scan.pdf").copy(binaryRepresentation = Some(scannedPdf(fakeJpeg)))
    val out = graft.docset.DocSet.of(spark, Seq(doc))
      .partitionAuto(ocr = Some(new FakeOcrProvider()))
      .takeAll()
    assert(out.length == 1)
    assert(out.head.elements.nonEmpty)
    assert(out.head.elements.forall(_.prop("ocr").contains("true")))
  }
}
