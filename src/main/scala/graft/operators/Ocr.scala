package graft.operators

import graft.model.Bbox

/** One recognized text region from an OCR pass over a page image. */
final case class OcrRegion(text: String, bbox: Option[Bbox], confidence: Double)

/**
 * Pluggable OCR for scanned / image-only documents (reference:
 * lib/sycamore/sycamore/transforms/detr_partitioner.py:1-779 — the Aryn
 * partitioner's deformable-DETR layout model + OCR + table-structure stack;
 * transforms/partition.py:165 ArynPartitioner). The model stack is I/O, not
 * engine: this trait is the same plugin contract as LlmClient and Embedder —
 * the engine hands over raw image bytes (a PDF image XObject's encoded
 * stream, a standalone image column, a decoded frame), an implementation
 * runs Tesseract / PaddleOCR / a remote layout service and returns text
 * regions with page-normalized bboxes. Implementations MUST be Serializable
 * and per-call pure: the engine invokes them inside partition-parallel maps
 * with no cross-document state, so OCR scales exactly like every other
 * per-row operator at 100 TB (model weights load once per executor via lazy
 * init in the implementation, never per document).
 */
trait OcrProvider extends Serializable {

  /** Recognize text in one page image. `pageNo` is 1-based and approximate
    * when the caller could not resolve true page structure (flagged by the
    * caller, not here). Bboxes are normalized to [0,1] page coordinates. */
  def recognize(image: Array[Byte], pageNo: Int): Seq[OcrRegion]
}

/**
 * Deterministic offline fake (the FakeLlmClient / hash-embedder pattern):
 * derives stable pseudo-text and a stable bbox from a SHA-1 of the image
 * bytes, so specs can pin exact output and the whole OCR plumbing — image
 * extraction, element assembly, provenance properties, bbox flow into the
 * mark passes — is exercised end-to-end without a model. Never a real
 * recognizer; swap in a model-backed OcrProvider for production.
 */
final class FakeOcrProvider(regionsPerImage: Int = 1) extends OcrProvider {
  require(regionsPerImage >= 1, s"regionsPerImage must be >= 1: $regionsPerImage")

  override def recognize(image: Array[Byte], pageNo: Int): Seq[OcrRegion] = {
    val digest = java.security.MessageDigest.getInstance("SHA-1").digest(image)
    val hex = digest.take(6).map(b => f"${b & 0xff}%02x").mkString
    (0 until regionsPerImage).map { i =>
      // stable fake geometry: horizontal bands top-to-bottom, x-offset from
      // the digest so two different images never produce identical boxes
      val x1 = (digest(i % digest.length) & 0x3f) / 255.0
      val y1 = i.toDouble / regionsPerImage
      OcrRegion(
        text = s"ocr:p$pageNo:r$i:$hex",
        bbox = Some(Bbox(x1, y1, math.min(1.0, x1 + 0.5),
          math.min(1.0, y1 + 0.8 / regionsPerImage))),
        confidence = 0.99)
    }
  }
}
