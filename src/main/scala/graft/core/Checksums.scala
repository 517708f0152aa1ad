package graft.core

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Lineage checksums (EXTRACTION_SPEC.md §6). Shared infrastructure — not
  * part of the kernel/golden extraction-parity surface. */
object Checksums {

  /** Per-doc digest: first 8 bytes (big-endian, signed) of SHA-256 over a
    * canonical encoding of the doc. */
  def docDigest(doc: Doc): Long = {
    val md = MessageDigest.getInstance("SHA-256")
    md.update(doc.doc_id.getBytes(StandardCharsets.UTF_8))
    md.update(0.toByte)
    doc.spans.foreach { s =>
      md.update(s.kind.getBytes(StandardCharsets.UTF_8)); md.update(1.toByte)
      md.update(s.text.getBytes(StandardCharsets.UTF_8)); md.update(1.toByte)
      md.update(s.media_ref.getBytes(StandardCharsets.UTF_8)); md.update(1.toByte)
      md.update(s.offset.toString.getBytes(StandardCharsets.UTF_8)); md.update(2.toByte)
    }
    val b = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }

  /** Order-insensitive partition checksum: XOR fold of per-doc digests. */
  def fold(digests: Iterator[Long]): Long = digests.foldLeft(0L)(_ ^ _)

  def render(v: Long): String = f"$v%016x"
}
