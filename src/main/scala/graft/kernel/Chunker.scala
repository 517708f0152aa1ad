package graft.kernel

/** Paragraph-packing text chunker — reference-exact re-expression of
  * `_chunk_text` (/root/reference/openfoia/pipeline/extract.py:215-237):
  *  - text no longer than the cap is returned verbatim as one chunk;
  *  - otherwise split on "\n\n" (empty/whitespace paragraphs KEPT, no
  *    trimming — the reference does neither);
  *  - greedy pack with per-paragraph accounting of len(para)+2 (the +2
  *    applies to the FIRST paragraph of a chunk too, as in the reference);
  *  - flush happens when adding would exceed the cap strictly (>), so an
  *    oversize single paragraph still becomes its own chunk, never split.
  * SURVEY.md §2 F6. Pure function — used from typed mapPartitions; the
  * chunk is the batched-tokenizer granularity of the north rule.
  */
object Chunker {

  val DefaultMaxChars = 8000 // extract.py:79

  def chunk(text: String, maxChars: Int = DefaultMaxChars): Vector[String] = {
    if (text == null) return Vector.empty
    if (text.length <= maxChars) return Vector(text) // extract.py:217-218
    val out = Vector.newBuilder[String]
    var cur = Vector.empty[String]
    var curLen = 0
    text.split("\n\n", -1).foreach { p =>
      val paraLen = p.length + 2 // extract.py:226 — +2 for "\n\n", always
      if (curLen + paraLen > maxChars && cur.nonEmpty) {
        out += cur.mkString("\n\n"); cur = Vector.empty; curLen = 0
      }
      cur :+= p
      curLen += paraLen
    }
    if (cur.nonEmpty) out += cur.mkString("\n\n")
    out.result()
  }
}
