package graft.kernel

/** Paragraph-packing text chunker — the reference's `_chunk_text`
  * (/root/reference/openfoia/pipeline/extract.py:215-237): split on
  * "\n\n", greedily pack paragraphs into chunks of at most `maxChars`,
  * a single paragraph longer than the cap becomes its own chunk.
  * SURVEY.md §2 F6. Pure function — used from typed mapPartitions; the
  * chunk is the batched-tokenizer granularity of the north rule.
  */
object Chunker {

  val DefaultMaxChars = 8000 // extract.py:79

  def chunk(text: String, maxChars: Int = DefaultMaxChars): Vector[String] = {
    if (text == null || text.isEmpty) return Vector.empty
    val paras = text.split("\n\n", -1).iterator.map(_.trim).filter(_.nonEmpty)
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    paras.foreach { p =>
      if (cur.isEmpty) cur.append(p)
      else if (cur.length + 2 + p.length <= maxChars) { cur.append("\n\n"); cur.append(p) }
      else { out += cur.toString; cur.clear(); cur.append(p) }
    }
    if (cur.nonEmpty) out += cur.toString
    out.result()
  }
}
