package graft.tools

import graft.gen.SpanGen
import graft.kernel.Extractor

/** Single-thread component profile of the extraction kernel: where does the
  * per-doc time go (clean/score vs detections vs pdf vs plumbing)? Dev tool.
  */
object KernelProfile {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROFILE_DOCS", "30000").toInt
    val docs = (0 until n).map(i => SpanGen.genDoc(SpanGen.docId(i.toLong)))
    def time(body: => Unit): Double = {
      def once = { val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
      once // warm
      (1 to 3).map(_ => once).min // min: host steal waves pollute single runs
    }
    // warm
    docs.take(5000).foreach(Extractor.extractDoc)
    val full = time(docs.foreach(d => Extractor.extractDoc(d)))
    println(f"PROFILE full extract: $full%.2fs (${n / full}%.0f docs/s single-thread)")

    // component: cleanHtml over every span text
    val texts = docs.flatMap(_.spans.map(_.text))
    val clean = time(texts.foreach(t => Extractor.cleanHtml(if (t == null) "" else t)))
    println(f"PROFILE cleanHtml all spans: $clean%.2fs")
    // component: detections over cleaned texts
    val cleaned = texts.map(t => Extractor.cleanHtml(if (t == null) "" else t))
    val det = time(cleaned.foreach(c => Extractor.detections(c)))
    println(f"PROFILE detections all spans: $det%.2fs")
    val scoreT = time(docs.foreach(_.spans.foreach(s =>
      if (s.kind == "html_block" || s.kind == "html_boiler" || s.kind == "html_link")
        Extractor.scoreHtml(s.kind, if (s.text == null) "" else s.text))))
    println(f"PROFILE scoreHtml (html spans): $scoreT%.2fs")

    // per-detector cost over the same cleaned spans (trigger-gated, as in
    // detections())
    Extractor.entityDetectors.zipWithIndex.foreach { case ((kind, p), i) =>
      val trig = Extractor.entityTriggers(i)
      val t = time(cleaned.foreach { c =>
        if (trig(c)) { val m = p.matcher(c); while (m.find()) () }
      })
      println(f"PROFILE   detector $kind%-16s $t%.2fs")
    }
    val tEx = time(cleaned.foreach(c =>
      if (Extractor.exemptionTrigger(c)) Extractor.exemptionScan(c)))
    println(f"PROFILE   detector EXEMPTIONS(fused) $tEx%.2fs")
  }
}
