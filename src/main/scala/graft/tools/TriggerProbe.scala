package graft.tools

import graft.gen.SpanGen
import graft.kernel.Extractor

/** Same-process A/B micro-benchmark of the fused kernel passes vs their
  * unfused formulations (interleaved reps, min — host steal on this box
  * makes cross-process comparisons meaningless). Dev tool. */
object TriggerProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROFILE_DOCS", "30000").toInt
    val reps = sys.env.getOrElse("PROFILE_REPS", "5").toInt
    val docs = (0 until n).map(i => SpanGen.genDoc(SpanGen.docId(i.toLong)))
    val texts = docs.flatMap(_.spans.map(s => if (s.text == null) "" else s.text))
    val cleaned = texts.map(Extractor.cleanHtml)
    val htmls = docs.flatMap(_.spans.filter(s =>
      s.kind == "html_block" || s.kind == "html_boiler" || s.kind == "html_link")
      .map(s => if (s.text == null) "" else s.text))

    def once(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    /** interleave A/B: per rep run both, report per-side minima */
    def ab(label: String)(a: => Unit)(b: => Unit): Unit = {
      once(a); once(b) // warm both
      val pairs = (1 to reps).map(_ => (once(a), once(b)))
      val (mA, mB) = (pairs.map(_._1).min, pairs.map(_._2).min)
      println(f"PROBE $label%-28s fused=$mA%.3fs unfused=$mB%.3fs speedup=${mB / mA}%.2fx")
    }

    var sink = 0L // defeat dead-code elimination
    ab("trigger gates (13)") {
      cleaned.foreach(c => sink += Extractor.triggerMask(c))
    } {
      cleaned.foreach { c =>
        var i = 0
        while (i < 12) { if (Extractor.entityTriggers(i)(c)) sink += 1; i += 1 }
        if (Extractor.exemptionTrigger(c)) sink += 1
      }
    }
    ab("scoreHtml counts") {
      htmls.foreach(t => sink += Extractor.cleanHtmlScored(t).words)
    } {
      htmls.foreach { t =>
        val cleanedT = Extractor.cleanHtml(t)
        val words = if (cleanedT.isEmpty) 0 else cleanedT.count(_ == ' ') + 1
        sink += words + t.count(_ == '\n') + (if (t.indexOf("<a") >= 0) 1 else 0)
      }
    }
    // old path: per-detector contains-gates + standalone scanner loops
    val standalone: IndexedSeq[String => Seq[(Int, Int)]] = IndexedSeq(
      graft.kernel.FastDetectors.personMatches, graft.kernel.FastDetectors.organizationMatches,
      graft.kernel.FastDetectors.locationMatches, graft.kernel.FastDetectors.dateMatches,
      graft.kernel.FastDetectors.moneyMatches, graft.kernel.FastDetectors.documentIdMatches,
      graft.kernel.FastDetectors.phoneMatches, graft.kernel.FastDetectors.emailMatches,
      graft.kernel.FastDetectors.addressMatches, graft.kernel.FastDetectors.contractMatches,
      graft.kernel.FastDetectors.caseNumberMatches, graft.kernel.FastDetectors.foiaMatches)
    ab("scan only (full mask)") {
      cleaned.foreach { c =>
        val all = graft.kernel.FastDetectors.allMatches(c, 0xFFF)
        var i = 0
        while (i < 12) { sink += all(i).length; i += 1 }
      }
    } {
      cleaned.foreach { c =>
        var i = 0
        while (i < 12) { sink += standalone(i)(c).length; i += 1 }
      }
    }
    ab("detections scans") {
      cleaned.foreach(c => sink += Extractor.detections(c).length)
    } {
      cleaned.foreach { c =>
        var i = 0
        while (i < 12) {
          if (Extractor.entityTriggers(i)(c)) sink += standalone(i)(c).length
          i += 1
        }
        if (Extractor.exemptionTrigger(c)) sink += Extractor.exemptionScan(c).length
      }
    }
    System.err.println(s"sink=$sink")
  }
}
