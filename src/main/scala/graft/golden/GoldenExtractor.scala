package graft.golden

import java.util.regex.Pattern

import scala.collection.mutable

import graft.core.{Doc, InKind, OutKind, Span, Spec}

/** Sequential single-threaded oracle — implementation #2 of
  * EXTRACTION_SPEC.md (SURVEY.md §5.2: the reference ships no fixtures, so
  * the golden set is produced by an independent implementation of the same
  * documented semantics). No Spark, no parallelism; imperative style on
  * purpose — it shares only the constants in [[graft.core.Spec]] with the
  * kernel, not code paths.
  */
object GoldenExtractor {

  private val entityPats: Array[(String, Pattern)] =
    Spec.EntityPatterns.map { case (k, re) => (k, Pattern.compile(re)) }.toArray
  private val exemptPats: Array[(String, Pattern)] =
    Spec.ExemptionPatterns.map { case (re, _) =>
      (Spec.canonicalExemptionCode(re), Pattern.compile(re, Pattern.CASE_INSENSITIVE))
    }.toArray
  private val anchorPat = Pattern.compile("(?s)<a\\b[^>]*>(.*?)</a>")
  private val headerPat = Spec.PdfHeader

  // Independent primitive implementations ---------------------------------

  /** Tag strip via '<'-segment walk (kernel uses a char-state machine). */
  private def untag(s: String): String = {
    val parts = s.split("<", -1)
    if (parts.length == 1) return s
    val out = new StringBuilder(parts(0))
    var i = 1
    while (i < parts.length) {
      val seg = parts(i)
      val gt = seg.indexOf('>')
      if (gt >= 0) out.append(seg.substring(gt + 1))
      // no '>': the unclosed tag swallows the rest of this segment
      i += 1
    }
    out.toString
  }

  private def unescape(s: String): String = {
    var r = s
    for ((ent, ch) <- Spec.HtmlEntities) r = r.replace(ent, ch)
    r
  }

  /** Whitespace-normalize via token collection (kernel streams chars). */
  private def squish(s: String): List[String] = {
    val toks = mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) {
        if (cur.nonEmpty) { toks += cur.toString; cur.clear() }
      } else cur.append(c)
      i += 1
    }
    if (cur.nonEmpty) toks += cur.toString
    toks.toList
  }

  private def squishStr(s: String): String = squish(s).mkString(" ")
  private def htmlClean(s: String): String = squishStr(unescape(untag(s)))

  private def capped(s: String): String = {
    val t = if (s == null) "" else s
    if (t.length > Spec.MaxSpanChars) t.substring(0, Spec.MaxSpanChars) else t
  }

  // Main ------------------------------------------------------------------

  def extract(doc: Doc): Doc = {
    val raw = if (doc.spans == null) Vector.empty[Span] else doc.spans.toVector
    val spans = raw.sortBy(_.offset).map { sp =>
      Span(sp.kind, capped(sp.text), if (sp.media_ref == null) "" else sp.media_ref, sp.offset)
    }

    // pass 1: reading-order queue of pdf bodies
    case class PdfKey(page: Int, y: Int, x: Int, off: Int)
    val pdfEntries = mutable.ArrayBuffer.empty[(PdfKey, String)]
    for (sp <- spans if sp.kind == InKind.PdfBlock) {
      val m = headerPat.matcher(sp.text)
      if (m.find()) {
        pdfEntries += ((PdfKey(m.group(1).toInt, m.group(2).toInt, m.group(3).toInt, sp.offset),
          sp.text.substring(m.end)))
      } else {
        pdfEntries += ((PdfKey(Int.MaxValue, Int.MaxValue, Int.MaxValue, sp.offset), sp.text))
      }
    }
    val pdfQueue = mutable.Queue.empty[String]
    pdfEntries
      .sortInPlaceBy(e => (e._1.page, e._1.y, e._1.x, e._1.off))
      .foreach(e => pdfQueue.enqueue(e._2))

    // pass 2: emission
    val out = mutable.ArrayBuffer.empty[Span]

    def emitDetections(text: String): Unit = {
      case class Hit(s: Int, e: Int, d: Int, kind: String, payload: String)
      val hits = mutable.ArrayBuffer.empty[Hit]
      var d = 0
      for ((etype, p) <- entityPats) {
        val m = p.matcher(text)
        while (m.find()) hits += Hit(m.start, m.end, d, OutKind.entity(etype), m.group())
        d += 1
      }
      for ((code, p) <- exemptPats) {
        val m = p.matcher(text)
        while (m.find()) hits += Hit(m.start, m.end, d, OutKind.Redaction, code)
        d += 1
      }
      hits.sortInPlaceBy(h => (h.s, h.e, h.d))
      for (h <- hits) out += Span(h.kind, h.payload, "", -1)
    }

    for (sp <- spans) {
      sp.kind match {
        case InKind.HtmlBlock | InKind.HtmlBoiler | InKind.HtmlLink =>
          val cleaned = htmlClean(sp.text)
          val nWords = squish(cleaned).size
          var nLines = 1
          var i = 0
          while (i < sp.text.length) { if (sp.text.charAt(i) == '\n') nLines += 1; i += 1 }
          val ld =
            if (sp.kind == InKind.HtmlLink) 1.0
            else if (cleaned.isEmpty) 0.0
            else {
              val m = anchorPat.matcher(sp.text)
              val buf = mutable.ArrayBuffer.empty[String]
              while (m.find()) buf += m.group(1)
              htmlClean(buf.mkString(" ")).length.toDouble / cleaned.length
            }
          val keep = nWords >= Spec.MinWords &&
            ld <= Spec.MaxLinkDensity &&
            nWords.toDouble / nLines >= Spec.MinWordsPerLine
          if (keep) {
            out += Span(OutKind.Text, cleaned, "", -1)
            emitDetections(cleaned)
          }

        case InKind.PdfBlock =>
          val body = squishStr(pdfQueue.dequeue())
          out += Span(OutKind.Text, body, "", -1)
          emitDetections(body)

        case InKind.Media =>
          out += Span(OutKind.Media, "", sp.media_ref, -1)

        case InKind.Redaction =>
          val t = squishStr(sp.text)
          case class RHit(s: Int, e: Int, d: Int, code: String)
          val rhits = mutable.ArrayBuffer.empty[RHit]
          var d = 0
          for ((code, p) <- exemptPats) {
            val m = p.matcher(t)
            while (m.find()) rhits += RHit(m.start, m.end, d, code)
            d += 1
          }
          if (rhits.isEmpty) out += Span(OutKind.Redaction, t, "", -1)
          else {
            rhits.sortInPlaceBy(h => (h.s, h.e, h.d))
            for (h <- rhits) out += Span(OutKind.Redaction, h.code, "", -1)
          }

        case _ => () // unknown kind: dropped
      }
    }

    var k = 0
    val renumbered = out.map { sp => val r = sp.copy(offset = k); k += 1; r }
    Doc(doc.doc_id, renumbered.toVector)
  }
}
