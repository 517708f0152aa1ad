package graft.kernel

import java.util.regex.Pattern

import graft.core.{Doc, InKind, OutKind, Span, Spec}

/** Parallel extraction kernel — implementation #1 of EXTRACTION_SPEC.md.
  *
  * A pure function `Doc => Doc` with no Spark imports: the Spark job applies
  * it via typed `mapPartitions` over `Encoders` (SURVEY.md §2.9); unit tests
  * and property tests call it directly. Style: functional/collection-based
  * (the golden oracle is deliberately imperative — independent
  * implementations, shared constants only).
  *
  * Reference semantics: exemption scan `openfoia/pipeline/ocr.py:262-286`,
  * entity extraction shape `openfoia/pipeline/extract.py:69-114`, reading
  * order `openfoia/pipeline/ocr.py:75-96,206-227`.
  */
object Extractor extends Serializable {

  /** Compiled detector tables. Compiled once per JVM (executor) at first
    * use — the "compiled regex DFAs broadcast to executors" of the north
    * rule: the pattern *strings* ship in the closure/broadcast; compilation
    * is lazy per executor. */
  private[graft] lazy val entityDetectors: IndexedSeq[(String, Pattern)] =
    Spec.EntityPatterns.toIndexedSeq.map { case (kind, re) => (kind, Pattern.compile(re)) }

  private[graft] lazy val exemptionDetectors: IndexedSeq[(String, Pattern)] =
    Spec.ExemptionPatterns.toIndexedSeq.map { case (re, _) =>
      (Spec.canonicalExemptionCode(re), Pattern.compile(re, Pattern.CASE_INSENSITIVE))
    }

  /** All 11 exemption patterns fused into ONE pass. Equivalence argument:
    * every exemption match starts with the literal `(b)(`, and that literal
    * cannot occur INSIDE any match (`(b)(d)` / `(b)(7)(X)` contain no inner
    * `(b)(`), so matches never overlap and continue-from-end scanning finds
    * exactly the union of the 11 per-pattern scans; at any start position at
    * most one pattern can match (the digit/suffix discriminates), so the
    * per-detector (start, end, index) sort order is also preserved. Pinned
    * by the kernel-vs-golden parity property suite (the golden oracle still
    * runs the 11 patterns separately). Profile: detections() was 69% of
    * kernel time, the exemption half of it collapses 11 passes into 1. */
  private val exemptionFused: Pattern = Pattern.compile(
    """\(b\)\(([1-6])\)|\(b\)\(7\)\(([ACDEF])\)""", Pattern.CASE_INSENSITIVE)

  /** Emits (start, end, detectorIndexWithinExemptions, canonicalCode). */
  private[graft] def exemptionScan(t: String): Seq[(Int, Int, Int, String)] = {
    val out = Seq.newBuilder[(Int, Int, Int, String)]
    val m = exemptionFused.matcher(t)
    while (m.find()) {
      val digit = m.group(1)
      if (digit != null) {
        val d = digit.charAt(0) - '1' // (b)(1)..(b)(6) → detectors 0..5
        out += ((m.start, m.end, d, s"(b)($digit)"))
      } else {
        val letter = Character.toUpperCase(m.group(2).charAt(0))
        val d = 6 + (letter match { // (b)(7)(A/C/D/E/F) → detectors 6..10
          case 'A' => 0; case 'C' => 1; case 'D' => 2; case 'E' => 3; case _ => 4
        })
        out += ((m.start, m.end, d, s"(b)(7)($letter)"))
      }
    }
    out.result()
  }

  /** Conservative literal prefilters, one per entity detector (same order):
    * a regex is run only if its trigger can possibly match — every true
    * match necessarily contains the trigger literal(s). Purely an engine
    * optimization (Aho-Corasick-style literal gating); output-equivalence
    * vs the unfiltered golden oracle is proven by the parity suites. */
  private[graft] lazy val entityTriggers: IndexedSeq[String => Boolean] = {
    def any(lits: String*): String => Boolean = s => lits.exists(l => s.contains(l))
    IndexedSeq(
      any("Mr.", "Ms.", "Mrs.", "Dr."), // PERSON
      any("Agency", "Bureau", "Department", "Commission", "Office", "Administration"), // ORGANIZATION
      _.contains(", "), // LOCATION
      s => s.contains('-') || s.contains(", "), // DATE: "Month d, yyyy" has ", "; ISO has '-'
      _.contains('$'), // MONEY
      _.contains("DOC-"), // DOCUMENT_ID
      _.contains('('), // PHONE
      _.contains('@'), // EMAIL
      _.contains("., "), // ADDRESS ("St., " etc.)
      _.contains('-'), // CONTRACT_NUMBER
      _.contains("-cv-"), // CASE_NUMBER
      _.contains("FOI")) // FOIA_TRACKING
  }

  /** Exemption patterns are case-insensitive `\(b\)\(...\)`. */
  private[graft] def exemptionTrigger(s: String): Boolean =
    s.contains("(b)(") || s.contains("(B)(")

  @inline private def startsAt(s: String, i: Int, lit: String): Boolean = {
    if (i + lit.length > s.length) false
    else {
      var j = 0
      while (j < lit.length && s.charAt(i + j) == lit.charAt(j)) j += 1
      j == lit.length
    }
  }

  /** All 13 trigger gates (12 entity + exemption) in ONE pass over the text.
    * Bit i == `entityTriggers(i)(s)`; bit 12 == `exemptionTrigger(s)` —
    * equivalence property-fuzzed in KernelProps. The per-detector
    * `String.contains` formulation re-scans the span up to 18×; this is the
    * Aho-Corasick-style fusion of those literal searches (candidate first
    * chars dispatch to short forward compares). Early-exits once every gate
    * has fired. */
  private[graft] def triggerMask(s: String): Int = {
    val AllBits = 0x1FFF
    var mask = 0
    val n = s.length
    var i = 0
    while (i < n && mask != AllBits) {
      s.charAt(i) match {
        case '$' => mask |= 1 << 4 // MONEY
        case '@' => mask |= 1 << 7 // EMAIL
        case '(' =>
          mask |= 1 << 6 // PHONE
          // exemption literal "(b)(" / "(B)(":
          if (i + 3 < n && (s.charAt(i + 1) == 'b' || s.charAt(i + 1) == 'B') &&
            s.charAt(i + 2) == ')' && s.charAt(i + 3) == '(') mask |= 1 << 12
        case '-' =>
          mask |= (1 << 3) | (1 << 9) // DATE (ISO), CONTRACT_NUMBER
          if (i + 3 < n && s.charAt(i + 1) == 'c' && s.charAt(i + 2) == 'v' &&
            s.charAt(i + 3) == '-') mask |= 1 << 10 // CASE_NUMBER "-cv-"
        case ',' =>
          if (i + 1 < n && s.charAt(i + 1) == ' ') mask |= (1 << 2) | (1 << 3) // LOCATION, DATE
        case '.' =>
          if (i + 2 < n && s.charAt(i + 1) == ',' && s.charAt(i + 2) == ' ')
            mask |= 1 << 8 // ADDRESS "., "
        case 'M' =>
          if (startsAt(s, i, "Mr.") || startsAt(s, i, "Ms.") || startsAt(s, i, "Mrs."))
            mask |= 1 << 0 // PERSON
        case 'D' =>
          if (startsAt(s, i, "Dr.")) mask |= 1 << 0
          else if (startsAt(s, i, "DOC-")) mask |= 1 << 5 // DOCUMENT_ID
          else if (startsAt(s, i, "Department")) mask |= 1 << 1 // ORGANIZATION
        case 'F' =>
          if (startsAt(s, i, "FOI")) mask |= 1 << 11 // FOIA_TRACKING
        case 'A' =>
          if (startsAt(s, i, "Agency") || startsAt(s, i, "Administration")) mask |= 1 << 1
        case 'B' =>
          if (startsAt(s, i, "Bureau")) mask |= 1 << 1
        case 'C' =>
          if (startsAt(s, i, "Commission")) mask |= 1 << 1
        case 'O' =>
          if (startsAt(s, i, "Office")) mask |= 1 << 1
        case _ =>
      }
      i += 1
    }
    mask
  }

  private val anchorRe: Pattern = Pattern.compile("(?s)<a\\b[^>]*>(.*?)</a>")

  // ------------------------------------------------------------- primitives

  /** EXTRACTION_SPEC §1: drop every `<...>` run; an unclosed `<` drops the
    * rest of the string. */
  private[graft] def stripTags(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var inTag = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inTag) { if (c == '>') inTag = false }
      else if (c == '<') inTag = true
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  private[graft] def decodeEntities(s: String): String =
    if (s.indexOf('&') < 0) s // fast path: nothing decodable
    else Spec.HtmlEntities.foldLeft(s) { case (acc, (ent, ch)) => acc.replace(ent, ch) }

  private[graft] def normWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) { if (sb.length() > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Fused stripTags+normWs single pass; the (rare) entity-decode branch
    * re-normalizes because decoded `&nbsp;` can introduce new whitespace.
    * Output-equivalent to `normWs(decodeEntities(stripTags(s)))` — entities
    * contain no whitespace, so collapsing runs first cannot create or
    * destroy a decodable entity (KernelProps parity covers this on
    * arbitrary strings). */
  private[graft] def cleanHtml(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var inTag = false
    var pendingSpace = false
    var hasAmp = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inTag) { if (c == '>') inTag = false }
      else if (c == '<') inTag = true
      else if (Character.isWhitespace(c)) { if (sb.length() > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        if (c == '&') hasAmp = true
        sb.append(c)
      }
      i += 1
    }
    val t = sb.toString
    if (hasAmp) normWs(decodeEntities(t)) else t
  }

  /** Reference formulation, kept for the unit tests' primitive checks. */
  private[graft] def cleanHtmlSlow(s: String): String = normWs(decodeEntities(stripTags(s)))
  private[graft] def cleanPlain(s: String): String = normWs(s)

  private[graft] final case class CleanStats(
      cleaned: String, words: Int, lines: Int, hasAnchor: Boolean)

  /** cleanHtml + every per-span count scoreHtml needs, in the SAME pass:
    * word count (separator spaces are exactly the ' ' chars this loop
    * appends), raw newline count (all of them — including inside tags, to
    * match `countChar(raw,'\n')`), and the `raw.contains("<a")` anchor
    * probe (state-independent, matching indexOf semantics). The rare
    * entity-decode branch recounts words after re-normalization.
    * Output-equivalence to the unfused formulations is property-fuzzed. */
  private[graft] def cleanHtmlScored(s: String): CleanStats = {
    val sb = new java.lang.StringBuilder(s.length)
    val n = s.length
    var i = 0
    var inTag = false
    var pendingSpace = false
    var hasAmp = false
    var hasAnchor = false
    var lines = 1
    var spaces = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\n') lines += 1
      if (c == '<') {
        if (i + 1 < n && s.charAt(i + 1) == 'a') hasAnchor = true
        if (!inTag) inTag = true
      } else if (inTag) { if (c == '>') inTag = false }
      else if (Character.isWhitespace(c)) { if (sb.length() > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false; spaces += 1 }
        if (c == '&') hasAmp = true
        sb.append(c)
      }
      i += 1
    }
    if (hasAmp) {
      val t = normWs(decodeEntities(sb.toString))
      CleanStats(t, wordCount(t), lines, hasAnchor)
    } else {
      val t = sb.toString
      CleanStats(t, if (t.isEmpty) 0 else spaces + 1, lines, hasAnchor)
    }
  }

  @inline private def countChar(s: String, c: Char): Int = {
    var n = 0; var i = 0
    while (i < s.length) { if (s.charAt(i) == c) n += 1; i += 1 }
    n
  }

  private def wordCount(cleaned: String): Int =
    if (cleaned.isEmpty) 0 else countChar(cleaned, ' ') + 1

  // --------------------------------------------------------------- scoring

  private[graft] final case class HtmlScore(
      cleaned: String, words: Int, linkDensity: Double, wordsPerLine: Double)

  private[graft] def scoreHtml(kind: String, raw: String): HtmlScore = {
    val cs = cleanHtmlScored(raw)
    val cleaned = cs.cleaned
    val linkDensity =
      if (kind == InKind.HtmlLink) 1.0
      else if (cleaned.isEmpty || !cs.hasAnchor) 0.0
      else {
        val m = anchorRe.matcher(raw)
        val inners = Iterator.continually(m).takeWhile(_.find()).map(_.group(1)).toSeq
        cleanHtml(inners.mkString(" ")).length.toDouble / cleaned.length
      }
    HtmlScore(cleaned, cs.words, linkDensity, cs.words.toDouble / cs.lines)
  }

  private[graft] def survives(s: HtmlScore): Boolean =
    s.words >= Spec.MinWords &&
      s.linkDensity <= Spec.MaxLinkDensity &&
      s.wordsPerLine >= Spec.MinWordsPerLine

  // ------------------------------------------------------------ detections

  private lazy val entityKinds: IndexedSeq[String] =
    Spec.EntityPatterns.toIndexedSeq.map(_._1)

  /** All detector matches over cleaned text, sorted by (start,end,detector).
    * EXTRACTION_SPEC §3. Three fused passes end to end: the 13-gate trigger
    * mask, the single-dispatch scan of every gated detector
    * (`FastDetectors.allMatches` — find()-equivalent per detector, fuzzed in
    * KernelProps), and the fused exemption scan. */
  private[graft] def detections(cleaned: String): Seq[Span] = {
    val hits = Seq.newBuilder[(Int, Int, Int, Span)]
    val mask = triggerMask(cleaned) // all 13 gates in one pass
    if ((mask & 0xFFF) != 0) {
      val per = FastDetectors.allMatches(cleaned, mask)
      var d = 0
      while (d < 12) {
        val kind = entityKinds(d)
        per(d).foreach { case (s, e) =>
          hits += ((s, e, d, Span(OutKind.entity(kind), cleaned.substring(s, e), "", 0)))
        }
        d += 1
      }
    }
    if ((mask >> 12 & 1) != 0)
      exemptionScan(cleaned).foreach { case (s, e, di, code) =>
        hits += ((s, e, 12 + di, Span(OutKind.Redaction, code, "", 0)))
      }
    hits.result().sortBy { case (s, e, i, _) => (s, e, i) }.map(_._4)
  }

  // ------------------------------------------------------------- pdf parse

  private[graft] final case class PdfBlock(page: Int, y: Int, x: Int, body: String)

  private[graft] def parsePdf(raw: String): PdfBlock = {
    val m = Spec.PdfHeader.matcher(raw)
    if (m.find())
      PdfBlock(m.group(1).toInt, m.group(2).toInt, m.group(3).toInt, raw.substring(m.end))
    else PdfBlock(Int.MaxValue, Int.MaxValue, Int.MaxValue, raw)
  }

  // ------------------------------------------------------------ the kernel

  private def sanitize(s: String): String = {
    val t = if (s == null) "" else s
    if (t.length > Spec.MaxSpanChars) t.substring(0, Spec.MaxSpanChars) else t
  }

  /** EXTRACTION_SPEC §0-4 end to end. Pure; deterministic. */
  def extractDoc(doc: Doc): Doc = {
    val input =
      (if (doc.spans == null) Seq.empty[Span] else doc.spans)
        .sortBy(_.offset)
        .map(s => Span(s.kind, sanitize(s.text), if (s.media_ref == null) "" else s.media_ref, s.offset))

    // Reading-order permutation of pdf bodies across pdf slots (§2.2).
    val pdfSlots = input.zipWithIndex.collect { case (s, i) if s.kind == InKind.PdfBlock => i }
    val pdfSorted = pdfSlots
      .map { i => (parsePdf(input(i).text), input(i).offset) }
      .sortBy { case (b, off) => (b.page, b.y, b.x, off) }
      .map(_._1)
    val pdfBodyAtSlot: Map[Int, String] =
      pdfSlots.zip(pdfSorted.map(_.body)).toMap

    val out = input.zipWithIndex.flatMap { case (span, slot) =>
      span.kind match {
        case InKind.HtmlBlock | InKind.HtmlBoiler | InKind.HtmlLink =>
          val sc = scoreHtml(span.kind, span.text)
          if (survives(sc)) Span(OutKind.Text, sc.cleaned, "", 0) +: detections(sc.cleaned)
          else Seq.empty
        case InKind.PdfBlock =>
          val body = cleanPlain(pdfBodyAtSlot(slot))
          Span(OutKind.Text, body, "", 0) +: detections(body)
        case InKind.Media =>
          Seq(Span(OutKind.Media, "", span.media_ref, 0))
        case InKind.Redaction =>
          val t = cleanPlain(span.text)
          val hits = if (exemptionTrigger(t)) exemptionScan(t) else Seq.empty
          val sorted = hits.sortBy { case (s, e, i, _) => (s, e, i) }
          if (sorted.isEmpty) Seq(Span(OutKind.Redaction, t, "", 0))
          else sorted.map { case (_, _, _, code) => Span(OutKind.Redaction, code, "", 0) }
        case _ => Seq.empty
      }
    }

    Doc(doc.doc_id, out.zipWithIndex.map { case (s, i) => s.copy(offset = i) })
  }
}
