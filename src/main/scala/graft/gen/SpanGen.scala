package graft.gen

import scala.util.Random
import scala.util.hashing.MurmurHash3

import graft.core.{Doc, InKind, Span}

/** Deterministic synthetic corpus of interleaved text+media span documents
  * (FIXTURES.md §1, §5). Per-doc RNG seeded by `GLOBAL_SEED ^ murmur3(doc_id)`
  * — splittable and order-independent, so generation is identical at any
  * parallelism and any partitioning. Pure: no wall clock, no global RNG.
  *
  * Content models the reference's document world: FOIA response letters with
  * exemption citations (/root/reference/openfoia/pipeline/ocr.py:248-260),
  * entity-bearing prose (openfoia/models.py:85-95 kinds), custom-pattern IDs
  * (config.example.json), OCR'd PDF layout blocks out of reading order
  * (openfoia/pipeline/ocr.py:206-227), boilerplate-laden HTML, and binary
  * media placeholders (openfoia/pipeline/ingest.py:100-149).
  */
object SpanGen {

  val GlobalSeed: Int = 42

  private val vocab: IndexedSeq[String] = IndexedSeq(
    "the", "agency", "records", "request", "pursuant", "review", "released",
    "document", "response", "disclosure", "information", "public", "interest",
    "material", "processing", "office", "federal", "statute", "provision",
    "withheld", "produced", "copy", "page", "letter", "dated", "received",
    "enclosed", "portions", "segregable", "determination", "appeal", "search",
    "conducted", "responsive", "files", "custodian", "under", "section",
    "applicable", "exemption", "therefore", "accordingly", "additional",
    "fees", "duplication", "category", "granted", "denied", "partial")

  private val firstNames = IndexedSeq("James", "Maria", "Robert", "Linda", "Ahmed", "Wei", "Elena", "Carlos")
  private val lastNames = IndexedSeq("Smith", "Garcia", "Johnson", "Chen", "Brown", "Davis", "Lopez", "Wilson")
  private val honorifics = IndexedSeq("Mr", "Ms", "Mrs", "Dr")
  private val orgHeads = IndexedSeq("Federal", "National", "Records", "Justice", "Environmental", "Transportation")
  private val orgTails = IndexedSeq("Agency", "Bureau", "Department", "Commission", "Office", "Administration")
  private val cities = IndexedSeq("Washington", "Arlington", "Springfield", "Denver", "Austin", "Phoenix", "Seattle", "Portland", "Chicago", "Boston")
  private val states = IndexedSeq("DC", "VA", "IL", "CO", "TX", "AZ", "WA", "OR", "MA", "NY")
  private val months = IndexedSeq("January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December")
  private val streets = IndexedSeq("Main", "Oak", "Elm", "Park", "First")
  private val streetKinds = IndexedSeq("St", "Ave", "Blvd", "Rd")
  private val exemptionCodes = IndexedSeq(
    "(b)(1)", "(b)(2)", "(b)(3)", "(b)(4)", "(b)(5)", "(b)(6)",
    "(b)(7)(A)", "(b)(7)(C)", "(b)(7)(D)", "(b)(7)(E)", "(b)(7)(F)")

  private def pick[T](r: Random, xs: IndexedSeq[T]): T = xs(r.nextInt(xs.length))

  private def entityText(r: Random): String = r.nextInt(12) match {
    case 0 => s"${pick(r, honorifics)}. ${pick(r, firstNames)} ${pick(r, lastNames)}"
    case 1 => s"${pick(r, orgHeads)} ${pick(r, orgTails)}"
    case 2 => s"${pick(r, cities)}, ${pick(r, states)}"
    case 3 => s"${pick(r, months)} ${1 + r.nextInt(28)}, ${1990 + r.nextInt(40)}"
    case 4 => f"${1990 + r.nextInt(40)}%04d-${1 + r.nextInt(12)}%02d-${1 + r.nextInt(28)}%02d"
    case 5 => f"$$${1 + r.nextInt(999)}%d,${r.nextInt(1000)}%03d.${r.nextInt(100)}%02d"
    case 6 => f"DOC-${100000 + r.nextInt(900000)}%d"
    case 7 => f"(${200 + r.nextInt(800)}%03d) ${200 + r.nextInt(800)}%03d-${r.nextInt(10000)}%04d"
    case 8 => s"${pick(r, IndexedSeq("foia.officer", "records.desk", "info"))}@${pick(r, IndexedSeq("justice", "epa", "dot"))}.gov"
    case 9 => s"${1 + r.nextInt(9999)} ${pick(r, streets)} ${pick(r, streetKinds)}., ${pick(r, cities)}, ${pick(r, states)} ${10000 + r.nextInt(90000)}"
    case 10 => s"${pick(r, IndexedSeq("AB", "GSA", "DOD", "HHS"))}-${1000 + r.nextInt(90000)}-${1000 + r.nextInt(90000)}"
    case _ => if (r.nextBoolean()) f"${10 + r.nextInt(90)}%d-cv-${1000 + r.nextInt(90000)}%d"
              else s"FOIA-${2000 + r.nextInt(30)}-${1 + r.nextInt(9999)}"
  }

  private def sentence(r: Random, nWords: Int, withEntity: Boolean): String = {
    val words = Seq.fill(nWords)(pick(r, vocab))
    val s = if (withEntity) {
      val cut = r.nextInt(words.length + 1)
      (words.take(cut) :+ entityText(r)) ++ words.drop(cut)
    } else words
    s.mkString(" ") + "."
  }

  private def htmlBlock(r: Random): String = {
    // content-ish prose: 2-5 sentences of 8-16 words, ~one per line, rare link
    val n = 2 + r.nextInt(4)
    val lines = Seq.fill(n) {
      val base = sentence(r, 8 + r.nextInt(9), r.nextInt(100) < 45)
      if (r.nextInt(100) < 12) base + s""" <a href="#${r.nextInt(99)}">${pick(r, vocab)}</a>"""
      else base
    }
    val body = lines.mkString("\n")
    if (r.nextInt(100) < 30) s"<p>$body</p>" else body
  }

  private def htmlBoiler(r: Random): String = {
    // nav/footer: short, link-heavy, many newlines
    val n = 2 + r.nextInt(4)
    Seq.fill(n) {
      s"""<a href="/${pick(r, vocab)}">${pick(r, vocab)} ${pick(r, vocab)}</a>"""
    }.mkString(" |\n") + (if (r.nextBoolean()) "\ncopyright &amp; terms" else "")
  }

  private def htmlLink(r: Random): String =
    s"""<a href="/${pick(r, vocab)}/${r.nextInt(999)}">${pick(r, vocab)} ${pick(r, vocab)} ${pick(r, vocab)}</a>"""

  private def pdfBlock(r: Random): String = {
    val page = 1 + r.nextInt(5)
    val y = r.nextInt(10) * 100
    val x = r.nextInt(6) * 100
    s"p=$page;y=$y;x=$x|" + sentence(r, 6 + r.nextInt(12), r.nextInt(100) < 40)
  }

  private def redactionSpan(r: Random): String = {
    if (r.nextInt(100) < 85) {
      val code = pick(r, exemptionCodes)
      val code2 = if (r.nextInt(100) < 25) " and " + pick(r, exemptionCodes) else ""
      s"Withheld under exemption ${if (r.nextBoolean()) code.toLowerCase(java.util.Locale.ROOT) else code}$code2"
    } else s"[REDACTED ${pick(r, vocab)}]"
  }

  /** Number of spans for a doc: Zipf-ish tail for skew exercises
    * (FIXTURES.md §5) — ~1.5% get 10×, ~0.1% get ~100×. */
  private def docSize(r: Random): Int = {
    val roll = r.nextInt(1000)
    if (roll < 1) 400 + r.nextInt(1200)
    else if (roll < 16) 60 + r.nextInt(120)
    else 5 + r.nextInt(26)
  }

  def docId(i: Long): String = f"d$i%09d"

  /** Generate one document; pure function of (doc_id). */
  def genDoc(id: String): Doc = {
    val r = new Random(GlobalSeed.toLong ^ (MurmurHash3.stringHash(id).toLong << 1))
    val n = docSize(r)
    val spans = (0 until n).map { k =>
      val roll = r.nextInt(100)
      val (kind, text, ref) =
        if (roll < 35) (InKind.HtmlBlock, htmlBlock(r), "")
        else if (roll < 55) (InKind.HtmlBoiler, htmlBoiler(r), "")
        else if (roll < 65) (InKind.HtmlLink, htmlLink(r), "")
        else if (roll < 85) (InKind.PdfBlock, pdfBlock(r), "")
        else if (roll < 92) (InKind.Media, "", s"m://$id/$k")
        else (InKind.Redaction, redactionSpan(r), "")
      Span(kind, text, ref, k)
    }
    Doc(id, spans)
  }

  def genDocs(n: Long): Iterator[Doc] = Iterator.range(0L, n).map(i => genDoc(docId(i)))
}
