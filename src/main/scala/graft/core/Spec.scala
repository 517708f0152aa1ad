package graft.core

import java.util.regex.Pattern

/** The extraction CONTRACT: every constant that defines extraction semantics.
  *
  * Both the parallel Spark kernel (`graft.kernel`) and the sequential golden
  * oracle (`graft.golden.GoldenExtractor`) consume these constants but
  * implement the logic independently (SURVEY.md §5.2, §7.1). Anything not
  * pinned here is an implementation detail that must NOT affect output.
  *
  * Pattern provenance:
  *  - FOIA exemption patterns: /root/reference/openfoia/pipeline/ocr.py:248-260
  *    (`RedactionDetector.EXEMPTION_PATTERNS`, matched case-insensitively per
  *    ocr.py:266-274).
  *  - Entity kinds: /root/reference/openfoia/models.py:85-95 (`EntityType`).
  *  - Custom entity patterns: /root/reference/config.example.json `entities`
  *    block (CONTRACT_NUMBER / CASE_NUMBER / FOIA_TRACKING), the reference's
  *    "user-defined function" surface (openfoia/config.py:100-105).
  *  - Boilerplate thresholds: Arc90/Boilerpipe-style block scoring (public
  *    Readability heuristics); the Python reference has no HTML path, so these
  *    thresholds ARE the spec (SURVEY.md §7.4.3).
  */
object Spec {

  // ---------------------------------------------------------------- salting
  /** Pinned salt for the doc_id → partition mapping. Resume idempotence
    * requires pid = pmod(murmur3(doc_id, SALT), P) to be a pure function
    * (SURVEY.md §4.3, FIXTURES.md §4). */
  val Salt: Int = 0x5eed

  // ---------------------------------------------------- boilerplate scoring
  /** A html_block/html_boiler/html_link span survives iff (after tag strip):
    *  words >= MinWords  &&  linkDensity <= MaxLinkDensity  &&
    *  wordsPerLine >= MinWordsPerLine.
    * linkDensity = (chars of text inside <a ...>...</a>) / (all text chars),
    * computed on tag-stripped text; wordsPerLine over '\n'-split raw lines. */
  val MinWords: Int = 8
  val MaxLinkDensity: Double = 0.33
  val MinWordsPerLine: Double = 4.0

  /** HTML entities decoded by the tokenizer (applied after tag stripping,
    * single pass, in this order; `&amp;` last so it does not re-introduce
    * decodable entities). */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&nbsp;" -> " ",
    "&amp;" -> "&")

  // ------------------------------------------------------------- pdf layout
  /** pdf_block text carries a layout header `p=<page>;y=<y>;x=<x>|<body>`.
    * Blocks are re-ordered by (page, y, x, input offset) — SURVEY.md §2 W2 —
    * within the slots the pdf blocks occupy in the surviving sequence.
    * A pdf_block whose header fails to parse keeps (page,y,x)=(MaxValue,
    * MaxValue, MaxValue) and its body is the full raw text. */
  val PdfHeader: Pattern = Pattern.compile("""^p=(\d+);y=(\d+);x=(\d+)\|""")

  // ---------------------------------------------------- exemption patterns
  /** FOIA exemption regexes, in reference table order (ocr.py:248-260).
    * Matched case-insensitively (ocr.py:268). Canonical code = pattern with
    * backslashes removed (ocr.py:271: `pattern.replace('\\', '')`). */
  val ExemptionPatterns: Seq[(String, String)] = Seq(
    ("""\(b\)\(1\)""", "National security"),
    ("""\(b\)\(2\)""", "Internal personnel rules"),
    ("""\(b\)\(3\)""", "Statutory exemption"),
    ("""\(b\)\(4\)""", "Trade secrets"),
    ("""\(b\)\(5\)""", "Deliberative process"),
    ("""\(b\)\(6\)""", "Personal privacy"),
    ("""\(b\)\(7\)\(A\)""", "Law enforcement - interference"),
    ("""\(b\)\(7\)\(C\)""", "Law enforcement - privacy"),
    ("""\(b\)\(7\)\(D\)""", "Law enforcement - confidential source"),
    ("""\(b\)\(7\)\(E\)""", "Law enforcement - techniques"),
    ("""\(b\)\(7\)\(F\)""", "Law enforcement - safety"))

  def canonicalExemptionCode(pattern: String): String = pattern.replace("\\", "")

  // ------------------------------------------------------- entity patterns
  /** Entity detectors in fixed table order. Kinds from models.py:85-95
    * (upper-cased) plus the three config.example.json custom types.
    * Matched case-SENSITIVELY (they encode capitalization). */
  val EntityPatterns: Seq[(String, String)] = Seq(
    ("PERSON", """\b(?:Mr|Ms|Mrs|Dr)\. [A-Z][a-z]+ [A-Z][a-z]+\b"""),
    ("ORGANIZATION", """\b(?:[A-Z][a-z]+ ){1,3}(?:Agency|Bureau|Department|Commission|Office|Administration)\b"""),
    ("LOCATION", """\b(?:Washington|Arlington|Springfield|Denver|Austin|Phoenix|Seattle|Portland|Chicago|Boston), [A-Z]{2}\b"""),
    ("DATE", """\b(?:January|February|March|April|May|June|July|August|September|October|November|December) \d{1,2}, \d{4}\b|\b\d{4}-\d{2}-\d{2}\b"""),
    ("MONEY", """\$\d{1,3}(?:,\d{3})*(?:\.\d{2})?"""),
    ("DOCUMENT_ID", """\bDOC-\d{6,}\b"""),
    ("PHONE", """\(\d{3}\) \d{3}-\d{4}"""),
    ("EMAIL", """\b[a-z][a-z0-9._]*@[a-z0-9.-]+\.(?:gov|com|org)\b"""),
    ("ADDRESS", """\b\d{1,5} [A-Z][a-z]+ (?:St|Ave|Blvd|Rd)\., [A-Z][a-z]+, [A-Z]{2} \d{5}(?:-\d{4})?\b"""),
    // config.example.json custom_types (verbatim):
    ("CONTRACT_NUMBER", """\b[A-Z]{2,4}-\d{4,}-\d{4,}\b"""),
    ("CASE_NUMBER", """\b\d{2}-cv-\d{4,}\b"""),
    ("FOIA_TRACKING", """\bFOI[A]?-\d{4}-\d+\b"""))

  // ---------------------------------------------------------- span hygiene
  /** Hard cap on per-span text bytes (mega-doc guard, SURVEY.md §7.4.4);
    * generator never exceeds it, kernel truncates defensively (in chars —
    * ASCII corpus, so chars == bytes for generated data). */
  val MaxSpanChars: Int = 65536

  /** Job-level mega-doc budget (SURVEY.md §7.4.4): a document whose input
    * exceeds either bound is QUARANTINED by ExtractJob — explicitly visible
    * in the tag=2 output and the run report — instead of being silently
    * clipped span-by-span at MaxSpanChars. These are job policy, not kernel
    * semantics: extractDoc itself is unchanged (kernel/golden parity is
    * oblivious to them), the guard runs before the kernel is invoked. */
  val MaxDocSpans: Int = 4096
  val MaxDocChars: Long = 8L * 1024 * 1024

  /** Detection-match ordering inside one text span: by (start, end,
    * detectorIndex) where detectors are numbered: entities first in
    * EntityPatterns order, then exemptions in ExemptionPatterns order. */
  // (documented here; encoded independently in kernel and golden)
}
