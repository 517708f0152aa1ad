package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Doc, InKind, Span}
import graft.gen.SpanGen
import graft.golden.GoldenExtractor
import graft.kernel.Extractor

/** Kernel-stage unit tests + kernel-vs-golden parity on the deterministic
  * corpus (SURVEY.md §5.2 items 1-2, in-memory tier). */
class KernelGoldenSpec extends AnyFunSuite {

  private def d(spans: Span*): Doc = Doc("t", spans.toVector)

  test("tag strip: plain, nested-ish, unclosed") {
    assert(Extractor.stripTags("a <b>c</b> d") == "a c d")
    assert(Extractor.stripTags("no tags") == "no tags")
    assert(Extractor.stripTags("cut <here forever") == "cut ")
    assert(Extractor.stripTags("<p>x</p>") == "x")
  }

  test("entity decode order: amp last") {
    assert(Extractor.decodeEntities("&amp;lt;") == "&lt;")
    assert(Extractor.decodeEntities("a &amp; b &lt;c&gt;") == "a & b <c>")
  }

  test("whitespace normalization") {
    assert(Extractor.normWs("  a\t\tb\n\nc  ") == "a b c")
    assert(Extractor.normWs("") == "")
    assert(Extractor.normWs(" \n ") == "")
  }

  test("boilerplate scoring: content block survives, nav does not") {
    val content = "the agency records request pursuant review released document response disclosure"
    val sc = Extractor.scoreHtml(InKind.HtmlBlock, content)
    assert(sc.words == 10 && Extractor.survives(sc))

    val nav = """<a href="/a">home</a> |""" + "\n" + """<a href="/b">contact us</a>"""
    val scNav = Extractor.scoreHtml(InKind.HtmlBoiler, nav)
    assert(!Extractor.survives(scNav), s"nav should die: $scNav")

    // link-run always dies regardless of length
    val link = """<a href="/x">""" + ("word " * 20).trim + "</a>"
    assert(!Extractor.survives(Extractor.scoreHtml(InKind.HtmlLink, link)))
  }

  test("link density computed over cleaned chars") {
    val half = """<a href="#">aaaa</a> bbbb"""
    val sc = Extractor.scoreHtml(InKind.HtmlBlock, half)
    assert(math.abs(sc.linkDensity - 4.0 / 9.0) < 1e-12)
  }

  test("pdf header parse + reading-order permutation in place") {
    val doc = d(
      Span(InKind.PdfBlock, "p=2;y=0;x=0|second page", "", 0),
      Span(InKind.Media, "", "m://t/1", 1),
      Span(InKind.PdfBlock, "p=1;y=100;x=0|below", "", 2),
      Span(InKind.PdfBlock, "p=1;y=0;x=0|top", "", 3))
    val out = Extractor.extractDoc(doc).spans
    assert(out.map(s => (s.kind, s.text, s.media_ref)) == Vector(
      ("text", "top", ""),
      ("media", "", "m://t/1"),
      ("text", "below", ""),
      ("text", "second page", "")))
    assert(out.map(_.offset) == Vector(0, 1, 2, 3))
  }

  test("pdf header parse failure keeps raw body, sorts last") {
    val doc = d(
      Span(InKind.PdfBlock, "no header here", "", 0),
      Span(InKind.PdfBlock, "p=1;y=0;x=0|first", "", 1))
    val out = Extractor.extractDoc(doc).spans
    assert(out.map(_.text) == Vector("first", "no header here"))
  }

  test("every exemption pattern matches and canonicalizes (ocr.py:248-260 table)") {
    val codes = Seq("(b)(1)", "(b)(2)", "(b)(3)", "(b)(4)", "(b)(5)", "(b)(6)",
      "(b)(7)(A)", "(b)(7)(C)", "(b)(7)(D)", "(b)(7)(E)", "(b)(7)(F)")
    for (c <- codes) {
      val out = Extractor.extractDoc(d(Span(InKind.Redaction, s"withheld per $c today", "", 0))).spans
      assert(out == Vector(Span("redaction", c, "", 0)), s"code $c")
      // case-insensitive (ocr.py:268)
      val lower = Extractor.extractDoc(
        d(Span(InKind.Redaction, s"per ${c.toLowerCase(java.util.Locale.ROOT)}", "", 0))).spans
      assert(lower == Vector(Span("redaction", c, "", 0)), s"lower $c")
    }
  }

  test("redaction span with no code keeps normalized text") {
    val out = Extractor.extractDoc(d(Span(InKind.Redaction, "  [REDACTED  thing] ", "", 0))).spans
    assert(out == Vector(Span("redaction", "[REDACTED thing]", "", 0)))
  }

  test("entity detection: one of each kind, ordered by position") {
    val text = "contact Mr. James Smith at (202) 555-0173 or foia.officer@justice.gov " +
      "re DOC-123456 case 23-cv-45678 ref FOIA-2023-99 contract AB-12345-67890 " +
      "sum $1,234.56 on March 14, 2023 in Washington, DC office of Federal Records Agency " +
      "addr 12 Oak St., Denver, CO 80201"
    val spans = Extractor.extractDoc(
      d(Span(InKind.PdfBlock, s"p=1;y=0;x=0|$text", "", 0))).spans
    val kinds = spans.map(_.kind)
    assert(kinds.head == "text")
    val expected = Set("entity:PERSON", "entity:PHONE", "entity:EMAIL", "entity:DOCUMENT_ID",
      "entity:CASE_NUMBER", "entity:FOIA_TRACKING", "entity:CONTRACT_NUMBER", "entity:MONEY",
      "entity:DATE", "entity:LOCATION", "entity:ORGANIZATION", "entity:ADDRESS")
    assert(expected.subsetOf(kinds.toSet), s"missing: ${expected -- kinds.toSet}")
    // detections are sorted by start position
    val persons = spans.filter(_.kind == "entity:PERSON").map(_.text)
    assert(persons == Vector("Mr. James Smith"))
  }

  test("media spans always survive with order preserved among stripped neighbors") {
    val doc = d(
      Span(InKind.HtmlLink, """<a href="/x">a b c</a>""", "", 0),
      Span(InKind.Media, "", "m://t/1", 1),
      Span(InKind.HtmlBoiler, """<a href="/y">z</a>""", "", 2),
      Span(InKind.Media, "", "m://t/3", 3))
    val out = Extractor.extractDoc(doc).spans
    assert(out == Vector(
      Span("media", "", "m://t/1", 0),
      Span("media", "", "m://t/3", 1)))
  }

  test("dense renumbering after filtering") {
    val doc = SpanGen.genDoc("d000000007")
    val out = Extractor.extractDoc(doc).spans
    assert(out.map(_.offset) == out.indices.toVector)
  }

  test("kernel == golden on 600 generated docs (span-sequence equality)") {
    var checked = 0
    SpanGen.genDocs(600).foreach { doc =>
      val k = Extractor.extractDoc(doc)
      val g = GoldenExtractor.extract(doc)
      assert(k.doc_id == g.doc_id)
      if (k.spans != g.spans) {
        val firstDiff = k.spans.zip(g.spans).indexWhere { case (a, b) => a != b }
        fail(s"doc ${doc.doc_id}: kernel ${k.spans.size} vs golden ${g.spans.size} spans; " +
          s"first divergence at $firstDiff: " +
          s"kernel=${k.spans.lift(firstDiff)} golden=${g.spans.lift(firstDiff)}")
      }
      checked += 1
    }
    assert(checked == 600)
  }

  test("wide sweep: kernel == golden on 8000 docs at a fresh id range (corpus-scale gate)") {
    // the committed parity checks cover ids 0..2000; this sweeps an id range
    // nothing else touches so corpus-scale parity is a suite gate, not a
    // tool run (tools/GoldenSweep remains the 20k+ manual sweep). Parallel
    // streams keep it well under the 30 s budget — both extractors already
    // run under 32 Spark task threads, so thread-safety is load-bearing
    // elsewhere too.
    val checked = new java.util.concurrent.atomic.AtomicLong()
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    java.util.stream.LongStream.range(100000L, 108000L).parallel().forEach { i =>
      val doc = SpanGen.genDoc(SpanGen.docId(i))
      val k = Extractor.extractDoc(doc)
      val g = GoldenExtractor.extract(doc)
      if (k.doc_id != g.doc_id || k.spans != g.spans) bad.add(doc.doc_id)
      checked.incrementAndGet()
    }
    assert(checked.get == 8000L)
    assert(bad.isEmpty, s"divergent docs: $bad")
  }

  test("extraction is idempotent on re-wrapped output text spans") {
    // re-extracting a doc whose spans are already clean 'text' spans would drop
    // them (unknown kind) — instead verify determinism: extract twice == once
    val doc = SpanGen.genDoc("d000000042")
    assert(Extractor.extractDoc(doc) == Extractor.extractDoc(doc))
  }

  test("generator is deterministic and order-independent") {
    val a = SpanGen.genDoc("d000000123")
    val b = SpanGen.genDoc("d000000123")
    assert(a == b)
    // generating other docs in between must not perturb
    SpanGen.genDoc("d000000124")
    assert(SpanGen.genDoc("d000000123") == a)
  }
}
