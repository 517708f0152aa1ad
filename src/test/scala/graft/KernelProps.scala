package graft

import org.scalacheck.{Arbitrary, Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.core.{Doc, InKind, Span}
import graft.golden.GoldenExtractor
import graft.kernel.{Chunker, Extractor}

/** Property tests (SURVEY.md §5.2 item 3). The central property is
  * adversarial kernel-vs-golden parity on arbitrary (including malformed)
  * documents — this is what proves the kernel's literal-trigger prefilter
  * and fast paths are output-equivalent, beyond the generator corpus. */
object KernelProps extends Properties("kernel") {

  private val interesting: Gen[String] = Gen.oneOf(
    "Mr. James Smith met with Dr. Ada Lovelace yesterday",
    "withheld under (b)(7)(C) and (B)(5) exemptions",
    "$1,234.56 was paid on March 14, 2023",
    "call (202) 555-0100 or foia.officer@justice.gov",
    "DOC-123456 23-cv-4567 FOIA-2023-99 AB-1234-5678",
    "p=2;y=100;x=0|body of the block",
    "p=bad;header|still a block",
    """<a href="/x">link text</a> trailing words""",
    "&amp;lt; &nbsp; &quot;quoted&#39;",
    "Washington, DC and 12 Oak St., Denver, CO 80201",
    "line one\nline two\nline three\n",
    "", "   ", "\n\n\n", "<unclosed tag swallows this",
    "a<b>c</b>d", "Mrs. X", "Ms.", "(b)(", "(b)(9)", "$",
    "Federal Records Agency of Springfield, IL")

  private val anyText: Gen[String] = Gen.frequency(
    4 -> interesting,
    2 -> Gen.asciiPrintableStr,
    1 -> Arbitrary.arbitrary[String], // arbitrary unicode
    1 -> Gen.const(null: String))

  private val anyKind: Gen[String] = Gen.frequency(
    3 -> Gen.oneOf(InKind.HtmlBlock, InKind.HtmlBoiler, InKind.HtmlLink,
      InKind.PdfBlock, InKind.Media, InKind.Redaction),
    1 -> Gen.oneOf("bogus", "", "TEXT", null: String))

  private val anySpan: Gen[Span] = for {
    k <- anyKind
    t <- anyText
    m <- Gen.oneOf(null: String, "", "m://d/1", "ref with spaces")
    off <- Arbitrary.arbitrary[Int]
  } yield Span(k, t, m, off)

  private val anyDoc: Gen[Doc] = for {
    n <- Gen.choose(0, 30)
    spans <- Gen.listOfN(n, anySpan)
  } yield Doc("prop-doc", spans.toVector)

  private val validKinds = Set("text", "media", "redaction")
  private def kindOk(k: String) = validKinds(k) || k.startsWith("entity:")

  property("kernel == golden on arbitrary docs (span-sequence equality)") =
    forAll(anyDoc) { d => Extractor.extractDoc(d).spans == GoldenExtractor.extract(d).spans }

  property("output offsets are dense 0..n-1") = forAll(anyDoc) { d =>
    val out = Extractor.extractDoc(d).spans
    out.map(_.offset) == out.indices
  }

  property("extraction is deterministic") = forAll(anyDoc) { d =>
    Extractor.extractDoc(d) == Extractor.extractDoc(d)
  }

  property("output kinds come from the output vocabulary") = forAll(anyDoc) { d =>
    Extractor.extractDoc(d).spans.forall(s => kindOk(s.kind))
  }

  property("media spans all survive, refs normalized, relative order kept") =
    forAll(anyDoc) { d =>
      val expected = d.spans.sortBy(_.offset).collect {
        case s if s.kind == InKind.Media => if (s.media_ref == null) "" else s.media_ref
      }
      Extractor.extractDoc(d).spans.filter(_.kind == "media").map(_.media_ref) == expected
    }

  property("fused cleanHtml == reference formulation on arbitrary strings") =
    forAll(Gen.oneOf(interesting, Gen.asciiPrintableStr, Arbitrary.arbitrary[String])) { s =>
      Extractor.cleanHtml(s) == Extractor.cleanHtmlSlow(s)
    }

  // ---------------------------------------------------------------- chunker

  private val para: Gen[String] = Gen.frequency(
    5 -> Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)),
    1 -> Gen.const(""), 1 -> Gen.const("  "))
  private val chunkInput: Gen[(String, Int)] = for {
    ps <- Gen.listOf(para)
    max <- Gen.choose(1, 60)
  } yield (ps.mkString("\n\n"), max)

  property("chunker: joining all chunks reconstructs the text exactly") =
    forAll(chunkInput) { case (text, max) =>
      // reference semantics (extract.py:215-237): nothing trimmed, nothing
      // dropped — chunking is a pure partition of the paragraph sequence
      Chunker.chunk(text, max).mkString("\n\n") == text
    }

  property("chunker: every chunk fits the cap or is a single oversize paragraph") =
    forAll(chunkInput) { case (text, max) =>
      Chunker.chunk(text, max).forall(c => c.length <= max || !c.contains("\n\n"))
    }
}
