#!/usr/bin/env python3
"""Reference-architecture throughput stand-in.

The reference (JordanCoin/openfoia) cannot run in this sandbox (tesseract /
LLM API dependencies), so this measures the throughput CEILING of its
architecture on the extraction semantics both engines share: a single
Python process (the reference's concurrency is asyncio.to_thread around
CPU-bound work — effectively one core for regex scanning, see
openfoia/pipeline/ocr.py:262-286 and extract.py) running the same cleaning
+ 23-pattern detection over the same corpus the Spark engine is benchmarked
on. Patterns mirror graft.core.Spec (provenance: ocr.py:248-260,
models.py:85-95, config.example.json).

Usage: python3 tools/ref_baseline.py <corpus_parquet_dir>
"""
import re
import sys
import time

import duckdb

TAG = re.compile(r"<[^>]*>|<[^>]*$")
WS = re.compile(r"\s+")
ANCHOR = re.compile(r"(?s)<a\b[^>]*>(.*?)</a>")
HEADER = re.compile(r"^p=(\d+);y=(\d+);x=(\d+)\|")

ENTITY = [re.compile(p) for p in [
    r"\b(?:Mr|Ms|Mrs|Dr)\. [A-Z][a-z]+ [A-Z][a-z]+\b",
    r"\b(?:[A-Z][a-z]+ ){1,3}(?:Agency|Bureau|Department|Commission|Office|Administration)\b",
    r"\b(?:Washington|Arlington|Springfield|Denver|Austin|Phoenix|Seattle|Portland|Chicago|Boston), [A-Z]{2}\b",
    r"\b(?:January|February|March|April|May|June|July|August|September|October|November|December) \d{1,2}, \d{4}\b|\b\d{4}-\d{2}-\d{2}\b",
    r"\$\d{1,3}(?:,\d{3})*(?:\.\d{2})?",
    r"\bDOC-\d{6,}\b",
    r"\(\d{3}\) \d{3}-\d{4}",
    r"\b[a-z][a-z0-9._]*@[a-z0-9.-]+\.(?:gov|com|org)\b",
    r"\b\d{1,5} [A-Z][a-z]+ (?:St|Ave|Blvd|Rd)\., [A-Z][a-z]+, [A-Z]{2} \d{5}(?:-\d{4})?\b",
    r"\b[A-Z]{2,4}-\d{4,}-\d{4,}\b",
    r"\b\d{2}-cv-\d{4,}\b",
    r"\bFOI[A]?-\d{4}-\d+\b",
]]
EXEMPT = [re.compile(p, re.I) for p in [
    r"\(b\)\(1\)", r"\(b\)\(2\)", r"\(b\)\(3\)", r"\(b\)\(4\)", r"\(b\)\(5\)",
    r"\(b\)\(6\)", r"\(b\)\(7\)\(A\)", r"\(b\)\(7\)\(C\)", r"\(b\)\(7\)\(D\)",
    r"\(b\)\(7\)\(E\)", r"\(b\)\(7\)\(F\)",
]]
ENTS = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
        ("&nbsp;", " "), ("&amp;", "&")]


def clean_html(s):
    s = TAG.sub("", s)
    for a, b in ENTS:
        s = s.replace(a, b)
    return WS.sub(" ", s).strip()


def detections(text, out):
    for p in ENTITY:
        out.extend(m.group() for m in p.finditer(text))
    for p in EXEMPT:
        out.extend(m.group() for m in p.finditer(text))


def extract_doc(spans):
    out = []
    for sp in sorted(spans, key=lambda x: x["offset"]):
        kind, text = sp["kind"], sp["text"] or ""
        if kind in ("html_block", "html_boiler", "html_link"):
            cleaned = clean_html(text)
            words = cleaned.count(" ") + 1 if cleaned else 0
            lines = text.count("\n") + 1
            if kind == "html_link":
                ld = 1.0
            elif not cleaned:
                ld = 0.0
            else:
                inner = " ".join(m.group(1) for m in ANCHOR.finditer(text))
                ld = len(clean_html(inner)) / len(cleaned)
            if words >= 8 and ld <= 0.33 and words / lines >= 4.0:
                out.append(cleaned)
                detections(cleaned, out)
        elif kind == "pdf_block":
            m = HEADER.match(text)
            body = WS.sub(" ", text[m.end():] if m else text).strip()
            out.append(body)
            detections(body, out)
        elif kind == "media":
            out.append(sp["media_ref"])
        elif kind == "redaction":
            t = WS.sub(" ", text).strip()
            hits = [m.group() for p in EXEMPT for m in p.finditer(t)]
            out.extend(hits or [t])
    return out


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_corpus"
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, spans FROM '{corpus}/*.parquet'").fetchall()
    docs = [(d, [dict(zip(("kind", "text", "media_ref", "offset"), s))
                 if isinstance(s, tuple) else s for s in spans])
            for d, spans in rows]
    # warm
    for d, spans in docs[:200]:
        extract_doc(spans)
    t0 = time.perf_counter()
    total_spans = 0
    for d, spans in docs:
        total_spans += len(extract_doc(spans))
    dt = time.perf_counter() - t0
    print(f"REF_BASELINE docs={len(docs)} out_spans={total_spans} "
          f"sec={dt:.2f} docs_per_sec={len(docs)/dt:.1f} (single process)")


if __name__ == "__main__":
    main()
