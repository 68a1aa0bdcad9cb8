"""Deterministic multi-page PDF corpus for the S2 page-explode path.

Same contract as gen_pages: every byte is a pure function of
(seed, doc_id), so any cluster regenerates the identical corpus.  The
built PDFs are minimal but REAL — catalog, page tree with /Kids,
per-page FlateDecode (or raw) content streams with Tj/TJ text
operators — i.e. exactly the structures sources/pdf.py parses, plus
valid enough for any external reader.
"""

from __future__ import annotations

import random
import zlib

from pyspark.sql import DataFrame, SparkSession

_WORDS = (
    "spark arrow shuffle catalyst tungsten parquet iceberg manifest "
    "page extract markdown heading table figure crawl host bucket "
    "vector cluster partition salt skew broadcast lineage snapshot"
).split()


def _escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_layout_content(
    title: str, col_a: list[str], col_b: list[str]
) -> str:
    """Two-column page content stream whose STREAM ORDER INTERLEAVES
    the columns (b0 a0 b1 a1 ... after the title) — the adversarial
    input for XY-cut reading order: stream-order extraction scrambles
    the columns, layout-aware extraction must yield
    title, col_a..., col_b...  Column x origins (72 / 320) leave a
    gutter wider than the cut threshold; the title sits above a
    >10pt band."""
    ops = ["BT /F1 14 Tf 72 740 Td", f"({_escape(title)}) Tj"]
    rows = max(len(col_a), len(col_b))
    for j in range(rows):
        y = 700 - 14 * j
        if j < len(col_b):
            ops.append(f"1 0 0 1 320 {y} Tm")
            ops.append(f"({_escape(col_b[j])}) Tj")
        if j < len(col_a):
            ops.append(f"1 0 0 1 72 {y} Tm")
            ops.append(f"({_escape(col_a[j])}) Tj")
    ops.append("ET")
    return " ".join(ops)


def build_pdf_raw_streams(
    streams: list[str], compress: bool = True
) -> bytes:
    """Like build_pdf but each page's content stream is given verbatim
    (for layout fixtures that position text themselves)."""
    return _build(streams, compress)


def build_pdf(page_texts: list[str], compress: bool = True) -> bytes:
    """Minimal valid multi-page PDF with one content stream per page."""
    streams = []
    for text in page_texts:
        lines = text.split("\n")
        ops = ["BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(lines):
            if j:
                ops.append("0 -14 Td")
            ops.append(f"({_escape(line)}) Tj")
        ops.append("ET")
        streams.append(" ".join(ops))
    return _build(streams, compress)


def _build(page_streams: list[str], compress: bool = True) -> bytes:
    """Minimal valid multi-page PDF with one content stream per page."""
    objects: list[bytes] = []  # bodies; object number = index + 1

    n = len(page_streams)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()  # 2
    )
    for i, ops_text in enumerate(page_streams):
        page_obj = 3 + 2 * i
        content_obj = page_obj + 1
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {content_obj} 0 R >>"
            ).encode()
        )
        stream = ops_text.encode()
        if compress:
            payload = zlib.compress(stream)
            head = f"<< /Length {len(payload)} /Filter /FlateDecode >>"
        else:
            payload = stream
            head = f"<< /Length {len(payload)} >>"
        objects.append(
            head.encode() + b"\nstream\n" + payload + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def doc_pdf(seed: int, doc_id: int) -> tuple[str, bytes, int]:
    """(url, pdf_bytes, n_pages) for one corpus document."""
    rng = random.Random((seed << 20) ^ doc_id)
    n_pages = rng.randint(1, 5)
    texts = []
    for p in range(n_pages):
        n_lines = rng.randint(2, 6)
        texts.append(
            "\n".join(
                " ".join(rng.choice(_WORDS) for _ in range(rng.randint(4, 9)))
                for _ in range(n_lines)
            )
        )
    url = f"https://pdf-host-{doc_id % 17}.example/doc{doc_id}.pdf"
    return url, build_pdf(texts, compress=rng.random() < 0.7), n_pages


def report_pdf(seed: int, doc_id: int) -> tuple[str, bytes]:
    """(url, pdf_bytes) for one LAYOUT-RICH report page: an 18pt title,
    a 14.5pt section heading, 12pt body paragraphs, and a positioned
    table whose cell x-origins align across rows — the fixture for
    heading/table reconstruction from positions (page_markdown_xy).
    Deterministic in (seed, doc_id)."""
    rng = random.Random((seed << 21) ^ (doc_id * 2654435761))
    title = " ".join(rng.choice(_WORDS) for _ in range(3)).title()
    heading = " ".join(rng.choice(_WORDS) for _ in range(2)).title()
    paras = [
        " ".join(rng.choice(_WORDS) for _ in range(rng.randint(5, 9)))
        for _ in range(rng.randint(2, 4))
    ]
    n_rows = rng.randint(2, 4)
    cols = [72, 250, 420]
    table = [
        [
            f"{rng.choice(_WORDS)}-{rng.randint(0, 99)}"
            for _ in cols
        ]
        for _ in range(n_rows + 1)  # header + rows
    ]
    ops = ["BT /F1 18 Tf 72 740 Td", f"({_escape(title)}) Tj"]
    y = 700.0
    for p in paras[: len(paras) // 2 + 1]:
        ops.append(f"/F1 12 Tf 1 0 0 1 72 {y:g} Tm")
        ops.append(f"({_escape(p)}) Tj")
        y -= 14
    y -= 16
    ops.append(f"/F1 14.5 Tf 1 0 0 1 72 {y:g} Tm")
    ops.append(f"({_escape(heading)}) Tj")
    y -= 20
    ops.append("/F1 12 Tf")
    for row in table:
        for x, cell in zip(cols, row):
            ops.append(f"1 0 0 1 {x} {y:g} Tm")
            ops.append(f"({_escape(cell)}) Tj")
        y -= 16
    y -= 8
    for p in paras[len(paras) // 2 + 1 :]:
        ops.append(f"1 0 0 1 72 {y:g} Tm")
        ops.append(f"({_escape(p)}) Tj")
        y -= 14
    ops.append("ET")
    url = f"https://report-host-{doc_id % 13}.example/report{doc_id}.pdf"
    return url, build_pdf_raw_streams(
        [" ".join(ops)], compress=rng.random() < 0.7
    )


def generate_pdfs_df(
    spark: SparkSession, n_docs: int, seed: int = 42
) -> DataFrame:
    """documents(url, payload) with multi-page PDF payloads."""
    rows = [
        (url, bytearray(data))
        for url, data, _ in (doc_pdf(seed, i) for i in range(n_docs))
    ]
    return spark.createDataFrame(rows, "url string, payload binary")
