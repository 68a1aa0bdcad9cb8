"""Classification contract + dispatch + full page kernel tests."""

from ocr_pipeline_spark.kernel.blocks import PageStats
from ocr_pipeline_spark.kernel.classify import (
    CONFIDENCE_FLOOR,
    classify_stats,
    dispatch_strategy,
    normalize_classification,
    wants_description,
)
from ocr_pipeline_spark.kernel.page import compute_spans, extract_page, finalize_page

ARTICLE = (
    "<html><body><main><h1>Spark at Scale</h1>"
    "<p>Distributed execution requires careful shuffle planning across many "
    "executors so partitions stay balanced and no single host dominates.</p>"
    "<p>Adaptive query execution re-plans joins at runtime using observed "
    "statistics from completed stages of the physical plan.</p>"
    "<ul><li>partitioning</li><li>salting</li><li>broadcast</li></ul>"
    "</main></body></html>"
)

TABLE_PAGE = (
    "<body><table><tr><th>metric</th><th>value</th></tr>"
    "<tr><td>docs/sec</td><td>1200</td></tr>"
    "<tr><td>efficiency</td><td>0.85</td></tr>"
    "<tr><td>executors</td><td>32</td></tr></table>"
    "<p>brief note</p></body>"
)

FLOWCHART_PAGE = (
    "<body><pre class='mermaid'>flowchart TD\n[Start] --> [Validate]\n"
    "[Validate] --> [Process]\n[Process] --> [End]</pre></body>"
)

MIXED_PAGE = (
    "<body><h1>Report</h1>"
    "<p>A long explanatory paragraph describing the architecture in enough "
    "detail that the text share of the page is clearly significant for the "
    "classifier to see it as real prose content.</p>"
    "<pre>[A] --> [B]\n[B] --> [C]</pre>"
    "<table><tr><th>x</th><th>y</th></tr><tr><td>1</td><td>2</td></tr></table>"
    "</body>"
)


# --- classification -------------------------------------------------------
def test_text_page_classification():
    r = extract_page(ARTICLE)
    assert r.classification["type"] == "text"
    assert r.classification["has_text"] is True
    assert r.classification["has_tables"] is False
    assert r.classification["confidence"] >= CONFIDENCE_FLOOR


def test_table_page_classification():
    r = extract_page(TABLE_PAGE)
    assert r.classification["type"] == "table"
    assert r.classification["has_tables"] is True


def test_flowchart_page_classification():
    r = extract_page(FLOWCHART_PAGE)
    assert r.classification["type"] == "flowchart"
    assert r.classification["has_diagrams"] is True


def test_mixed_page_classification():
    r = extract_page(MIXED_PAGE)
    assert r.classification["type"] == "mixed"
    assert r.classification["has_tables"] is True
    assert r.classification["has_diagrams"] is True


def test_empty_page_gets_padding_default():
    r = extract_page("<body><nav><a href='/'>only nav</a></nav></body>")
    assert r.classification["type"] == "mixed"
    assert r.classification["confidence"] == 0.5
    assert r.markdown == ""


def test_confidence_bounds_and_rounding():
    c = classify_stats(PageStats(text_chars=5000))
    assert 0.5 <= c["confidence"] <= 0.98
    assert round(c["confidence"], 2) == c["confidence"]


# --- normalization (graft of parse_classification) ------------------------
def test_normalize_whitelists_type():
    assert normalize_classification({"type": "BANANA"})["type"] == "mixed"
    assert normalize_classification({"type": "Table"})["type"] == "table"
    assert normalize_classification(None)["type"] == "mixed"


def test_normalize_coerces_confidence():
    assert normalize_classification({"confidence": "0.9"})["confidence"] == 0.9
    assert normalize_classification({"confidence": "high"})["confidence"] == 0.5
    assert normalize_classification({})["confidence"] == 0.5


# --- dispatch (graft of get_prompt, threshold 0.7) -------------------------
def test_low_confidence_falls_back_to_mixed_strategy():
    assert dispatch_strategy({"type": "flowchart", "confidence": 0.69}) == "markdown"
    assert dispatch_strategy({"type": "flowchart", "confidence": 0.7}) == "describe"
    assert dispatch_strategy(None) == "markdown"
    assert dispatch_strategy({"type": "weird", "confidence": 0.9}) == "markdown"


def test_wants_description_gate():
    assert wants_description({"type": "diagram"})
    assert wants_description({"type": "flowchart"})
    assert wants_description({"type": "mixed", "has_diagrams": True})
    assert not wants_description({"type": "mixed", "has_diagrams": False})
    assert not wants_description({"type": "text", "has_diagrams": True})


# --- finalize (A1 merge + A2 header) ---------------------------------------
def test_header_format():
    md, method, _ = finalize_page("Body.", {"type": "text", "confidence": 0.87,
                                            "method": "dom-heuristic-v1"}, "", 3)
    assert md == (
        "<!-- Page 3 | Type: text | Confidence: 87% | Method: dom-heuristic-v1 -->"
        "\n\nBody."
    )
    assert method == "dom-heuristic-v1"


def test_pure_diagram_description_replaces_text():
    md, method, _ = finalize_page(
        "```\nraw\n```", {"type": "flowchart", "confidence": 0.9, "method": "x"},
        "Flowchart with 2 nodes.", 1,
    )
    assert "raw" not in md
    assert "Flowchart with 2 nodes." in md
    assert method == "diagram-describe-v1"


def test_mixed_description_appended():
    md, _, _ = finalize_page(
        "Main text.", {"type": "mixed", "confidence": 0.8, "method": "m"},
        "A diagram.", 1,
    )
    assert "Main text." in md
    assert "\n\n---\n*Diagram description:*\n\nA diagram." in md


def test_empty_text_page_yields_empty_markdown():
    md, _, spans = finalize_page("", {"type": "text", "confidence": 0.9, "method": "m"}, "", 1)
    assert md == "" and spans == []


# --- spans -----------------------------------------------------------------
def test_spans_cover_and_index_markdown():
    r = extract_page(MIXED_PAGE, describe=True)
    assert r.spans
    for s in r.spans:
        assert 0 <= s["start"] < s["end"] <= len(r.markdown)
        assert r.markdown[s["start"]:s["end"]].strip()
    kinds = [s["block_type"] for s in r.spans]
    assert kinds[0] == "meta"
    assert "table" in kinds


def test_span_kinds():
    md = "<!-- m -->\n\n# H\n\npara\n\n- a\n- b\n\n| x | y |\n| 1 | 2 |\n\n```\ncode\n\nmore\n```\n\n> q"
    kinds = [s["block_type"] for s in compute_spans(md)]
    assert kinds == ["meta", "heading", "paragraph", "list", "table", "code", "quote"]


def test_fenced_block_with_blank_lines_is_one_span():
    md = "```\na\n\nb\n```"
    spans = compute_spans(md)
    assert len(spans) == 1
    assert spans[0]["end"] == len(md)


# --- describe path in the kernel -------------------------------------------
def test_describe_flag_controls_description():
    off = extract_page(FLOWCHART_PAGE, describe=False)
    on = extract_page(FLOWCHART_PAGE, describe=True)
    assert off.description == ""
    assert on.description != ""
    assert on.method == "diagram-describe-v1"
    assert "Nodes: Start; Validate; Process; End" in on.markdown


def test_kernel_is_deterministic():
    a = extract_page(MIXED_PAGE, describe=True)
    b = extract_page(MIXED_PAGE, describe=True)
    assert a.markdown == b.markdown
    assert a.spans == b.spans
