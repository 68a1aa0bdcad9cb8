"""Page-fidelity golden tests: byte-identical output on hand-reviewed
fixtures (SURVEY.md §5.2.2 — the graft formalizes the reference's
golden-output verification practice, docs/notes.md:82-85)."""

import pathlib

import pytest

from ocr_pipeline_spark.kernel import extract_page

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
CASES = sorted(p.stem for p in GOLDEN_DIR.glob("*.html"))


@pytest.mark.parametrize("name", CASES)
def test_golden_byte_identical(name):
    html = (GOLDEN_DIR / f"{name}.html").read_bytes()
    expected = (GOLDEN_DIR / f"{name}.md").read_text()
    result = extract_page(html, describe=True)
    assert result.markdown == expected, (
        f"{name}: output differs from golden (byte comparison)"
    )


def test_goldens_exist():
    assert len(CASES) >= 6
