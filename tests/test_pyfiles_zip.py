"""The spark-submit artifact must never go stale: every tracked source
module ships in dist/ocr_pipeline_spark.zip (the round-4 modules were
missing from a zip built months of commits earlier — a cluster submit
would have ImportError'd on warc/layout/semdedup)."""

import glob
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_zip_contains_every_source_module():
    zip_path = os.path.join(REPO, "dist", "ocr_pipeline_spark.zip")
    assert os.path.exists(zip_path), "run scripts/build_pyfiles.sh"
    names = set(zipfile.ZipFile(zip_path).namelist())
    missing = [
        os.path.relpath(f, REPO)
        for f in glob.glob(
            os.path.join(REPO, "ocr_pipeline_spark", "**", "*.py"),
            recursive=True,
        )
        if os.path.relpath(f, REPO) not in names
    ]
    assert not missing, f"stale dist zip, rebuild: {missing}"
