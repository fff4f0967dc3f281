"""The spark-submit ``--py-files`` artifact must match the working tree.

``learnedspatial_spark.zip`` is what a cluster run actually executes
(run_pipeline.py / README deployment section).  It goes stale silently:
a round-4 review found the shipped zip still carrying pre-fix dedup
code after the source was fixed.  This test makes that drift a loud
failure — rebuild with ``python tools_make_zip.py`` after any engine or
oracle change (same commit).
"""

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(REPO, "learnedspatial_spark.zip")
PACKAGES = ("learnedspatial_spark", "oracle")  # tools_make_zip.py's set


def _tree_py_files():
    for pkg in PACKAGES:
        for dirpath, _, files in os.walk(os.path.join(REPO, pkg)):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    yield os.path.relpath(full, REPO)


def test_py_files_zip_matches_working_tree():
    with zipfile.ZipFile(ZIP) as z:
        in_zip = {n for n in z.namelist() if n.endswith(".py")}
        in_tree = set(_tree_py_files())
        missing = sorted(in_tree - in_zip)
        extra = sorted(in_zip - in_tree)
        assert not missing and not extra, (
            f"zip out of sync (rebuild: python tools_make_zip.py); "
            f"missing={missing} extra={extra}")
        differing = [n for n in sorted(in_tree)
                     if z.read(n) != open(os.path.join(REPO, n), "rb").read()]
        assert not differing, (
            f"zip content stale for {differing} — "
            f"rebuild: python tools_make_zip.py")
