"""Build the --py-files archive for spark-submit.

    python tools/make_pyfiles_zip.py [/tmp/engine.zip]

Zips rdf_dtdl_fabric_ontology_converter_spark/ (source only, no caches)
with fixed timestamps so the archive bytes are reproducible — rebuilding
without source changes yields an identical file, which keeps cluster
deploy diffs and cache keys stable.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

PKG = "rdf_dtdl_fabric_ontology_converter_spark"


def build(out_path: str, repo_root: Path | None = None) -> str:
    root = repo_root or Path(__file__).resolve().parent.parent
    pkg_dir = root / PKG
    files = sorted(p for p in pkg_dir.rglob("*.py")
                   if "__pycache__" not in p.parts)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(root)),
                                   date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, p.read_bytes(), zipfile.ZIP_DEFLATED)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/engine.zip"
    print(build(out))
