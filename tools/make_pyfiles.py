"""Build the --py-files zip for spark-submit deployment.

Usage: python tools/make_pyfiles.py [out_zip]
Produces dist/lmss_entity_extractor_spark.zip containing the package
(pure source; executors unpack it onto sys.path).
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "lmss_entity_extractor_spark"


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "dist" / "lmss_entity_extractor_spark.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(PKG.rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
        # the frozen stop-word fixture ships inside the zip too
        for fx in sorted((REPO / "fixtures").glob("*.txt")):
            zf.write(fx, fx.relative_to(REPO))
    print(out)


if __name__ == "__main__":
    main()
