"""Package the engine for spark-submit --py-files.

Usage: python scripts/make_pyfiles_zip.py [out.zip]

The analog of the reference's container packaging
(/root/reference/Dockerfile, scripts/gem_proc_run.sh): everything the
executors need in one artifact. Executor Python workers do NOT inherit
the driver's sys.path — shipping the zip is mandatory off-box.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "gemproc2caom2_spark.zip"
    pkg = REPO / "gemproc2caom2_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg.rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    print(out)


if __name__ == "__main__":
    main()
