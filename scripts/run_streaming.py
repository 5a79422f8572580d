"""spark-submit entry point: incremental streaming run (AvailableNow).

The gem_proc_run_vos / run_by_state analog: same stage chain, different
source + persisted watermark (/root/reference/gemProc2caom2/
composable.py:74-77,135-160; config/config.yml:63-73). The streaming
checkpoint dir plays state.yml.

  python scripts/run_streaming.py --input DIR --output DIR --checkpoint DIR
"""

from __future__ import annotations

import os
import sys

# repo root on sys.path: these scripts live in scripts/; when shipped
# via --py-files the package is already importable and this is a no-op
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from gemproc2caom2_spark.session import build_session
    from gemproc2caom2_spark.streaming.incremental import run_available_now

    spark = build_session(app_name="gemproc-streaming", master=args.master)
    try:
        run_available_now(spark, args.input, args.output, args.checkpoint)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
