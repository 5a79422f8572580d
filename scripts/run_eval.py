"""spark-submit entry point: run the engine's evaluation gates.

The acceptance checks as a job: keep/drop F1 of the trained quality
classifier vs the full rule pipeline (eval1) and IVF ANN recall@k vs
exact top-k (eval2), printed as one JSON line for a scheduler to
threshold on — the reference's test-fixture acceptance
(/root/reference/gemProc2caom2/tests/test_main_app.py:171-186) turned
into a runnable pipeline stage.

Local:
  python scripts/run_eval.py --sf-dir /root/testdata/sf0.01

Cluster:
  spark-submit --py-files gemproc2caom2_spark.zip \
      scripts/run_eval.py --sf-dir s3://.../tables
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import traceback


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01",
                    help="table directory (documents/embeddings parquet)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--min-f1", type=float, default=None,
                    help="exit 1 if keep/drop F1 falls below this bar")
    ap.add_argument("--min-recall", type=float, default=None,
                    help="exit 1 if mean ANN recall falls below this bar")
    args = ap.parse_args()

    from gemproc2caom2_spark.plans.queries_text import (
        eval1_keep_drop_f1,
        eval2_ann_recall,
    )
    from gemproc2caom2_spark.session import build_session

    spark = build_session(app_name="gemproc-eval", master=args.master)
    try:
        f1_row = eval1_keep_drop_f1(spark, args.sf_dir).collect()[0].asDict()
        recall_rows = [
            r.asDict() for r in eval2_ann_recall(spark, args.sf_dir).collect()
        ]
        mean_recall = (
            sum(r["recall_r6"] for r in recall_rows) / len(recall_rows)
            if recall_rows
            else None
        )
        print(json.dumps({
            "keep_drop": f1_row,
            "ann_recall_per_query": recall_rows,
            "ann_recall_mean": round(mean_recall, 6) if mean_recall is not None else None,
        }))
        ok = True
        if args.min_f1 is not None:
            ok = ok and (f1_row["f1_r6"] or 0.0) >= args.min_f1
        if args.min_recall is not None:
            ok = ok and (mean_recall or 0.0) >= args.min_recall
        return 0 if ok else 1
    except Exception:
        traceback.print_exc()
        return 1
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
