"""Generate golden verdict fixtures (run once; output is checked in).

The analog of regenerating the reference's *.expected.xml goldens
(/root/reference/gemProc2caom2/tests/test_main_app.py:174-180 writes
actual next to expected on mismatch). Uses ONLY the pure-Python oracle
(tests/oracle.py) — never Spark — so the goldens are an independent
check on the Spark implementation.

Usage: python tests/gen_goldens.py
"""

from __future__ import annotations

import base64
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gemproc2caom2_spark.sources.datagen import generate_pandas  # noqa: E402
from tests import oracle  # noqa: E402

N_DOCS = 60
SEED = 42


def main() -> None:
    pdf = generate_pandas(N_DOCS, SEED)
    goldens = []
    for row in pdf.itertuples(index=False):
        res = oracle.process_document(row.html, row.text)
        goldens.append(
            {
                "url": row.url,
                "category": row.category,
                "lang_pred": res["lang_pred"],
                "quality": res["quality"],
                "perplexity": res["perplexity"],
                "drop_reason_pre_dedup": res["drop_reason_pre_dedup"],
                # base64 so byte-identity survives JSON round-trip exactly
                "scrubbed_text_b64": (
                    base64.b64encode(res["scrubbed_text"].encode("utf-8")).decode()
                    if res["scrubbed_text"] is not None
                    else None
                ),
                "text_extracted_b64": (
                    base64.b64encode(res["text_extracted"].encode("utf-8")).decode()
                    if res["text_extracted"] is not None
                    else None
                ),
            }
        )
    out = Path(__file__).parent / "data" / "expected_verdicts.json"
    out.write_text(json.dumps(goldens, indent=1, ensure_ascii=True))
    n_drop = sum(1 for g in goldens if g["drop_reason_pre_dedup"])
    print(f"wrote {len(goldens)} goldens ({n_drop} pre-dedup drops) -> {out}")


if __name__ == "__main__":
    main()
