"""Ad-hoc per-query measurement harness for the optimization rounds.

NOT the driver bench (bench.py is frozen); this exists to:
- time individual queries with the noop sink (guide §1.4) at any SF,
- capture .explain("formatted") per query into plans/r06/,
- label jobs so the UI / event logs attribute time per query.

Usage:
  python bench_extra.py time  <sf_dir> <reps> <query> [query ...]
  python bench_extra.py plan  <sf_dir> <outdir> <suffix> <query> [...]
  python bench_extra.py all   <sf_dir> <reps>          # every headline query
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gemproc2caom2_spark.session import build_session  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark():
    return build_session(
        app_name="bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
        driver_memory=os.environ.get("SPARK_GRAFT_MEM", "32g"),
    )


def _consume(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_queries(sf_dir: str, reps: int, names: list[str]) -> dict[str, list[float]]:
    import __spark_entry__ as entry

    qs = entry.queries()
    spark = _spark()
    # warmup on a cheap query so JIT/Arrow startup is not attributed
    _consume(qs["tx5_scrub"](spark, sf_dir))
    out: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        times = []
        for _ in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(name)
            t0 = time.monotonic()
            _consume(fn(spark, sf_dir))
            times.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = times
        print(json.dumps({"query": name, "reps": times, "min": min(times)}),
              flush=True)
    spark.stop()
    return out


def dump_plans(sf_dir: str, outdir: str, suffix: str, names: list[str]) -> None:
    import __spark_entry__ as entry

    qs = entry.queries()
    spark = _spark()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "time":
        time_queries(sys.argv[2], int(sys.argv[3]), sys.argv[4:])
    elif mode == "plan":
        dump_plans(sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5:])
    elif mode == "all":
        import bench

        time_queries(sys.argv[2], int(sys.argv[3]), list(bench.HEADLINE))
    else:
        raise SystemExit(f"unknown mode {mode!r}")
