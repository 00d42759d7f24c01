"""Capture `.explain("formatted")` output and (optionally) noop-sink
timings for named queries — the measurement harness for optimization
rounds (guide §1: measure first, keep the plan evidence).

Usage:
    python tools/plan_capture.py --out plans/r14 --suffix before \
        [--sf-dir /root/testdata/sf0.1] [--time] [query ...]

With no query names: the bench HEADLINE + EXTRA_REPRESENTATIVES set.
`--time` additionally runs each query to a noop sink (1 warm + 2
measured, best reported) so computation is timed without sink effects.
"""

from __future__ import annotations

import argparse
import io
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--time", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import bench
    from t_spoon_spark.registry import all_queries
    from t_spoon_spark.session import build_spark

    names = args.queries or (list(bench.HEADLINE) + list(bench.EXTRA_REPRESENTATIVES))
    qs = all_queries()
    spark = build_spark(app_name="plan_capture")
    outdir = REPO / args.out
    outdir.mkdir(parents=True, exist_ok=True)

    timings: dict[str, float] = {}
    for name in names:
        if name not in qs:
            print(f"# {name}: NOT REGISTERED", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, args.sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (outdir / f"{name}_{args.suffix}.txt").write_text(buf.getvalue())
            line = f"# {name}: plan captured"
            if args.time:
                samples = []
                spark.sparkContext.setJobDescription(f"plan_capture:{name}")
                for i in range(3):
                    t0 = time.time()
                    qs[name](spark, args.sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = time.time() - t0
                    if i > 0:
                        samples.append(dt)
                spark.sparkContext.setJobDescription(None)
                timings[name] = round(min(samples), 3)
                line += f" noop_best={min(samples):.3f}s"
            print(line, file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — capture must survive any query
            print(f"# {name}: FAILED {type(exc).__name__}: {exc}", file=sys.stderr)
    if timings:
        import json

        print(json.dumps(timings, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
