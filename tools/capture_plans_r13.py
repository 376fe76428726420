"""Capture explain("formatted") for named queries into plans/r13/<name>_<tag>.txt.

Usage: python tools/capture_plans_r13.py <tag> [name ...]
With no names, captures the 13 bench-flagged queries.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biocache_store_spark.io import sf_dir  # noqa: E402
from biocache_store_spark.queries import load_all  # noqa: E402
from biocache_store_spark.session import get_spark  # noqa: E402


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    data_dir = sf_dir()
    spark = get_spark(app_name="plan-capture-r13")
    registry = load_all()
    if not names:
        names = [n for n, q in sorted(registry.items()) if q.bench]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = registry[name].spark_fn(spark, data_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
