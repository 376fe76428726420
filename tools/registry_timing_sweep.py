"""Time EVERY registered query at sf0.1 (noop sink, one warm session).

Ranks the full operator surface by wall-clock so optimization rounds can
see where time actually goes beyond the 13 bench-flagged queries.

Usage: python tools/registry_timing_sweep.py [sf_dir] [passes]
Writes /tmp/registry_sweep.json and prints the ranking.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biocache_store_spark.queries import load_all  # noqa: E402
from biocache_store_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="registry-timing-sweep")
    registry = load_all()
    times: dict[str, float] = {}
    for name, q in sorted(registry.items()):
        best = float("inf")
        try:
            for _ in range(passes):
                t0 = time.perf_counter()
                q.spark_fn(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                best = min(best, time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: {exc}")
            best = -1.0
        times[name] = round(best, 3)
        print(f"{name:40s} {best:7.3f}")
    ranked = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    with open("/tmp/registry_sweep.json", "w") as f:
        json.dump(ranked, f, indent=1)
    print("== slowest 20 ==")
    for n, t in list(ranked.items())[:20]:
        print(f"{n:40s} {t:7.3f}")
    print(f"total(min-of-{passes}): {sum(t for t in times.values() if t > 0):.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
