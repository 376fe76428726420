"""Regenerate API.md: every public function/class per module with its
docstring summary — the one-page map a user migrating from the reference
needs. Run after adding operators: python tools/gen_api_docs.py
"""

from __future__ import annotations

import importlib
import inspect
import os
import pkgutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import biocache_store_spark  # noqa: E402

SKIP = {"biocache_store_spark.queries"}  # documented via SURVEY §8 registry


def first_line(obj) -> str:
    doc = inspect.getdoc(obj) or ""
    return doc.split("\n")[0].strip()


def main() -> None:
    lines = [
        "# API reference (auto-generated — tools/gen_api_docs.py)",
        "",
        "Public entry points per module; full semantics live in each",
        "docstring (with reference file:line citations). The 132-query",
        "registry is documented separately in SURVEY.md §8.",
        "",
    ]
    pkg = biocache_store_spark
    mods = []
    for m in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        if any(m.name.startswith(s) for s in SKIP):
            continue
        mods.append(m.name)
    for name in sorted(mods):
        try:
            mod = importlib.import_module(name)
        except Exception as exc:  # noqa: BLE001
            print(f"skip {name}: {exc}")
            continue
        entries = []
        for attr, obj in sorted(vars(mod).items()):
            if attr.startswith("_"):
                continue
            if not (inspect.isfunction(obj) or inspect.isclass(obj)):
                continue
            if getattr(obj, "__module__", None) != name:
                continue
            try:
                sig = str(inspect.signature(obj))
            except (TypeError, ValueError):
                sig = "(...)"
            if len(sig) > 80:
                sig = sig[:77] + "..."
            entries.append(f"* `{attr}{sig}` — {first_line(obj)}")
        if not entries:
            continue
        lines.append(f"## `{name}`")
        lines.append("")
        lines.append(first_line(mod))
        lines.append("")
        lines.extend(entries)
        lines.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "API.md"), "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote API.md ({len(lines)} lines)")


if __name__ == "__main__":
    main()
