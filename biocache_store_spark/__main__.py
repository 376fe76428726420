"""`python -m biocache_store_spark <tool> ...` — see cli.py."""

from biocache_store_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
