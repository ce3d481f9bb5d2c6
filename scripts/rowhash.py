#!/usr/bin/env python
"""Order-insensitive result hash for declared queries (A/B identity check).

Usage: python scripts/rowhash.py <sf_dir> q1 q2 ...
Prints `<query> <nrows> <sha256>` per query, hashing the sorted repr of
all rows (floats rounded to 9 significant digits to absorb non-semantic
float formatting; result values themselves are deterministic).
"""
from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, "/root/repo")


def _norm(v):
    if isinstance(v, float):
        return float(f"{v:.9g}")
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir
    import __spark_entry__ as entry
    from datapoints_csv_extractor_spark.session import get_spark

    spark = get_spark(
        app_name="rowhash",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.ansi.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        cols = sorted(df.columns)
        rows = sorted(
            repr(tuple(_norm(r[c]) for c in cols)) for r in df.collect()
        )
        h = hashlib.sha256("\n".join(rows).encode()).hexdigest()
        print(f"{name} {len(rows)} {h}", flush=True)


if __name__ == "__main__":
    main()
