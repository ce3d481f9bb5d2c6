#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count,
sorted column names, and the order-insensitive multiset of values
(exact equality after normalization; floats also get an isclose
fallback report so near-misses are visible before they become driver
hash mismatches).

The Spark session runs with ``spark.sql.ansi.enabled=true`` by default
— the driver builds its own session where Spark 4's ANSI default is ON,
so every query must survive ANSI semantics (no silent long wraps, no
invalid-cast NULLs) regardless of the engine's own ansi=false default.
Set SPARK_GRAFT_ANSI=0 to check under the engine session instead.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _type_family(t: str) -> str:
    """Collapse a Spark dtype or DuckDB type name to a comparison
    family. The driver hashes RAW cell values, so a DuckDB DECIMAL /
    HUGEINT / DATE against a Spark double / long / timestamp is a
    driver hash mismatch even when ``norm_cell`` makes the local sweep
    look exact — that exact gap shipped round 5's only red row
    (q_quantile_sketch_rollup). This gate fails the pair BEFORE value
    comparison so local green implies driver green."""
    t = t.lower()
    if t.startswith("decimal") or t in ("hugeint", "uhugeint"):
        return "decimal"
    if t in ("double", "float", "real", "float64", "float32"):
        return "float"
    if t in ("bigint", "int", "integer", "smallint", "tinyint", "long",
             "short", "byte", "ubigint", "uinteger", "usmallint",
             "utinyint", "int64", "int32"):
        return "int"
    if t.startswith("timestamp"):
        return "timestamp"
    if t == "date":
        return "date"
    if t in ("string", "varchar", "text"):
        return "str"
    if t in ("boolean", "bool"):
        return "bool"
    return t


def dtype_parity_problems(s_dtypes, d_cols, d_types):
    """Return a list of per-column dtype-family mismatches between the
    Spark result schema and the DuckDB oracle output. DECIMAL/HUGEINT
    on the oracle side is ALWAYS a failure (the driver's hash sees
    Decimal objects); date-vs-timestamp likewise."""
    spark_fam = {c: _type_family(t) for c, t in s_dtypes}
    problems = []
    for c, t in zip(d_cols, [str(x) for x in d_types]):
        df_fam = _type_family(t)
        sf_fam = spark_fam.get(c)
        if sf_fam is None:
            continue  # column-name mismatch is reported separately
        if df_fam == "decimal":
            problems.append(
                f"oracle col {c!r} is {t} (DECIMAL/HUGEINT) vs spark "
                f"{sf_fam} — CAST it in the oracle SQL"
            )
        elif df_fam != sf_fam:
            problems.append(
                f"oracle col {c!r} is {t} ({df_fam}) vs spark {sf_fam}"
            )
    return problems


def norm_cell(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat() + " 00:00:00"
    if isinstance(v, float) and v.is_integer():
        return v
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def cells_close(a, b):
    if isinstance(a, float) and isinstance(b, (float, int)):
        if math.isnan(a) and math.isnan(float(b)):
            return True
        return math.isclose(a, float(b), rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def main() -> int:
    import __spark_entry__ as E
    from datapoints_csv_extractor_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import os

    ansi = os.environ.get("SPARK_GRAFT_ANSI", "1") != "0"
    spark = get_spark(
        app_name="check-oracle",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.ansi.enabled": "true" if ansi else "false",
        },
    )
    print(f"spark.sql.ansi.enabled={ansi} (driver mirror)" if ansi else "ansi off")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    unknown = sorted(only - set(qs))
    if unknown:
        # A typo'd sweep must not masquerade as green ("0 failures"
        # over 11 of 12 requested queries) — fail loudly up front.
        print(f"FAIL  unknown query name(s): {unknown}")
        print(f"\n{len(unknown)} failures: {unknown}")
        return 1
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows-only  {name}: {len(s_rows)} rows (no oracle)")
            continue
        try:
            rel = con.sql(sql)
            d_cols = rel.columns
            d_rows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures.append(name)
            continue

        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        elif s_cols != d_cols:
            # Column ORDER parity: the value comparison below sorts
            # columns by name, so an order-only divergence is invisible
            # here — but it is a latent driver risk and every oracle in
            # the repo is expected to mirror its Spark twin's SELECT
            # order exactly (round-9 advice: q_bpe_apply shipped with a
            # reordered oracle that only this check would catch).
            problems.append(
                f"column ORDER differs: spark={s_cols} duckdb={d_cols}"
            )
        problems.extend(dtype_parity_problems(df.dtypes, d_cols, rel.types))
        if not problems:
            sn, dn = norm_rows(s_cols, s_rows), norm_rows(d_cols, d_rows)
            exact = sn == dn
            if not exact:
                n_bad, max_diff, first = 0, 0.0, None
                for a, b in zip(sn, dn):
                    if a == b:
                        continue
                    for x, y in zip(a, b):
                        if x != y and not cells_close(x, y):
                            n_bad += 1
                            if first is None:
                                first = (x, y)
                        if isinstance(x, float) and isinstance(y, (int, float)):
                            try:
                                max_diff = max(max_diff, abs(x - float(y)))
                            except (TypeError, OverflowError):
                                pass
                if n_bad:
                    problems.append(f"{n_bad} cells differ beyond tolerance, first={first}")
                else:
                    problems.append(
                        f"float-noise only (max abs diff {max_diff:.2e}) — "
                        "driver hash would MISMATCH; tighten rounding"
                    )
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"ok    {name}: {len(s_rows)} rows exact-match")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
