"""Multi-dimensional file layout: Z-order (Morton) clustering.

Parquet prunes row groups on per-column min/max statistics, but a sort
helps only its leading column: a ts-sorted events table answers time
slices cheaply while every user_id predicate still scans everything.
Interleaving the bits of several normalized columns into one Morton
key and sorting by IT gives every participating column locality, so
row-group stats become selective for all of them at once — the
standard lakehouse technique (Delta/Iceberg ``OPTIMIZE ZORDER BY``)
expressed here as plain Spark expressions.

Scale shape: two parameter-sized min/max aggregates (one row) + a
range repartition + within-partition sort — exactly what a normal
sorted write costs; the Morton key itself is a pure codegen'd
projection (no UDF, no shuffle beyond the write's own range
partitioning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16


def _normalize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column onto [0, 2^bits) integer space."""
    span = max(hi - lo, 1e-300)
    scaled = ((col.cast("double") - F.lit(lo)) / F.lit(span)) * F.lit(
        (1 << bits) - 1
    )
    return F.least(
        F.greatest(F.round(scaled, 0).cast("long"), F.lit(0)),
        F.lit((1 << bits) - 1),
    )


def morton_key(normalized: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Interleave the bits of pre-normalized [0, 2^bits) columns into
    one Morton code (column i contributes bit j at position
    j*n_cols+i). Pure bitwise expression — whole-stage codegen.

    The interleaved width must fit the POSITIVE range of a long:
    bit 63 is the sign bit (rows landing there would sort BEFORE the
    low keys) and shifts >= 64 wrap mod 64 on the JVM, silently
    aliasing distinct keys — either corrupts the clustering with no
    error, so an oversized request fails loudly instead. Callers that
    want per-column adaptation: bits = 63 // len(cols)."""
    n = len(normalized)
    if n == 0:
        raise ValueError("morton_key needs at least one column")
    if n * bits > 63:
        raise ValueError(
            f"morton_key: {n} columns x {bits} bits = {n * bits} interleaved "
            "bits exceeds the 63 positive bits of a long; pass "
            f"bits <= {63 // n} (e.g. bits = 63 // n_cols)"
        )
    key = F.lit(0).cast("long")
    for i, c in enumerate(normalized):
        for j in range(bits):
            bit = F.shiftright(c, j).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, j * n + i)
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = ZORDER_BITS,
    n_files: int = 8,
) -> None:
    """Write ``df`` clustered by the Morton key of ``cols``.

    Column ranges come from one 1-row min/max aggregate (driver-side,
    parameter-sized); the write range-partitions by the key so files
    tile the Z-curve, then sorts within partitions so row groups tile
    it too. Timestamp columns are keyed by their epoch seconds.

    The bit budget adapts to the column count (bits is capped at
    63 // n_cols) so a 4+-column z-order narrows per-column resolution
    instead of overflowing the long key. An entirely-NULL key column
    has no range and raises; rows with a NULL in SOME key column get
    that dimension coalesced to the column minimum (they cluster at
    the low edge of that axis rather than landing in
    range-partitioning limbo with a NULL key).
    """
    if cols:
        bits = min(bits, 63 // len(cols))
    probes = []
    keyed = df
    key_cols = []
    for name in cols:
        c = F.col(name)
        if dict(df.dtypes).get(name, "").startswith("timestamp"):
            c = F.unix_timestamp(c.cast("timestamp")).cast("double")
        kc = f"__z_{name}"
        keyed = keyed.withColumn(kc, c.cast("double"))
        key_cols.append(kc)
        probes += [F.min(kc).alias(f"lo_{name}"), F.max(kc).alias(f"hi_{name}")]
    rng = keyed.agg(*probes).collect()[0]
    for name in cols:
        if rng[f"lo_{name}"] is None:
            raise ValueError(
                f"write_zordered: z-order column {name!r} is entirely NULL — "
                "it has no range to normalize; drop it from cols or fill it"
            )
    normalized = [
        _normalize(
            F.coalesce(F.col(kc), F.lit(float(rng[f"lo_{name}"]))),
            float(rng[f"lo_{name}"]),
            float(rng[f"hi_{name}"]),
            bits,
        )
        for kc, name in zip(key_cols, cols)
    ]
    (
        keyed.withColumn("__zkey", morton_key(normalized, bits))
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *key_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
