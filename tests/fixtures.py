"""Synthetic TEBIS wide-CSV generator (FIXTURES.md §1 parameters).

Re-creates the reference's fixture shapes (tests/test_files/TEBIS_FK_*)
plus the under-tested edges: decimal comma, empty cells, bad floats,
ids containing ':', missing filename timestamp, named-ts-column header.
"""

from __future__ import annotations

import random
from pathlib import Path


def write_tebis_csv(
    folder: Path,
    prefix: str = "TEBIS_FK",
    file_ts: int | None = 1550092560,
    n_series: int = 3,
    n_rows: int = 60,
    start_ts: int | None = None,
    cadence_s: int = 1,
    null_rate: float = 0.0,
    bad_value_rate: float = 0.0,
    id_colon_rate: float = 0.0,
    seed: int = 42,
    headers: list[str] | None = None,
    units: list[str] | None = None,
) -> Path:
    rng = random.Random(seed)
    start = start_ts if start_ts is not None else (file_ts or 1550092500) - n_rows
    name = f"{prefix}_{file_ts}.csv" if file_ts is not None else f"{prefix}.csv"
    path = folder / name

    if headers is None:
        headers = []
        for i in range(n_series):
            ext_id = f"ns:sensor:{i}" if rng.random() < id_colon_rate else f"{seed * 100 + i}"
            headers.append(f"{ext_id} : SERIES{i}")
    if units is None:
        units = ["°C", "bar", "h", "mA", "G"][: len(headers)]
        units += [""] * (len(headers) - len(units))

    lines = [";" + ";".join(headers)]
    lines.append("Zeitstempel;" + ";".join(units))
    for r in range(n_rows):
        ts = start + r * cadence_s
        cells = []
        for i in range(len(headers)):
            roll = rng.random()
            if roll < null_rate:
                cells.append("")
            elif roll < null_rate + bad_value_rate:
                cells.append("not-a-number")
            else:
                cells.append(f"{rng.randint(0, 99)},{rng.randint(0, 999999):06d}")
        lines.append(f"{ts};" + ";".join(cells))

    path.write_text("\n".join(lines) + "\n", encoding="latin-1")
    return path
