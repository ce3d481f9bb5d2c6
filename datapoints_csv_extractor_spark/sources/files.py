"""File discovery: batch pruning/ordering and live top-k selection.

Mirrors the reference's scan operators (SURVEY.md §2.1 S1-S4):

- ``find_historical_files`` -> csv_extractor.py:239-262
  glob ``*.csv``; when a time range is given keep only files whose stem
  has >2 ``_``-parts AND a parseable trailing int ts strictly inside
  ``(time_from, time_until)`` (both bounds EXCLUSIVE, each optional);
  sort ascending by ts with missing-ts files treated as ts=0.
- ``find_live_files`` -> csv_extractor.py:265-280
  newest ≤20 files by mtime, skipping files modified <1 s ago (writer
  settle guard) and files that vanish between glob and stat.

This enumeration is driver-side metadata work, exactly like Spark's own
FileIndex listing; the per-file data processing stays distributed. At
100 TB / millions-of-files scale the same pruning predicate runs as a
Catalyst partition filter over a ts-partitioned layout instead (see
sources/tebis_csv.py notes), or the listing itself is distributed with
``spark.createDataFrame(paths)`` + a mapInPandas stat pass.
"""

from __future__ import annotations

import time
from pathlib import Path


def _stem_timestamp(path: Path) -> int | None:
    """Trailing ``_<int>`` of the stem when it has >2 parts, else None."""
    parts = path.stem.split("_")
    if len(parts) > 2:
        try:
            return int(parts[-1])
        except ValueError:
            return None
    return None


def find_historical_files(
    folder_path: str | Path,
    time_from: int | None = None,
    time_until: int | None = None,
) -> list[Path]:
    """Pruned, ascending-by-file-ts list of csv paths (S1+S2+S3)."""
    folder = Path(folder_path)
    all_paths = list(folder.glob("*.csv"))

    if time_from or time_until:
        kept = []
        for path in all_paths:
            ts = _stem_timestamp(path)
            if ts is None:
                # Range given but no parseable ts -> file is skipped
                # (csv_extractor.py:244-254 only appends on success).
                continue
            if (not time_from or time_from < ts) and (not time_until or ts < time_until):
                kept.append(path)
        all_paths = kept

    # Ascending by ts; files without a ts sort as ts=0 (:256-262).
    return sorted(all_paths, key=lambda p: (_stem_timestamp(p) or 0, str(p)))


def find_live_files(
    folder_path: str | Path,
    max_files: int = 20,
    settle_seconds: float = 1.0,
) -> list[Path]:
    """Newest ``max_files`` settled csv paths by mtime, newest first (S4)."""
    folder = Path(folder_path)
    before = time.time() - settle_seconds
    candidates: list[tuple[Path, float]] = []
    for path in folder.glob("*.csv"):
        try:
            mtime = path.stat().st_mtime
        except OSError:
            # File vanished between glob and stat (multiple extractors)
            # -> skip, like csv_extractor.py:270-273.
            continue
        if mtime < before:
            candidates.append((path, mtime))
    candidates.sort(key=lambda pm: pm[1], reverse=True)
    return [p for p, _ in candidates[:max_files]]
