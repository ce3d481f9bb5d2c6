"""Scalar column expressions for the TEBIS wide-CSV semantics.

Each function returns a JVM-side Column expression (whole-stage-codegen
eligible; no Python UDFs) mirroring one scalar rule of the reference:

- header split on the LAST colon   -> csv_extractor.py:148-149
  (``col_name.rpartition(":")``: name = part after last ':', trimmed;
  external_id = part before last ':', trimmed; '' when no colon)
- decimal-comma float parse        -> csv_extractor.py:99
  (``float(value_string.replace(",", "."))``; parse failure -> skip)
- epoch seconds -> milliseconds    -> csv_extractor.py:103
  (``int(ts) * 1000``)
- filename batch timestamp         -> csv_extractor.py:245-248
  (trailing ``_<int>`` of the stem, only when the stem has >2 parts)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def header_name(header: Column | str) -> Column:
    """Series name: substring after the LAST ':', whitespace-trimmed.

    ``rpartition`` yields the whole string when no ':' exists, and so
    does ``substring_index(h, ':', -1)``.
    """
    h = F.col(header) if isinstance(header, str) else header
    return F.trim(F.substring_index(h, ":", -1))


def header_external_id(header: Column | str) -> Column:
    """External id: substring before the LAST ':', whitespace-trimmed.

    ``rpartition(':')[0]`` is '' when the header has no colon; the
    anchored regex below likewise yields '' on no-match. A plain
    ``split(h, ':')[0]`` would be WRONG for ids that themselves contain
    ':' (SURVEY.md §7 "what's hard" #3).
    """
    h = F.col(header) if isinstance(header, str) else header
    return F.trim(F.regexp_extract(h, r"^(.*):[^:]*$", 1))


def decimal_comma_double(value: Column | str) -> Column:
    """Parse a decimal-comma numeric string to DOUBLE; NULL when invalid.

    ``try_cast`` keeps the reference's skip-don't-fail contract
    (csv_extractor.py:98-102) as NULL-then-filter, fully JVM-side.
    """
    v = F.col(value) if isinstance(value, str) else value
    return F.replace(v, F.lit(","), F.lit(".")).try_cast("double")


def seconds_to_ms(ts_seconds: Column | str) -> Column:
    """Epoch-seconds string -> epoch-milliseconds LONG (NULL if invalid)."""
    t = F.col(ts_seconds) if isinstance(ts_seconds, str) else ts_seconds
    return t.try_cast("long") * F.lit(1000)


def file_timestamp(path: Column | str) -> Column:
    """Trailing ``_<epoch>`` of a csv filename stem; NULL when absent.

    Only filenames whose stem has more than two '_'-separated parts
    carry a timestamp (``len(filename_parts) > 2`` at
    csv_extractor.py:246); e.g. ``TEBIS_FK_1550092560.csv`` -> 1550092560
    but ``data_1.csv`` -> NULL.
    """
    p = F.col(path) if isinstance(path, str) else path
    stem = F.regexp_extract(p, r"([^/\\]+)\.[Cc][Ss][Vv]$", 1)
    has_ts = F.size(F.split(stem, "_")) > 2
    trailing = F.regexp_extract(stem, r"_(\d+)$", 1)
    return F.when(has_ts & (trailing != ""), trailing.cast("long"))
