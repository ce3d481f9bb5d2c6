"""Property-based parity: the Spark ingest plan vs a pure-Python model
of the reference's parse semantics (csv_extractor.py:92-160).

Hypothesis generates adversarial wide-CSV shapes — ids with colons and
spaces, empty cells, garbage floats, varying widths — and the
distributed plan must emit exactly the datapoint set the reference's
dict-pivot loop would.
"""

from __future__ import annotations

from pathlib import Path

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datapoints_csv_extractor_spark.sources.tebis_csv import read_datapoints

# Header atoms: no ';' (delimiter), '"' (quote), or newlines; colons
# allowed INSIDE external ids (the last-colon split must survive them).
_id_alphabet = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789:_.", min_size=1, max_size=12
).filter(lambda s: not s.endswith(":"))
_name_alphabet = st.text(
    alphabet="ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_", min_size=1, max_size=10
)

_value_cell = st.one_of(
    st.just(""),  # empty -> skipped
    st.just("garbage"),  # unparseable -> skipped
    st.just("NaN-ish"),  # unparseable -> skipped
    st.builds(
        lambda a, b: f"{a},{b:06d}", st.integers(-99, 99), st.integers(0, 999999)
    ),  # decimal comma
    st.builds(lambda a: str(a), st.integers(-1000, 1000)),  # plain int
)


@st.composite
def tebis_file(draw):
    n_series = draw(st.integers(1, 5))
    n_rows = draw(st.integers(0, 8))
    headers = [
        f"{draw(_id_alphabet)} : {draw(_name_alphabet)}" for _ in range(n_series)
    ]
    start_ts = draw(st.integers(1_500_000_000, 1_600_000_000))
    rows = [
        [draw(_value_cell) for _ in range(n_series)] for _ in range(n_rows)
    ]
    return headers, start_ts, rows


def _reference_model(headers, start_ts, rows):
    """The reference's semantics, as plain Python (dict-pivot loop):
    split header on LAST ':', strip; skip empty/unparseable cells;
    value = float(cell.replace(',', '.')); ts_ms = epoch_s * 1000."""
    expected = set()
    for col_idx, header in enumerate(headers):
        ext_id, _, name = header.rpartition(":")
        ext_id, name = ext_id.strip(), name.strip()
        for row_idx, row in enumerate(rows):
            cell = row[col_idx]
            if cell == "":
                continue
            try:
                v = float(cell.replace(",", "."))
            except ValueError:
                continue
            expected.add((ext_id, name, (start_ts + row_idx) * 1000, v))
    return expected


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=tebis_file())
def test_ingest_matches_reference_model(spark, tmp_path_factory, data):
    headers, start_ts, rows = data
    folder = tmp_path_factory.mktemp("prop")
    lines = [";" + ";".join(headers), "Zeitstempel;" + ";".join("u" for _ in headers)]
    for i, row in enumerate(rows):
        lines.append(f"{start_ts + i};" + ";".join(row))
    path = folder / "PROP_FK_1550092560.csv"
    path.write_text("\n".join(lines) + "\n", encoding="latin-1")

    got = {
        (r.external_id, r.name, r.ts_ms, r.value)
        for r in read_datapoints(spark, [path]).collect()
    }
    assert got == _reference_model(headers, start_ts, rows)
