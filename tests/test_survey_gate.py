"""SURVEY gate numbers are machine-checked against their committed
artifacts (VERDICT r10 item 3: four consecutive rounds carried a gate
number no committed artifact contained — the rule is now mechanical).

SURVEY.md holds one or more fenced ``gate-citations`` JSON blocks.
Each claim names an artifact file at the repo root, a dotted path into
its JSON, and either an exact value (``eq``) or a ``[lo, hi]`` band
(bands absorb the measured ±40% run-to-run noise of single-sample
work_ms — VERDICT r10 item 4 — so a claim survives a driver re-run of
the same code but a genuinely divergent number goes red). An optional
``quote`` is a literal substring the SURVEY prose must contain, tying
the human-readable paragraph to the checked claim.
"""

from __future__ import annotations

import json
import math
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SURVEY = (ROOT / "SURVEY.md").read_text()

BLOCK_RE = re.compile(r"```gate-citations\n(.*?)```", re.DOTALL)


def _blocks() -> list[dict]:
    blocks = BLOCK_RE.findall(SURVEY)
    assert blocks, "SURVEY.md must contain a gate-citations block"
    return [json.loads(b) for b in blocks]


def _resolve(artifact: str, path: str):
    f = ROOT / artifact
    assert f.exists(), f"cited artifact {artifact} is not committed"
    node = json.loads(f.read_text())
    for key in path.split("."):
        assert isinstance(node, dict) and key in node, (
            f"{artifact}: path {path} breaks at {key!r}"
        )
        node = node[key]
    return node


def test_gate_citations_match_committed_artifacts():
    n_claims = 0
    for block in _blocks():
        for claim in block["claims"]:
            value = _resolve(claim["artifact"], claim["path"])
            where = f"{claim['artifact']}:{claim['path']}"
            if "eq" in claim:
                assert isinstance(value, (int, float)) and math.isclose(
                    value, claim["eq"], rel_tol=0, abs_tol=1e-9
                ), f"{where} = {value}, SURVEY quotes {claim['eq']}"
            else:
                lo, hi = claim["lo"], claim["hi"]
                assert lo <= value <= hi, (
                    f"{where} = {value}, outside the SURVEY band "
                    f"[{lo}, {hi}]"
                )
            if "quote" in claim:
                assert claim["quote"] in SURVEY, (
                    f"SURVEY prose lost the quoted claim {claim['quote']!r} "
                    f"backing {where}"
                )
            n_claims += 1
    assert n_claims >= 5, "gate-citations block looks gutted"


def test_gate_registry_count_matches_entrypoint():
    """The registry size quoted in SURVEY's gate must equal the live
    queries() registry (point claims about our own code are exact,
    not banded)."""
    import sys

    sys.path.insert(0, str(ROOT))
    import __spark_entry__ as E

    counts = re.findall(r"registry (\d+)\s+entries", SURVEY)
    assert counts, "SURVEY gate must state 'registry N entries'"
    # Earlier rounds' gate paragraphs are history; only the LAST
    # (current) gate claim must match the live registry.
    assert int(counts[-1]) == len(E.queries()), (
        f"SURVEY's current gate says registry {counts[-1]}, live "
        f"registry has {len(E.queries())}"
    )


def test_window_composition_table_matches_live_registry():
    """The rotation-ledger discipline, made mechanical (the same
    spirit as the citation checks): the LATEST round's
    window-composition table in SURVEY must list exactly the first
    50 queries() entries, in order — a rotation that forgets to
    update the ledger (or a ledger edit that drifts from the code)
    goes red instead of waiting for the judge's diff."""
    import sys

    sys.path.insert(0, str(ROOT))
    import __spark_entry__ as E

    anchor = SURVEY.rindex("window composition")
    rows = re.findall(
        r"\|\s*\d+\s*\|\s*(q[\w]*)\s*\|", SURVEY[anchor:]
    )[:50]
    live = list(E.queries())[:50]
    assert rows == live, (
        "SURVEY window-composition table drifted from the live "
        f"registry; first mismatch: "
        f"{next(((i, a, b) for i, (a, b) in enumerate(zip(rows, live), 1) if a != b), None)}"
    )
