"""Permanent gate for the rounding-boundary audit (VERDICT r7 #3b).

scripts/audit_round_boundaries.py strips every oracle's rounding sites,
re-runs the unrounded SQL in duckdb, and measures each produced value's
distance to its rounding half-boundary against the exact-rational floor
and the wobble-relative threshold. The q124 r07 driver red (a value
EXACTLY on the half grid) is the class this pins shut: any future oracle
whose rounded value sits within noise reach of a boundary fails here
before it can flake in a driver window.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_no_oracle_value_near_rounding_boundary(sf_dir):
    import audit_round_boundaries as arb

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = arb.main(sf_dir)
    tail = "\n".join(buf.getvalue().splitlines()[-6:])
    assert rc == 0, f"boundary audit flagged values:\n{tail}"
