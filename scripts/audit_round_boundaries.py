"""Rounding-boundary audit over every registered oracle (VERDICT r7 #3b).

The q124_unpivot driver red was caused by AVG(l_tax) landing EXACTLY on
the 1e-6 half boundary: duckdb's parallel aggregation sums in a
nondeterministic order, so the pre-round double wobbles by ~1 ulp around
the boundary and ROUND flips between runs/environments even though both
engines are "correct". No post-round comparison can catch this class —
the builder's sweep and the driver both see internally-consistent rounds
that happen to disagree.

This audit catches it at the source: for each registered oracle, strip
every non-nested ROUND(expr, d) down to (expr), run the modified SQL in
duckdb, and for every float column measure the distance of value*10^d to
the nearest half-integer (the rounding decision boundary). A distance
below THRESHOLD means a summation-order wobble can flip the rounded
digit — the query must move to exact decimal/integer arithmetic (the
q124 fix pattern: DECIMAL micro-units + (2*s + n) DIV (2*n)).

Scales where the true value is *on* the grid (distance ~0.5 from the
half boundary) are safe: e.g. ROUND(SUM(2-decimal values), 4) — the sum
is an exact multiple of 0.01, nowhere near a 1e-4 half boundary.

Usage: python scripts/audit_round_boundaries.py  [SPARK_GRAFT_SF_DIR]
Exits non-zero if any site is within THRESHOLD of a boundary.
"""

from __future__ import annotations

import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdataindexing_spark import registry  # noqa: E402
from tests.oracle import make_duckdb  # noqa: E402

# A value is dangerous when its distance to the half boundary is within
# reach of cross-engine noise. Two noise classes:
#   (1) exact-rational boundary hits — the true value IS on (or within
#       float-representation error of) the half grid, so engines disagree
#       structurally. Distance ~0..1e-10 in grid units. ABS_FLOOR catches
#       these (q124's AVG(l_tax) had distance exactly 0.0).
#   (2) summation-order / libm-ulp wobble — bounded by ~n_terms*eps*|v|
#       absolute, i.e. REL_WOBBLE*|v|*10^d in grid units with a very
#       generous REL_WOBBLE = 1e-11 (eps=2.2e-16 times up to ~10^4 terms,
#       plus margin for blocked parallel sums and Math.log-vs-libm ulps).
# Flag when distance < max of the two. A fixed coarse threshold does NOT
# work: with thousands of output values some value always sits ~1e-5
# from a boundary at any grid — that is statistics, not risk.
ABS_FLOOR = 1e-6
REL_WOBBLE = 1e-11

# (query, column) pairs whose rounded value is exact-by-construction —
# either ROW-LOCAL arithmetic on small integers (ratios like 23/32 or
# |A∩B|/|A|: both engines hold the bit-identical double, no
# summation-order wobble, half-up FLOOR deterministic on exact halves)
# or a deterministic division of cross-engine-identical doubles (exact
# decimal/integer sums cast to double, one IEEE op, then half-up FLOOR).
# SCOPED per query (r08 review): a bare column-name allowlist would
# silently disable auditing for any FUTURE oracle emitting a float
# column that happens to collide with a generic name like 'mean' or 'p'.
ALLOW_EXACT = {
    # row-local small-int ratios
    ("txt_quality_score", "ttr"),
    ("txt_quality_score", "avg_token_len"),
    ("txt_quality_score", "quality"),
    ("txt_repetition", "dup2_frac"),
    ("q61_quality_filter", "ttr"),
    ("dedup_ngram_jaccard", "jac"),
    ("dedup_ngram_jaccard_raw", "jac"),
    ("dedup_minhash_lsh", "jac"),
    ("dedup_delta_vs_corpus", "jac"),
    ("st9_stream_lsh_dedup", "jac"),
    ("q104_containment_pairs", "cont_ab"),
    ("q104_containment_pairs", "cont_ba"),
    ("dedup_span_fraction", "dup_frac"),
    ("q108_event_transitions", "p"),
    # deterministic division of identical doubles after exact sums
    ("q77_sql_tpch_q17", "avg_yearly"),
    ("q66_sql_tpch_q14", "promo_revenue"),
    ("q85_sql_tpch_q8", "mkt_share"),
    ("q09_tpch_q1", "avg_disc"),
    ("q50_filtered_agg", "avg_f"),
    ("q58_variant_extract", "avg_k"),
    ("q109_length_quartiles", "avg_chars"),
    ("q124_unpivot", "mean"),
}


def strip_rounds(sql: str) -> tuple[str, list[tuple[int, str | None]]]:
    """Replace each non-nested rounding site with its unrounded expr;
    return the modified SQL and a list of (scale d, output alias) pairs
    — alias is the `AS name` following the site if present, so the
    caller can audit ONLY the columns a rounding decision actually
    produces (an un-rounded exact-DECIMAL column in the same select
    must not inherit another column's grid).

    Handles both engine rounding — ROUND(expr, d) — and the repo's
    explicit half-up idiom FLOOR(expr * 1eD + 0.5) / 1eD (q124/q118/
    txt_* after the r07 fixes), so hardened sites stay under audit."""
    alias_pat = re.compile(r"\s*AS\s+([A-Za-z_][A-Za-z0-9_]*)", re.IGNORECASE)
    out, digits, i, n = [], [], 0, len(sql)
    pat = re.compile(r"(ROUND|FLOOR)\s*\(", re.IGNORECASE)
    hup_tail = re.compile(r"\*\s*1[eE](\d+)\s*\+\s*0\.5\s*$")
    hup_div = re.compile(r"\s*/\s*1[eE](\d+)")
    while i < n:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        out.append(sql[i : m.start()])
        # balanced-paren scan to the matching close
        depth, j, top_commas = 1, m.end(), []
        while j < n and depth:
            c = sql[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "," and depth == 1:
                top_commas.append(j)
            j += 1
        inner = sql[m.end() : j - 1]
        fn = m.group(1).upper()
        if fn == "FLOOR":
            mt = hup_tail.search(inner)
            md = hup_div.match(sql, j)
            if mt and md and mt.group(1) == md.group(1):
                ma = alias_pat.match(sql, md.end())
                digits.append(
                    (int(mt.group(1)), ma.group(1) if ma else None)
                )
                out.append("(" + inner[: mt.start()] + ")")
                i = md.end()
            else:  # plain FLOOR, not the half-up idiom — keep as-is
                out.append(sql[m.start() : j])
                i = j
            continue
        if top_commas:
            cut = top_commas[-1] - m.end()
            expr, d_txt = inner[:cut], inner[cut + 1 :]
            try:
                ma = alias_pat.match(sql, j)
                digits.append(
                    (int(d_txt.strip()), ma.group(1) if ma else None)
                )
            except ValueError:  # ROUND(x, col) — keep as-is
                out.append(sql[m.start() : j])
                i = j
                continue
        else:
            ma = alias_pat.match(sql, j)
            expr, _ = inner, digits.append((0, ma.group(1) if ma else None))
        out.append("(" + expr + ")")  # nested ROUNDs inside expr survive
        i = j
    return "".join(out), digits


def boundary_distance(v: float, d: int) -> float:
    y = abs(v) * (10.0**d)
    if not math.isfinite(y) or y > 2**52:
        return 0.5  # beyond double integer resolution: rounding is moot
    frac = y - math.floor(y)
    return abs(frac - 0.5)


def main(sf_dir: str | None = None) -> int:
    if sf_dir is None:
        sf_dir = (
            sys.argv[1]
            if len(sys.argv) > 1
            else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
        )
    con = make_duckdb(sf_dir)
    flagged, audited = [], 0
    for name, spec in sorted(registry.all_specs().items()):
        if spec.oracle is None:
            continue
        sql = spec.oracle_text()
        if not re.search(r"(ROUND|FLOOR)\s*\(", sql, re.IGNORECASE):
            continue
        stripped, digits = strip_rounds(sql)
        if not digits:
            continue
        try:
            tbl = con.execute(stripped).arrow()
        except Exception as e:  # stripping broke the SQL — report, move on
            print(f"AUDIT_ERR {name}: {type(e).__name__}: {str(e)[:100]}")
            continue
        audited += 1
        # per-column scales: a column audits only against the d of its
        # OWN rounding site; sites with no recoverable alias fall back
        # to every float column (conservative)
        fallback_ds = sorted({d for d, a in digits if a is None})
        by_alias: dict[str, set] = {}
        for d, a in digits:
            if a is not None:
                by_alias.setdefault(a, set()).add(d)
        # track the worst value by margin RATIO (distance / its own
        # threshold) so a small-|v| exact hit outranks a large-|v| miss
        worst = (float("inf"), 0.5, None, None, None)
        for col in tbl.column_names:
            if (name, col) in ALLOW_EXACT:
                continue
            ds = sorted(by_alias.get(col, set()) | set(fallback_ds))
            if not ds:
                continue
            arr = tbl.column(col)
            if str(arr.type) not in ("double", "float"):
                continue
            vals = [v for v in arr.to_pylist() if v is not None]
            # all-integer column = an exact integer sum (quantity-style):
            # every partial is exactly representable, wobble is zero, and
            # rounding an on-grid integer at d>=1 decimals cannot flip
            if vals and all(float(v).is_integer() for v in vals):
                continue
            for v in vals:
                for d in ds:
                    dist = boundary_distance(float(v), d)
                    thr = max(ABS_FLOOR, REL_WOBBLE * abs(v) * (10.0**d))
                    ratio = dist / thr
                    if ratio < worst[0]:
                        worst = (ratio, dist, col, float(v), d)
        if worst[0] < 1.0:
            flagged.append((name, *worst))
        print(
            f"{name}: margin_ratio={worst[0]:.3e} min_half_dist={worst[1]:.3e}"
            + (f" col={worst[2]} v={worst[3]!r} d={worst[4]}" if worst[2] else "")
        )
    print(
        f"\naudited={audited} flagged={len(flagged)} "
        f"(abs_floor={ABS_FLOOR}, rel_wobble={REL_WOBBLE})"
    )
    for f in flagged:
        print("FLAGGED", f)
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
