"""Regenerate SURVEY.md §8 (implementation map) from the query registry.

Usage: python scripts/gen_survey_map.py
Rewrites everything after the '## 8.' heading in SURVEY.md.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdataindexing_spark import registry  # noqa: E402

HEADER = "## 8. Implementation map (auto-generated from the query registry)"


def render() -> str:
    specs = sorted(registry.all_specs().values(), key=lambda s: s.name)
    n_oracle = sum(1 for s in specs if s.oracle is not None)
    lines = [
        HEADER,
        "",
        f"{len(specs)} declared queries, {n_oracle} with duckdb SQL oracles",
        "(the rest are contract-verified in `tests/`). Builders live in the "
        "named module;",
        "every entry is exported through `__spark_entry__.queries()` / "
        "`oracle_sql()`.",
        "",
        "| Query | Module | Tags | Verification |",
        "|---|---|---|---|",
    ]
    for s in specs:
        mod = s.builder.__module__.replace("bigdataindexing_spark.", "")
        verif = (
            "duckdb SQL oracle"
            if s.oracle is not None
            else "pytest contract (rows-only driver check)"
        )
        lines.append(f"| `{s.name}` | `{mod}` | {', '.join(s.tags)} | {verif} |")
    return "\n".join(lines) + "\n"


def main() -> None:
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")
    text = open(path).read()
    new = re.sub(r"## 8\..*\Z", render(), text, flags=re.S)
    open(path, "w").write(new)
    print("SURVEY.md §8 regenerated")


if __name__ == "__main__":
    main()
