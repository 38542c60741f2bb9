"""Regenerate registry entry/oracle counts in COVERAGE.md and README.md.

VERDICT r4 #7: the counts drifted when they were hand-written. Run from
the repo root after adding registry entries:

    python scripts/update_counts.py

Counts come from the live registry (`queries()` / `oracle_sql()` via
`__spark_entry__`), so they can never disagree with the driver contract.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    import __spark_entry__ as entry

    n_q = len(entry.queries())
    n_o = len(entry.oracle_sql())

    cov = ROOT / "COVERAGE.md"
    text = cov.read_text()
    new = re.sub(
        r"\(\d+ entries,\n\d+ with exact DuckDB oracles\)",
        f"({n_q} entries,\n{n_o} with exact DuckDB oracles)",
        text,
        count=1,
    )
    if new == text and f"({n_q} entries" not in text:
        raise SystemExit("COVERAGE.md count pattern not found — fix manually")
    cov.write_text(new)

    readme = ROOT / "README.md"
    text = readme.read_text()
    new = re.sub(
        r"driver contract: \d+ queries, \d+ with DuckDB oracles",
        f"driver contract: {n_q} queries, {n_o} with DuckDB oracles",
        text,
        count=1,
    )
    if new == text and f"{n_q} queries" not in text:
        raise SystemExit("README.md count pattern not found — fix manually")
    readme.write_text(new)

    print(f"registry: {n_q} entries, {n_o} oracles — COVERAGE.md + README.md updated")


if __name__ == "__main__":
    main()
