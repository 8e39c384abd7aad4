#!/usr/bin/env python
"""Generate QUERY_INDEX.md: one row per declared query with its
evidence status — oracle-backed vs rows-only, and the driver round that
stamped it green (from CORRECTNESS_r0*.json).  The flat companion to
SURVEY.md's narrative batch tables.

Usage: python tools/gen_index.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as mod

    qs = mod.queries()
    oracles = set(mod.oracle_sql())
    # Union of ALL driver stamps (CORRECTNESS_r*.json — r0* missed r10+,
    # the r10 "73 stale rows" bug).  A query's row shows its FIRST green
    # stamp; a query that has never stamped green shows its LATEST failed
    # round so regressions stay visible until re-stamped.
    green: dict[str, str] = {}
    failed: dict[str, str] = {}
    for f in sorted(glob.glob(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "CORRECTNESS_r*.json")
    )):
        rnd = os.path.basename(f)[len("CORRECTNESS_"):-len(".json")]
        data = json.load(open(f))
        for name, row in data.items():
            if row.get("err") is None and row.get("hash_match"):
                green.setdefault(name, f"{rnd} green")
            elif row.get("err") == "no_oracle" and (
                row.get("spark_rows") is not None
            ):
                green.setdefault(name, f"{rnd} rows-only green")
            else:
                failed[name] = f"{rnd} FAIL"
    stamped = {**{n: s for n, s in failed.items() if n not in green}, **green}
    lines = [
        "# Query index",
        "",
        f"{len(qs)} queries ({sum(1 for q in qs if q in oracles)} "
        "oracle-backed, "
        f"{sum(1 for q in qs if q not in oracles)} rows-only).  "
        "Driver stamps from the CORRECTNESS_r*.json union; a FAIL row "
        "keeps its latest failed round until a later driver stamp "
        "re-greens it (local fixes show here only after the next "
        "driver run).",
        "",
        "| query | evidence | driver stamp |",
        "|---|---|---|",
    ]
    for name in sorted(qs):
        ev = "oracle" if name in oracles else "rows-only"
        st = stamped.get(name, "—")
        lines.append(f"| `{name}` | {ev} | {st} |")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "QUERY_INDEX.md",
    )
    open(out, "w").write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(qs)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
