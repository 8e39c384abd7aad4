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
    stamped: dict[str, str] = {}
    for f in sorted(glob.glob(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "CORRECTNESS_r0*.json")
    )):
        rnd = os.path.basename(f)[len("CORRECTNESS_"):-len(".json")]
        data = json.load(open(f))
        for name, row in data.items():
            if name in stamped:
                continue
            ok = (
                row.get("rows_match")
                and row.get("schema_match") is not False
                and not row.get("err")
            )
            stamped[name] = f"{rnd} {'green' if ok else 'SEE JSON'}"
    lines = [
        "# Query index",
        "",
        f"{len(qs)} queries ({sum(1 for q in qs if q in oracles)} "
        "oracle-backed, "
        f"{sum(1 for q in qs if q not in oracles)} rows-only).  "
        "Driver stamps from CORRECTNESS_r0*.json; unstamped entries are "
        "covered by the local oracle sweep (tools/check_oracle.py) and "
        "the unit suite.",
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
