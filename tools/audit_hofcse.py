#!/usr/bin/env python
"""HOF-CSE audit: find array EXPRESSIONS captured inside lambda/callback
bodies — the O(n²) class fixed in round 7.

Spark does not common-subexpression-eliminate inside higher-order-
function lambdas: an expression referenced in a lambda body is
re-evaluated PER ELEMENT.  When that expression itself builds an array
over the row (tokenize, transform, slice chains), the per-element
re-evaluation turns an O(n) operator into O(n²) — invisible at unit-test
sizes, ruinous at corpus scale.  Round-7 finds of exactly this shape:

- ``minhash _word_shingle_hashes``: element_at over the inline
  token-hash transform — sf0.1 colds 49.9→8.3 s (pairs), 61.2→2.8 s
  (capped), 57.7→1.1 s (bucket report);
- ``rsi``: diff lambda's element_at over the inline value projection —
  20.2→5.4 s;
- ``chunk_documents``: window lambdas re-tokenizing per chunk.

The fix is always the same: stage the array behind a projection
boundary (a ``select`` alias) and reference the bound COLUMN.

This script flags (a) locals assigned an ``F.<array-builder>(...)``
call that are then referenced inside an ``ast.Lambda``, and (b) the
same capture inside nested ``def`` callbacks.  Hits are LEADS, not
verdicts — two benign shapes recur: a literal array (constant-folded
by Catalyst before execution) and an expression used as a HOF's INPUT
argument (evaluated once per call, not per element).  Verify each hit
by reading whether the reference sits inside the lambda BODY.

Usage: python tools/audit_hofcse.py [package_dir]
Exits 0 always (advisory); prints one line per lead.

Known-benign leads (triaged round 7 — all three are HOF *inputs*,
evaluated once per call, and identical sibling expressions inside one
projection are CSE'd by WholeStageCodegen subexpression elimination):

- embedding.py mmr_select/cos: ``dot`` IS the aggregate's result,
  used outside any lambda body;
- similarity.py pq_encode/dists_for_sub: ``subv`` slice feeds
  zip_with as its input argument (k sibling aggregates share it
  within the one staged projection);
- similarity.py pq_search/table_entry: ``subq`` — same shape.
"""

from __future__ import annotations

import ast
import glob
import os
import sys

ARRAY_BUILDERS = {
    "transform", "split", "filter", "slice", "sequence", "zip_with",
    "array_distinct", "aggregate", "concat", "collect_list",
    "sort_array", "arrays_zip",
}


def expr_locals(fn: ast.FunctionDef) -> dict:
    out = {}
    for node in ast.walk(fn):
        if (
            isinstance(node, ast.Assign)
            and len(node.targets) == 1
            and isinstance(node.targets[0], ast.Name)
        ):
            v = node.value
            if (
                isinstance(v, ast.Call)
                and isinstance(v.func, ast.Attribute)
                and isinstance(v.func.value, ast.Name)
                and v.func.value.id == "F"
                and v.func.attr in ARRAY_BUILDERS
            ):
                out[node.targets[0].id] = node.lineno
    return out


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "smartpy_arc_spark",
    )
    leads = 0
    for path in sorted(glob.glob(os.path.join(root, "**", "*.py"),
                                 recursive=True)):
        tree = ast.parse(open(path).read())
        for fn in [n for n in ast.walk(tree)
                   if isinstance(n, ast.FunctionDef)]:
            ev = expr_locals(fn)
            if not ev:
                continue
            closures = [n for n in ast.walk(fn)
                        if isinstance(n, ast.Lambda)]
            closures += [n for n in fn.body
                         if isinstance(n, ast.FunctionDef)]
            for cl in closures:
                args = {a.arg for a in cl.args.args}
                kind = "lambda" if isinstance(cl, ast.Lambda) else (
                    f"nested-def {cl.name}")
                for name in [n for n in ast.walk(cl)
                             if isinstance(n, ast.Name)]:
                    if name.id in ev and name.id not in args:
                        print(
                            f"{os.path.relpath(path)}:{cl.lineno} "
                            f"fn={fn.name} {kind} captures expr-local "
                            f"'{name.id}' (assigned line {ev[name.id]})"
                        )
                        leads += 1
                        break
    print(f"\n{leads} leads (verify each: input-args and literal arrays "
          f"are benign; per-element body references are the O(n²) bug)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
