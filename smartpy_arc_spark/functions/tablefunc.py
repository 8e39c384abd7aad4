"""Python UDTFs — the row-expanding escape hatch (Spark 4 surface).

A UDTF is the LAST resort in this engine's hierarchy (built-in
expressions → Pandas UDF / mapInPandas → UDTF): per-row Python with
arbitrary fan-out, lateral-joinable from SQL.  The demo function here is
deliberately one that built-ins CAN express — the unit test pins UDTF
output equal to the built-in plan, documenting both the mechanism and
the cost trade (the built-in path stays in whole-stage codegen; the
UDTF ships every row through a Python worker).

Use a UDTF in production only when the expansion logic needs a real
Python library (parser, tokenizer, decoder) per row; otherwise write
the built-in expression.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="token string, n int")
class TopTokensUDTF:
    """Per-document top-k whitespace tokens by count, ties broken
    lexicographically (deterministic — Counter.most_common alone leaves
    tie order to insertion, which is corpus-order-dependent)."""

    def eval(self, text: str, k: int):
        from collections import Counter

        counts = Counter((text or "").split())
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for token, n in ranked[: (k or 0)]:
            yield token, n


def register_udtfs(spark) -> None:
    """Register the engine's UDTFs on a session (idempotent)."""
    spark.udtf.register("top_tokens", TopTokensUDTF)
