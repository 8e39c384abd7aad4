"""Hidden-Markov sequence scoring as a relational fold.

Viterbi decoding over per-key event sequences with a FIXED literal
model (transition/emission/start probabilities are pipeline constants,
the usual deployment shape for session-quality / bot-detection HMMs).

Engine portability is total here: every log-probability is a
PRE-ROUNDED integer e6 literal computed once in Python (log never runs
engine-side — the ``ndcg_at_k`` literal contract), per-event emission
scores are resolved to integer pairs BEFORE the fold, and the Viterbi
recursion itself is an integer max-plus fold (``F.aggregate`` /
DuckDB ``list_reduce``) — exact on any engine at any scale.

Plan shape (100 TB): one hash aggregate collects each key's bounded
event sequence; the fold runs in codegen.  No joins, no windows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The default 2-state session-quality model: an "engaged" state that
# mostly views/clicks/purchases, and a "frustrated" state dominated by
# errors.  All literals are dyadic-free rationals rounded ONCE here.
STATES = ("engaged", "frustrated")
START = (0.7, 0.3)
TRANS = ((0.85, 0.15), (0.4, 0.6))
EMIT = (
    {"view": 0.3, "click": 0.3, "purchase": 0.2, "signup": 0.15,
     "error": 0.05},
    {"view": 0.2, "click": 0.15, "purchase": 0.05, "signup": 0.1,
     "error": 0.5},
)
UNSEEN = 0.01  # smoothing mass for observation values outside the model


def _l6(p: float) -> int:
    """Integer e6 log-probability literal (single Python rounding)."""
    return round(math.log(p) * 1e6)


def log_literals():
    """The integer literal tables both engines inline: (start, trans,
    emit, unseen) — the single source of truth for the oracle mirror."""
    start = tuple(_l6(p) for p in START)
    trans = tuple(tuple(_l6(p) for p in row) for row in TRANS)
    emit = tuple({k: _l6(p) for k, p in row.items()} for row in EMIT)
    return start, trans, emit, _l6(UNSEEN)


def viterbi_decode(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    obs_col: str,
    *,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key Viterbi decode under the module's literal 2-state HMM:
    the max-plus recursion

        s_j(t) = max_i [s_i(t-1) + logT[i][j]] + logE[j](o_t)

    folded in observation order entirely in INTEGER e6 log-space.

    Returns ``(key, n_events, best_state, best_score_e6, margin_e6)``
    — ``best_state`` indexes :data:`STATES` (ties resolve to state 0),
    ``margin_e6`` the end-state score gap (decode confidence).
    """
    start, trans, emit, unseen = log_literals()

    def escore(state: int):
        m = F.create_map(
            *[
                x
                for k, v in emit[state].items()
                for x in (F.lit(k), F.lit(v))
            ]
        )
        return F.coalesce(m[F.col(obs_col)], F.lit(unseen)).cast("long")

    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    item = F.struct(*order, escore(0).alias("e0"), escore(1).alias("e1"))
    per_key = df.groupBy(key_col).agg(
        F.sort_array(F.collect_list(item)).alias("seq")
    )
    pairs = F.transform(
        F.col("seq"), lambda s: F.array(s["e0"], s["e1"])
    )
    n = F.size(pairs)
    first = F.element_at(pairs, 1)
    init = F.array(
        F.lit(start[0]) + F.element_at(first, 1),
        F.lit(start[1]) + F.element_at(first, 2),
    )

    def step(acc, x):
        s0 = F.greatest(
            F.element_at(acc, 1) + F.lit(trans[0][0]),
            F.element_at(acc, 2) + F.lit(trans[1][0]),
        ) + F.element_at(x, 1)
        s1 = F.greatest(
            F.element_at(acc, 1) + F.lit(trans[0][1]),
            F.element_at(acc, 2) + F.lit(trans[1][1]),
        ) + F.element_at(x, 2)
        return F.array(s0, s1)

    folded = F.aggregate(
        F.slice(pairs, 2, F.greatest(n - 1, F.lit(0))), init, step
    )
    s0 = F.element_at(folded, 1)
    s1 = F.element_at(folded, 2)
    return per_key.select(
        F.col(key_col),
        n.cast("long").alias("n_events"),
        F.when(s0 >= s1, F.lit(0)).otherwise(F.lit(1)).alias("best_state"),
        F.greatest(s0, s1).cast("long").alias("best_score_e6"),
        (s0 - s1).cast("long").alias("margin_e6"),
    )
