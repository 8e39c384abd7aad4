"""Size-guarded eager localCheckpoint for O(input)-sized intermediates.

``localCheckpoint(eager=True)`` makes a repeated-subtree plan single-pass
(guide §2.4/§5), but it is the WRONG trade when the frame being pinned is
proportional to the input: at the 100 TB tier it converts a column-pruned
parquet re-scan into a cluster-wide MEMORY_AND_DISK write of the whole
intermediate, and — because local checkpoints are non-replicated and
truncate lineage — one lost executor after materialization fails the job
instead of recomputing (VERDICT r11 item 1).

:func:`sized_local_checkpoint` keeps the single-pass property exactly
where it is cheap and drops to recompute-from-lineage where it is not:

- the decision input is the SUM OF LEAF-RELATION SIZES of the frame's
  optimized plan — exact file bytes for parquet scans, the propagated
  Catalyst estimate for upstream checkpoint RDDs (measured: a
  localCheckpoint's ``LogicalRDD`` carries its origin plan's stats).
  Plan-level stats are useless here (a join node's default estimate is
  the PRODUCT of its children), leaf sums are robust;
- a per-site ``scale`` factor expresses known super-linear expansion
  (e.g. the frequent-itemsets pair explosion is bounded by
  ``max_basket/2`` rows per basket-item row);
- frames whose leaves carry no size (``createDataFrame`` locals,
  ``defaultSizeInBytes`` sentinels) keep the status-quo checkpoint;
- the budget is ``$SMARTPY_ARC_CKPT_CAP_BYTES`` (default 8 GiB — a
  single-node storage-tier budget; production clusters should set it to
  roughly the cluster's storage-memory headroom).  Every frame this
  module guards is deterministic (distinct / joins / filters of
  deterministic inputs), so the recompute path is semantics-preserving.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_DEFAULT_CAP_BYTES = 8 * 1024**3
# Long.MaxValue (and anything close) marks an unsized leaf
_UNSIZED_SENTINEL = 1 << 62


def ckpt_cap_bytes() -> int:
    return int(
        os.environ.get("SMARTPY_ARC_CKPT_CAP_BYTES", _DEFAULT_CAP_BYTES)
    )


def leaf_input_bytes(df: DataFrame) -> int | None:
    """Sum of the optimized plan's leaf-relation sizes in bytes, or None
    when any leaf is unsized (status quo applies then)."""
    try:
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        total = 0
        for i in range(leaves.size()):
            size = int(str(leaves.apply(i).stats().sizeInBytes()))
            if size >= _UNSIZED_SENTINEL:
                return None
            total += size
        return total
    except Exception:
        return None


def sized_local_checkpoint(
    df: DataFrame,
    *,
    scale: float = 1.0,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Eager serialized localCheckpoint when ``leaf_input_bytes * scale``
    fits the cap; the unmodified (recompute-from-lineage) frame when it
    does not — see module docstring for the trade."""
    est = leaf_input_bytes(df)
    if est is not None and est * scale > ckpt_cap_bytes():
        return df
    return df.localCheckpoint(eager=True, storageLevel=storage_level)
