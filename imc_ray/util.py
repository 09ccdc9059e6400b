"""Small shared utilities."""

from __future__ import annotations

import numpy as np
import pandas as pd


def join_partitions(cap: int = 64) -> int:
    """Partition count for native hash joins, sized to the live cluster.

    Ray's hash-shuffle join spins one aggregator actor pool sized
    min(num_partitions, default parallelism); when that exceeds the
    session's CPUs the aggregators starve the upstream map tasks and the
    join deadlocks (observed at num_partitions=32 on a 4-CPU test session).
    Half the cluster CPUs keeps aggregators and producers co-scheduled on
    one node; on a multi-node cluster cluster_resources() counts all nodes,
    so partition counts scale out naturally up to ``cap`` (raise cap for
    10^12-row exchanges — partitions may exceed CPUs there, bounded by the
    aggregator pool, but must never exceed what leaves producers runnable
    on the smallest deployment)."""
    try:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
    except Exception:
        ncpu = 8
    return max(2, min(cap, ncpu // 2))


def round_half_away(x, nd: int = 2):
    """Round half away from zero — DuckDB's ROUND semantics.  numpy/pandas
    round half-to-even, which flips oracle value-hashes exactly on .xxx5
    boundaries; every float that reaches a DuckDB-compared surface goes
    through this instead."""
    scale = 10.0 ** nd
    arr = np.asarray(x, dtype=np.float64)
    out = np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
    if isinstance(x, pd.Series):
        return pd.Series(out, index=x.index, name=x.name)
    return out
