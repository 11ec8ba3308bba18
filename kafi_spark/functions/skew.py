"""Skew-robust equi-join via key salting.

AQE's skew-join splitting (on in this engine's sessions) handles most
skew at runtime; explicit salting remains the tool when one join key
dominates so hard that even split partitions bottleneck, or when AQE is
unavailable (e.g. inside some streaming micro-batches).

Mechanics: left rows scatter across ``salt`` sub-keys; right rows
replicate to ALL sub-keys (replication factor = ``salt``, so size the
salt to the skew, not to the cluster). The join key becomes
(key, sub-key) — a hot key's rows now land on ``salt`` reducers instead
of one.

The scatter must be deterministic (Spark retries recompute partitions),
so it hashes the full left row: distinct rows of a hot key spread;
EXACT duplicate rows co-locate (they are indistinguishable — dedupe
first if a single row value dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the left side salted against hot keys.

    Semantically identical to ``left.join(right, on, how)`` for
    ``inner`` and ``left`` joins (right rows are replicated, so
    right-side multiplicity is preserved per salt bucket). Other join
    types are refused — their semantics do not survive replication.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    l = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)).cast("int"),
    )
    r = right.withColumn(
        "__salt", F.explode(F.lit(list(range(salt))))
    )
    return l.join(r, keys + ["__salt"], how).drop("__salt")
