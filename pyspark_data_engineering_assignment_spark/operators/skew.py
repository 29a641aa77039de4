"""Skew mitigation for hot-key joins: deterministic salting.

AQE's skew-join splitting (on in ``session.py``) handles most skew at
runtime by splitting oversized partitions of a sort-merge join. Salting
is the plan-level tool for the case AQE can't fix: a shuffled join where
single keys are so hot that one task would still receive a partition-
sized chunk after splitting, or where the join is hash-based.

Technique: the large (skewed) side spreads each hot key across
``n_salts`` sub-keys via a deterministic per-row hash; the small side is
replicated once per salt. The join key becomes (key, salt) - hot keys
now occupy ``n_salts`` tasks instead of one. Replication cost:
``|small| x n_salts`` rows shuffled, so pick n_salts ~ the worst
key-frequency ratio, not blindly large.

Everything is a built-in expression (xxhash64 / explode) - codegen'd,
deterministic under retries (no rand(), which would break task-retry
correctness for the salted side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key_cols: list[str],
    n_salts: int,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large`` x ``small`` on ``key_cols`` with the large
    side salted into ``n_salts`` sub-keys per key. Semantics equal a
    plain join for ``inner`` and ``left`` (each large row joins exactly
    one replica of its matching small rows).

    The salt is a deterministic hash over the large side's whole row
    (all columns), so retried tasks re-derive identical salts.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salts))
    salted_large = large.withColumn("_salt", salt)
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_large.join(
        replicated_small, on=[*key_cols, "_salt"], how=how
    ).drop("_salt")
