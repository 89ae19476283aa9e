"""Skew-mitigating salted join.

AQE's skew-join split (enabled in session.py) handles most sort-merge skew
at runtime; salting is the explicit fallback for pathological single-key
hotspots (e.g. a null-ish default key holding 10% of a 100 TB fact) or for
engines/stages where AQE cannot split (e.g. a skewed aggregation input).

Mechanics: the large side gets a uniform pseudo-random salt in [0, salt);
the smaller (but non-broadcastable) side is replicated once per salt value;
the join key becomes (key, salt), spreading each hot key over ``salt``
reducers. Replication cost: |right| × salt rows — choose salt ≈ the skew
factor, not more.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Join with the left (skewed, large) side salted and the right side
    replicated ``salt`` times. Result equals ``left.join(right, on, how)``
    for equi-joins; supported hows: inner, left, left_semi, left_anti."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r}")
    salted_left = left.withColumn(
        SALT_COL, F.floor(F.rand(seed) * salt).cast("int")
    )
    replicated_right = right.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i).cast("int") for i in range(salt)])),
    )
    out = salted_left.join(replicated_right, [*on, SALT_COL], how)
    return out.drop(SALT_COL)
