"""Skew mitigation: salted equi-join for hot keys.

A hash equi-join sends every row of a key to one reducer; a hot key
(power-law user, null-ish default, celebrity document) turns that
reducer into the straggler that defines job wall-clock. AQE's skew
join (on in session.py) splits oversized SORT-MERGE partitions at
runtime, but it cannot help when the skewed side feeds a stream-
static join, when the build side must not broadcast, or when the
skew is in aggregation state. Salting is the static fix:

- the SKEWED (probe) side gets a deterministic salt in
  ``[0, salt)`` hashed from a per-row column, splitting each hot key
  across ``salt`` reducers;
- the OTHER (build) side is replicated ``salt``× via a literal-array
  explode (cheap: array of ints, map-side);
- the join key becomes ``(keys..., _salt)`` — a plain hash equi-join
  with per-key parallelism ``salt``.

Replication multiplies the build side's shuffle volume by ``salt``,
so this is for build sides too big to broadcast but ≪ probe side.
Result equality with the unsalted join is oracle-checked
(``skew_salted_user_join``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    *,
    salt: int = 16,
    how: str = "inner",
    salt_source: Column | str | None = None,
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on ``on`` with the hot-key load
    spread over ``salt`` reducers per key.

    ``salt_source`` (default: all of the skewed side's non-key
    columns) feeds a 64-bit hash → pmod salt: deterministic per row,
    so retries/speculative tasks agree, unlike ``rand()``. Only
    inner/left joins are meaningful (a right/full join would see
    ``salt`` copies of unmatched build rows).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left only")

    if salt_source is None:
        extra = [c for c in skewed.columns if c not in keys]
        if not extra:
            raise ValueError("no non-key column to derive the salt from")
        src = F.xxhash64(*extra)
    else:
        src = (
            F.xxhash64(F.col(salt_source))
            if isinstance(salt_source, str)
            else F.xxhash64(salt_source)
        )

    probe = skewed.withColumn("_salt", F.pmod(src, F.lit(salt)).cast("int"))
    build = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return probe.join(build, [*keys, "_salt"], how).drop("_salt")
