"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most runtime skew;
salting is the explicit tool for *known* pathological keys — e.g. a null-ish
default key holding 30% of a 100 TB fact. The hot key's rows are spread over
``n_salts`` synthetic sub-keys on the large side while the small side is
replicated ``n_salts`` times, so no single task owns the whole hot key.

``salted_join`` salts deterministically: a hash of the caller's uniquifier
column when given, else a hash over ALL of the large side's columns — a
stable row expression, unlike ``F.rand`` whose routing changes with file
splits/parallelism. The join output is identical either way; stability
matters for any consumer observing row lineage or re-running incrementally.
The replicate side must be the smaller one (its row count multiplies by
``n_salts``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hashable_type(dt: T.DataType) -> bool:
    """Whether ``xxhash64`` accepts the type (maps aren't hashable, at any
    nesting depth)."""
    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _hashable_type(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_hashable_type(f.dataType) for f in dt.fields)
    return True


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    large_uniquifier: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side salted and the small side replicated.

    ``large_uniquifier``: a column spreading the hot key's rows across salts
    (any high-cardinality column). When omitted, the salt is
    ``pmod(xxhash64(<hashable large columns>), n_salts)`` — deterministic
    for a given row regardless of partition layout; duplicate rows share a
    salt, which only matters if the duplicates of one hot key dominate (pass
    an explicit uniquifier there). Map-typed columns (which ``xxhash64``
    rejects) are skipped; if nothing but the join keys is hashable the salt
    would be constant per key — no spread — so that raises instead.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # replicated small side would duplicate its unmatched rows n_salts
        # times under right/full-preserving joins
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    on = list(on)
    if large_uniquifier is None:
        hashable = [
            f.name for f in large.schema.fields if _hashable_type(f.dataType)
        ]
        if not set(hashable) - set(on):
            raise ValueError(
                "salted_join: no hashable non-key columns to derive a salt "
                "from (map-typed columns can't feed xxhash64, and join keys "
                "alone give every hot-key row the same salt) — pass "
                "large_uniquifier explicitly"
            )
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in hashable]), F.lit(n_salts)
        ).cast("int")
    else:
        u = (
            F.col(large_uniquifier)
            if isinstance(large_uniquifier, str)
            else large_uniquifier
        )
        salt = F.pmod(F.xxhash64(u), F.lit(n_salts)).cast("int")
    clash = {"_salt"} & (set(large.columns) | set(small.columns))
    if clash:
        raise ValueError(
            "salted_join reserves the column name '_salt'; rename it on "
            "the input (it would be silently clobbered and dropped)"
        )
    l_salted = large.withColumn("_salt", salt)
    s_replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    out = l_salted.join(s_replicated, [*on, "_salt"], how)
    return out.drop("_salt")
