"""Skew-mitigation join plans.

AQE's skew-join handles most cases at runtime
(spark.sql.adaptive.skewJoin.enabled, on by default in the session
factory); salting is the explicit fallback for pathological keys —
e.g. joining an events fact on a user_id where one bot user holds 10%
of all rows, or the shingle inverted-index join in n-gram dedup where
stopword shingles hit thousands of documents.

``salted_join`` replicates the *small* side SALT times and scatters the
big side uniformly across the salt space, so one hot key spreads over
SALT reducers instead of one.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SALT_COL = "_sayn_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    salt: int = 16,
    salt_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Join with the hot-key shuffle key split ``salt`` ways.

    big side:   salt = pmod(hash(salt columns), salt) (uniform scatter)
    small side: exploded to all salt values (replication factor = salt —
    only sane when `small` is the dimension side).

    ``salt_cols`` names the columns the scatter hashes (pick a couple
    of high-cardinality non-key columns); by default every hashable
    column of ``big`` is used — MapType columns are EXCLUDED because
    ``hash`` rejects them outright (an AnalysisException, not a slow
    plan), and hashing a wide payload row costs more than it needs to.
    Any salt assignment is CORRECT (the small side is replicated to
    all salt values), so the choice only affects scatter uniformity.

    Result equals ``big.join(small, on, how)`` for inner/left joins.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if salt_cols is None:
        def hashable(dt) -> bool:
            if isinstance(dt, T.MapType):
                return False
            if isinstance(dt, T.ArrayType):
                return hashable(dt.elementType)
            if isinstance(dt, T.StructType):
                return all(hashable(f.dataType) for f in dt.fields)
            return True

        salt_cols = [f.name for f in big.schema.fields if hashable(f.dataType)]
        if not salt_cols:
            salt_cols = keys
    big_salted = big.withColumn(
        SALT_COL, F.pmod(F.hash(*[F.col(c) for c in salt_cols]), F.lit(salt))
    )
    small_salted = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return big_salted.join(small_salted, [*keys, SALT_COL], how).drop(SALT_COL)
