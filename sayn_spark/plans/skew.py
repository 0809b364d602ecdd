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

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_sayn_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Join with the hot-key shuffle key split ``salt`` ways.

    big side:   salt = pmod(hash(whole row), salt)  (uniform scatter)
    small side: exploded to all salt values (replication factor = salt —
    only sane when `small` is the dimension side).

    Result equals ``big.join(small, on, how)`` for inner/left joins.
    """
    keys = [on] if isinstance(on, str) else list(on)
    big_salted = big.withColumn(SALT_COL, F.pmod(F.hash(*big.columns), F.lit(salt)))
    small_salted = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return big_salted.join(small_salted, [*keys, SALT_COL], how).drop(SALT_COL)
