"""Snapshot diff: classify rows between two versions of a table as
added / removed / changed / unchanged — the SCD-2 / dbt-snapshot
primitive the reference's users hand-write in warehouse SQL (SAYN
ships the statements, SURVEY §2.4; the merge templates in
`database/templates/merge_tables.sql` are its write-side half).

Scale shape: both sides are reduced to (key, md5-of-compared-columns)
BEFORE the join, so the full-outer join shuffles fixed-width rows
(keys + 32-char hash), never the payload — at 100 TB the diff costs
two hashed scans plus one key-partitioned join, and the hash columns
are what you'd persist to make the next diff incremental.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_COL = "change_type"

# Field separator / NULL sentinel for payload fingerprints.  A plain
# concat_ws("") makes distinct payloads collide — ('ab','c') vs
# ('a','bc') — and a ' ' NULL sentinel collides with real spaces, which
# would silently classify changed rows as 'unchanged'.  \x1f (unit
# separator) and \x00 cannot appear in the string form of typical
# payloads, and to_json would cost more for the same guarantee.
_FP_SEP = "\x1f"
_FP_NULL = "\x00"


def _payload_fingerprint(cols: Sequence[str]) -> F.Column:
    """md5 over separator-joined, null-sentinelled string forms of ``cols``."""
    return F.md5(
        F.concat_ws(
            _FP_SEP,
            *[F.coalesce(F.col(c).cast("string"), F.lit(_FP_NULL)) for c in cols],
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """(keys..., change_type) for every key present in either side.

    ``compare_cols`` defaults to all shared non-key columns; values are
    compared via an md5 of their string forms (null-safe: nulls encode
    as a sentinel) so one fixed-width column stands in for any payload
    width.
    """
    keys = list(keys)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]

    def hashed(df: DataFrame, alias: str) -> DataFrame:
        return df.select(*keys, _payload_fingerprint(compare_cols).alias(alias))

    o = hashed(old, "_old_h")
    n = hashed(new, "_new_h")
    joined = o.join(n, keys, "full_outer")
    return joined.select(
        *keys,
        F.when(F.col("_old_h").isNull(), F.lit("added"))
        .when(F.col("_new_h").isNull(), F.lit("removed"))
        .when(F.col("_old_h") != F.col("_new_h"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias(CHANGE_COL),
    )


VALID_FROM = "_valid_from"
VALID_TO = "_valid_to"


def snapshot_apply(
    history: DataFrame,
    snapshot: DataFrame,
    keys: Sequence[str],
    snapshot_ts,
    compare_cols: Optional[Sequence[str]] = None,
    validate_keys: bool = True,
) -> DataFrame:
    """SCD-2 history upsert (dbt-snapshot semantics): fold a new full
    snapshot into a history table carrying ``_valid_from``/``_valid_to``
    (``_valid_to IS NULL`` = current version).

    Per key: unchanged current rows pass through; changed rows get their
    current version closed at ``snapshot_ts`` and a new open version
    inserted; keys absent from the snapshot are closed (soft delete);
    new keys open a first version.  Closed history rows always pass
    through untouched.

    Contract: ``keys`` must be unique within ``snapshot`` (and within
    the open slice of ``history``) — duplicates would fan out through
    the full-outer join, emitting duplicated closed rows and multiple
    simultaneous open versions.  With ``validate_keys`` (default) the
    snapshot side is checked up front (one cheap key-count aggregate)
    and a ``ValueError`` names offending keys; pass ``False`` only when
    the caller has already guaranteed uniqueness and wants to skip the
    extra job.

    Scale shape: the only join is current-history x snapshot on the
    natural key — both sides reduced to (key, payload-hash) plus the
    snapshot payload, so the shuffle carries each payload once.  Closed
    rows never enter the join (filter on ``_valid_to IS NULL`` prunes
    them at the scan), which is what keeps cost proportional to the
    *live* key count, not accumulated history depth, at 100 TB.
    """
    keys = list(keys)
    ts = F.lit(snapshot_ts) if not isinstance(snapshot_ts, F.Column) else snapshot_ts
    ts = ts.cast(history.schema[VALID_FROM].dataType)
    if compare_cols is None:
        shared = [c for c in snapshot.columns if c in set(history.columns)]
        compare_cols = [c for c in shared if c not in set(keys) | {VALID_FROM, VALID_TO}]
    payload = list(compare_cols)

    if validate_keys:
        dupes = (
            snapshot.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > 1)
            .limit(5)
            .collect()
        )
        if dupes:
            sample = [tuple(r[k] for k in keys) for r in dupes]
            raise ValueError(
                f"snapshot_apply: snapshot has duplicate keys on {keys}; "
                f"sample: {sample}"
            )

    closed = history.where(F.col(VALID_TO).isNotNull())
    current = history.where(F.col(VALID_TO).isNull())

    cur = current.select(
        *keys, *payload, VALID_FROM, _payload_fingerprint(payload).alias("_cur_h")
    )
    snap = snapshot.select(
        *keys,
        *[F.col(c).alias(f"_snap_{c}") for c in payload],
        _payload_fingerprint(payload).alias("_snap_h"),
    )
    j = cur.join(snap, keys, "full_outer")

    # current rows surviving or being closed by this snapshot
    from_current = j.where(F.col("_cur_h").isNotNull()).select(
        *keys,
        *payload,
        F.col(VALID_FROM),
        F.when(F.col("_snap_h").isNull() | (F.col("_snap_h") != F.col("_cur_h")), ts)
        .cast(history.schema[VALID_TO].dataType)
        .alias(VALID_TO),
    )
    # new versions opened by this snapshot (added keys or changed payloads)
    opened = j.where(
        F.col("_snap_h").isNotNull()
        & (F.col("_cur_h").isNull() | (F.col("_cur_h") != F.col("_snap_h")))
    ).select(
        *keys,
        *[F.col(f"_snap_{c}").alias(c) for c in payload],
        ts.alias(VALID_FROM),
        F.lit(None).cast(history.schema[VALID_TO].dataType).alias(VALID_TO),
    )
    cols = keys + payload + [VALID_FROM, VALID_TO]
    return (
        closed.select(*cols)
        .unionByName(from_current.select(*cols))
        .unionByName(opened.select(*cols))
    )


def snapshot_as_of(history: DataFrame, asof) -> DataFrame:
    """Point-in-time read of an SCD-2 history: rows whose validity
    interval covers ``asof`` (``_valid_from <= asof < _valid_to``, open
    versions extend to infinity) — reconstructs the table exactly as it
    stood at any past snapshot boundary.

    A pure filter: no join, no shuffle; with the history partitioned or
    z-ordered on ``_valid_from`` the scan prunes to the files whose
    interval can cover ``asof``.
    """
    ts = F.lit(asof) if not isinstance(asof, F.Column) else asof
    ts = ts.cast(history.schema[VALID_FROM].dataType)
    return history.where(
        (F.col(VALID_FROM) <= ts)
        & (F.col(VALID_TO).isNull() | (F.col(VALID_TO) > ts))
    ).drop(VALID_FROM, VALID_TO)
