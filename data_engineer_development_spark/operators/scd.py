"""Slowly-changing-dimension (type 2) merge — the warehouse operator the
reference's truncate-and-reload dims (export_svg.py CTAS) graduate to when
history must be kept.

``scd2_apply`` reconciles the ACTIVE slice of a versioned dimension with a
fresh snapshot: changed keys close their open row (``valid_to`` set) and
open a new one, unseen keys insert, unchanged keys pass through. The whole
merge is ONE full-outer equi-join on the business key plus unions — hash
partitioned, no driver involvement, the shape that scales to any dimension
size. (Without a lakehouse table format the result is a new frame to
materialize, matching this engine's overwrite-based catalog.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: Sequence[str],
    effective_date: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Return the new full dimension state (history + reconciled actives).

    ``current``: (key, *attrs, valid_from, valid_to) with NULL valid_to on
    active rows. ``updates``: (key, *attrs) snapshot effective at
    ``effective_date`` (an ISO date string).
    """
    eff = F.lit(effective_date).cast("date")
    closed_history = current.filter(F.col(valid_to).isNotNull())
    active = current.filter(F.col(valid_to).isNull())

    a = active.alias("a")
    u = updates.alias("u")
    joined = a.join(u, F.col(f"a.{key}") == F.col(f"u.{key}"), "full")

    differs = F.lit(False)
    for c in attrs:
        differs = differs | (
            ~F.col(f"a.{c}").eqNullSafe(F.col(f"u.{c}"))
        )
    in_both = F.col(f"a.{key}").isNotNull() & F.col(f"u.{key}").isNotNull()
    changed = in_both & differs

    # unchanged active rows pass through; changed ones close at eff
    kept = joined.filter(
        F.col(f"a.{key}").isNotNull() & ~changed
    ).select(
        *[F.col(f"a.{c}").alias(c) for c in (key, *attrs)],
        F.col(f"a.{valid_from}").alias(valid_from),
        F.col(f"a.{valid_to}").alias(valid_to),
    )
    closes = joined.filter(changed).select(
        *[F.col(f"a.{c}").alias(c) for c in (key, *attrs)],
        F.col(f"a.{valid_from}").alias(valid_from),
        eff.alias(valid_to),
    )
    # changed keys re-open with the new attrs; brand-new keys insert
    inserts = joined.filter(
        changed | F.col(f"a.{key}").isNull()
    ).select(
        *[F.col(f"u.{c}").alias(c) for c in (key, *attrs)],
        eff.alias(valid_from),
        F.lit(None).cast("date").alias(valid_to),
    )
    return closed_history.unionByName(kept).unionByName(closes).unionByName(
        inserts
    )
