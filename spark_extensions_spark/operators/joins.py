"""Join operators Spark lacks as built-ins: as-of join, interval join.

The reference library inherits plain Spark joins (SURVEY.md §2.E;
``/root/reference/pom.xml:360-386`` — all relational capability is
provided-scope Spark). As-of / interval joins have no DataFrame built-in
in either, so we compose them from public primitives.

Scale posture: ``asof_join`` uses the union + partitioned-window
formulation — ONE shuffle on the join key, no row explosion, no skew
amplification from range self-joins. This is the strategy that survives
100 TB: a naive ``t_left >= t_right`` theta join explodes to
O(|L|·|R|) per key, while the union trick is O(|L|+|R|) with a single
sort per key partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    right_values: list[str] | None = None,
    how: str = "left",
    tolerance: Column | None = None,
    right_tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the nearest right row at or
    before (``direction="backward"``, the default) or at or after
    (``"forward"``) its time, within the same ``on`` key group.

    Both directions share the single-shuffle union+window plan; forward
    simply flips the within-partition sort to descending time so the
    carried right row is the earliest at-or-after match.

    Implementation (scalable, single-shuffle): tag both sides, union by
    matching schema, sort within each key partition by
    ``(time, side, tiebreak)`` with right rows before left rows at equal
    times (so a right row at exactly ``left_time`` matches), then carry
    the right columns forward with ``last_value(..., ignoreNulls)``.
    Left rows then re-filter out. Ties on ``right_time`` resolve to the
    greatest ``right_tiebreak`` value (deterministic output).

    ``tolerance``: optional max age (a Column interval or double seconds
    depending on the time columns' type arithmetic) — matches older than
    ``left_time - tolerance`` are nulled out.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_values is None:
        right_values = [c for c in right.columns if c not in keys and c != right_time]
    if how not in ("left", "inner"):
        raise ValueError("asof_join supports how in ('left','inner')")
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    backward = direction == "backward"

    lcols = [c for c in left.columns]
    # Build a common schema: left columns + right payload (+ right time copy).
    rtime_out = f"__asof_rtime"
    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_values],
        F.lit(None).cast(right.schema[right_time].dataType).alias(rtime_out),
        F.col(left_time).alias("__asof_t"),
        F.lit(1).alias("__side"),
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        *[F.col(c).alias(f"__r_{c}") for c in right_values],
        F.col(right_time).alias(rtime_out),
        F.col(right_time).alias("__asof_t"),
        F.lit(0).alias("__side"),
    ).select(  # re-order to the union schema
        *[F.col(c) for c in lcols],
        *[F.col(f"__r_{c}") for c in right_values],
        F.col(rtime_out),
        F.col("__asof_t"),
        F.col("__side"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    t_order = F.col("__asof_t").asc() if backward else F.col("__asof_t").desc()
    order = [t_order, F.col("__side").asc()]
    if right_tiebreak is not None:
        # among right rows with equal time, the winner is the one sorting
        # last (last_value picks it up): largest tiebreak for backward,
        # smallest for forward
        tb = F.when(F.col("__side") == 0, F.col(f"__r_{right_tiebreak}"))
        order.append(tb.asc_nulls_first() if backward else tb.desc_nulls_first())
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in lcols],
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in right_values
        ],
        F.last(F.col(rtime_out), ignorenulls=True).over(w).alias("__m_rtime"),
        F.col("__asof_t"),
        F.col("__side"),
    ).filter(F.col("__side") == 1)

    if tolerance is not None:
        too_old = (
            F.col("__m_rtime") < (F.col("__asof_t") - tolerance)
            if backward
            else F.col("__m_rtime") > (F.col("__asof_t") + tolerance)
        )
        carried = carried.select(
            *[F.col(c) for c in lcols],
            *[
                F.when(too_old, F.lit(None)).otherwise(F.col(f"__m_{c}")).alias(f"__m_{c}")
                for c in right_values
            ],
            F.when(too_old, F.lit(None)).otherwise(F.col("__m_rtime")).alias("__m_rtime"),
        )

    out = carried.select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__m_{c}").alias(f"{c}_right" if c in lcols else c) for c in right_values],
        F.col("__m_rtime").alias(f"{right_time}_right" if right_time in lcols else right_time),
    )
    if how == "inner":
        out = out.filter(F.col(f"{right_time}_right" if right_time in lcols else right_time).isNotNull())
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str] | None,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
) -> DataFrame:
    """Interval-overlap join: rows whose [start,end] ranges intersect.

    Overlap predicate ``a.start <= b.end AND b.start <= a.end``
    (SURVEY.md §2.E "Joins — as-of / interval"). With equi keys present
    Catalyst plans a sort-merge/shuffled-hash join on the keys and applies
    the range predicate as a post-join filter — the scalable shape. A
    keyless interval join degenerates to a broadcast-nested-loop; callers
    at scale should bucket time into coarse grains and join on the grain.
    """
    cond = (F.col(f"l.{left_start}") <= F.col(f"r.{right_end}")) & (
        F.col(f"r.{right_start}") <= F.col(f"l.{left_end}")
    )
    if on:
        keys = [on] if isinstance(on, str) else list(on)
        for k in keys:
            cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    return left.alias("l").join(right.alias("r"), cond)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_source: str | None = None,
) -> DataFrame:
    """Skew-resistant equi-join via key salting.

    A hot join key concentrates a whole shuffle partition on one task;
    salting splits each key into ``n_salts`` sub-partitions: the left
    side gets a deterministic salt derived from one of its own columns
    (``salt_source``, default: all non-key columns via xxhash64), and the
    right side is replicated ``n_salts`` times so every (key, salt)
    bucket finds its match. Join result is EXACTLY the plain equi-join
    (verified by oracle query ``join_salted``); cost is ``n_salts``× the
    right side's shuffle volume — use when the right side is small-ish
    but too big to broadcast and the left is skewed.

    AQE's skew-join splitting handles most cases at runtime; explicit
    salting remains the tool for extreme single-key skew and for
    stream-stream joins where AQE does not apply.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if salt_source is not None:
        salt_basis = [F.col(salt_source)]
    else:
        salt_basis = [F.col(c) for c in left.columns if c not in keys] or [
            F.lit(0)
        ]
    l_salted = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_basis), F.lit(n_salts)).cast("int")
    )
    r_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = l_salted.join(r_salted, keys + ["__salt"], how)
    return out.drop("__salt")


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    delta: float,
    extra_cond=None,
) -> DataFrame:
    """Banded numeric join: all pairs with ``|left_val − right_val| ≤
    delta`` WITHOUT a nested-loop — the scale path for distance-band
    theta joins.

    Both sides bucket to ``floor(v / delta)``; a qualifying pair's
    buckets differ by at most 1, so the left side explodes to its
    {b−1, b, b+1} neighborhood and the join is a plain EQUI join on
    the bucket (shuffle-hash/SMJ, AQE-skew-splittable) followed by the
    exact band filter.  3× left duplication buys an O(matches) join
    instead of O(|L|·|R|): the standard similarity-band trick.
    ``extra_cond`` (Column) is applied after the join (e.g. key
    inequality to deduplicate symmetric pairs).
    """
    lb = F.floor(F.col(left_val) / delta).cast("bigint")
    rb = F.floor(F.col(right_val) / delta).cast("bigint")
    l_exp = left.withColumn(
        "__band", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    r_b = right.withColumn("__band", rb)
    joined = l_exp.join(r_b, "__band").filter(
        F.abs(F.col(left_val) - F.col(right_val)) <= delta
    )
    if extra_cond is not None:
        joined = joined.filter(extra_cond)
    return joined.drop("__band")


def interval_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: int,
    on: str | list[str] | None = None,
) -> DataFrame:
    """Interval-overlap join as an EQUI-join on time grains — the
    scalable form of the overlap join (the shape range-join optimizers
    rewrite to; `interval_join`'s docstring prescribes it and this
    operator provides it).

    Each side explodes its [start, end] span into the grains of width
    ``bin_width`` it covers (integer units — cast timestamps to epoch
    first); the join is then a plain shuffled equi-join on the grain,
    never a broadcast-nested-loop. A pair overlapping several grains
    would match repeatedly, so the filter keeps each pair ONLY in the
    grain containing the LATER of the two starts: the later-starting
    interval always covers its own start grain, and overlap guarantees
    the earlier one reaches it — exactly-once emission with no distinct
    shuffle.

    ``on`` (round 9, from the Zipf-fixture audit): optional equi keys
    COMPOSED with the grain. A keyed interval self-join on a Zipf-hot
    key is the measured 100 TB failure mode — the plain SMJ residual
    form concentrates the hot key's quadratic pair expansion on ONE
    task (215x on the skewed sf1 fixture); joining on (key, grain)
    spreads the same key across its lifetime's grains, restoring
    parallelism ∝ active-days / bin_width while emitting the identical
    pair set. Keys must carry the SAME column name on both sides; like
    an equi-join, the output keeps one copy of each key column.

    Cost: explosion factor = avg(span / bin_width) per side; pick
    ``bin_width`` near the typical span so the factor stays ~1-2.
    Output columns: [keys] + left columns + right columns (key columns
    excluded from the per-side lists; disambiguate the rest
    beforehand).
    """
    keys = [on] if isinstance(on, str) else list(on or [])

    def grains(df, start, end):
        g = F.explode(
            F.sequence(
                (F.col(start) / bin_width).cast("long"),
                (F.col(end) / bin_width).cast("long"),
            )
        )
        return df.withColumn("__grain", g).withColumn(
            "__start_grain", (F.col(start) / bin_width).cast("long")
        )

    l = grains(left, left_start, left_end).alias("l")
    r = grains(right, right_start, right_end).alias("r")
    overlap = (F.col(f"l.{left_start}") <= F.col(f"r.{right_end}")) & (
        F.col(f"r.{right_start}") <= F.col(f"l.{left_end}")
    )
    once = F.col("l.__grain") == F.greatest(
        F.col("l.__start_grain"), F.col("r.__start_grain")
    )
    cond = (F.col("l.__grain") == F.col("r.__grain")) & overlap & once
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    out = l.join(r, cond)
    return out.select(
        *[F.col(f"l.{k}") for k in keys],
        *[F.col(f"l.{c}") for c in left.columns if c not in keys],
        *[F.col(f"r.{c}") for c in right.columns if c not in keys],
    )
