"""Join strategies for hostile key distributions (SURVEY §2.2 J-family,
scale hardening).

Catalyst's default answers — broadcast for small dims, sort-merge for
the rest, AQE skew-split when statistics reveal a hot partition — cover
the common cases.  Two situations defeat them at 100 TB and need an
explicit construction:

- **Skewed fact⋈mid-size dim** where the dim is too big to broadcast
  and one key owns a double-digit percentage of the fact (the null-ish
  sentinel key, the megacity, the bot user).  AQE's skew join only
  splits SORT-MERGE partitions it can see at runtime and cannot help
  when the hot key must still land in one task's sort.  ``salted_join``
  spreads each hot key across ``n_salts`` tasks deterministically.

- **The same big⋈big join run repeatedly** (daily fact builds, iterated
  pipelines).  Paying the shuffle every run is wasted work;
  ``sources/sink.py::write_bucketed`` persists both sides hash-bucketed
  on the join key, after which every join — and every groupBy on that
  key — plans with ZERO exchanges (tests/test_plan_shapes.py pins it).

The reference (webscraper-postgres.py) joins in pandas on a single
node, where skew is invisible; these operators are what the same joins
need on a cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Equi-join a skew-keyed big side against a non-broadcastable small
    side by salting: big rows get a deterministic salt in [0, n_salts),
    the small side is replicated once per salt (row-local explode, no
    shuffle), and the join runs on (key, salt) — so a key that owns 30%
    of the fact spreads over ``n_salts`` tasks instead of melting one.

    Semantics: identical to ``big.join(small, big_key == small_key,
    how)`` — each big row carries exactly one salt, so multiplicity is
    preserved; each small row appears once per salt but only ever
    matches big rows of its own salt.

    Right/full outer (round 13 — the skewed snapshot-diff / CDC
    reconciliation shape): the naive construction is WRONG under
    salting (an unmatched small row would emit one null-extended row
    PER REPLICA, and a matched row's other-salt replicas would emit
    spurious ones), and deduping replicas post-join would re-
    concentrate the hot key.  Instead the small side's outer-ness is
    decided at KEY granularity: result = salted inner (for 'right') /
    salted left (for 'full') ∪ null-extended small rows anti-joined
    against the big side's DISTINCT keys.  The anti join's shuffle
    carries only distinct keys — the distinct collapses a hot key to
    ONE row with map-side partial aggregation, so no skew ever
    re-concentrates.  Requires disjoint column names across the two
    sides (the union is by name).

    The salt must be DETERMINISTIC (oracle-checkable, retry-stable,
    lineage-recomputable — the same discipline as every sampler in this
    repo): xxhash64 of ``salt_on`` (default: all big-side columns), not
    ``rand()``.  Duplicate big rows therefore share a salt; they are
    exactly the rows a shuffle would co-locate anyway, and any varying
    column in ``salt_on`` spreads a hot KEY perfectly.

    Cost: small side ×n_salts (choose n_salts ≈ hot-key share ×
    parallelism, not hundreds), big side one shuffle on (key, salt) —
    same shuffle count as the plain join, but skew-free; outer modes
    add one distinct-key anti join whose shuffle is key-cardinality
    sized.
    """
    how = {"outer": "full", "full_outer": "full"}.get(how, how)
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(
            f"salted_join supports inner/left/right/full, got {how!r}"
        )
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    if how in ("right", "full"):
        overlap = set(big.columns) & set(small.columns)
        if overlap:
            raise ValueError(
                f"salted_join {how!r} needs disjoint column names; "
                f"both sides carry {sorted(overlap)}"
            )
    salt_cols: list[Column] = [
        F.col(c) for c in (salt_on if salt_on is not None else big.columns)
    ]
    b = big.withColumn("_salt", F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)))
    s = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>")),
    )
    matched_how = {"right": "inner", "full": "left"}.get(how, how)
    joined = b.join(
        s,
        (b[big_key] == s[small_key]) & (b["_salt"] == s["_salt"]),
        matched_how,
    ).drop("_salt")
    if how in ("inner", "left"):
        return joined
    # outer small side, key-granular: small rows whose key never occurs
    # in big (NULL small keys match nothing, so they belong here too)
    big_keys = big.select(F.col(big_key).alias("__bk")).distinct()
    unmatched = small.join(
        big_keys, F.col(small_key) == F.col("__bk"), "left_anti"
    )
    null_big = [
        F.lit(None).cast(f.dataType).alias(f.name) for f in big.schema.fields
    ]
    unmatched = unmatched.select(
        *null_big, *[F.col(c) for c in small.columns]
    )
    return joined.unionByName(unmatched)


def preagg_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    sum_cols: list[str],
    group_cols: list[str],
    count_alias: str | None = "n_rows",
) -> DataFrame:
    """Eager aggregation (aggregate pushdown BELOW the join): partially
    aggregate the fact on its join key first, join the per-key partials
    to the dim, then finish the aggregate on the dim's grouping columns
    — equivalent to ``fact.join(dim).groupBy(group_cols).agg(sum, count)``
    when ``dim`` is unique on ``dim_key`` (the standard eager-aggregation
    correctness condition; an inner join on a key-unique dim neither
    duplicates nor drops partials).

    Why it exists: Catalyst does not reorder aggregates through joins,
    so the naive plan shuffles EVERY fact row into the join and again
    into the aggregate.  This construction shuffles the fact once, down
    to one row per distinct join key — at 100 TB, a revenue-by-nation
    report over 10^12 lineitems becomes a join of 10^7 per-supplier
    partials against the dim, a ~10^5× reduction in join input, and the
    dim side usually broadcasts from there.  SUM and COUNT re-aggregate
    losslessly (exact DECIMAL sums recommended per the registry
    discipline); AVG derives as sum/count downstream; holistic metrics
    (medians, distincts) cannot ride this path and must use the plain
    join.
    """
    aggs = [F.sum(c).alias(f"_s_{c}") for c in sum_cols]
    if count_alias:
        aggs.append(F.count("*").alias("_n"))
    pre = fact.groupBy(fact_key).agg(*aggs)
    j = pre.join(dim, pre[fact_key] == dim[dim_key])
    final = [F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sum_cols]
    if count_alias:
        final.append(F.sum("_n").cast("long").alias(count_alias))
    return j.groupBy(*group_cols).agg(*final)
