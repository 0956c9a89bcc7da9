"""Deterministic corpus-composition operators — the data-recipe layer of
an LLM training pipeline (mixture balancing, epoch upsampling, budget
selection, training-order shuffling).

The reference has no analogue (its dataset is one fixed table); these
generalize its deterministic-pipeline discipline (webscraper-postgres.py
re-runs must converge to the same table) to corpus composition.  Every
operator here selects/duplicates/orders rows as a PURE FUNCTION of the
row key — never ``rand()``/``sample()`` — so results are identical on
any cluster layout, re-runs are reproducible, and two tables processed
on the same key stay aligned.  That is what makes them oracle-checkable
AND what production data recipes need (a re-run after a failed stage
must not reshuffle the corpus).

Scale posture: per-domain statistics are tiny aggregates broadcast back
to the full table (never the reverse), selection predicates are codegen
integer arithmetic evaluated row-local, and the only full-data shuffles
are the ones the semantics require (the range shuffle under
budget-prefix and shuffle-rank).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# Knuth multiplicative hash → uniform-ish rational in [0, 1) with a
# 1/1000 grid; plain integer arithmetic, expressible identically in any
# engine (same scheme as plans/llm_data.py::sample_stratified).
_HASH_MOD = 1000


def _key_uniform(key: Column) -> Column:
    return F.pmod(key * F.lit(2654435761), F.lit(_HASH_MOD)) / float(_HASH_MOD)


def sample_mixture(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    weights: dict[str, float],
) -> DataFrame:
    """Mixture-balancing sampler: downsample domains so the output
    follows the target proportions ``weights`` at the largest total
    size the corpus supports.

    The achievable scale is ``s = min_d(n_d / w_d)`` (the binding domain
    is kept whole); every other domain is thinned to ``rate_d = s * w_d
    / n_d`` via the key-hash — the standard recipe step that turns a
    crawl's natural skew into a target training mixture.  Domains
    absent from ``weights`` are dropped (weight 0).

    Distributed shape: one tiny per-domain count aggregate, a broadcast
    single-row min, a broadcast rate join back onto the corpus — the
    full table is never shuffled, and the filter is codegen arithmetic.
    """
    w_expr = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    counts = (
        df.groupBy(domain_col)
        .agg(F.count("*").alias("_n"))
        .withColumn("_w", w_expr[F.col(domain_col)])
        .where(F.col("_w").isNotNull() & (F.col("_w") > 0))
    )
    scale = counts.agg(F.min(F.col("_n") / F.col("_w")).alias("_s"))
    rates = counts.crossJoin(F.broadcast(scale)).select(
        domain_col,
        (F.col("_s") * F.col("_w") / F.col("_n")).alias("_rate"),
    )
    return (
        df.join(F.broadcast(rates), domain_col)
        .where(_key_uniform(F.col(key_col)) < F.col("_rate"))
        .drop("_rate")
    )


def upsample_epochs(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    epochs: dict[str, float],
    default_epochs: float = 1.0,
) -> DataFrame:
    """Deterministic epoch upsampling: repeat each row according to its
    domain's (possibly fractional) epoch count — the over/under-sampling
    half of a data recipe (e.g. 2.5 epochs of high-quality text, 0.5 of
    crawl).

    ``epochs = b + f`` yields ``b`` copies of every row plus one extra
    for the key-hash fraction ``f`` of rows — so the EXPECTED epoch
    count is exact, realized deterministically per key (fractional
    epochs select the same extra rows on every run).  An ``epoch``
    column (1-based copy index) distinguishes the duplicates downstream
    (e.g. for per-epoch shuffling).  Rows landing at 0 copies drop out.

    Distributed shape: the epoch count is a row-local codegen
    expression; the duplication is an explode — no shuffle at all, and
    output size is exactly the recipe's token multiplier.
    """
    e_expr = F.create_map(
        *[F.lit(x) for kv in epochs.items() for x in kv]
    )
    e = F.coalesce(e_expr[F.col(domain_col)], F.lit(float(default_epochs)))
    base = F.floor(e).cast("int")
    extra = (_key_uniform(F.col(key_col)) < (e - F.floor(e))).cast("int")
    n_copies = base + extra
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(1), n_copies)
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn("epoch", F.explode(copies))


def select_until_budget(
    df: DataFrame,
    order_cols: list,
    len_col: str,
    budget: int,
    out_col: str = "cum_tokens",
) -> DataFrame:
    """Priority-ordered budget selection: keep rows, in ``order_cols``
    order, while the running total of ``len_col`` stays within
    ``budget`` — "take the best documents until the token budget is
    full", the final gate of a data recipe.

    Built on distributed_cumsum (range-repartition + broadcast partition
    offsets), so selecting from a 100 TB candidate pool never funnels
    through one task; the emitted ``out_col`` carries each kept row's
    cumulative total for downstream packing.  ``order_cols`` must be a
    total order (unique tie-break key) — same contract as the cumsum.
    """
    from .windows import distributed_cumsum

    return distributed_cumsum(df, order_cols, len_col, out_col=out_col).where(
        F.col(out_col) <= budget
    )


def shuffle_order(
    df: DataFrame,
    key_col: str,
    seed: str = "0",
    out_col: str = "shuffle_pos",
) -> DataFrame:
    """Deterministic global training order: assign each row a contiguous
    1..N position by sorting on a seeded cryptographic hash of its key —
    the "global shuffle" every training run needs, made reproducible
    (re-runs and retries see the same order; changing ``seed`` reshuffles).

    The rank comes from grouped_row_number with NO group columns: a
    range shuffle on the hash plus per-partition offsets, so the global
    numbering never funnels through a single task (the failure mode of
    a partition-less row_number at corpus scale).
    """
    from .windows import grouped_row_number

    h = F.md5(
        F.concat_ws(":", F.lit(seed), F.col(key_col).cast("string"))
    )
    return grouped_row_number(
        df.withColumn("_h", h), [], ["_h", key_col], out_col=out_col
    ).drop("_h")


def sample_weighted(
    df: DataFrame, key_col: str, weight_col: str, k: int
) -> DataFrame:
    """Weighted sampling without replacement, k items, inclusion odds
    ∝ ``weight_col`` — Efraimidis–Spirakis A-ES with a DETERMINISTIC
    uniform: u = md5-hash of the key mapped into (0,1), item rank
    ln(u)/w, keep the k largest (ln(u)/w is order-equivalent to the
    classic u^(1/w) and numerically safer).

    The temperature/length-proportional selection step of data recipes
    (e.g. sampling documents ∝ token count); deterministic like every
    operator in this module — re-runs, retries, and cluster layout
    changes reproduce the same sample.  Non-positive weights are
    excluded (they have no sampling odds).  Scale shape: the rank is
    row-local codegen arithmetic and the global top-k is
    TakeOrderedAndProject — per-partition heads merged on the driver,
    never a full sort.  ln() is libm-evaluated, so cross-engine
    equality holds except on sub-ulp rank ties at the selection
    boundary — measure-zero for real data, and pinned per-dataset by
    the oracle harness.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("es:"), F.col(key_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    u = (F.pmod(h, F.lit(1 << 20)).cast("double") + F.lit(0.5)) / F.lit(
        float(1 << 20)
    )
    rank = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("_es", rank)
        .orderBy(F.desc("_es"), F.col(key_col))
        .limit(k)
        .drop("_es")
    )


def sample_per_group(
    df: DataFrame, group_col: str, key_col: str, k: int, seed: str = "pg"
) -> DataFrame:
    """Deterministic uniform k-sample PER GROUP: within each group,
    rows rank by a seeded md5 of their key and the k smallest win.

    The per-stratum counterpart of shuffle_order's global ordering —
    "k example documents per source / k users per cohort" — with the
    module's determinism contract: re-runs, retries, and cluster
    layout changes reproduce the same sample, and growing a group only
    perturbs membership at the hash boundary (adding rows never
    reorders two existing survivors).

    Plan: the hash is row-local codegen; one shuffle on the group for
    the row_number window.  Skew note for 100 TB: a single giant group
    still funnels through one task here — when groups can be
    pathological, pre-filter with an approximate per-group threshold
    (the distributed grouped-ranking pattern in operators/windows.py)
    so the window only sees ~k·fudge rows per group.
    """
    h = F.md5(
        F.concat(
            F.lit(seed + ":"),
            F.col(group_col).cast("string"),
            F.lit(":"),
            F.col(key_col).cast("string"),
        )
    )
    w = W.partitionBy(group_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def group_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    weights: dict[str, int] | None = None,
) -> DataFrame:
    """Train/val/test assignment that never separates near-duplicates:
    documents connected by any chain of near-dup ``pairs`` (id_a, id_b)
    land in the SAME split, so evaluation can't be contaminated by a
    near-copy of a training document — the leakage mode a plain
    per-document hash split invites whenever dedup keeps both ends of
    a borderline pair (or dedup runs after splitting).

    Composition: dedup_groups (pointer-jumped connected components)
    labels every paired document with its component-min id; unpaired
    documents are their own singleton representative (left join +
    coalesce — NO extra pass over the corpus).  The split is then the
    standard md5-band on the REPRESENTATIVE (split_by_hash's exact
    arithmetic, content-derived, engine-reproducible) — so by
    construction every member of a group shares its group's split, and
    assignments stay stable as unrelated documents arrive.

    Returns df's columns + (group_rep, split).  Weights default to
    train/val/test = 8/1/1.
    """
    from .dedup import dedup_groups

    weights = weights or {"train": 8, "val": 1, "test": 1}
    groups = dedup_groups(pairs).select(
        F.col("doc_id").alias(id_col), "group_id"
    )
    rep = F.coalesce(F.col("group_id"), F.col(id_col))
    total = sum(weights.values())
    bucket = F.pmod(
        F.conv(F.substring(F.md5(rep.cast("string")), 1, 15), 16, 10)
        .cast("long"),
        F.lit(total),
    )
    expr = None
    cum = 0
    for name, wgt in weights.items():
        cum += wgt
        cond = bucket < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.join(groups, id_col, "left").select(
        *[F.col(c) for c in df.columns],
        rep.alias("group_rep"),
        expr.alias("split"),
    )


def unimax_allocation(
    df: DataFrame,
    source_col: str,
    len_col: str,
    budget: int | tuple[int, int],
    max_epochs: int = 1,
) -> DataFrame:
    """UNIMAX water-filling budget allocation (Chung et al. 2023): split
    a total token ``budget`` across sources as UNIFORMLY as possible,
    with no source repeated past ``max_epochs`` — the principled
    alternative to temperature sampling for multilingual/multi-source
    recipes (small sources are capped instead of oversampled into
    memorization; the freed budget flows to the sources that can absorb
    it).

    Closed-form water filling, all in exact 64-bit integers so the
    result is bit-identical on any engine: sources sorted by capacity
    (``tokens * max_epochs``) ascending, a source is SATURATED iff even
    an equal split of the budget remaining after all smaller sources
    exceeds its capacity — ``cap_i * n_remaining <= budget -
    cum_smaller_caps`` (saturation is a prefix of the sort: if i
    overflows its fair share, so does every larger j).  Saturated
    sources take their full capacity; the rest split the remainder
    evenly, with the integer leftover (< n_unsaturated tokens) going one
    token each to the smallest-capacity unsaturated sources —
    deterministic, exhaustive whenever any source is unsaturated.

    ``budget`` is an absolute token count, or an exact rational
    ``(num, den)`` of the corpus total (e.g. ``(2, 1)`` = two epochs'
    worth) so callers stay scale-invariant without collecting a count.

    Distributed shape: one tiny per-source aggregate; every window below
    runs over ONE ROW PER SOURCE (bounded by source count, never data
    volume — the distributed_cumsum offsets rule).  Overflow headroom:
    ``capacity * n_sources`` must stay under 2^63 — ~1e15 tokens across
    1e3 sources; fine beyond 100 TB of text.
    """
    counts = df.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(len_col).cast("long")).alias("tokens"),
    )
    full = W.partitionBy()
    if isinstance(budget, tuple):
        num, den = budget
        b_num = F.sum("tokens").over(full) * int(num)
        # exact integer floor-div: subtract the remainder first so the
        # double division is of an exactly-divisible value (< 2^53)
        b = ((b_num - F.pmod(b_num, F.lit(int(den)))) / int(den)).cast("long")
    else:
        b = F.lit(int(budget))
    asc = W.orderBy(F.col("capacity").asc(), F.col(source_col).asc())
    staged = (
        counts.withColumn(
            "capacity", F.col("tokens") * F.lit(int(max_epochs))
        )
        .withColumn("_b", b)
        .withColumn("_k", F.count("*").over(full))
        .withColumn("_i", F.row_number().over(asc))
        .withColumn(
            "_cum_smaller",
            F.coalesce(
                F.sum("capacity").over(
                    asc.rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "saturated",
            F.col("capacity") * (F.col("_k") - F.col("_i") + 1)
            <= F.col("_b") - F.col("_cum_smaller"),
        )
        .withColumn(
            "_sat_sum",
            F.coalesce(
                F.sum(F.when(F.col("saturated"), F.col("capacity"))).over(
                    full
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "_n_unsat",
            F.sum((~F.col("saturated")).cast("long")).over(full),
        )
    )
    rem = F.col("_b") - F.col("_sat_sum")
    share = F.when(
        F.col("_n_unsat") > 0,
        ((rem - F.pmod(rem, F.col("_n_unsat"))) / F.col("_n_unsat")).cast(
            "long"
        ),
    )
    leftover = F.pmod(rem, F.col("_n_unsat"))
    # saturation is a prefix of the capacity-asc order, so the rank of an
    # unsaturated source among unsaturated ones is _i - n_saturated
    unsat_rank = F.col("_i") - (F.col("_k") - F.col("_n_unsat"))
    return staged.select(
        source_col,
        "n_docs",
        "tokens",
        "capacity",
        "saturated",
        F.when(F.col("saturated"), F.col("capacity"))
        .otherwise(
            share + (unsat_rank <= leftover).cast("long")
        )
        .alias("allocation"),
    )


def apply_token_allocation(
    df: DataFrame,
    source_col: str,
    key_col: str,
    len_col: str,
    alloc: DataFrame,
) -> DataFrame:
    """Materialize a per-source token ``alloc`` (source, tokens,
    allocation — unimax_allocation's output) into actual training rows:
    every row of source d appears ``allocation_d DIV tokens_d`` times
    (whole epochs), and the remainder ``allocation_d MOD tokens_d``
    tokens are filled by ONE extra copy of a deterministic per-source
    prefix — rows ordered by (key-hash, key), kept while the running
    token total stays within the remainder.  Output carries a 1-based
    ``epoch`` column; sources allocated 0 whole epochs contribute only
    their prefix.

    Realized tokens land within one document of the allocation per
    source (the final prefix document straddling the cut is dropped, the
    standard document-granularity under-fill) and every copy decision is
    a pure function of the row key — re-runs and cluster layouts agree.

    Distributed shape: the allocation is a broadcast join (one row per
    source); the prefix cut rides grouped_cumsum (range-shuffled, never
    one-task-per-source); the duplication is a row-local explode.
    EAGER via grouped_cumsum's pin — wrap compositions in a
    ``pinning.pin_scope``.
    """
    from .windows import grouped_cumsum

    sized = df.join(
        F.broadcast(
            alloc.select(
                source_col,
                F.col("tokens").alias("_src_tokens"),
                F.col("allocation").alias("_alloc"),
            )
        ),
        source_col,
    )
    order = [_key_uniform(F.col(key_col)), F.col(key_col)]
    cum = grouped_cumsum(sized, [source_col], order, len_col, out_col="_cum")
    base = F.when(
        F.col("_src_tokens") > 0,
        (
            (
                F.col("_alloc")
                - F.pmod(F.col("_alloc"), F.col("_src_tokens"))
            )
            / F.col("_src_tokens")
        ).cast("long"),
    ).otherwise(F.lit(0))
    rem = F.when(
        F.col("_src_tokens") > 0,
        F.pmod(F.col("_alloc"), F.col("_src_tokens")),
    ).otherwise(F.lit(0))
    n_copies = (base + (F.col("_cum") <= rem).cast("long")).cast("int")
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(1), n_copies)
    ).otherwise(F.array().cast("array<int>"))
    return (
        cum.withColumn("epoch", F.explode(copies))
        .drop("_src_tokens", "_alloc", "_cum")
    )


def interleave_sources(
    df: DataFrame,
    source_col: str,
    key_col: str,
    weights: dict[str, int],
) -> DataFrame:
    """Deterministic proportional interleave: an integer ``interleave_key``
    such that sorting by (key, source, id) yields a training order where
    EVERY prefix holds each source in proportion to ``weights`` (±1 doc)
    — the anti-clumping guarantee a mixture ratio alone doesn't give
    (a 90/10 mixture written source-by-source still trains on 90% of
    one source first).

    Construction: rows rank within their source in key-hash order
    (deterministic, layout-independent, via the distributed
    grouped_row_number); the i-th document of source s lands at
    ``(2·i − 1) · (L / w_s)`` where ``L = lcm(weights)`` — the exact
    odd-multiples spacing of the classic weighted round-robin, all in
    64-bit integers (no float drift, bit-identical cross-engine).
    Sources absent from ``weights`` are dropped.  Overflow headroom:
    corpus_size · L/w_min under 2^62.

    EAGER via grouped_row_number's pin; wrap compositions in a
    ``pinning.pin_scope``.
    """
    from math import lcm

    from .windows import grouped_row_number

    L = lcm(*weights.values())
    inv_expr = F.create_map(
        *[
            x
            for s, w in weights.items()
            for x in (F.lit(s), F.lit(L // w))
        ]
    )
    ranked = grouped_row_number(
        df.where(F.col(source_col).isin(*weights)),
        [source_col],
        [_key_uniform(F.col(key_col)), F.col(key_col)],
        out_col="_rn",
    )
    return ranked.withColumn(
        "interleave_key",
        ((F.col("_rn") * 2 - 1) * inv_expr[F.col(source_col)]).cast("long"),
    ).drop("_rn")


def rendezvous_assign(
    df: DataFrame,
    id_col: str,
    shards: list[str],
) -> DataFrame:
    """Rendezvous (highest-random-weight) sharding → every input row
    plus ``shard``: each id goes to the shard with the highest
    ``md5(id ':' shard)`` score.

    THE stable routing rule for distributed storage and incremental
    pipelines: unlike ``hash(id) mod n`` — where changing n remaps
    ~everything — removing a shard remaps ONLY that shard's rows
    (every survivor's winning score is untouched), and adding one
    steals exactly the rows it now wins.  Content-derived md5 (the
    split_by_hash discipline): reproducible across runs, engines, and
    cluster layouts, and an external system can compute the same
    assignment.

    A narrow per-row expression — no shuffle, no state: the score
    list is a ``shards``-length literal array transformed per row,
    the winner one array_max over (score, shard) structs (ties —
    md5 collisions across shards — break to the lexicographically
    largest shard, deterministically).
    """
    scores = F.array(
        *[
            F.struct(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col(id_col).cast("string"),
                                F.lit(":" + s),
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                )
                .cast("long")
                .alias("h"),
                F.lit(s).alias("shard"),
            )
            for s in shards
        ]
    )
    return df.withColumn("shard", F.array_max(scores)["shard"])
