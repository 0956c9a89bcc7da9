"""Entity resolution / record linkage: blocking → verify → cluster.

The classic three-stage construction for "which records are the same
real-world entity" (customer files, product catalogs, author tables):

1. **Blocking** — a cheap deterministic key (here: normalized suffix +
   length band) so candidate generation is an EQUI-join on the block,
   never the O(n²) all-pairs cross join.  The same reduce-to-equi-join
   move as the MinHash bands (operators/dedup.py) and the interval
   buckets (operators/timeseries.py): at 100 TB the only joins that
   work are hash joins.
2. **Verify** — exact edit distance (levenshtein, JVM codegen) on the
   few pairs sharing a block, keeping pairs within ``max_dist``.
   Payload (the normalized strings) rides the block join; nothing
   re-joins against the corpus.
3. **Cluster** — connected components over the verified pairs
   (operators/dedup.py::dedup_groups — pointer-jumped min-label
   propagation), so A↔B and B↔C land A,B,C in one entity even when
   A↔C itself missed the distance cut.

Blocking is RECALL-bounded: a true match whose records disagree on the
block key is never compared (the standard trade — production systems
run several complementary blocking passes and union the pairs, exactly
how dedup_pairs_battery unions minhash/simhash/ngram candidates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_name(c: Column | str) -> Column:
    """Canonical comparison form: lowercase, outer whitespace stripped,
    inner whitespace runs collapsed.  Kept deliberately tiny and
    SQL-expressible (lower/trim/regexp_replace) so the DuckDB oracle
    states the identical normalization."""
    col = F.col(c) if isinstance(c, str) else c
    return F.regexp_replace(F.lower(F.trim(col)), " +", " ")


def linkage_candidates(
    records: DataFrame,
    id_col: str,
    name_col: str,
    block_suffix_len: int = 4,
    max_dist: int = 2,
) -> DataFrame:
    """Verified candidate pairs (id_a < id_b, edit distance ≤ max_dist)
    among records sharing a blocking key.

    The block is (suffix of the normalized name, length) — suffix
    rather than prefix because identifier-shaped names (SKUs, account
    names, "Customer#000000042") share long constant prefixes, which
    would collapse everything into one block and reintroduce the n²
    join blocking exists to avoid.  The length band is free extra
    selectivity: records whose lengths differ by more than ``max_dist``
    cannot be within distance ``max_dist`` anyway (levenshtein ≥
    length difference), so banding on exact length only costs matches
    blocking already risks, and it bounds the worst block size.

    Cost: one shuffle on the block key; per-block work is |block|²
    verify comparisons — the block key must be chosen so blocks stay
    O(1)-ish, the same hot-bucket discipline as capped_band_pairs.
    """
    n = normalize_name(name_col)
    keyed = records.select(
        F.col(id_col).alias("rec_id"),
        n.alias("name_n"),
        F.concat_ws(
            "|",
            F.substring(n, -block_suffix_len, block_suffix_len),
            F.length(n).cast("string"),
        ).alias("_block"),
    )
    a = keyed.select(
        F.col("rec_id").alias("id_a"),
        F.col("name_n").alias("name_a"),
        "_block",
    )
    b = keyed.select(
        F.col("rec_id").alias("id_b"),
        F.col("name_n").alias("name_b"),
        "_block",
    )
    return (
        a.join(b, "_block")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") <= max_dist)
        .select("id_a", "id_b", "dist")
    )


def linkage_clusters(pairs: DataFrame) -> DataFrame:
    """Entity ids from verified pairs: (rec_id, entity_id) where
    entity_id is the smallest rec_id transitively reachable — a thin
    naming shim over dedup_groups (same algorithm, same guarantees);
    records with no matching pair are their own entity and simply
    don't appear (union them back with entity_id = rec_id if a total
    assignment is needed)."""
    from .dedup import dedup_groups

    return dedup_groups(pairs.select("id_a", "id_b")).select(
        F.col("doc_id").alias("rec_id"), F.col("group_id").alias("entity_id")
    )
