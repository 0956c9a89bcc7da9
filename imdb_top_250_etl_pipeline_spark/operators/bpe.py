"""Distributed BPE (byte-pair encoding) vocabulary training.

Tokenizer training is the one corpus-scale job every pre-training
pipeline runs exactly once and every later job depends on.  The
standard trainer (Sennrich et al., the GPT-2/SentencePiece shape)
iterates: count adjacent symbol pairs across the corpus, merge the most
frequent pair everywhere, repeat.  The scalable formulation operates on
the DISTINCT-WORD table weighted by word frequency — corpus size only
matters once (the word count), after which each merge round's cost is
bounded by vocabulary size, not corpus size.

Spark-first shape, NO driver-side collect anywhere (the engine's
no-collect rule): each round's argmax pair is a one-row DataFrame
(TakeOrdered with a deterministic freq-desc/lexicographic tie-break)
that CROSS-JOINS back as a broadcast, and the merge itself is a per-row
``aggregate`` fold over the symbol array comparing against the
broadcast pair columns — so the full k-round trainer is one lazy plan
per round with a localCheckpoint pin between rounds (the
kmeans_refine/pagerank iteration discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pinning import eager_pin, pin

END_MARK = "▁"  # word-end sentinel (SentencePiece's marker)


def _word_symbols(df: DataFrame, text_col: str) -> DataFrame:
    """(symbols: array<string>, freq: long) — one row per DISTINCT word,
    symbols = characters with the end-marker appended to the last."""
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    chars = F.split(F.col("w"), "")
    n = F.size(chars)
    symbols = F.concat(
        F.slice(chars, 1, n - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(END_MARK))),
    )
    # 1-char words: slice(1, 0) is empty, element_at(-1) is the char
    return words.select(symbols.alias("symbols"), "freq")


def _merge_expr(pa, pb):
    """Fold a symbol array, replacing every adjacent (pa, pb) with
    pa||pb — left-to-right, non-overlapping (after a merge the new
    symbol can immediately pair with the NEXT input, matching the
    reference implementation)."""

    def step(acc, x):
        # ANSI note: element_at(acc, -1) THROWS on an empty array, but
        # Catalyst's And short-circuits (left=false skips the right), so
        # the size(acc) > 0 guard makes this safe under the driver's
        # vanilla ANSI session — verified explicitly; keep the guard
        # FIRST in the conjunction
        can = (F.size(acc) > 0) & (F.element_at(acc, -1) == pa) & (x == pb)
        merged = F.concat(
            F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(pa, pb))
        )
        return F.when(can, merged).otherwise(F.concat(acc, F.array(x)))

    return lambda col: F.aggregate(
        col, F.array().cast("array<string>"), step
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges → (rank, left, right, freq): the
    rank-ordered merge table (the tokenizer artifact).

    Determinism: each round's winning pair is the max by (freq DESC,
    left ASC, right ASC) — the lexicographic tie-break makes the whole
    merge sequence reproducible across partitionings and engines, which
    the python-dual test pins exactly.  Rounds whose best pair has
    freq < 2 stop contributing (a pair occurring once is never worth a
    merge; the reference trainer's stopping rule).
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = df.sparkSession
    vocab, vocab_pin = pin(_word_symbols(df, text_col))
    merges: DataFrame | None = None
    for rank in range(n_merges):
        pairs = (
            vocab.select(
                F.posexplode(
                    F.slice(F.col("symbols"), 1, F.size("symbols") - 1)
                ).alias("_i", "left"),
                F.col("symbols"),
                F.col("freq"),
            )
            .select(
                "left",
                F.element_at(F.col("symbols"), F.col("_i") + 2).alias(
                    "right"
                ),
                "freq",
            )
            .groupBy("left", "right")
            .agg(F.sum("freq").alias("pair_freq"))
            .where(F.col("pair_freq") >= 2)
        )
        best = (
            pairs.orderBy(
                F.desc("pair_freq"), F.asc("left"), F.asc("right")
            )
            .limit(1)
            .select(
                F.lit(rank).cast("long").alias("rank"),
                "left",
                "right",
                F.col("pair_freq").alias("freq"),
            )
        )
        # pin the 1-row winner: it feeds BOTH the merge table and the
        # rewrite, and must not be recomputed against a rewritten vocab.
        # These pins stay until the ambient pin_scope closes — the
        # returned merges table is a union over ALL of them.
        best = eager_pin(best)
        merges = best if merges is None else merges.unionByName(best)
        rewrite = _merge_expr(F.col("_pl"), F.col("_pr"))
        vocab = (
            vocab.crossJoin(
                F.broadcast(
                    best.select(
                        F.col("left").alias("_pl"),
                        F.col("right").alias("_pr"),
                    )
                )
            )
            .select(rewrite(F.col("symbols")).alias("symbols"), "freq")
        )
        if (rank + 1) % checkpoint_every == 0 or rank == n_merges - 1:
            # new vocab checkpoint materialized -> the previous round's
            # vocab blocks can be freed immediately
            vocab, handle = pin(vocab)
            vocab_pin.release()
            vocab_pin = handle
    # the final vocab pin is pure scratch (only `merges` is returned)
    vocab_pin.release()
    return merges


def bpe_segment(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Apply a learned merge list to a corpus → (id, tokens:
    array<string>): the encode side, with the merge table as plain
    Python literals (the tokenizer artifact is tiny and ships with the
    job — broadcast by value into the plan, never a join).  Each merge
    is one fold over the symbol arrays; k merges chain k folds into a
    single codegen'd projection — no shuffles at all beyond the scan.
    """
    words = df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), " ")).alias("_pos", "_w"),
    ).where(F.length("_w") > 0)
    sym_w = F.split(F.col("_w"), "")
    n_w = F.size(sym_w)
    expr = F.concat(
        F.slice(sym_w, 1, n_w - 1),
        F.array(F.concat(F.element_at(sym_w, -1), F.lit(END_MARK))),
    )
    for left, right in merges:
        expr = _merge_expr(F.lit(left), F.lit(right))(expr)
    return (
        words.select(id_col, "_pos", expr.alias("_toks"))
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_pos", "_toks"))
                    ),
                    lambda s: s["_toks"],
                )
            ).alias("tokens")
        )
    )
