#!/usr/bin/env python
"""Recall-vs-parameter curves for the approximate families at sf1.

The single recall-floor tests pin one operating point each; a 100 TB
user tuning bands/rows, hamming radius, or nprobe needs the CURVE.
This sweep records recall against exact ground truth computed at probe
scale, plus wall seconds per setting, for:

- MinHash LSH (k=16): bands in {2,4,8,16} (rows = k/bands) against
  brute-force word-shingle Jaccard >= 0.5 pairs over the sf1
  doc_id%11 subset (~4.5k docs -> ~10M exact comparisons; the subset
  is what makes EXACT truth tractable — the operator's cost model is
  unchanged by it).
- SimHash (bands=4): verify radius max_hamming in {2,3,4,6,8} against
  brute-force hamming<=radius pairs over the same subset (banding
  guarantees recall 1.0 through radius 3 = bands-1; the curve shows
  the decay beyond the guarantee), plus bands in {2,8} at radius 8
  for the banding axis.
- IVF ANN: nprobe in {1,2,4,8,16} with 200 sampled centroids over the
  20k-vector sf1 embeddings, recall@10 against brute_force_topk for
  200 queries.

Writes ONE JSON object to RECALL_CURVES_r8.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("CURVE_SF_DIR", "/root/repo/.scratch/sf1")
OUT = os.environ.get("CURVE_OUT", "RECALL_CURVES_r8.json")


def pair_set(df) -> set[tuple[int, int]]:
    return {
        (min(r[0], r[1]), max(r[0], r[1]))
        for r in df.select("id_a", "id_b").collect()
    }


def main() -> None:
    from imdb_top_250_etl_pipeline_spark.operators.dedup import (
        _half_long,
        minhash_candidate_pairs,
        simhash_pairs,
        simhash_table,
        word_shingles,
    )
    from imdb_top_250_etl_pipeline_spark.operators.pinning import pin_scope
    from imdb_top_250_etl_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )
    from imdb_top_250_etl_pipeline_spark.session import get_spark

    spark = get_spark("recall-curves")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {"sf_dir": SF_DIR}

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where(F.col("doc_id") % 11 == 0)
        .select("doc_id", "text")
    )
    n_docs = docs.count()
    report["n_docs_subset"] = n_docs

    # ---- exact word-shingle Jaccard ground truth (brute force) ----
    sh = docs.select(
        "doc_id",
        F.array_distinct(word_shingles("text", 3)).alias("sh"),
    ).where(F.size("sh") > 0)
    # the brute-force nested loop streams the LEFT side: spread it over
    # all cores (a single-file parquet read otherwise leaves the whole
    # O(n^2) comparison on one task)
    a = sh.repartition(64).select(
        F.col("doc_id").alias("id_a"), F.col("sh").alias("sa")
    )
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sb"))
    t0 = time.perf_counter()
    truth_mh = pair_set(
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sa", "sb"))
                / F.size(F.array_union("sa", "sb"))
            ).alias("j"),
        )
        .where(F.col("j") >= 0.5)
    )
    report["minhash_truth"] = {
        "n_pairs": len(truth_mh),
        "brute_force_s": round(time.perf_counter() - t0, 1),
    }

    report["minhash_curve"] = []
    for bands in (2, 4, 8, 16):
        with pin_scope():
            t0 = time.perf_counter()
            found = pair_set(
                minhash_candidate_pairs(
                    docs, "text", "doc_id", k=16, bands=bands,
                    jaccard_threshold=0.5,
                )
            )
            wall = round(time.perf_counter() - t0, 1)
        hit = len(found & truth_mh)
        report["minhash_curve"].append(
            {
                "k": 16,
                "bands": bands,
                "rows": 16 // bands,
                "recall": round(hit / max(len(truth_mh), 1), 4),
                "n_found": len(found),
                "wall_s": wall,
            }
        )

    # ---- SimHash: exact hamming ground truth per radius ----
    with pin_scope():
        # bits is a 64-char '0'/'1' string; hamming = popcount over the
        # xor of its two 32-bit halves (the operator's own verify form)
        st = simhash_table(docs, "text", "doc_id").select(
            "doc_id",
            _half_long(F.col("bits"), 1).alias("h1"),
            _half_long(F.col("bits"), 33).alias("h2"),
        )
        sa = st.repartition(64).select(
            F.col("doc_id").alias("id_a"),
            F.col("h1").alias("a1"),
            F.col("h2").alias("a2"),
        )
        sb = st.select(
            F.col("doc_id").alias("id_b"),
            F.col("h1").alias("b1"),
            F.col("h2").alias("b2"),
        )
        ham = F.bit_count(
            F.col("a1").bitwiseXOR(F.col("b1"))
        ) + F.bit_count(F.col("a2").bitwiseXOR(F.col("b2")))
        t0 = time.perf_counter()
        truth_rows = (
            sa.join(sb, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", ham.alias("h"))
            .where(F.col("h") <= 8)
            .collect()
        )
        report["simhash_truth_brute_force_s"] = round(
            time.perf_counter() - t0, 1
        )
        truth_by_radius = {
            r: {
                (min(x["id_a"], x["id_b"]), max(x["id_a"], x["id_b"]))
                for x in truth_rows
                if x["h"] <= r
            }
            for r in (2, 3, 4, 6, 8)
        }
        report["simhash_curve"] = []
        for radius in (2, 3, 4, 6, 8):
            with pin_scope():
                t0 = time.perf_counter()
                found = pair_set(
                    simhash_pairs(
                        docs, "text", "doc_id", max_hamming=radius, bands=4
                    )
                )
                wall = round(time.perf_counter() - t0, 1)
            truth = truth_by_radius[radius]
            report["simhash_curve"].append(
                {
                    "bands": 4,
                    "max_hamming": radius,
                    "recall": round(
                        len(found & truth) / max(len(truth), 1), 4
                    ),
                    "n_truth": len(truth),
                    "n_found": len(found),
                    "wall_s": wall,
                }
            )
        for bands in (2, 8):
            with pin_scope():
                t0 = time.perf_counter()
                found = pair_set(
                    simhash_pairs(
                        docs, "text", "doc_id", max_hamming=8, bands=bands
                    )
                )
                wall = round(time.perf_counter() - t0, 1)
            truth = truth_by_radius[8]
            report["simhash_curve"].append(
                {
                    "bands": bands,
                    "max_hamming": 8,
                    "recall": round(
                        len(found & truth) / max(len(truth), 1), 4
                    ),
                    "n_truth": len(truth),
                    "n_found": len(found),
                    "wall_s": wall,
                }
            )

    # ---- IVF: recall@10 vs brute force ----
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = e.where(F.col("vec_id") % 100 == 0)
    centroids = e.where(F.col("vec_id") % 100 == 50)
    report["ivf"] = {
        "n_corpus": e.count(),
        "n_queries": queries.count(),
        "n_centroids": centroids.count(),
        "k": 10,
    }
    truth_ann = {}
    t0 = time.perf_counter()
    for r in brute_force_topk(e, queries, k=10).collect():
        truth_ann.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    report["ivf"]["brute_force_s"] = round(time.perf_counter() - t0, 1)

    report["ivf_curve"] = []
    for nprobe in (1, 2, 4, 8, 16):
        with pin_scope():
            t0 = time.perf_counter()
            got: dict = {}
            for r in ivf_topk(
                e, queries, centroids, k=10, nprobe=nprobe
            ).collect():
                got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            wall = round(time.perf_counter() - t0, 1)
        recalls = [
            len(got.get(q, set()) & t) / len(t) for q, t in truth_ann.items()
        ]
        report["ivf_curve"].append(
            {
                "nprobe": nprobe,
                "recall_at_10": round(sum(recalls) / len(recalls), 4),
                "wall_s": wall,
            }
        )

    # ---- PQ + exact refine: recall@5 vs shortlist size (round 11) ----
    from imdb_top_250_etl_pipeline_spark.operators.similarity import (
        pq_encode,
        pq_refine_topk,
        pq_train,
    )

    truth5: dict = {}
    t0 = time.perf_counter()
    for r in brute_force_topk(e, queries, k=5).collect():
        truth5.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    report["pq"] = {
        "m": 16,
        "ksub": 16,
        "k": 5,
        "brute_force_s": round(time.perf_counter() - t0, 1),
    }
    with pin_scope():
        seeds = e.where(F.col("vec_id") % 29 == 0)
        books = pq_train(e, seeds, m=16, ksub=16, iterations=3)
        index = pq_encode(e, books, m=16)
        report["pq_curve"] = []
        for shortlist in (20, 50, 100, 200):
            t0 = time.perf_counter()
            got = {}
            for r in pq_refine_topk(
                index, queries, books, e, k=5, shortlist=shortlist, m=16
            ).collect():
                got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            wall = round(time.perf_counter() - t0, 1)
            recalls = [
                len(got.get(q, set()) & t) / len(t)
                for q, t in truth5.items()
            ]
            report["pq_curve"].append(
                {
                    "shortlist": shortlist,
                    "recall_at_5": round(sum(recalls) / len(recalls), 4),
                    "wall_s": wall,
                }
            )

    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
