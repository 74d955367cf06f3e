"""Round-13 scaling sections, written to SCALING_r13.json:

- ``html``: extract_html_text at x10/x25/x50 over synthetic HTML
  (every doc's payload unique, realistic tag/entity density). Claim:
  a pure per-row regexp map — linear in payload bytes, falling
  per-doc cost, zero exchanges at any size.

- ``hardneg``: mine_hard_negatives with a FIXED 64-query batch against
  a growing corpus. Claim: cost is the Q*N integer dot-product stream
  (queries broadcast, corpus never shuffles) — linear in N with flat
  per-(query*vector) cost.

- ``pq``: pq_topk_adc (encode + LUT + ADC) vs the int8 brute-force
  scorer on the same shapes, fixed 64 queries. Claim: encode is one
  keyed shuffle of N*m integer rows (linear); ADC scoring touches only
  m-byte codes, so per-vector search cost falls while brute force
  carries full 64-lane dot products. The crossover is the PQ memory
  story made measurable.

- ``detshuffle``: deterministic_shuffle at x10/x25/x50. Claim: one
  keyed exchange + shard-local sort = linear, falling per-doc.

- ``entropy``: char census + integer-bits entropy at x10/x25/x50.
  Claim: per-row O(D*N_chars) HOF, no explode — linear corpus-wise.

- ``mixture``: mixture_epoch_plan at x10/x25/x50. Claim: one
  map-side-combined census + a 5-row broadcast join — linear with the
  census, output size constant.

Usage: python scripts/scale_stress_r13.py [--sizes 10 25 50] [--runs 2]
       [--only html hardneg pq detshuffle entropy mixture]

Partial ``--only`` runs MERGE into SCALING_r13.json (the r9 harness
convention)."""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import scale_stress as ss  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

BASE_DOCS = 2_000
BASE_VECS = 2_000
N_QUERIES = 64
DIM = 64


def ss_materialize(df):
    return df.localCheckpoint(eager=True)


def _html_corpus(spark, n_docs: int):
    """Unique-per-doc payload wrapped in a realistic markup envelope
    (title + style + script with decoy close tag + comment + entities +
    paragraphs) — ~0.5 KB of HTML per doc."""
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(19)),
            lambda j: F.concat(
                F.lit("w"), F.col("id").cast("string"), F.lit("x"),
                j.cast("string"),
            ),
        ),
        " ",
    )
    html = F.concat(
        F.lit("<!DOCTYPE html><html><head><title>Doc "),
        F.col("id").cast("string"),
        F.lit('</title><style>p { margin: 0; }</style>'
              '<script>var x = "</div>" + 1 < 2;</script></head>'
              "<body><!-- draft <p>note</p> --><h1>Header</h1><p>"),
        body,
        F.lit(" &amp; more &lt;data&gt;</p><div>"),
        body,
        F.lit("</div><ul><li>a</li><li>b</li></ul></body></html>"),
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), html.alias("html")
    )


def _vec_corpus(spark, n_vecs: int):
    """Deterministic pseudo-random float vectors, dim 64, no RNG."""
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: (
            ((F.col("id") * 31 + j * 17) % 29 - 14).cast("double") / 14.0
        ).cast("float"),
    )
    lab = (F.col("id") % 10).cast("bigint")
    return spark.range(n_vecs).select(
        F.col("id").alias("vec_id"), vec.alias("embedding"),
        lab.alias("label"),
    )


def run_html(spark, n_docs: int, runs: int) -> dict:
    from candia_spark.operators.curation import extract_html_text

    docs = ss_materialize(_html_corpus(spark, n_docs))
    sec = ss.timed(lambda: extract_html_text(docs), runs)
    return {
        "n_docs": n_docs,
        "sec": sec,
        "us_per_doc": round(sec * 1e6 / n_docs, 2),
    }


def run_hardneg(spark, n_vecs: int, runs: int) -> dict:
    from candia_spark.operators.similarity import mine_hard_negatives

    corpus = ss_materialize(_vec_corpus(spark, n_vecs))
    qs = ss_materialize(
        corpus.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding", "label"
        )
    )
    sec = ss.timed(lambda: mine_hard_negatives(corpus, qs, k=5), runs)
    return {
        "n_vecs": n_vecs,
        "n_queries": N_QUERIES,
        "sec": sec,
        "us_per_vec": round(sec * 1e6 / n_vecs, 2),
        "ns_per_pair": round(sec * 1e9 / (n_vecs * N_QUERIES), 2),
    }


def run_pq(spark, n_vecs: int, runs: int) -> dict:
    from candia_spark.operators.similarity import (
        cosine_topk_int8,
        pq_codebook_first_k,
        pq_encode,
        pq_topk_adc,
    )

    corpus = ss_materialize(_vec_corpus(spark, n_vecs).select(
        "vec_id", "embedding"
    ))
    qs = ss_materialize(
        corpus.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
    )
    # one-time index build (the production amortized pass) ...
    cb = ss_materialize(pq_codebook_first_k(corpus, m=8, codewords=16))
    sec_enc = ss.timed(lambda: pq_encode(corpus, cb, m=8), runs)
    enc = ss_materialize(pq_encode(corpus, cb, m=8))
    # ... then per-batch search touches ONLY the m-byte codes
    sec_search = ss.timed(
        lambda: pq_topk_adc(
            corpus, qs, k=5, m=8, codewords=16, codebook=cb, encoded=enc
        ),
        runs,
    )
    sec_bf = ss.timed(lambda: cosine_topk_int8(corpus, qs, k=5), runs)
    return {
        "n_vecs": n_vecs,
        "n_queries": N_QUERIES,
        "encode_sec_one_time": sec_enc,
        "encode_us_per_vec": round(sec_enc * 1e6 / n_vecs, 2),
        "search_sec": sec_search,
        "search_us_per_vec": round(sec_search * 1e6 / n_vecs, 2),
        "int8_bruteforce_sec": sec_bf,
        "int8_bruteforce_us_per_vec": round(sec_bf * 1e6 / n_vecs, 2),
    }


def run_detshuffle(spark, n_docs: int, runs: int) -> dict:
    from candia_spark.operators.sampling import deterministic_shuffle

    docs = ss_materialize(
        spark.range(n_docs).select(F.col("id").alias("doc_id"))
    )
    sec = ss.timed(
        lambda: deterministic_shuffle(docs, n_shards=64, salt="s"), runs
    )
    return {
        "n_docs": n_docs,
        "sec": sec,
        "us_per_doc": round(sec * 1e6 / n_docs, 2),
    }


def run_entropy(spark, n_docs: int, runs: int) -> dict:
    from candia_spark.functions.text import (
        char_census_counts,
        char_entropy_bits,
    )

    body = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(19)),
            lambda j: F.concat(
                F.lit("w"), F.col("id").cast("string"), F.lit("x"),
                j.cast("string"),
            ),
        ),
        " ",
    )
    docs = ss_materialize(
        spark.range(n_docs).select(
            F.col("id").alias("doc_id"), body.alias("text")
        )
    )

    def thunk():
        cnt = char_census_counts("text")
        return docs.select(
            "doc_id",
            char_entropy_bits(cnt, F.length("text")).alias("e"),
        )

    sec = ss.timed(thunk, runs)
    return {
        "n_docs": n_docs,
        "sec": sec,
        "us_per_doc": round(sec * 1e6 / n_docs, 2),
    }


def run_mixture(spark, n_docs: int, runs: int) -> dict:
    from candia_spark.operators.curation import mixture_epoch_plan

    body = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(19)),
            lambda j: F.concat(
                F.lit("w"), F.col("id").cast("string"), F.lit("x"),
                j.cast("string"),
            ),
        ),
        " ",
    )
    docs = ss_materialize(
        spark.range(n_docs).select(
            F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias(
                "source"
            ),
            body.alias("text"),
        )
    )
    weights = {f"src{i}": i + 1 for i in range(5)}
    sec = ss.timed(
        lambda: mixture_epoch_plan(docs, weights, budget_tokens=10**9), runs
    )
    return {
        "n_docs": n_docs,
        "sec": sec,
        "us_per_doc": round(sec * 1e6 / n_docs, 2),
    }


def run_ivfpq(spark, n_vecs: int, runs: int) -> dict:
    """IVF pruning on top of PQ: probe-restricted ADC vs flat ADC, same
    shapes. Claim: the probed candidate mass is ~nprobe/n_cells of the
    corpus, so search cost drops proportionally while encode and the
    coarse assignment stay linear one-time passes."""
    import numpy as np

    from candia_spark.operators.similarity import pq_topk_adc, pq_topk_ivf
    from candia_spark.plans.ivf_pinned import PINNED_CENTROIDS_8x64

    corpus = ss_materialize(_vec_corpus(spark, n_vecs).select(
        "vec_id", "embedding"
    ))
    qs = ss_materialize(
        corpus.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
    )
    cent = np.array(PINNED_CENTROIDS_8x64, dtype=np.float64)
    # index build once (codes + cells persisted in production), then
    # compare SEARCH cost: probe-restricted vs flat ADC
    from candia_spark.operators.similarity import (
        ivf_bucket,
        pq_codebook_first_k,
        pq_encode,
    )

    cb = ss_materialize(pq_codebook_first_k(corpus, m=8, codewords=16))
    cells = ivf_bucket(corpus, cent).select("vec_id", "bucket")
    encc = ss_materialize(pq_encode(corpus, cb, m=8).join(cells, "vec_id"))
    enc = ss_materialize(encc.select("vec_id", "sub", "code"))
    sec_ivfpq = ss.timed(
        lambda: pq_topk_ivf(
            corpus, qs, cent, k=5, nprobe=3, codebook=cb, encoded_cells=encc
        ),
        runs,
    )
    sec_flat = ss.timed(
        lambda: pq_topk_adc(corpus, qs, k=5, codebook=cb, encoded=enc), runs
    )
    # candidate-mass telemetry: distinct (query, vec) pairs ADC actually
    # scores — the pruning factor as a NUMBER (wall time at these sizes
    # is stage-floor-dominated; the mass ratio is what scales)
    ivf_pairs = (
        pq_topk_ivf(
            corpus, qs, cent, k=10**9, nprobe=3, codebook=cb,
            encoded_cells=encc,
        ).count()
    )
    flat_pairs = n_vecs * N_QUERIES
    return {
        "n_vecs": n_vecs,
        "n_queries": N_QUERIES,
        "nprobe_of_cells": "3/8",
        "ivfpq_search_sec": sec_ivfpq,
        "ivfpq_search_us_per_vec": round(sec_ivfpq * 1e6 / n_vecs, 2),
        "flat_pq_search_sec": sec_flat,
        "flat_pq_search_us_per_vec": round(sec_flat * 1e6 / n_vecs, 2),
        "ivfpq_scored_pairs": ivf_pairs,
        "flat_scored_pairs": flat_pairs,
        "pruned_mass_frac": round(ivf_pairs / flat_pairs, 4),
    }


def run_jl(spark, n_vecs: int, runs: int) -> dict:
    """JL 64->16 projection, both engines. Claim: pure map, linear,
    falling per-vector; 'hof' is compile-free but interpreted per row,
    'flat' pays ~2-4 s Janino compile for codegen'd execution; the
    marginals (38 vs 29 us/vec) put the crossover near ~250k vectors
    per compiled plan."""
    from candia_spark.operators.similarity import jl_project_int8

    corpus = ss_materialize(_vec_corpus(spark, n_vecs).select(
        "vec_id", "embedding"
    ))
    sec_h = ss.timed(
        lambda: jl_project_int8(corpus, in_dim=DIM, out_dim=16,
                                engine="hof"), runs
    )
    sec_f = ss.timed(
        lambda: jl_project_int8(corpus, in_dim=DIM, out_dim=16,
                                engine="flat"), runs
    )
    return {
        "n_vecs": n_vecs,
        "hof_sec": sec_h,
        "hof_us_per_vec": round(sec_h * 1e6 / n_vecs, 2),
        "flat_sec": sec_f,
        "flat_us_per_vec": round(sec_f * 1e6 / n_vecs, 2),
    }


def run_packwhole(spark, n_docs: int, runs: int) -> dict:
    """Whole-doc packing over 64 shards. Claim: the Arrow grouped-map
    sees 16-byte rows only (text never enters the UDF); cost is one
    shard-keyed shuffle + a linear per-shard walk."""
    from candia_spark.operators.curation import pack_sequences_whole

    body = F.array_join(
        F.transform(
            F.sequence(F.lit(0), (F.col("id") % 30 + 5).cast("int")),
            lambda j: F.concat(
                F.lit("w"), F.col("id").cast("string"), F.lit("x"),
                j.cast("string"),
            ),
        ),
        " ",
    )
    docs = ss_materialize(
        spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % 64).cast("string")).alias(
                "source"
            ),
            body.alias("text"),
        )
    )
    sec = ss.timed(lambda: pack_sequences_whole(docs, budget=256), runs)
    return {
        "n_docs": n_docs,
        "n_shards": 64,
        "sec": sec,
        "us_per_doc": round(sec * 1e6 / n_docs, 2),
    }


LEGS = {
    "html": (run_html, BASE_DOCS),
    "hardneg": (run_hardneg, BASE_VECS),
    "pq": (run_pq, BASE_VECS),
    "ivfpq": (run_ivfpq, BASE_VECS),
    "detshuffle": (run_detshuffle, BASE_DOCS),
    "entropy": (run_entropy, BASE_DOCS),
    "mixture": (run_mixture, BASE_DOCS),
    "jl": (run_jl, BASE_VECS),
    "packwhole": (run_packwhole, BASE_DOCS),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[10, 25, 50])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING_r13.json"))
    ap.add_argument(
        "--only", nargs="+", default=list(LEGS), choices=list(LEGS)
    )
    args = ap.parse_args()

    from candia_spark.session import get_spark

    spark = get_spark(app_name="candia_scale_stress_r13")
    spark.sparkContext.setLogLevel("ERROR")
    ss._SPARK_FOR_RECLAIM = spark

    report: dict = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            report = json.load(fh)
    report["runs"] = args.runs

    # family warmups: one tiny call per operator family so the x10
    # tile's minimum is not a JIT measurement (the r7 lesson)
    for key in args.only:
        fn, base = LEGS[key]
        fn(spark, max(base // 10, 50), 1)
        ss.reclaim()

    for key in args.only:
        fn, base = LEGS[key]
        rows = report.setdefault(key, {})
        for k in args.sizes:
            entry = fn(spark, base * k, args.runs)
            rows[f"x{k}"] = entry
            ss.reclaim()
            print(json.dumps({"progress": f"{key} x{k}", **entry}),
                  flush=True)
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps({"done": args.out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
