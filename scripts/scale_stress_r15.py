"""Round-15 scaling sections, written to SCALING_r15.json:

- ``ann_curve``: the ANN OPERATING CURVE (verdict r14 next #4) — the
  residual-encoded IVFADC (q127's operator) at x10/x25 corpus sizes,
  index built ONCE (persisted centroids / cell centroids / codebook /
  encoded cells), then nprobe swept over {1, 2, 3, 4, 6, 8}: recall@10
  against the int8 brute-force truth, the SCORED corpus mass fraction
  (the probed cells' share of encoded vectors — the cost the curve
  trades recall against), and search wall per query. This is the
  evidence a production deployment picks nprobe/n_cells from.

- ``residual_delta``: raw-vector q124 vs residual q127 recall@10 on
  the same corpus/queries at each size — the measured quality delta
  that justifies residual encoding (Jégou et al. 2011 §III).

- ``cell_balance``: the trained coarse quantizer's cell-size census at
  each size (max/mean cell fraction) — the skew measurement behind the
  max_cell_frac guard (verdict r14 next #5).

- ``q128_chain``: the capstone pretrain-assembly chain at
  sf0.001/0.01/0.1 — wall seconds and µs/input-record; the chain is
  ~15 sequential stage jobs, so the claim is FLAT wall vs corpus size
  until records dominate the fixed stage overhead.

Usage: python scripts/scale_stress_r15.py [--sizes 10 25] [--runs 2]
       [--only ann_curve residual_delta cell_balance q128_chain]

Partial ``--only`` runs MERGE into SCALING_r15.json (the r9 harness
convention)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import scale_stress as ss  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

BASE_VECS = 2_000
K_TRUTH = 10
NPROBES = [1, 2, 3, 4, 6, 8]
COARSE_K = 8


def _mat(df):
    return df.localCheckpoint(eager=True)


def _queries(emb, stride=97):
    return emb.filter(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _mean_recall(spark, truth, approx):
    from candia_spark.operators.retrieval import ann_recall_audit

    rows = ann_recall_audit(truth, approx, k=K_TRUTH).collect()
    return round(sum(r["recall"] for r in rows) / max(len(rows), 1), 4)


def _uniform_embeddings(spark, k):
    tmp = tempfile.mkdtemp(prefix=f"annc{k}_")
    ss.build_embeddings(spark, k, tmp)
    return spark.read.parquet(os.path.join(tmp, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )


def _run_nprobe_sweep(spark, sizes, runs, corpus_of, coarse_k, nprobes,
                      label, claim):
    """ONE sweep harness for every corpus family (review r15: the
    per-family copies had already drifted on timing methodology):
    build the residual index once per size (persisted pieces), then
    per nprobe record recall@10 vs the int8 truth, the scored corpus
    mass, and best-of-``runs`` search wall."""
    from candia_spark.operators.clustering import (
        kmeans_centroids,
        kmeans_probe_cells,
    )
    from candia_spark.operators.similarity import (
        _pq_codebook_kmeans_q,
        _pq_encode_q,
        cell_centroids_int8,
        cosine_topk_int8,
        pq_topk_ivfadc_residual,
        quantize_int8,
    )

    out = {"claim": claim, "coarse_k": coarse_k, "sizes": {}}
    for k in sizes:
        emb = _mat(corpus_of(spark, k))
        n = emb.count()
        qs = _mat(_queries(emb))
        nq = qs.count()
        t0 = time.perf_counter()
        cent = _mat(kmeans_centroids(emb, k=coarse_k, iters=2))
        cells = _mat(
            kmeans_probe_cells(emb, cent, nprobe=1, id_col="vec_id")
            .select("vec_id", F.col("cluster").alias("bucket"))
        )
        q = _mat(quantize_int8(emb))
        cc = _mat(cell_centroids_int8(q, cells))
        rz = _mat(
            q.join(cells, "vec_id")
            .join(F.broadcast(cc), "bucket")
            .select(
                "vec_id", "bucket",
                F.zip_with("qvec", "cvec", lambda x, c: x - c).alias("qvec"),
            )
        )
        cb = _mat(
            _pq_codebook_kmeans_q(
                rz.select("vec_id", "qvec"), 8, 16, 2, "vec_id"
            )
        )
        enc = _mat(
            _pq_encode_q(rz.select("vec_id", "qvec"), cb, 8, "vec_id").join(
                rz.select("vec_id", "bucket"), "vec_id"
            )
        )
        build_s = round(time.perf_counter() - t0, 3)
        truth = _mat(cosine_topk_int8(emb, qs, k=K_TRUTH))
        # cell census once: scored mass per nprobe derives from it
        census = {
            r["bucket"]: r["n"]
            for r in cells.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        total = sum(census.values())
        curve = []
        for nprobe in nprobes:
            probes = kmeans_probe_cells(
                qs, cent, nprobe=nprobe, id_col="query_id"
            )
            probed = probes.groupBy("cluster").agg(
                F.count(F.lit(1)).alias("nq")
            ).collect()
            scored_mass = sum(
                census.get(r["cluster"], 0) * r["nq"] for r in probed
            ) / (total * nq)
            approx = pq_topk_ivfadc_residual(
                emb, qs, k=K_TRUTH, nprobe=nprobe,
                centroids=cent, cell_centroids=cc,
                codebook=cb, encoded_cells=enc,
            )
            best = None
            for _ in range(max(1, runs)):
                t0 = time.perf_counter()
                approx.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            rec = _mean_recall(spark, truth, approx)
            curve.append({
                "nprobe": nprobe,
                "recall_at_10": rec,
                "scored_mass_frac": round(scored_mass, 4),
                "search_wall_s": round(best, 3),
                "search_us_per_query": round(best / nq * 1e6, 1),
            })
            print(json.dumps({label: k, **curve[-1]}), flush=True)
        out["sizes"][str(k)] = {
            "n_vectors": n, "n_queries": nq,
            "build_once_s": build_s, "curve": curve,
        }
    return out


def run_ann_curve(spark, sizes, runs):
    return _run_nprobe_sweep(
        spark, sizes, runs, _uniform_embeddings, COARSE_K, NPROBES,
        "ann_curve",
        "index built once (trained coarse + cell centroids + residual "
        "codebook + encoded cells persisted); each nprobe point pays "
        "only probe + LUT + the probed cells' ADC — recall climbs with "
        "scored mass, and the curve picks the production nprobe",
    )


def _clustered_embeddings(spark, n_vectors, n_clusters=32, dim=64,
                          offset=20.0):
    """The q127 test fixture scaled up, generated in-plan: ±20 cluster
    offsets (cluster = vid % n_clusters, offset sign pattern from the
    cluster bits) + an id-derived ±8 spread — the corpus family where
    coarse cells carry real structure, so the nprobe curve is a real
    operating trade (the uniform tiled corpus has none: its recall sits
    at the PQ capacity floor at every nprobe — measured, kept in the
    leg as the contrast)."""
    base = spark.range(n_vectors).select(F.col("id").alias("vec_id"))
    c = (F.col("vec_id") % n_clusters).cast("int")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        # bit (d % 8) of the cluster id via floor-div (shiftright takes
        # only a literal shift, and d is a lambda column)
        lambda d: (
            F.when(
                F.floor(
                    c.cast("double") / F.pow(F.lit(2.0), (d % 8))
                ).cast("bigint") % 2 == 1,
                F.lit(float(offset)),
            ).otherwise(F.lit(float(-offset)))
            + 2.0 * ((F.col("vec_id") * 7 + d * 13) % 9 - 4)
        ).cast("double"),
    )
    return base.select("vec_id", vec.alias("embedding"))


def run_ann_curve_clustered(spark, sizes, runs, offset=20.0,
                            label="ann_curve_clustered"):
    return _run_nprobe_sweep(
        spark, sizes, runs,
        lambda sp, k: _clustered_embeddings(sp, BASE_VECS * k,
                                            offset=offset),
        16, (1, 2, 3, 4, 6, 8, 12, 16), label,
        "on a corpus WITH coarse structure (32 planted clusters), "
        "recall climbs steeply with the first few probes then "
        "saturates — the knee picks the production nprobe; the uniform "
        "corpus leg is the contrast (no structure -> capacity floor)",
    )


def run_residual_delta(spark, sizes):
    from candia_spark.operators.similarity import (
        cosine_topk_int8,
        pq_topk_ivf_trained,
        pq_topk_ivfadc_residual,
    )

    out = {"claim": (
        "same corpus, same queries, same m/K/nprobe budget: the "
        "residual encoder's recall@10 minus the raw-vector encoder's "
        "is the measured value of Jégou §III residual encoding"
    ), "sizes": {}}
    for k in sizes:
        tmp = tempfile.mkdtemp(prefix=f"rdelta{k}_")
        n = ss.build_embeddings(spark, k, tmp)
        emb = _mat(
            spark.read.parquet(os.path.join(tmp, "embeddings.parquet"))
            .select("vec_id", "embedding")
        )
        qs = _mat(_queries(emb))
        truth = _mat(cosine_topk_int8(emb, qs, k=K_TRUTH))
        kw = dict(k=K_TRUTH, m=8, codewords=16, nprobe=3, coarse_k=8,
                  coarse_iters=2, pq_iters=2)
        raw = _mean_recall(spark, truth, pq_topk_ivf_trained(emb, qs, **kw))
        res = _mean_recall(
            spark, truth, pq_topk_ivfadc_residual(emb, qs, **kw)
        )
        out["sizes"][str(k)] = {
            "n_vectors": n,
            "recall_raw_q124": raw,
            "recall_residual_q127": res,
            "delta": round(res - raw, 4),
        }
        print(json.dumps({"residual_delta": k, **out["sizes"][str(k)]}),
              flush=True)
    return out


def run_cell_balance(spark, sizes):
    from candia_spark.operators.clustering import (
        kmeans_centroids,
        kmeans_probe_cells,
    )

    out = {"claim": (
        "trained cells are uneven by construction; the census is one "
        "k-row agg over the assignment — max_cell_frac quantifies the "
        "worst probe's corpus share and the guard raises above it"
    ), "sizes": {}}
    for k in sizes:
        tmp = tempfile.mkdtemp(prefix=f"cbal{k}_")
        n = ss.build_embeddings(spark, k, tmp)
        emb = spark.read.parquet(
            os.path.join(tmp, "embeddings.parquet")
        ).select("vec_id", "embedding")
        cent = _mat(kmeans_centroids(emb, k=COARSE_K, iters=2))
        sizes_rows = (
            kmeans_probe_cells(emb, cent, nprobe=1, id_col="vec_id")
            .groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        ns = sorted((int(r["n"]) for r in sizes_rows), reverse=True)
        tot = sum(ns)
        out["sizes"][str(k)] = {
            "n_vectors": n, "n_cells": len(ns),
            "max_cell_frac": round(ns[0] / tot, 4),
            "even_grid_frac": round(1 / COARSE_K, 4),
            "cell_fracs": [round(x / tot, 4) for x in ns],
        }
        print(json.dumps({"cell_balance": k, **out["sizes"][str(k)]}),
              flush=True)
    return out


def run_rerank_recovery(spark, sizes):
    """Re-rank recovery on the HARD corpus (the uniform leg's capacity
    floor): plain residual-ADC ranks vs the same index with an exact
    re-rank over R in {20, 50}. Claim: the shortlist's hit rate, not
    ADC rank quality, bounds recall — exact re-ranking of a small R
    recovers a large fraction of the floor at Q*R extra full-vector
    reads (Jégou §V-D's measured point)."""
    from candia_spark.operators.similarity import (
        cosine_topk_int8,
        pq_topk_ivfadc_residual,
        pq_topk_rerank,
    )

    out = {"claim": (
        "exact re-rank of the ADC shortlist recovers recall the "
        "quantizer loses; cost is Q*R full-vector reads, never a scan"
    ), "sizes": {}}
    kw = dict(m=8, codewords=16, nprobe=3, coarse_k=8,
              coarse_iters=2, pq_iters=2)
    for k in sizes:
        emb = _mat(_uniform_embeddings(spark, k))
        n = emb.count()
        qs = _mat(_queries(emb))
        truth = _mat(cosine_topk_int8(emb, qs, k=K_TRUTH))
        plain = _mean_recall(
            spark, truth, pq_topk_ivfadc_residual(emb, qs, k=K_TRUTH, **kw)
        )
        row = {"n_vectors": n, "recall_plain_adc": plain}
        for r in (20, 50):
            row[f"recall_rerank_R{r}"] = _mean_recall(
                spark, truth,
                pq_topk_rerank(emb, qs, k=K_TRUTH, shortlist=r, **kw),
            )
        out["sizes"][str(k)] = row
        print(json.dumps({"rerank_recovery": k, **row}), flush=True)
    return out


def run_blocklist_scale(spark, runs):
    """The join engine vs list size at fixed corpus (sf0.1 documents,
    5000 docs): plan compile + execution wall as the phrase list grows
    1k -> 10k -> 50k. Claim: phrases are broadcast DATA, so wall grows
    with the broadcast build + n-gram join probe, not with plan size —
    the inline engine cannot run any of these points (measured
    StackOverflow near 1k contains() terms)."""
    from candia_spark.operators.curation import blocklist_filter
    from candia_spark.tables import load_table

    docs = _mat(
        load_table(spark, "/root/testdata/sf0.1", "documents").select(
            "doc_id", "text"
        )
    )
    out = {"claim": (
        "join-engine wall is broadcast-build + n-gram probe, constant "
        "plan size; the inline engine stack-overflows near 1k phrases"
    ), "n_docs": docs.count(), "points": []}
    for n_phrases in (1_000, 10_000, 50_000):
        phrases = [f"filler phrase {i:06d}" for i in range(n_phrases - 2)]
        phrases += ["slow", "merge batch"]  # real corpus hits
        best = None
        for _ in range(max(1, runs)):
            t0 = time.perf_counter()
            blocklist_filter(docs, phrases, engine="join").write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out["points"].append(
            {"n_phrases": n_phrases, "wall_s": round(best, 3)}
        )
        print(json.dumps({"blocklist_scale": n_phrases,
                          "wall_s": round(best, 3)}), flush=True)
    return out


def run_q128_chain(spark, runs):
    from candia_spark.plans.queries import QUERY_REGISTRY

    out = {"claim": (
        "the capstone chain is ~15 sequential stage jobs over "
        "stage-checkpointed corpora; wall is dominated by fixed stage "
        "overhead at these sizes, so µs/record FALLS as records grow — "
        "the 100 TB shape is per-stage linear scans + keyed shuffles"
    ), "sf": {}}
    spec = QUERY_REGISTRY["q128_pretrain_assembly"]
    for sf, ndocs in (("sf0.001", 500), ("sf0.01", 500), ("sf0.1", 5000)):
        best = None
        for _ in range(max(1, runs)):
            t0 = time.perf_counter()
            spec.spark(spark, f"/root/testdata/{sf}").write.format(
                "noop"
            ).mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out["sf"][sf] = {
            "records": ndocs,
            "wall_s": round(best, 3),
            "us_per_record": round(best / ndocs * 1e6, 1),
        }
        print(json.dumps({"q128_chain": sf, **out["sf"][sf]}), flush=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="*", type=int, default=[10, 25])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()
    legs = args.only or [
        "ann_curve", "ann_curve_clustered", "ann_curve_overlap",
        "residual_delta", "cell_balance", "q128_chain", "blocklist_scale",
        "rerank_recovery"
    ]

    from candia_spark.session import get_spark

    spark = get_spark(app_name="scale_stress_r15")
    spark.sparkContext.setLogLevel("ERROR")

    path = os.path.join(REPO, "SCALING_r15.json")
    result = {}
    if os.path.exists(path):
        with open(path) as f:
            result = json.load(f)
    result["runs"] = args.runs
    if "ann_curve" in legs:
        result["ann_curve"] = run_ann_curve(spark, args.sizes, args.runs)
    if "ann_curve_clustered" in legs:
        result["ann_curve_clustered"] = run_ann_curve_clustered(
            spark, args.sizes, args.runs
        )
    if "ann_curve_overlap" in legs:
        # ±6 offsets against a ±8 spread: true neighbors cross cell
        # borders — the classic RISING recall-vs-nprobe curve between
        # the uniform floor and the well-separated ceiling
        result["ann_curve_overlap"] = run_ann_curve_clustered(
            spark, args.sizes, args.runs, offset=6.0,
            label="ann_curve_overlap",
        )
    if "residual_delta" in legs:
        result["residual_delta"] = run_residual_delta(spark, args.sizes)
    if "cell_balance" in legs:
        result["cell_balance"] = run_cell_balance(spark, args.sizes)
    if "q128_chain" in legs:
        result["q128_chain"] = run_q128_chain(spark, args.runs)
    if "blocklist_scale" in legs:
        result["blocklist_scale"] = run_blocklist_scale(spark, args.runs)
    if "rerank_recovery" in legs:
        result["rerank_recovery"] = run_rerank_recovery(spark, args.sizes)
    with open(path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print("WROTE", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
