"""Round-10 scaling sections, written to SCALING_r10.json:

- ``bpe`` (verdict r9 next #2): the multi-round BPE trainer's per-round
  cost must track the VOCABULARY, not the corpus. Two corpus families
  at x10/x25/x50 docs:

  * ``fixed_vocab``: every document drawn from a 40-sentence pool over
    a ~60-word vocabulary — the corpus grows 5x across sizes while
    |vocab| stays constant. Claim: round-1 wall (census + one round)
    grows with the corpus, but the MARGINAL per-round cost
    ((t_rounds6 - t_rounds1) / 5 — rounds 2-6 never touch the corpus)
    stays flat.
  * ``growing_vocab``: the same pool plus one novel token per document
    — |vocab| ~ n_docs. Claim: the marginal per-round cost now grows,
    and tracks the recorded vocab row count, certifying that rounds
    price by vocabulary rather than enjoying a small-constant fluke.

- ``selfrep_long`` (verdict r9 next #4 / wrong #3): the
  remove_self_repeated_blocks engines on a long-document tile
  (32 docs x 10k/50k/100k tokens, block_words=16). The suggested
  map-typed fold accumulator is measured honestly against the
  exists-fold and the Arrow set: Catalyst's runtime MapData is
  array-backed (map_contains_key = linear scan, map_concat = O(n)
  copy), so BOTH folds are quadratic; only the Arrow leg is linear.
  Claim: arrow/auto µs-per-token flat across tiles; the sql fold's
  quadratic curve is recorded as the reason the auto default routes
  long docs away from it.

- ``bigram_openvocab`` (advice r9 #2): bigram_assoc's
  broadcast_unigrams=False shuffle-join fallback vs the broadcast-map
  default on a growing-vocabulary corpus (one novel token per doc) at
  x10/x25/x50. Claim: the fallback stays linear and within a small
  factor of the broadcast path — the insurance is affordable where the
  broadcast would eventually be impossible.

Usage: python scripts/scale_stress_r10.py [--sizes 10 25 50] [--runs 2]
       [--only bpe selfrep_long bigram_openvocab]

Partial ``--only`` runs MERGE into SCALING_r10.json instead of
clobbering (the r9 harness convention).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import scale_stress as ss  # noqa: E402  (sibling harness: builders + timer)

from pyspark.sql import functions as F  # noqa: E402

BASE_DOCS = 2_000  # x1 corpus size for the synthetic families

# ~60-word vocabulary, 40 sentences — the fixed-vocab pool. Sentences
# share words so merges are contested (real tie-break traffic).
_POOL_WORDS = [
    f"w{i}{'abcdefgh'[i % 8] * (i % 3 + 1)}" for i in range(60)
]
_POOL = [
    " ".join(_POOL_WORDS[(7 * s + j) % 60] for j in range(12))
    for s in range(40)
]


def _pool_corpus(spark, n_docs: int, novel_token: bool):
    """n_docs documents cycling through the sentence pool; optionally one
    novel token per document (vocab ~ n_docs instead of constant)."""
    text = F.element_at(
        F.array(*[F.lit(s) for s in _POOL]),
        (F.col("id") % len(_POOL) + 1).cast("int"),
    )
    if novel_token:
        text = F.concat(text, F.lit(" nv"), F.col("id").cast("string"))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )


def run_bpe(spark, n_docs: int, runs: int) -> dict:
    from candia_spark.operators.curation import bpe_encode, bpe_train, tokens

    out: dict = {"n_docs": n_docs}
    for fam, novel in (("fixed_vocab", False), ("growing_vocab", True)):
        docs = ss_materialize(_pool_corpus(spark, n_docs, novel))
        vocab_rows = (
            docs.select(F.explode(tokens("text")).alias("t"))
            .filter(F.length("t") >= 2)
            .agg(F.count_distinct("t"))
            .collect()[0][0]
        )
        t1 = ss.timed(lambda d=docs: bpe_train(d, rounds=1), runs)
        t6 = ss.timed(lambda d=docs: bpe_train(d, rounds=6), runs)
        per_round_ms = round((t6 - t1) * 1000 / 5, 1)
        # encode under the trained merges: claim is one vocab-sized
        # segmentation map + one corpus-scale word join -> linear with
        # falling per-doc cost
        merges = [
            (r["lhs"], r["rhs"])
            for r in bpe_train(docs, rounds=6).orderBy("merge_round").collect()
        ]
        enc = ss.timed(lambda d=docs: bpe_encode(d, merges), runs)
        out[fam] = {
            "vocab_rows": int(vocab_rows),
            "rounds1_sec": t1,
            "rounds6_sec": t6,
            "marginal_per_round_ms": per_round_ms,
            "encode_sec": enc,
            "encode_us_per_doc": round(enc * 1e6 / n_docs, 1),
        }
    return out


def ss_materialize(df):
    """Eagerly cut the synthetic generator so timed calls measure the
    operator, not range()+element_at row synthesis."""
    return df.localCheckpoint(eager=True)


def run_selfrep_long(spark, n_tok: int, runs: int) -> dict:
    """32 docs x n_tok random tokens from a 2000-word vocabulary (nearly
    all blocks distinct — the fold's worst case) per engine."""
    import random

    from candia_spark.operators.dedup import remove_self_repeated_blocks

    rng = random.Random(7)
    rows = [
        (
            i,
            " ".join(
                str(rng.randrange(2000)) for _ in range(n_tok)
            ),
        )
        for i in range(32)
    ]
    docs = ss_materialize(
        spark.createDataFrame(rows, "doc_id bigint, text string")
        .repartition(32)
    )
    out: dict = {"n_tok": n_tok, "n_docs": 32}
    for engine in ("sql", "arrow", "auto"):
        if engine == "sql" and n_tok > 50_000:
            # the quadratic fold at 6250 blocks is ~3 min/run — the
            # 50k point already pins the curve; record the skip loudly
            out["sql_sec"] = None
            out["sql_skipped"] = "quadratic leg pinned by smaller tiles"
            continue
        sec = ss.timed(
            lambda e=engine: remove_self_repeated_blocks(
                docs, block_words=16, engine=e
            ),
            runs,
        )
        out[f"{engine}_sec"] = sec
        out[f"{engine}_us_per_ktok"] = round(sec * 1e6 / (32 * n_tok) * 1000, 2)
    return out


def run_bigram_openvocab(spark, n_docs: int, runs: int) -> dict:
    from candia_spark.operators.curation import bigram_assoc, tokens

    docs = ss_materialize(_pool_corpus(spark, n_docs, novel_token=True))
    vocab_rows = (
        docs.select(F.explode(tokens("text")).alias("t"))
        .agg(F.count_distinct("t"))
        .collect()[0][0]
    )
    bcast = ss.timed(lambda: bigram_assoc(docs), runs)
    shuffle = ss.timed(
        lambda: bigram_assoc(docs, broadcast_unigrams=False), runs
    )
    return {
        "n_docs": n_docs,
        "vocab_rows": int(vocab_rows),
        "broadcast_sec": bcast,
        "shuffle_sec": shuffle,
        "shuffle_us_per_doc": round(shuffle * 1e6 / n_docs, 1),
    }


def run_dsir(spark, n_docs: int, runs: int) -> dict:
    """DSIR selection at x10/x25/x50 open-vocab docs; the target slice
    is every 20th document (fixed FRACTION, so the target census grows
    too — the worst case for the left join). Claim: two token censuses
    + one scoring join + one per-doc agg = linear, falling per-doc."""
    from candia_spark.operators.curation import dsir_select

    docs = ss_materialize(_pool_corpus(spark, n_docs, novel_token=True))
    target = docs.filter(F.col("doc_id") % 20 == 0)
    sec = ss.timed(lambda: dsir_select(docs, target), runs)
    return {
        "n_docs": n_docs,
        "dsir_sec": sec,
        "dsir_us_per_doc": round(sec * 1e6 / n_docs, 1),
    }


def run_mmr(spark, n_vecs: int, runs: int) -> dict:
    """MMR rerank at x10/x25/x50 synthetic vectors (dim 16,
    deterministic integer-mix coordinates): the corpus pays ONE exact
    top-40 cosine pass; the pairwise-sim stage and driver greedy are
    bounded by the shortlist, so wall must track the corpus scan."""
    from candia_spark.operators.similarity import mmr_select

    vec = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda j: (
            ((F.col("id") * 31 + j * 17) % 97).cast("float") / F.lit(97.0)
            + F.lit(0.01)
        ).cast("float"),
    )
    emb = ss_materialize(
        spark.range(n_vecs).select(
            F.col("id").alias("vec_id"), vec.alias("embedding")
        )
    )
    queries = emb.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    sec = ss.timed(
        lambda: mmr_select(emb, queries, k=8, shortlist=40), runs
    )
    return {
        "n_vecs": n_vecs,
        "mmr_sec": sec,
        "mmr_us_per_vec": round(sec * 1e6 / n_vecs, 2),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[10, 25, 50])
    ap.add_argument(
        "--tok-sizes", type=int, nargs="+",
        default=[10_000, 50_000, 100_000],
    )
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING_r10.json"))
    ap.add_argument(
        "--only", nargs="+",
        default=["bpe", "selfrep_long", "bigram_openvocab", "dsir", "mmr"],
        choices=["bpe", "selfrep_long", "bigram_openvocab", "dsir", "mmr"],
    )
    args = ap.parse_args()

    from candia_spark.session import get_spark

    spark = get_spark(app_name="candia_scale_stress_r10")
    spark.sparkContext.setLogLevel("ERROR")
    ss._SPARK_FOR_RECLAIM = spark

    # merge into an existing artifact on partial --only runs (r9 rule)
    report: dict = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            report = json.load(fh)
    report.setdefault("base_docs", BASE_DOCS)
    report["runs"] = args.runs

    if "bpe" in args.only:
        # family warmup: one tiny trainer pass JITs the census/replace
        # shapes so the first size's minimum is not a JIT measurement
        from candia_spark.operators.curation import bpe_train

        bpe_train(_pool_corpus(spark, 100, False), rounds=2).count()
        report["bpe"] = []
        for k in args.sizes:
            ss.reclaim()
            entry = run_bpe(spark, BASE_DOCS * k, args.runs)
            entry["multiplier"] = k
            report["bpe"].append(entry)
            print(json.dumps({"progress": f"bpe x{k}", **entry}), flush=True)

    if "selfrep_long" in args.only:
        from candia_spark.operators.dedup import remove_self_repeated_blocks

        remove_self_repeated_blocks(
            _pool_corpus(spark, 100, False), engine="auto"
        ).count()
        report["selfrep_long"] = []
        for n_tok in args.tok_sizes:
            ss.reclaim()
            entry = run_selfrep_long(spark, n_tok, args.runs)
            report["selfrep_long"].append(entry)
            print(json.dumps({"progress": f"selfrep {n_tok}", **entry}),
                  flush=True)

    if "bigram_openvocab" in args.only:
        from candia_spark.operators.curation import bigram_assoc

        bigram_assoc(_pool_corpus(spark, 100, True)).count()
        report["bigram_openvocab"] = []
        for k in args.sizes:
            ss.reclaim()
            entry = run_bigram_openvocab(spark, BASE_DOCS * k, args.runs)
            entry["multiplier"] = k
            report["bigram_openvocab"].append(entry)
            print(json.dumps({"progress": f"bigram x{k}", **entry}),
                  flush=True)

    if "dsir" in args.only:
        from candia_spark.operators.curation import dsir_select

        warm = _pool_corpus(spark, 100, True)
        dsir_select(warm, warm.filter("doc_id % 20 = 0")).count()
        report["dsir"] = []
        for k in args.sizes:
            ss.reclaim()
            entry = run_dsir(spark, BASE_DOCS * k, args.runs)
            entry["multiplier"] = k
            report["dsir"].append(entry)
            print(json.dumps({"progress": f"dsir x{k}", **entry}), flush=True)

    if "mmr" in args.only:
        from candia_spark.operators.similarity import mmr_select

        run_mmr(spark, 500, 1)  # family warmup
        report["mmr"] = []
        for k in args.sizes:
            ss.reclaim()
            entry = run_mmr(spark, 20_000 * k, args.runs)
            entry["multiplier"] = k
            report["mmr"].append(entry)
            print(json.dumps({"progress": f"mmr x{k}", **entry}), flush=True)

    report["generated_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {args.out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
