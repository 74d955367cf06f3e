"""Round-11 scaling sections, written to SCALING_r11.json:

- ``mmr_grouped`` (verdict r10 next #1): mmr_select's two engines on a
  growing QUERY batch (corpus fixed at 20k vectors, queries x10/x25/x50
  of a 40-query base). Claim: the grouped engine's per-query cost stays
  flat/falling (the greedy distributes across query groups and nothing
  query-batch-sized is collected), while the driver engine serializes
  Q greedy loops and collects Q*shortlist^2/2 score rows — its
  per-query cost is floored by the driver core. Both legs produce the
  identical trajectory (pytest-pinned), so this is purely a
  where-does-it-run measurement.

- ``bpe_local`` (verdict r10 next #2): bpe_train's per-merge-round
  marginal cost, distributed vs local, on a 10k-doc open-vocabulary
  corpus (~10k-word vocab — enough pair mass for 1000 rounds). The
  distributed loop's marginal cost is the Spark job-scheduling floor
  (~230 ms/round, r10 bpe leg); the local loop's incremental-census
  rounds must land around/below a millisecond — the difference between
  "days of scheduling" and "seconds of compute" for a production
  30k-50k-merge vocabulary.

- ``dsir_bigram`` (verdict r10 next #3): dsir_select with
  ngram=2/buckets=65536 at x10/x25/x50 open-vocab docs. Claim: hashed
  bigram features keep the same linear falling-per-doc shape as the
  r10 unigram leg — the censuses are CAPPED at ``buckets`` rows, so
  the model side stops growing entirely once the corpus saturates the
  table.

- ``quality`` (verdict r10 next #5): quality_classifier_weights (train
  on a fixed-fraction slice vs rest) + quality_classifier_score over
  the full corpus at x10/x25/x50. Claim: two censuses + one broadcast
  model join + one per-doc agg = linear, falling per-doc.

- ``boilerplate`` (r11 new operator): strip_boilerplate_lines over
  the q98-shaped corpus (per-source header + unique body + 1-in-3
  promo + global footer) at x10/x25/x50. Claim: three linear keyed
  shuffles -> linear wall, falling per-doc; the viral furniture lines
  skew the probe join's key but never expand it.

- ``budget_fill`` (r11 new operator): quality_budget_fill over 20
  shards at x10/x25/x50. Claim: ONE shard-keyed window -> linear wall,
  falling per-doc (the pack_sequences posture).

Usage: python scripts/scale_stress_r11.py [--sizes 10 25 50] [--runs 2]
       [--only mmr_grouped bpe_local dsir_bigram quality boilerplate
        budget_fill]

Partial ``--only`` runs MERGE into SCALING_r11.json instead of
clobbering (the r9 harness convention).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import scale_stress as ss  # noqa: E402  (sibling harness: builders + timer)

from pyspark.sql import functions as F  # noqa: E402

BASE_DOCS = 2_000   # x1 corpus size for the text families
BASE_QUERIES = 40   # x1 query-batch size for the mmr family
MMR_CORPUS = 20_000


def ss_materialize(df):
    """Eagerly cut the synthetic generator so timed calls measure the
    operator, not range()+element_at row synthesis."""
    return df.localCheckpoint(eager=True)


_POOL_WORDS = [
    f"w{i}{'abcdefgh'[i % 8] * (i % 3 + 1)}" for i in range(60)
]
_POOL = [
    " ".join(_POOL_WORDS[(7 * s + j) % 60] for j in range(12))
    for s in range(40)
]


def _pool_corpus(spark, n_docs: int, novel_token: bool):
    text = F.element_at(
        F.array(*[F.lit(s) for s in _POOL]),
        (F.col("id") % len(_POOL) + 1).cast("int"),
    )
    if novel_token:
        text = F.concat(text, F.lit(" nv"), F.col("id").cast("string"))
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )


def _vectors(spark, n: int, id_col: str):
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda j: (
            ((F.col("id") * 31 + j * 17) % 97).cast("float") / F.lit(97.0)
            + F.lit(0.01)
        ).cast("float"),
    )
    return spark.range(n).select(
        F.col("id").alias(id_col), vec.alias("embedding")
    )


def run_mmr_grouped(spark, emb, n_queries: int, runs: int) -> dict:
    from candia_spark.operators.similarity import mmr_select

    # distinct query vectors (offset ids so none coincides with a corpus
    # row — the all-tie degeneracy the r10 fixtures documented)
    queries = ss_materialize(
        _vectors(spark, n_queries, "query_id").withColumn(
            "query_id", F.col("query_id") + 1_000_000
        ).withColumn(
            "embedding",
            F.transform(
                F.col("embedding"), lambda x: (x + F.lit(0.005)).cast("float")
            ),
        )
    )
    out: dict = {"n_queries": n_queries}
    for engine in ("grouped", "driver"):
        sec = ss.timed(
            lambda e=engine: mmr_select(
                emb, queries, k=8, shortlist=40, engine=e
            ),
            runs,
        )
        out[f"{engine}_sec"] = sec
        out[f"{engine}_us_per_query"] = round(sec * 1e6 / n_queries, 1)
    # the full scale configuration: grouped greedy + heap shortlist —
    # the per-partition numpy top-k replaces the Q*N-row window shuffle
    # with Q*k*P candidate rows, the documented killer at large Q
    sec = ss.timed(
        lambda: mmr_select(
            emb, queries, k=8, shortlist=40,
            engine="grouped", topk_engine="heap",
        ),
        runs,
    )
    out["grouped_heap_sec"] = sec
    out["grouped_heap_us_per_query"] = round(sec * 1e6 / n_queries, 1)
    return out


def run_bpe_local(spark, n_docs: int, runs: int) -> dict:
    from candia_spark.operators.curation import bpe_train, tokens

    docs = ss_materialize(_pool_corpus(spark, n_docs, novel_token=True))
    vocab_rows = (
        docs.select(F.explode(tokens("text")).alias("t"))
        .filter(F.length("t") >= 2)
        .agg(F.count_distinct("t"))
        .collect()[0][0]
    )
    out: dict = {"n_docs": n_docs, "vocab_rows": int(vocab_rows)}
    # end-to-end local engine (corpus census + vocab collect + rounds)
    l1 = ss.timed(lambda: bpe_train(docs, rounds=1, engine="local"), runs)
    l1000 = ss.timed(
        lambda: bpe_train(docs, rounds=1000, engine="local"), runs
    )
    out["local_rounds1_sec"] = l1
    out["local_rounds1000_sec"] = l1000
    out["local_marginal_per_round_us"] = round((l1000 - l1) * 1e6 / 999, 1)
    # merge-loop marginal cost BY ROUND BUCKET, timed directly on the
    # collected vocabulary (python perf_counter minima) — the Spark
    # census's ±0.5 s run-to-run variance would otherwise swamp the
    # sub-ms tail rounds. BPE's per-round work is the affected-word
    # mass: the first ~100 merges (pairs occurring in most of the
    # vocabulary) are milliseconds each; the production-dominant tail
    # (a 50k-merge vocab is almost entirely tail) is sub-ms.
    import time as _time

    from candia_spark.functions.text import tokens as _tok  # noqa: F401
    from candia_spark.operators.curation import _bpe_train_local

    vocab_rows_data = [
        (r["sym_str"], int(r["cnt"]))
        for r in docs.select(
            F.explode(tokens("text")).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .filter(F.length("word") >= 2)
        .select(
            F.concat(
                F.lit(" "),
                F.array_join(
                    F.expr(
                        "transform(sequence(1, length(word)), "
                        "i -> substr(word, i, 1))"
                    ),
                    "  ",
                ),
                F.lit(" "),
            ).alias("sym_str"),
            "cnt",
        )
        .collect()
    ]
    lt = {}
    for r in (1, 100, 1000, 4000):
        best = None
        for _ in range(max(1, runs)):
            t0 = _time.perf_counter()
            _bpe_train_local(list(vocab_rows_data), r)
            dt = _time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        lt[r] = round(best, 3)
    out["loop_rounds_sec"] = {str(r): t for r, t in lt.items()}
    out["loop_marginal_us_r1_100"] = round((lt[100] - lt[1]) * 1e6 / 99, 1)
    out["loop_marginal_us_r100_1000"] = round(
        (lt[1000] - lt[100]) * 1e6 / 900, 1
    )
    out["loop_marginal_us_r1000_4000"] = round(
        (lt[4000] - lt[1000]) * 1e6 / 3000, 1
    )
    # distributed: 1 vs 6 rounds -> marginal per-round ms (the r10 leg's
    # statistic; 1000 distributed rounds would be ~4 minutes of pure
    # scheduling — the very thing the local engine removes)
    d1 = ss.timed(
        lambda: bpe_train(docs, rounds=1, engine="distributed"), runs
    )
    d6 = ss.timed(
        lambda: bpe_train(docs, rounds=6, engine="distributed"), runs
    )
    out["dist_rounds1_sec"] = d1
    out["dist_rounds6_sec"] = d6
    out["dist_marginal_per_round_ms"] = round((d6 - d1) * 1000 / 5, 1)
    return out


def run_dsir_bigram(spark, n_docs: int, runs: int) -> dict:
    from candia_spark.operators.curation import dsir_select

    docs = ss_materialize(_pool_corpus(spark, n_docs, novel_token=True))
    target = docs.filter(F.col("doc_id") % 20 == 0)
    sec = ss.timed(
        lambda: dsir_select(docs, target, ngram=2, buckets=65536), runs
    )
    return {
        "n_docs": n_docs,
        "dsir_bigram_sec": sec,
        "dsir_bigram_us_per_doc": round(sec * 1e6 / n_docs, 1),
    }


def run_boilerplate(spark, n_docs: int, runs: int) -> dict:
    """Boilerplate line removal at x10/x25/x50: docs spread over 20
    sources, each doc = per-source header + unique body + 1-in-3 promo
    + global footer (the q98 shape). Claim: three linear keyed shuffles
    -> linear wall with falling per-doc cost; the viral header/footer
    lines (df = 100% of their source) skew the probe join's key but
    never expand it (one census row per key)."""
    from candia_spark.operators.curation import strip_boilerplate_lines

    body = _pool_corpus(spark, n_docs, novel_token=True)
    docs = ss_materialize(
        body.select(
            "doc_id",
            F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string"))
            .alias("source"),
            F.concat(
                F.lit("site header "),
                (F.col("doc_id") % 20).cast("string"),
                F.lit("\n"),
                F.col("text"),
                F.when(
                    F.col("doc_id") % 3 == 0, F.lit("\npromo banner")
                ).otherwise(F.lit("")),
                F.lit("\ncopyright footer"),
            ).alias("text"),
        )
    )
    sec = ss.timed(lambda: strip_boilerplate_lines(docs), runs)
    return {
        "n_docs": n_docs,
        "boilerplate_sec": sec,
        "boilerplate_us_per_doc": round(sec * 1e6 / n_docs, 1),
    }


def run_budget_fill(spark, n_docs: int, runs: int) -> dict:
    """Token-budget quality fill at x10/x25/x50: synthetic scored docs
    over 20 shards, budget sized to keep ~1/4 of each shard. Claim: ONE
    shard-keyed window -> linear wall, falling per-doc cost (the
    pack_sequences posture — no global order in the plan)."""
    from candia_spark.operators.curation import quality_budget_fill

    docs = ss_materialize(
        spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % 20).cast("string"))
            .alias("source"),
            (F.col("id") % 97 + 40).cast("bigint").alias("n_tokens"),
            ((F.col("id") * 31) % 1009).cast("bigint").alias("score_w"),
        )
    )
    per_shard = n_docs // 20
    budget = per_shard * 88 // 4  # mean ~88 tokens/doc, keep ~1/4
    sec = ss.timed(
        lambda: quality_budget_fill(docs, budget_tokens=budget), runs
    )
    return {
        "n_docs": n_docs,
        "budget_tokens": budget,
        "fill_sec": sec,
        "fill_us_per_doc": round(sec * 1e6 / n_docs, 1),
    }


def run_quality(spark, n_docs: int, runs: int) -> dict:
    from candia_spark.operators.curation import (
        quality_classifier_score,
        quality_classifier_weights,
    )

    docs = ss_materialize(_pool_corpus(spark, n_docs, novel_token=True))
    pos = docs.filter(F.col("doc_id") % 20 == 0)
    neg = docs.filter(F.col("doc_id") % 20 != 0)

    def full():
        w = quality_classifier_weights(pos, neg, buckets=4096)
        return quality_classifier_score(
            docs, w, threshold=(1, 2), buckets=4096
        )

    sec = ss.timed(full, runs)
    return {
        "n_docs": n_docs,
        "quality_sec": sec,
        "quality_us_per_doc": round(sec * 1e6 / n_docs, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[10, 25, 50])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING_r11.json"))
    ap.add_argument(
        "--only", nargs="+",
        default=["mmr_grouped", "bpe_local", "dsir_bigram", "quality",
                 "boilerplate", "budget_fill"],
        choices=["mmr_grouped", "bpe_local", "dsir_bigram", "quality",
                 "boilerplate", "budget_fill"],
    )
    args = ap.parse_args()

    from candia_spark.session import get_spark

    spark = get_spark(app_name="candia_scale_stress_r11")
    spark.sparkContext.setLogLevel("ERROR")
    ss._SPARK_FOR_RECLAIM = spark

    report: dict = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            report = json.load(fh)
    report.setdefault("base_docs", BASE_DOCS)
    report.setdefault("base_queries", BASE_QUERIES)
    report["runs"] = args.runs

    if "mmr_grouped" in args.only:
        from candia_spark.operators.similarity import mmr_select

        emb = ss_materialize(_vectors(spark, MMR_CORPUS, "vec_id"))
        # family warmup: JIT both engines' shapes once
        wq = _vectors(spark, 4, "query_id").withColumn(
            "query_id", F.col("query_id") + 1_000_000
        )
        for e in ("grouped", "driver"):
            mmr_select(emb, wq, k=4, shortlist=8, engine=e).count()
        report["mmr_grouped"] = {"corpus_vecs": MMR_CORPUS, "tiles": []}
        for k in args.sizes:
            ss.reclaim()
            entry = run_mmr_grouped(spark, emb, BASE_QUERIES * k, args.runs)
            entry["multiplier"] = k
            report["mmr_grouped"]["tiles"].append(entry)
            print(json.dumps({"progress": f"mmr x{k}", **entry}), flush=True)

    if "bpe_local" in args.only:
        from candia_spark.operators.curation import bpe_train

        bpe_train(_pool_corpus(spark, 100, True), rounds=2, engine="local")
        bpe_train(
            _pool_corpus(spark, 100, True), rounds=2, engine="distributed"
        ).count()
        ss.reclaim()
        report["bpe_local"] = run_bpe_local(spark, 10_000, args.runs)
        print(json.dumps({"progress": "bpe_local",
                          **report["bpe_local"]}), flush=True)

    if "dsir_bigram" in args.only:
        from candia_spark.operators.curation import dsir_select

        warm = _pool_corpus(spark, 100, True)
        dsir_select(warm, warm.filter("doc_id % 20 = 0"),
                    ngram=2, buckets=65536).count()
        report["dsir_bigram"] = []
        for k in args.sizes:
            ss.reclaim()
            entry = run_dsir_bigram(spark, BASE_DOCS * k, args.runs)
            entry["multiplier"] = k
            report["dsir_bigram"].append(entry)
            print(json.dumps({"progress": f"dsir_bigram x{k}", **entry}),
                  flush=True)

    if "quality" in args.only:
        from candia_spark.operators.curation import (
            quality_classifier_score,
            quality_classifier_weights,
        )

        warm = _pool_corpus(spark, 100, True)
        quality_classifier_score(
            warm,
            quality_classifier_weights(
                warm.filter("doc_id % 20 = 0"),
                warm.filter("doc_id % 20 != 0"),
                buckets=4096,
            ),
            threshold=(1, 2),
            buckets=4096,
        ).count()
        report["quality"] = []
        for k in args.sizes:
            ss.reclaim()
            entry = run_quality(spark, BASE_DOCS * k, args.runs)
            entry["multiplier"] = k
            report["quality"].append(entry)
            print(json.dumps({"progress": f"quality x{k}", **entry}),
                  flush=True)

    if "boilerplate" in args.only:
        from candia_spark.operators.curation import strip_boilerplate_lines

        warm = _pool_corpus(spark, 100, True).select(
            "doc_id", F.lit("s").alias("source"), "text"
        )
        strip_boilerplate_lines(warm).count()
        report["boilerplate"] = []
        for k in args.sizes:
            ss.reclaim()
            entry = run_boilerplate(spark, BASE_DOCS * k, args.runs)
            entry["multiplier"] = k
            report["boilerplate"].append(entry)
            print(json.dumps({"progress": f"boilerplate x{k}", **entry}),
                  flush=True)

    if "budget_fill" in args.only:
        from candia_spark.operators.curation import quality_budget_fill

        warm = spark.range(100).selectExpr(
            "id as doc_id", "'s' as source",
            "cast(50 as bigint) as n_tokens", "id as score_w",
        )
        quality_budget_fill(warm, budget_tokens=500).count()
        report["budget_fill"] = []
        for k in args.sizes:
            ss.reclaim()
            entry = run_budget_fill(spark, BASE_DOCS * k, args.runs)
            entry["multiplier"] = k
            report["budget_fill"].append(entry)
            print(json.dumps({"progress": f"budget_fill x{k}", **entry}),
                  flush=True)

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps({"done": args.out}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
