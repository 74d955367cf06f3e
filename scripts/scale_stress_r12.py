"""Round-12 scaling sections, written to SCALING_r12.json:

- ``exact_substring`` (verdict r11 next #1): exact_substring_dedup at
  x10/x25/x50 on two corpus shapes. ``dup_heavy`` is the 40-sentence
  pool corpus — beyond the first 40 docs EVERYTHING is a cross-doc
  duplicate, so the covered-position explode + anti join + rebuild run
  at FULL mass (the worst case: k * every token removed). ``dup_free``
  gives every doc id-salted tokens (census df=1 everywhere), isolating
  the census/spine cost with zero removal mass. Claim: both linear
  with flat/falling per-token cost — the operator's cost is
  census + k*dup_mass, never pairs.

- ``phash`` (verdict r11 next #2): dhash64 + phash_near_dups at
  x10/x25/x50 over unique-text payloads with ~1% planted
  last-byte-flip twins. Claim: the hash pass is linear (one Arrow
  scan); candidate mass is the banded birthday bound (sum df^2 over
  16-bit band values, ~n^2/2^16 per band), reported as telemetry so
  the quadratic tail is a NUMBER, not a surprise — and the two-cap
  knobs (pytest'd) bound degenerate corpora.

- ``rolling_substring``: a FIXED 2,000-doc batch rewritten against a
  persisted gram census of a GROWING corpus. Claim: per-batch cost
  tracks the batch (the docstring contract, measured).

- ``multiclass`` (verdict r11 next #3): multiclass_classifier_weights
  + _predict at x10/x25/x50, 5 planted classes, buckets=4096,
  min_contrast=3. Claim: one corpus census + model-sized algebra +
  broadcast scoring = linear, falling per-doc.

Usage: python scripts/scale_stress_r12.py [--sizes 10 25 50] [--runs 2]
       [--only exact_substring phash multiclass]

Partial ``--only`` runs MERGE into SCALING_r12.json (the r9 harness
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

_POOL_WORDS = [
    f"w{i}{'abcdefgh'[i % 8] * (i % 3 + 1)}" for i in range(60)
]
_POOL = [
    " ".join(_POOL_WORDS[(7 * s + j) % 60] for j in range(12))
    for s in range(40)
]


def ss_materialize(df):
    return df.localCheckpoint(eager=True)


def _pool_corpus(spark, n_docs: int):
    text = F.element_at(
        F.array(*[F.lit(s) for s in _POOL]),
        (F.col("id") % len(_POOL) + 1).cast("int"),
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )


def _unique_corpus(spark, n_docs: int, n_tok: int = 14):
    """Every token id-salted -> zero cross-document grams anywhere."""
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_tok - 1)),
            lambda j: F.concat(
                F.lit("t"), F.col("id").cast("string"), F.lit("x"),
                j.cast("string"),
            ),
        ),
        " ",
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )


def run_exact_substring(spark, n_docs: int, runs: int) -> dict:
    from candia_spark.operators.dedup import exact_substring_dedup

    out: dict = {"n_docs": n_docs}
    heavy = ss_materialize(_pool_corpus(spark, n_docs))
    sec = ss.timed(lambda: exact_substring_dedup(heavy, k=6), runs)
    # pool sentences are 12 tokens each
    out["dup_heavy_sec"] = sec
    out["dup_heavy_us_per_tok"] = round(sec * 1e6 / (n_docs * 12), 2)
    free = ss_materialize(_unique_corpus(spark, n_docs))
    sec = ss.timed(lambda: exact_substring_dedup(free, k=6), runs)
    out["dup_free_sec"] = sec
    out["dup_free_us_per_tok"] = round(sec * 1e6 / (n_docs * 14), 2)
    return out


def _image_corpus(spark, n_docs: int):
    """Diverse stand-in image payloads: 192 md5-derived hex chars per
    doc. Structured same-template text is the DEGENERATE phash input
    (near-identical byte means -> one giant hamming-0 family -> the
    quadratic regime the cap knobs bound, pytest'd); real image bytes
    are high-entropy, which this models."""
    payload = F.encode(
        F.concat(
            *[
                F.md5((F.col("id") + F.lit(i * 1_000_003)).cast("string"))
                for i in range(6)
            ]
        ),
        "UTF-8",
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), payload.alias("payload")
    )


def run_phash(spark, n_docs: int, runs: int) -> dict:
    from candia_spark.operators.multimodal import phash_near_dups

    base = _image_corpus(spark, n_docs)
    twins = _image_corpus(spark, n_docs).filter(
        F.col("doc_id") % 100 == 0
    ).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(
            F.col("payload").cast("string").substr(
                F.lit(1), F.length(F.col("payload").cast("string")) - 1
            ),
            F.lit("."),
        ).cast("binary").alias("payload"),
    )
    imgs = ss_materialize(base.unionByName(twins))
    n_imgs = n_docs + n_docs // 100
    out: dict = {"n_images": n_imgs}
    sec = ss.timed(lambda: phash_near_dups(imgs, max_hamming=6), runs)
    out["phash_sec"] = sec
    out["phash_us_per_image"] = round(sec * 1e6 / n_imgs, 1)
    # candidate/verified mass telemetry: the banded birthday bound is a
    # NUMBER in the artifact, not an assumption
    pairs = phash_near_dups(imgs, max_hamming=6)
    out["verified_pairs"] = pairs.count()
    out["verified_per_1k_images"] = round(
        out["verified_pairs"] * 1000 / n_imgs, 2
    )
    return out


def run_rolling_substring(spark, corpus_docs: int, runs: int) -> dict:
    """Rolling exact-substring dedup: a FIXED 2,000-doc batch rewritten
    against a persisted gram census of a GROWING corpus (x10/x25/x50).
    Claim: per-batch cost tracks the batch — the batch pays its own
    tokenize + a gram-keyed probe whose batch side is fixed;
    the only corpus-driven term is the stored census scan, so wall time
    grows far slower than the corpus (measured, not argued — the
    docstring's contract)."""
    from candia_spark.operators.dedup import (
        exact_substring_dedup,
        gram_owner_census,
    )

    # census must GROW with the corpus (unique-token docs; the pool
    # corpus saturates at 40 sentences' grams), while a fixed pool
    # slice guarantees the batch's grams are census-covered so the
    # removal path runs at full batch mass every time
    corpus = _unique_corpus(spark, corpus_docs).unionByName(
        _pool_corpus(spark, 2_000).select(
            (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
        )
    )
    census = ss_materialize(gram_owner_census(corpus, k=6))
    batch = ss_materialize(
        _pool_corpus(spark, 2_000).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        )
    )
    sec = ss.timed(
        lambda: exact_substring_dedup(batch, k=6, corpus_owners=census),
        runs,
    )
    return {
        "corpus_docs": corpus_docs,
        "batch_docs": 2_000,
        "census_rows": census.count(),
        "rolling_sec": sec,
        "rolling_us_per_batch_doc": round(sec * 1e6 / 2_000, 1),
    }


def run_multiclass(spark, n_docs: int, runs: int) -> dict:
    from candia_spark.operators.curation import (
        multiclass_classifier_predict,
        multiclass_classifier_weights,
    )

    labeled = ss_materialize(
        _pool_corpus(spark, n_docs).select(
            "doc_id",
            F.concat(F.lit("c"), (F.col("doc_id") % 5).cast("string"))
            .alias("label"),
            F.concat(
                F.col("text"),
                F.lit(" clssig"),
                (F.col("doc_id") % 5).cast("string"),
                F.lit(" clssig"),
                (F.col("doc_id") % 5).cast("string"),
            ).alias("text"),
        )
    )

    def full():
        w = multiclass_classifier_weights(
            labeled, label_col="label", buckets=4096, min_contrast=3
        )
        return multiclass_classifier_predict(labeled, w, buckets=4096)

    sec = ss.timed(full, runs)
    return {
        "n_docs": n_docs,
        "multiclass_sec": sec,
        "multiclass_us_per_doc": round(sec * 1e6 / n_docs, 1),
    }


def run_webcuration(spark, n_docs: int, runs: int) -> dict:
    """The late-r12 web-curation family at x10/x25/x50: url_dedup
    (regexp canonicalization + ONE url-keyed window), gopher_rules
    (pure map, zero keyed exchanges), domain cap (ONE domain-keyed
    window), and fuzzy decontamination of the corpus against a FIXED
    97-docs-ish benchmark slice (bipartite banded minhash + exact
    verify — per-corpus-doc cost, benchmark side constant). Claim: all
    four linear with flat/falling per-doc cost."""
    from candia_spark.functions.text import url_registered_domain
    from candia_spark.operators.curation import (
        cap_per_source,
        gopher_rules,
        url_dedup,
    )
    from candia_spark.operators.dedup import decontaminate_fuzzy

    docs = ss_materialize(_pool_corpus(spark, n_docs))
    urls = ss_materialize(
        docs.select(
            "doc_id",
            F.concat(
                F.when(F.col("doc_id") % 3 == 0, F.lit("HTTPS://WWW.s"))
                .otherwise(F.lit("https://www.s")),
                (F.col("doc_id") % 1000).cast("string"),
                F.lit(".example.com/p/"),
                (F.col("doc_id") % 7919).cast("string"),
                F.when(F.col("doc_id") % 2 == 0,
                       F.lit("?utm_source=x&q=1")).otherwise(F.lit("?q=1")),
            ).alias("url"),
        )
    )
    out: dict = {"n_docs": n_docs}
    sec = ss.timed(lambda: url_dedup(urls), runs)
    out["url_dedup_sec"] = sec
    out["url_dedup_us_per_doc"] = round(sec * 1e6 / n_docs, 1)
    sec = ss.timed(lambda: gopher_rules(docs), runs)
    out["gopher_sec"] = sec
    out["gopher_us_per_doc"] = round(sec * 1e6 / n_docs, 1)
    withdom = urls.withColumn("domain", url_registered_domain("url"))
    sec = ss.timed(
        lambda: cap_per_source(withdom, cap=50, source_col="domain"), runs
    )
    out["domain_cap_sec"] = sec
    out["domain_cap_us_per_doc"] = round(sec * 1e6 / n_docs, 1)
    bench = ss_materialize(
        _pool_corpus(spark, 100).select(
            (F.col("doc_id") + 30_000_000).alias("doc_id"), "text"
        )
    )
    sec = ss.timed(
        lambda: decontaminate_fuzzy(docs, bench, threshold=0.7), runs
    )
    out["fuzzy_decon_sec"] = sec
    out["fuzzy_decon_us_per_doc"] = round(sec * 1e6 / n_docs, 1)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[10, 25, 50])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "SCALING_r12.json"))
    ap.add_argument(
        "--only", nargs="+",
        default=["exact_substring", "phash", "multiclass",
                 "rolling_substring", "webcuration"],
        choices=["exact_substring", "phash", "multiclass",
                 "rolling_substring", "webcuration"],
    )
    args = ap.parse_args()

    from candia_spark.session import get_spark

    spark = get_spark(app_name="candia_scale_stress_r12")
    spark.sparkContext.setLogLevel("ERROR")
    ss._SPARK_FOR_RECLAIM = spark

    report: dict = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            report = json.load(fh)
    report.setdefault("base_docs", BASE_DOCS)
    report["runs"] = args.runs

    # family warmups: one tiny call per new operator family so the x10
    # tile's minimum is not a JIT measurement (the r7 lesson)
    from candia_spark.operators.dedup import exact_substring_dedup
    from candia_spark.operators.multimodal import phash_near_dups
    from candia_spark.operators.curation import (
        multiclass_classifier_predict,
        multiclass_classifier_weights,
    )

    warm = _pool_corpus(spark, 100)
    exact_substring_dedup(warm, k=6).count()
    phash_near_dups(
        warm.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    ).count()
    wl = warm.select(
        "doc_id", F.lit("a").alias("label"), "text"
    )
    multiclass_classifier_predict(
        wl, multiclass_classifier_weights(wl, label_col="label")
    ).count()

    runners = {
        "exact_substring": run_exact_substring,
        "phash": run_phash,
        "multiclass": run_multiclass,
        "rolling_substring": run_rolling_substring,
        "webcuration": run_webcuration,
    }
    for key in ("exact_substring", "phash", "multiclass",
                "rolling_substring", "webcuration"):
        if key not in args.only:
            continue
        report[key] = []
        for k in args.sizes:
            ss.reclaim()
            entry = runners[key](spark, BASE_DOCS * k, args.runs)
            entry["multiplier"] = k
            report[key].append(entry)
            print(json.dumps({"progress": f"{key} x{k}", **entry}),
                  flush=True)

    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps({"done": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
