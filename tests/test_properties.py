"""Property-based tests (hypothesis): operator semantics against
independent brute-force oracles on generated inputs. Spark-backed
properties use few examples (each is a distributed job); the pure-python
greedy-partition kernel gets full fuzzing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from candia_spark.operators.asof import asof_join
from candia_spark.operators.dedup import ngram_jaccard_pairs
from candia_spark.operators.relational import interval_join
from candia_spark.operators.sequential import greedy_partition_starts

# --- pure-python kernel: fuzz hard --------------------------------------

values_strategy = st.lists(
    st.floats(min_value=1.0, max_value=1e6, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=200,
)


@given(values_strategy, st.floats(min_value=1.0, max_value=1e5))
@settings(max_examples=200, deadline=None)
def test_greedy_partition_invariants(values, ppm):
    values = sorted(set(values))
    starts = greedy_partition_starts(values, ppm)
    assert len(starts) == len(values)
    # 1. each value's start is a value <= it, and the first value starts
    #    its own partition
    assert starts[0] == values[0]
    for v, s in zip(values, starts):
        assert s <= v and s in values
    # 2. within-partition: v - start <= start*ppm/1e6; a partition break
    #    happens exactly when tolerance is exceeded
    prev_start = starts[0]
    for v, s in zip(values, starts):
        if s == prev_start:
            assert v - s <= s * ppm / 1e6 + 1e-9
        else:
            assert s == v  # new partition starts at the breaking value
            assert v - prev_start > prev_start * ppm / 1e6
            prev_start = s


# --- Spark-backed properties: few examples, composite inputs ------------

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=1000),  # t
        st.integers(min_value=-100, max_value=100),  # payload
    ),
    min_size=1,
    max_size=40,
)

anchors_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=1000),
        st.integers(min_value=-100, max_value=100),
    ),
    min_size=1,
    max_size=20,
)


@given(events_strategy, anchors_strategy)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_asof_join_matches_pandas(spark, pts, anchors):
    # dedupe anchor (key, t) pairs: with duplicate timestamps merge_asof's
    # pick is positional while ours is value-deterministic
    seen = {}
    for k, t, v in anchors:
        seen[(k, t)] = v
    anchors = [(k, t, v) for (k, t), v in seen.items()]

    pdf_p = pd.DataFrame(pts, columns=["k", "t", "v"]).sort_values("t", kind="stable")
    pdf_a = pd.DataFrame(anchors, columns=["k", "t", "av"]).sort_values("t", kind="stable")
    want = pd.merge_asof(pdf_p, pdf_a, on="t", by="k", direction="backward")

    dfp = spark.createDataFrame(pdf_p)
    dfa = spark.createDataFrame(pdf_a.rename(columns={"av": "av"}))
    got = asof_join(dfp, dfa, on="t", by=["k"]).toPandas()

    want_set = sorted(
        (r.k, r.t, r.v, None if pd.isna(r.av) else int(r.av))
        for r in want.itertuples()
    )
    got_set = sorted(
        (r.k, r.t, r.v, None if pd.isna(r.av) else int(r.av))
        for r in got.itertuples()
    )
    assert got_set == want_set


intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=90),
        st.integers(min_value=1, max_value=30),
    ),
    min_size=1,
    max_size=10,
)

points_strategy = st.lists(
    st.integers(min_value=-10, max_value=130), min_size=1, max_size=50
)


@given(points_strategy, intervals_strategy)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_interval_join_matches_bruteforce(spark, points, spans):
    windows = sorted({(lo, lo + w) for lo, w in spans})
    pts = spark.createDataFrame(
        [(i, float(p)) for i, p in enumerate(points)], ["pid", "x"]
    )
    wins = spark.createDataFrame(
        [(float(lo), float(hi)) for lo, hi in windows], ["lo", "hi"]
    )
    got = {
        (r["pid"], r["lo"], r["hi"])
        for r in interval_join(
            pts, wins, point_col="x", lo_col="lo", hi_col="hi"
        ).collect()
    }
    want = set()
    for i, p in enumerate(points):
        hits = sorted((lo, hi) for lo, hi in windows if lo <= p < hi)
        if hits:
            want.add((i, float(hits[0][0]), float(hits[0][1])))
    assert got == want


docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=12
    ),
    min_size=2,
    max_size=8,
)


@given(docs_strategy)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ngram_jaccard_matches_sets(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)], ["doc_id", "text"]
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, n=2, threshold=0.0).collect()
    }
    shingles = [
        {tuple(toks[i : i + 2]) for i in range(len(toks) - 1)} for toks in docs
    ]
    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(shingles[a] & shingles[b])
            union = len(shingles[a] | shingles[b])
            if inter > 0:
                want[(a, b)] = inter / union
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k])


# --- bio-domain scalars: fuzz against python reference semantics ---------

aa_strategy = st.text(alphabet="ACDEFGHIKLMNPQRSTVWY", min_size=0, max_size=60)


def _py_digest(seq: str) -> list[str]:
    """Independent python oracle: cleave after K/R not before P."""
    peps, cur = [], []
    for i, ch in enumerate(seq):
        cur.append(ch)
        nxt = seq[i + 1] if i + 1 < len(seq) else None
        if ch in "KR" and nxt is not None and nxt != "P":
            peps.append("".join(cur))
            cur = []
    if cur:
        peps.append("".join(cur))
    return peps


@given(st.lists(aa_strategy, min_size=1, max_size=8))
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_tryptic_digestion_properties(spark, seqs):
    from pyspark.sql import functions as F

    from candia_spark.functions.bio import tryptic_peptides

    df = spark.createDataFrame([(i, s) for i, s in enumerate(seqs)], "i int, seq string")
    got = {
        r.i: list(r.peps)
        for r in df.select("i", tryptic_peptides("seq").alias("peps")).collect()
    }
    for i, s in enumerate(seqs):
        peps = got[i]
        # 1. matches the independent oracle
        assert peps == _py_digest(s), s
        # 2. lossless: concatenation reconstructs the protein
        assert "".join(peps) == s
        # 3. every internal boundary is a legal cleavage site
        pos = 0
        for p in peps[:-1]:
            pos += len(p)
            assert s[pos - 1] in "KR" and s[pos] != "P", s


@given(aa_strategy)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_decoy_rotate_is_length_preserving_permutation(spark, seq):
    from pyspark.sql import functions as F

    from candia_spark.functions.bio import decoy_rotate

    got = (
        spark.createDataFrame([(seq,)], "seq string")
        .select(decoy_rotate("seq").alias("d"))
        .collect()[0]
        .d
    )
    assert got == seq[:-5] + seq[-3:] + seq[-5:-3]
    assert sorted(got) == sorted(seq)  # permutation of the same residues


# --- sequence packing vs pure-python reference --------------------------

pack_docs_strategy = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),              # shard
        st.integers(min_value=0, max_value=12),        # token count
    ),
    min_size=1,
    max_size=40,
)


@given(pack_docs_strategy, st.integers(min_value=1, max_value=16))
@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
def test_pack_sequences_matches_reference(spark, doc_specs, budget):
    """pack_sequences equals the obvious sequential reference: per shard
    in id order, start = running token total, seq ids by integer
    division. The Spark form must agree doc-for-doc on every field."""
    from candia_spark.operators.curation import pack_sequences

    rows = [
        (i, shard, " ".join(f"t{j}" for j in range(n)))
        for i, (shard, n) in enumerate(doc_specs)
    ]
    got = {
        r["doc_id"]: r
        for r in pack_sequences(
            spark.createDataFrame(rows, "doc_id long, source string, text string"),
            budget=budget,
        ).collect()
    }
    offset: dict[str, int] = {}
    for i, (shard, n) in enumerate(doc_specs):
        start = offset.get(shard, 0)
        offset[shard] = start + n
        r = got[i]
        assert r["shard"] == shard and r["n_tokens"] == n
        assert r["start_offset"] == start
        assert r["seq_id"] == start // budget
        assert r["offset_in_seq"] == start % budget
        assert r["end_seq_id"] == max(start, start + n - 1) // budget


# --- k-means trajectory vs an exact pure-python reference ----------------

def _ref_kmeans(rows, k, iters, scale):
    """Exact reference Lloyd's with the engine's conventions: float32->
    double quantization with half-away rounding, k-smallest-id seeding,
    key = double(d)/double(n^2) with (key, cluster) lexicographic argmin,
    integer centroid sums, empty clusters dropping out. Python ints/floats
    are exact here (d < 2^53 at test sizes), so this is an independent
    bit-exact recomputation of the whole trajectory."""
    import math

    def quant(x):
        v = float(np.float32(x)) * scale
        return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))

    q = {vid: [quant(x) for x in vec] for vid, vec in rows}
    seeds = sorted(q)[:k]
    cent = {c: (list(q[vid]), 1) for c, vid in enumerate(seeds)}
    assign = {}
    for it in range(iters):
        for vid, qv in q.items():
            best = None
            for c, (sv, n) in sorted(cent.items()):
                d = sum((n * x - s) ** 2 for x, s in zip(qv, sv))
                key = (float(d) / float(n * n), c)
                if best is None or key < best:
                    best = key
            assign[vid] = best[1]
        if it < iters - 1:
            cent = {}
            for vid, c in assign.items():
                sv, n = cent.get(c, ([0] * len(q[vid]), 0))
                cent[c] = ([a + b for a, b in zip(sv, q[vid])], n + 1)
    return assign


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
            min_size=3,
            max_size=3,
        ),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=3),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_kmeans_matches_exact_reference(spark, vecs, k, iters):
    from candia_spark.operators.clustering import kmeans_assign

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(df, k=k, iters=iters, scale=1000).collect()
    }
    assert got == _ref_kmeans(rows, k, iters, 1000)


# --- substring duplication vs a set-based python reference ---------------

def _ref_substring(docs, gram):
    per = {}
    for did, text in docs:
        starts = [
            s
            for s in range(1, max(len(text) - gram + 1, 1) + 1)
            if s == 1 or text[s - 2] == " "
        ]
        per[did] = {text[s - 1 : s - 1 + gram] for s in starts}
    out = {}
    for did, gs in per.items():
        shared = {
            g for g in gs if any(g in per[o] for o in per if o != did)
        }
        out[did] = (len(gs), len(shared))
    return out


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_substring_duplication_matches_reference(spark, texts, gram):
    from candia_spark.operators.dedup import substring_duplication

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_shared"])
        for r in substring_duplication(df, gram_chars=gram, text_col="text").collect()
    }
    assert got == _ref_substring(docs, gram)


def test_quantization_rounding_agrees_with_duckdb_on_real_data(spark, sf_smoke):
    """round-half-away vs HALF_UP could in principle diverge on exact .5
    products; certify on every real embedding component that Spark's
    F.round(x*scale) and DuckDB's round(x*scale) produce the same integer
    (the premise of the q57-q60 trajectory gates)."""
    import duckdb
    from pyspark.sql import functions as F

    path = f"{sf_smoke}/embeddings.parquet"
    sdf = (
        spark.read.parquet(path)
        .select(
            "vec_id",
            F.posexplode(
                F.transform(
                    "embedding",
                    lambda x: F.round(x.cast("double") * 1000, 0).cast("long"),
                )
            ).alias("pos", "v"),
        )
        .toPandas()
        .sort_values(["vec_id", "pos"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    odf = (
        con.sql(
            f"""
        SELECT vec_id, i - 1 AS pos,
               CAST(round(CAST(embedding[i] AS DOUBLE) * 1000, 0) AS BIGINT) AS v
        FROM read_parquet('{path}'),
             UNNEST(generate_series(1, len(embedding))) AS u(i)"""
        )
        .df()
        .sort_values(["vec_id", "pos"])
        .reset_index(drop=True)
    )
    con.close()
    assert len(sdf) == len(odf) and len(sdf) > 0
    assert (sdf["v"].values == odf["v"].values).all()


@given(docs_strategy)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_containment_matches_sets_and_dominates_jaccard(spark, docs):
    """ngram_containment_pairs against python set arithmetic: n_common /
    min(|A|,|B|) exactly, and containment >= jaccard on every pair (the
    overlap coefficient dominates by definition since min <= union)."""
    from candia_spark.operators.dedup import ngram_containment_pairs

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)], ["doc_id", "text"]
    )
    got = {
        (r["id_a"], r["id_b"]): r
        for r in ngram_containment_pairs(df, n=2, threshold=0.0).collect()
    }
    shingles = [
        {tuple(toks[j : j + 2]) for j in range(len(toks) - 1)} for toks in docs
    ]
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(shingles[a] & shingles[b])
            if inter == 0:
                assert (a, b) not in got
                continue
            r = got[(a, b)]
            assert r["n_common"] == inter
            assert r["containment"] == inter / min(len(shingles[a]), len(shingles[b]))
            assert r["containment"] >= r["jaccard"]


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
            min_size=0,
            max_size=20,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_winnowing_matches_reference_implementation(spark, docs):
    """winnow_fingerprints against a direct python re-implementation of
    the window-minimum rule (md5 over \\x1f-joined n-grams, window w,
    distinct) — the fingerprint SET is exactly reproducible."""
    import hashlib

    from candia_spark.operators.dedup import winnow_fingerprints

    n, w = 2, 3
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)], ["doc_id", "text"]
    )
    got: dict[int, set] = {}
    for r in winnow_fingerprints(df, n=n, window=w).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, toks in enumerate(docs):
        grams = ["\x1f".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
        hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
        if not hs:
            assert i not in got
            continue
        expect = {
            min(hs[j : j + w]) for j in range(max(len(hs) - w + 1, 1))
        }
        assert got.get(i, set()) == expect


# --- round-9 operators: fuzz against python references --------------------

token_strategy = st.text(alphabet="abcd", min_size=1, max_size=2)
doc_strategy = st.lists(token_strategy, min_size=0, max_size=24)


def _py_selfrep(toks: list[str], bw: int) -> tuple[int, int, str]:
    nb = len(toks) // bw
    blocks = [" ".join(toks[i * bw : (i + 1) * bw]) for i in range(nb)]
    kept, seen = [], set()
    for b in blocks:
        if b not in seen:
            seen.add(b)
            kept.append(b)
    tail = " ".join(toks[nb * bw :])
    clean = " ".join(x for x in (" ".join(kept), tail) if x)
    return nb, len(kept), clean


@given(st.lists(doc_strategy, min_size=1, max_size=6),
       st.integers(min_value=1, max_value=4))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_self_repeated_blocks_matches_reference(spark, docs, bw):
    """remove_self_repeated_blocks == an independent first-occurrence
    fold, for any tokenization and block width (repetition-rich alphabet
    so the removal branch fires often). Every example also carries one
    NULL-text row — ADVICE r10: NULL must behave as '' in all three
    engines and never fall out of the auto split."""
    from candia_spark.operators.dedup import remove_self_repeated_blocks

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)]
        + [(len(docs), None)],
        "doc_id bigint, text string",
    )
    # NB: Spark split("", " ") == [""], one empty token — mirror that
    want = {
        i: _py_selfrep(" ".join(toks).split(" "), bw)
        for i, toks in enumerate(docs)
    }
    want[len(docs)] = _py_selfrep("".split(" "), bw)
    # all three engines must match the reference (auto's filter-split
    # must route every row — including the NULL-text one — to a leg)
    for engine in ("sql", "arrow", "auto"):
        got = {
            r["doc_id"]: (r["n_blocks"], r["n_kept"], r["clean_text"])
            for r in remove_self_repeated_blocks(
                df, block_words=bw, engine=engine
            ).collect()
        }
        assert got == want, engine


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=30), min_size=0,
                 max_size=10, unique=True),
        min_size=1, max_size=4,
    ),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_borda_fuse_matches_reference(spark, lists, depth, out_k):
    """borda_fuse == an independent python Borda fold for arbitrary
    ranked lists (ids ranked by list position, rank starts at 1)."""
    from collections import defaultdict

    from candia_spark.operators.retrieval import borda_fuse

    dfs = [
        spark.createDataFrame(
            [(doc, r + 1) for r, doc in enumerate(ids)] or [(None, None)],
            "doc_id int, rank int",
        ).filter("doc_id is not null")
        for ids in lists
    ]
    got = {
        r["doc_id"]: (r["fused_points"], r["n_lists"], r["fused_rank"])
        for r in borda_fuse(dfs, depth=depth, out_k=out_k).collect()
    }
    pts, nl = defaultdict(int), defaultdict(int)
    for ids in lists:
        for r, doc in enumerate(ids):
            if r + 1 <= depth:
                pts[doc] += depth - r
                nl[doc] += 1
    order = sorted(pts, key=lambda d: (-pts[d], d))[:out_k]
    want = {d: (pts[d], nl[d], i + 1) for i, d in enumerate(order)}
    assert got == want


@given(st.lists(doc_strategy, min_size=2, max_size=8))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_contamination_spans_matches_reference(spark, docs):
    """contamination_spans == an independent covered-position union:
    every corpus doc sharing a 3-gram with the benchmark slice reports
    the exact count of distinct covered token positions and the
    cross-multiplied >=20% heavy flag."""
    from candia_spark.operators.dedup import contamination_spans

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = df.filter("doc_id % 2 = 0")
    corpus = df.filter("doc_id % 2 = 1")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_contaminated"], r["heavy"])
        for r in contamination_spans(corpus, bench, n=3).collect()
    }
    def toks_of(i):
        return " ".join(docs[i]).split(" ")  # Spark split semantics
    bset = set()
    for i in range(0, len(docs), 2):
        t = toks_of(i)
        bset |= {tuple(t[j:j+3]) for j in range(len(t) - 2)}
    want = {}
    for i in range(1, len(docs), 2):
        t = toks_of(i)
        cov = set()
        for j in range(len(t) - 2):
            if tuple(t[j:j+3]) in bset:
                cov |= {j, j + 1, j + 2}
        if cov:
            heavy = 1 if len(cov) * 5 >= len(t) else 0
            want[i] = (len(t), len(cov), heavy)
    assert got == want


def _py_bpe(docs: list[list[str]], rounds: int):
    """Independent BPE trainer: dict/Counter census, greedy left-to-right
    non-overlapping merge, ties to the lexicographically smallest pair."""
    from collections import Counter

    wf = Counter(w for toks in docs for w in toks if w)
    vocab = [
        (list(w), c) for w, c in wf.items() if len(w) >= 2
    ]  # symbol list per distinct word
    merges = []
    for rnd in range(1, rounds + 1):
        census: Counter = Counter()
        for syms, c in vocab:
            for i in range(len(syms) - 1):
                census[(syms[i], syms[i + 1])] += c
        if not census:
            break
        (left, right), w = min(
            census.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rnd, left, right, left + right, w))
        new_vocab = []
        for syms, c in vocab:
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab.append((out, c))
        vocab = new_vocab
    return merges


bpe_word = st.text(alphabet="ab", min_size=1, max_size=6)


@given(st.lists(st.lists(bpe_word, min_size=0, max_size=10),
                min_size=1, max_size=5),
       st.integers(min_value=1, max_value=4))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_bpe_train_matches_reference(spark, docs, rounds):
    """bpe_train == an independent Counter-based Sennrich loop for any
    tiny two-letter corpus and round count: same merges, same order,
    same weights, same tie-breaks, same early stop. The two-letter
    alphabet makes pair ties and repeated merges (aa+aa etc.) common —
    exactly the paths where a wrong greedy rewrite or tie-break shows.
    BOTH engines (r11: the collected-vocab incremental-census local
    loop, and the per-round distributed loop) must match the same
    reference — which also pins their mutual equivalence."""
    from candia_spark.operators.curation import bpe_train

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        ["doc_id", "text"],
    )
    want = _py_bpe(docs, rounds)
    for engine in ("local", "distributed"):
        got = [
            tuple(r)
            for r in bpe_train(df, rounds=rounds, engine=engine).collect()
        ]
        assert got == want, engine


@given(st.lists(st.lists(bpe_word, min_size=0, max_size=10),
                min_size=1, max_size=5),
       st.integers(min_value=1, max_value=3))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_bpe_encode_matches_reference(spark, docs, rounds):
    """bpe_encode == training with _py_bpe then applying the merges in
    order (greedy left-to-right) to every word and counting symbols."""
    from candia_spark.operators.curation import bpe_encode, bpe_train

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        ["doc_id", "text"],
    )
    merges = [(m[1], m[2]) for m in _py_bpe(docs, rounds)]

    def seg_count(word: str) -> int:
        syms = list(word)
        for left, right in merges:
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    want = {
        i: (len([t for t in toks if t]),
            sum(seg_count(t) for t in toks if t))
        for i, toks in enumerate(docs)
    }
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_encode(df, bpe_train(df, rounds=rounds)).collect()
    }
    assert got == want


@given(st.lists(doc_strategy, min_size=2, max_size=6))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_dsir_select_matches_reference(spark, docs):
    """dsir_select == an independent Counter fold: per token
    bits(target cnt, 0 if absent) - bits(corpus cnt), per-doc sums,
    above-corpus-mean selection by exact cross-multiplication. Target =
    the even-indexed documents."""
    from collections import Counter

    from candia_spark.operators.curation import dsir_select

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_bits"], r["selected"])
        for r in dsir_select(df, df.filter("doc_id % 2 = 0")).collect()
    }
    bits = lambda c: len(bin(c)) - 2  # noqa: E731 — matches length(bin(x))
    src = Counter(t for toks in docs for t in toks if t)
    tgt = Counter(
        t for i, toks in enumerate(docs) if i % 2 == 0 for t in toks if t
    )
    per = {}
    for i, toks in enumerate(docs):
        ts = [t for t in toks if t]
        if not ts:
            continue
        score = sum(
            (bits(tgt[t]) if t in tgt else 0) - bits(src[t]) for t in ts
        )
        per[i] = (len(ts), score)
    c_toks = sum(n for n, _ in per.values())
    c_bits = sum(s for _, s in per.values())
    want = {
        i: (n, s, 1 if s * c_toks > c_bits * n else 0)
        for i, (n, s) in per.items()
    }
    assert got == want


@given(st.lists(doc_strategy, min_size=2, max_size=6))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_dsir_hashed_bigrams_matches_reference(spark, docs):
    """dsir_select with ngram=2/buckets (r11) == the same Counter fold
    over HASHED BIGRAM features: feature = md5(a+' '+b) first-15-hex ->
    int % buckets (the cross-engine device, recomputed independently
    with hashlib here). buckets=16 forces hash COLLISIONS — the census
    must sum collided features together exactly as the hash table
    model says, and docs with <2 tokens must drop (no features)."""
    import hashlib
    from collections import Counter

    from candia_spark.operators.curation import dsir_select

    B = 16
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_bits"], r["selected"])
        for r in dsir_select(
            df, df.filter("doc_id % 2 = 0"), ngram=2, buckets=B
        ).collect()
    }

    def feats(toks):
        ts = [t for t in toks if t]
        return [
            int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:15], 16) % B
            for a, b in zip(ts, ts[1:])
        ]

    bits = lambda c: len(bin(c)) - 2  # noqa: E731
    src = Counter(f for toks in docs for f in feats(toks))
    tgt = Counter(
        f for i, toks in enumerate(docs) if i % 2 == 0 for f in feats(toks)
    )
    per = {}
    for i, toks in enumerate(docs):
        fs = feats(toks)
        if not fs:
            continue
        score = sum(
            (bits(tgt[f]) if f in tgt else 0) - bits(src[f]) for f in fs
        )
        per[i] = (len(fs), score)
    c_toks = sum(n for n, _ in per.values())
    c_bits = sum(s for _, s in per.values())
    want = {
        i: (n, s, 1 if s * c_toks > c_bits * n else 0)
        for i, (n, s) in per.items()
    }
    assert got == want


@given(st.lists(doc_strategy, min_size=1, max_size=6))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_bigram_assoc_matches_reference(spark, docs):
    """bigram_assoc == an independent integer PMI-proxy fold (bits =
    bit_length of exact counts; incoherent flag by cross-multiplied
    corpus-mean compare)."""
    from collections import Counter

    from candia_spark.operators.curation import bigram_assoc

    rows = [(i, "A", " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )
    got = {
        r["doc_id"]: (r["n_pairs"], r["total_assoc"], r["incoherent"])
        for r in bigram_assoc(df).collect()
    }
    toks = {i: " ".join(d).lower().split(" ") for i, d in enumerate(docs)}
    toks = {i: [t for t in ts if t] for i, ts in toks.items()}
    uni = Counter(t for ts in toks.values() for t in ts)
    big = Counter(
        (ts[j], ts[j+1]) for ts in toks.values() for j in range(len(ts)-1)
    )
    per = {}
    for i, ts in toks.items():
        prs = [(ts[j], ts[j+1]) for j in range(len(ts) - 1)]
        if not prs:
            continue
        assoc = sum(
            2 * big[p].bit_length()
            - uni[p[0]].bit_length() - uni[p[1]].bit_length()
            for p in prs
        )
        per[i] = (len(prs), assoc)
    c_pairs = sum(v[0] for v in per.values())
    c_assoc = sum(v[1] for v in per.values())
    want = {
        i: (n, a, 1 if a * c_pairs < c_assoc * n else 0)
        for i, (n, a) in per.items()
    }
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=25),
                  st.integers(min_value=0, max_value=25)),
        min_size=0, max_size=10,
    ),
    st.integers(min_value=1, max_value=9),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_cluster_safe_split_matches_reference(spark, edges, train_lt):
    """cluster_safe_split == an independent union-find + audit for any
    pair graph over the 0..25 corpus and any train fraction."""
    from candia_spark.operators.curation import cluster_safe_split

    edges = [(a, b) for a, b in edges if a != b]
    docs = spark.createDataFrame([(i,) for i in range(26)], ["doc_id"])
    pairs = spark.createDataFrame(
        edges or [(None, None)], "id_a int, id_b int"
    ).filter("id_a is not null")
    got = {
        r["split"]: (r["n_docs"], r["n_clusters"], r["n_moved"],
                     r["n_leaky_clusters"])
        for r in cluster_safe_split(
            docs, pairs, mod=10, train_lt=train_lt
        ).collect()
    }
    parent = list(range(26))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members = {}
    for i in range(26):
        members.setdefault(min(j for j in range(26) if find(j) == find(i)),
                           []).append(i)
    want = {}
    for rep, ms in members.items():
        split = "train" if rep % 10 < train_lt else "val"
        d = want.setdefault(split, [0, 0, 0, 0])
        nt = sum(1 for m in ms if m % 10 < train_lt)
        d[0] += len(ms)
        d[1] += 1
        d[2] += (len(ms) - nt) if split == "train" else nt
        d[3] += 1 if 0 < nt < len(ms) else 0
    assert got == {k: tuple(v) for k, v in want.items()}


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=15),
                  st.integers(min_value=0, max_value=15)),
        min_size=0, max_size=8,
    ),
    st.lists(st.integers(min_value=0, max_value=6), min_size=16,
             max_size=16),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_canonical_docs_matches_reference(spark, edges, lens):
    """canonical_docs == union-find + keep-longest (min-id ties) for any
    pair graph and token-length assignment over a 16-doc corpus."""
    from candia_spark.operators.dedup import canonical_docs

    edges = [(a, b) for a, b in edges if a != b]
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * lens[i])) for i in range(16)],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame(
        edges or [(None, None)], "id_a int, id_b int"
    ).filter("id_a is not null")
    got = {
        r["rep"]: (r["keep_id"], r["n_members"], r["best_quality"])
        for r in canonical_docs(docs, pairs).collect()
    }
    # canonical_docs tokenizes with tokens_col (empties FILTERED, the
    # _TOKS_SQL convention): an empty text counts zero tokens
    q = {i: lens[i] for i in range(16)}
    parent = list(range(16))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for i in range(16):
        comps.setdefault(find(i), []).append(i)
    want = {}
    for ms in comps.values():
        rep = min(ms)
        best = max(q[m] for m in ms)
        keep = min(m for m in ms if q[m] == best)
        want[rep] = (keep, len(ms), best)
    assert got == want


@given(st.integers(min_value=2, max_value=4),
       st.lists(st.integers(min_value=0, max_value=3), min_size=6,
                max_size=12))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_cluster_purity_consistent_with_assignment(spark, k, labels):
    """cluster_purity's contingency layer agrees with kmeans_assign's
    own output joined to the labels (majority by count, ties to the
    smallest label) — pins the agg on top of the already-fuzzed
    k-means."""
    from collections import Counter

    from candia_spark.operators.clustering import cluster_purity, kmeans_assign

    rows = [
        (i, [float(i % 5), float((i * 7) % 11)], labels[i])
        for i in range(len(labels))
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    got = {
        r["cluster"]: (r["cluster_size"], r["majority_label"],
                       r["n_majority"])
        for r in cluster_purity(df, k=k, iters=2).collect()
    }
    assign = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(df, k=k, iters=2).collect()
    }
    per = {}
    for vid, cl in assign.items():
        per.setdefault(cl, Counter())[labels[vid]] += 1
    want = {}
    for cl, cnt in per.items():
        best_n = max(cnt.values())
        best_lab = min(l for l, n in cnt.items() if n == best_n)
        want[cl] = (sum(cnt.values()), best_lab, best_n)
    assert got == want


@given(
    st.lists(
        st.lists(st.integers(min_value=-3, max_value=3),
                 min_size=3, max_size=3),
        min_size=2, max_size=12,
    ),
    st.integers(min_value=1, max_value=5),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_mmr_select_matches_reference(spark, vecs, k):
    """mmr_select == an independent numpy pipeline (cosines rounded to
    6 digits, shortlist cut with id-asc ties, greedy num*rel -
    (den-num)*maxsim with ties to the smallest id) for any small
    integer-coordinate vector set. Small discrete coordinates make
    exact ties COMMON — the paths where the Spark-side shortlist window
    and the driver greedy could silently disagree with the oracle."""
    from candia_spark.operators.similarity import mmr_select

    vecs = [v for v in vecs if any(x != 0 for x in v)]
    if len(vecs) < 2:
        return
    k = min(k, len(vecs))
    q = [1.0, 0.5, -0.25]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(99, q)], "query_id bigint, embedding array<float>"
    )
    shortlist = len(vecs)
    got_by_engine = {
        engine: [
            r["vec_id"]
            for r in mmr_select(
                emb, queries, k=k, shortlist=shortlist, engine=engine
            ).orderBy("mmr_rank").collect()
        ]
        for engine in ("driver", "grouped")
    }
    got = got_by_engine["driver"]
    assert got_by_engine["grouped"] == got  # exact trajectory parity

    def cos(a, b):
        a, b = np.asarray(a, float), np.asarray(b, float)
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    rel = {i: cos(v, q) for i, v in enumerate(vecs)}
    sims = {
        (i, j): cos(vecs[i], vecs[j])
        for i in range(len(vecs)) for j in range(i + 1, len(vecs))
    }
    first = max(rel.items(), key=lambda kv: (kv[1], -kv[0]))[0]
    sel, remaining = [first], set(rel) - {first}
    for _ in range(2, k + 1):
        if not remaining:
            break
        best, best_score = None, None
        for v in sorted(remaining):
            ms = max(sims[(min(v, s), max(v, s))] for s in sel)
            score = 1 * rel[v] - 1 * ms
            if best_score is None or score > best_score:
                best, best_score = v, score
        sel.append(best)
        remaining.discard(best)
    assert got == sel

@given(st.lists(doc_strategy, min_size=2, max_size=6),
       st.integers(min_value=0, max_value=3))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_quality_classifier_matches_reference(spark, docs, num):
    """quality_classifier_weights + _score == an independent Counter
    fold: weight = bits(pos cnt) - bits(neg cnt) (0 for an absent
    side), per-doc occurrence-weighted sums, keep by exact
    cross-multiplication against a fuzzed num/2 threshold. Pos = the
    even-indexed documents, neg = the rest; EVERY doc gets a verdict,
    empty docs score zeros."""
    from collections import Counter

    from candia_spark.operators.curation import (
        quality_classifier_score,
        quality_classifier_weights,
    )

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        ["doc_id", "text"],
    )
    pos_df = df.filter("doc_id % 2 = 0")
    neg_df = df.filter("doc_id % 2 = 1")
    w_df = quality_classifier_weights(pos_df, neg_df)
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_w"], r["keep"])
        for r in quality_classifier_score(
            df, w_df, threshold=(num, 2)
        ).collect()
    }
    bits = lambda c: len(bin(c)) - 2  # noqa: E731
    pos = Counter(
        t for i, toks in enumerate(docs) if i % 2 == 0 for t in toks if t
    )
    neg = Counter(
        t for i, toks in enumerate(docs) if i % 2 == 1 for t in toks if t
    )
    weight = {
        t: (bits(pos[t]) if t in pos else 0) - (bits(neg[t]) if t in neg else 0)
        for t in set(pos) | set(neg)
    }
    want = {}
    for i, toks in enumerate(docs):
        ts = [t for t in toks if t]
        s = sum(weight.get(t, 0) for t in ts)
        want[i] = (len(ts), s, 1 if s * 2 > num * len(ts) else 0)
    assert got == want

line_strategy = st.sampled_from(["aa", "bb", "cc", "dd x", ""])


@given(st.lists(st.lists(line_strategy, min_size=1, max_size=5),
                min_size=2, max_size=8),
       st.integers(min_value=1, max_value=3))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_strip_boilerplate_lines_matches_reference(spark, docs, min_docs):
    """strip_boilerplate_lines == an independent per-group fold (line ->
    distinct-doc count; strip iff count*den >= num*group_docs and count
    >= min_docs; survivors keep order). A 5-line pool forces heavy
    sharing, docs alternate between two groups, and empty lines are in
    the pool — the de-dup census must count DOCS, not occurrences
    (duplicate lines within one doc)."""
    from candia_spark.operators.curation import strip_boilerplate_lines

    rows = [
        (i, "g" + str(i % 2), "\n".join(lines))
        for i, lines in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean_text"])
        for r in strip_boilerplate_lines(
            df, max_frac=(1, 2), min_docs=min_docs
        ).collect()
    }
    by_group: dict = {}
    for i, lines in enumerate(docs):
        by_group.setdefault("g" + str(i % 2), []).append((i, lines))
    want = {}
    for grp, members in by_group.items():
        n_docs = len(members)
        df_count: dict = {}
        for _, lines in members:
            for line in set(lines):
                df_count[line] = df_count.get(line, 0) + 1
        for i, lines in members:
            kept = [
                ln for ln in lines
                if not (df_count[ln] * 2 >= 1 * n_docs
                        and df_count[ln] >= min_docs)
            ]
            want[i] = (len(lines), len(kept), "\n".join(kept))
    assert got == want


# --- URL canonicalization: Spark chain vs a rule-by-rule python ref ------

import re as _re


def _ref_canonical_url(u: str) -> str:
    m = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$", u)
    if m and m.group(1):
        u = m.group(1).lower() + "://" + m.group(2).lower() + m.group(3)
    u = _re.sub(r"#.*", "", u)
    u = _re.sub(r"&(utm_[^=&#]*|gclid|fbclid)=[^&#]*", "", u)
    u = _re.sub(r"\?(utm_[^=&#]*|gclid|fbclid)=[^&#]*&", "?", u)
    u = _re.sub(r"\?(utm_[^=&#]*|gclid|fbclid)=[^&#]*$", "", u)
    return _re.sub(r"/$", "", u)


_seg = st.text(
    alphabet="abcdefgzXYZ0129._~-", min_size=0, max_size=6
)
_param_key = st.one_of(
    st.just("utm_source"), st.just("utm_a"), st.just("gclid"),
    st.just("fbclid"), st.just("q"), st.just("page"), st.just("utmx"),
)
_url_strategy = st.builds(
    lambda scheme, host, segs, params, frag, slash: (
        scheme + "://" + host + "/" + "/".join(segs)
        + ("?" + "&".join(f"{k}={v}" for k, v in params) if params else "")
        + (("#" + frag) if frag is not None else "")
        + ("/" if slash else "")
    ),
    st.sampled_from(["http", "HTTPS", "Ftp"]),
    st.sampled_from(["Ex.COM", "www.ex.com", "A.b.C.org", "localhost:81"]),
    st.lists(_seg, min_size=0, max_size=3),
    st.lists(st.tuples(_param_key, _seg), min_size=0, max_size=4),
    st.one_of(st.none(), _seg),
    st.booleans(),
)


@given(st.lists(_url_strategy, min_size=1, max_size=25))
@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_canonical_url_matches_python_reference(spark, urls):
    """functions.text.canonical_url must equal the rule-by-rule python
    reference on generated URLs covering every rule interaction:
    mixed-case schemes/hosts, tracking params in every position mix,
    lookalike keys (utmx), fragments, trailing slashes, ports."""
    from candia_spark.functions.text import canonical_url

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i bigint, url string"
    )
    got = {
        r.i: r.c
        for r in df.select("i", canonical_url("url").alias("c")).collect()
    }
    for i, u in enumerate(urls):
        assert got[i] == _ref_canonical_url(u), u


def _ref_gopher(text, min_words=5):
    t = text or ""
    toks = [x for x in t.lower().split(" ") if x != ""]
    lines = t.split("\n")
    n, nl = len(toks), len(lines)
    sum_chars = sum(len(x) for x in toks)
    n_symbols = t.count("#") + (len(t) - len(t.replace("...", ""))) // 3
    bullets = sum(1 for l in lines if l[:1] in ("-", "*", "•"))
    ell = sum(1 for l in lines if len(l) >= 3 and l[-3:] == "...")
    alpha = sum(1 for x in toks if _re.search("[a-z]", x))
    stop = len(
        set(toks)
        & {"the", "be", "to", "of", "and", "that", "have", "with"}
    )
    flags = (
        int(min_words <= n <= 100_000),
        int(3 * n <= sum_chars <= 10 * n),
        int(n_symbols * 10 <= 1 * n),
        int(bullets * 10 <= 9 * nl),
        int(ell * 10 <= 3 * nl),
        int(alpha * 5 >= 4 * n),
        int(stop >= 2),
    )
    return (n, nl) + flags + (int(all(flags)),)


_gopher_text = st.lists(
    st.lists(
        st.sampled_from(
            ["the", "and", "of", "to", "is", "that", "have", "with",
             "be", "w", "zz9", "42", "#", "...",
             "- x", "longishword", "a.b...", ""]
        ),
        min_size=0, max_size=12,
    ).map(lambda ws: " ".join(ws)),
    min_size=1, max_size=4,
).map(lambda ls: "\n".join(ls))


@given(st.lists(_gopher_text, min_size=1, max_size=20))
@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_gopher_rules_match_python_reference(spark, texts):
    """operators.curation.gopher_rules must equal the rule-by-rule
    python reference on generated multi-line texts mixing stopwords,
    symbols, ellipses, bullet prefixes, and empty lines."""
    from candia_spark.operators.curation import gopher_rules

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: tuple(r)[1:]
        for r in gopher_rules(df, min_words=5).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _ref_gopher(t), repr(t)


# --- r13: cross-engine fuzz of the HTML extraction chain -----------------

# Markup-ish soup: tags (balanced or not), entities, comments, script
# fragments, text runs — the generator's job is to stress the common
# Java-regex/RE2 subset claim, not to produce valid HTML.
_html_atoms = st.sampled_from([
    "<p>", "</p>", "<div class='x'>", "</div>", "<br>", "<BR/>",
    "<script>", "</script>", "<style>", "</style>", "<title>",
    "</title>", "<!--", "-->", "<li>", "</li>", "<h2>", "</h2>",
    "&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;", "&amp;lt;",
    "plain", "words here", "a < b", "x > y", '"quoted"', "  ",
    "\n", "\t", "1 < 2 && 3", "<span>", "</span>", "<", ">", "e",
])
_html_doc = st.lists(_html_atoms, min_size=0, max_size=30).map("".join)


@given(st.lists(_html_doc, min_size=1, max_size=8))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_html_clean_chain_cross_engine(spark, docs):
    """The q111 claim, fuzzed: the SAME pattern tables executed by Java
    regex (Spark) and RE2 (DuckDB) agree byte for byte on arbitrary
    markup soup — including unbalanced tags, entity-in-entity, and
    decoy closers."""
    import duckdb

    from candia_spark.operators.curation import extract_html_text
    from candia_spark.plans.queries import _html_clean_sql

    sdf = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id bigint, html string"
    )
    got = {
        r["doc_id"]: r["clean_text"]
        for r in extract_html_text(sdf).collect()
    }
    con = duckdb.connect()
    expr = _html_clean_sql("html")
    for i, d in enumerate(docs):
        want = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS html)", [d]
        ).fetchone()[0]
        assert got[i] == want, (d, got[i], want)


# --- r13: blocklist padded-space device vs a python reference ------------

_words = st.sampled_from(["slow", "fast", "merge", "conflict", "data",
                          "slowly", "s", "1a", "x"])
_bl_text = st.lists(
    st.one_of(_words, st.sampled_from([",", "!", "  ", "\n", "--", "."])),
    min_size=0, max_size=20,
).map(" ".join)


@given(st.lists(_bl_text, min_size=1, max_size=10))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_blocklist_matches_python_reference(spark, texts):
    """q121's word-bounded verdicts equal a from-scratch python
    reference (re-tokenize, test phrase-as-sublist) on generated text —
    boundary words ('slow' vs 'slowly'), punctuation splices, and
    empty docs included."""
    import re

    from candia_spark.operators.curation import blocklist_filter

    phrases = ["slow", "merge conflict"]
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["first_hit"], r["blocked"])
        for r in blocklist_filter(sdf, phrases).collect()
    }

    def ref(t):
        toks = re.sub(r"[^a-z0-9]+", " ", t.lower()).split()
        hits = sorted(
            p for p in phrases
            if any(
                toks[i:i + len(p.split())] == p.split()
                for i in range(len(toks))
            )
        )
        return (len(hits), hits[0] if hits else "", bool(hits))

    for i, t in enumerate(texts):
        assert got[i] == ref(t), (t, got[i], ref(t))


# --- r13: whole-doc packing vs a python replay of the greedy -------------

_tok_counts = st.lists(st.integers(min_value=0, max_value=30),
                       min_size=1, max_size=25)


@given(_tok_counts, st.integers(min_value=1, max_value=12))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pack_whole_matches_python_replay(spark, counts, budget):
    """q118's per-shard greedy equals a from-scratch python replay on
    random token counts — fits / overflow-closes / oversize-alone all
    exercised by the generator."""
    from candia_spark.operators.curation import pack_sequences_whole

    rows = [
        (i, "s", " ".join(f"w{j}" for j in range(c)))
        for i, c in enumerate(counts)
    ]
    sdf = spark.createDataFrame(
        rows, "doc_id bigint, source string, text string"
    )
    got = {
        r["doc_id"]: (r["seq_id"], r["offset_in_seq"], r["kept_tokens"])
        for r in pack_sequences_whole(sdf, budget=budget).collect()
    }
    cur_seq, cur_fill = 0, 0
    for i, t in enumerate(counts):
        if t > budget:
            if cur_fill > 0:
                cur_seq += 1
            want = (cur_seq, 0, budget)
            cur_seq, cur_fill = cur_seq + 1, 0
        elif cur_fill + t <= budget:
            want = (cur_seq, cur_fill, t)
            cur_fill += t
        else:
            cur_seq, cur_fill = cur_seq + 1, t
            want = (cur_seq, 0, t)
        assert got[i] == want, (i, t, budget, got[i], want)


# --- r13: jl projection + pq encode vs numpy references ------------------

_vec_lists = st.lists(
    st.lists(
        st.floats(min_value=-4.0, max_value=4.0,
                  allow_nan=False, allow_infinity=False,
                  width=32),
        min_size=8, max_size=8,
    ).filter(lambda v: any(x != 0.0 for x in v)),
    min_size=1, max_size=10,
)


@given(_vec_lists)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_jl_projection_matches_numpy(spark, vecs):
    """Both jl engines equal the numpy signed-sum over the same
    quantized lanes and the same md5-parity matrix, exactly (all
    integers — no tolerance)."""
    from candia_spark.operators.similarity import jl_project_int8, jl_sign

    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )
    qs = {}
    for i, v in enumerate(vecs):
        x = np.array(v, dtype=np.float64)
        n = np.linalg.norm(np.float32(v).astype(np.float64))
        qs[i] = np.floor(np.float32(v).astype(np.float64) / n * 127)
    S = np.array(
        [[jl_sign("jl", i, j) for i in range(8)] for j in range(4)],
        dtype=np.int64,
    )
    for engine in ("hof", "flat"):
        got = {
            r["vec_id"]: list(r["proj"])
            for r in jl_project_int8(
                sdf, in_dim=8, out_dim=4, engine=engine
            ).collect()
        }
        for i in qs:
            want = (S @ qs[i].astype(np.int64)).tolist()
            assert got[i] == want, (engine, i, got[i], want)


@given(_vec_lists)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_pq_encode_matches_numpy_argmin(spark, vecs):
    """q116's assignment equals the numpy integer-L2 argmin (ties ->
    smallest code) against the same first-k codebook."""
    from candia_spark.operators.similarity import (
        pq_codebook_first_k,
        pq_encode,
    )

    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )
    m, K = 2, min(2, len(vecs))
    cb = pq_codebook_first_k(sdf, m=m, codewords=K)
    enc = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in pq_encode(sdf, cb, m=m).collect()
    }
    q = {}
    for i, v in enumerate(vecs):
        n = np.linalg.norm(np.float32(v).astype(np.float64))
        q[i] = np.floor(np.float32(v).astype(np.float64) / n * 127).astype(
            np.int64
        )
    d_over_m = 8 // m
    for i in q:
        for s in range(m):
            sv = q[i][s * d_over_m:(s + 1) * d_over_m]
            dists = [
                int(((q[c][s * d_over_m:(s + 1) * d_over_m] - sv) ** 2).sum())
                for c in range(K)
            ]
            want = int(np.argmin(dists))  # first (smallest code) on ties
            assert enc[(i, s)] == want, (i, s, dists, enc[(i, s)])


@given(_vec_lists)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.slow
def test_pq_codebook_kmeans_matches_numpy_lloyd(spark, vecs):
    """q122/q124's PQ trainer equals a from-scratch numpy replay of the
    per-subspace Lloyd's trajectory: same int8 quantization, min-id
    seeding, (sum, count) centroid form with d/n^2 float64 keys and
    smallest-code ties, JOIN-semantics empty-cluster dropout, and the
    round-half-up floor((2s+n)/(2n)) integer codewords — exactly (all
    integers at the end, no tolerance)."""
    from candia_spark.operators.similarity import pq_codebook_kmeans

    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>",
    )
    m, dsub, iters = 2, 4, 2
    K = min(2, len(vecs))
    q = {}
    for i, v in enumerate(vecs):
        n = np.linalg.norm(np.float32(v).astype(np.float64))
        q[i] = np.floor(np.float32(v).astype(np.float64) / n * 127).astype(
            np.int64
        )
    # replay: per subspace, cent = {code: (sums array, count)}
    cent = {
        s: {
            c: (q[c][s * dsub:(s + 1) * dsub].copy(), 1)
            for c in range(K)
        }
        for s in range(m)
    }
    for _ in range(iters):
        assign = {}
        for i in q:
            for s in range(m):
                sv = q[i][s * dsub:(s + 1) * dsub]
                best = None
                for c in sorted(cent[s]):
                    sums, n = cent[s][c]
                    d = int(((n * sv - sums) ** 2).sum())
                    key = d / float(n * n)  # the float64 comparison key
                    if best is None or key < best[0]:
                        best = (key, c)
                assign[(i, s)] = best[1]
        nxt = {s: {} for s in range(m)}
        for (i, s), c in assign.items():
            sums, n = nxt[s].get(c, (np.zeros(dsub, dtype=np.int64), 0))
            nxt[s][c] = (sums + q[i][s * dsub:(s + 1) * dsub], n + 1)
        cent = nxt  # empty codes drop (the JOIN recenter semantics)
    want = {}
    for s in cent:
        for c, (sums, n) in cent[s].items():
            want[(s, c)] = [
                int(np.floor((2 * x + n) / float(2 * n))) for x in sums
            ]
    got = {
        (r["sub"], r["code"]): list(r["cw"])
        for r in pq_codebook_kmeans(
            sdf, m=m, codewords=K, iters=iters
        ).collect()
    }
    assert got == want
