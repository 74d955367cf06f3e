"""Round-13 operators: HTML->text extraction, hard-negative mining,
PQ ADC top-k, deterministic training shuffle, mixture/epoch planning,
char-entropy signals. Query-level oracle parity for q111-q116 is covered
by test_queries_oracle's registry sweep; these pin operator semantics
on by-hand fixtures plus the scale-critical plan shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from candia_spark.functions.text import char_census_counts, char_entropy_bits
from candia_spark.operators.curation import (
    extract_html_text,
    html_clean_text,
    mixture_epoch_plan,
)
from candia_spark.operators.sampling import deterministic_shuffle
from candia_spark.operators.similarity import (
    mine_hard_negatives,
    pq_codebook_first_k,
    pq_encode,
    pq_topk_adc,
)


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- HTML extraction -------------------------------------------------------


def _html_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, html string")


def test_html_extract_by_hand(spark):
    html = (
        "<html><head><title> T </title><style>p{}</style>"
        '<script>var a = "</div>" + 1 < 2;</script></head>'
        "<body><!-- <p>ghost</p> --><h1>Head</h1>"
        "<p>one &amp; two &lt;3&gt;</p><div>line2</div>"
        "<span>inline</span> tail</body></html>"
    )
    out = extract_html_text(_html_df(spark, [(1, html)])).collect()[0]
    assert out["title"] == "T"
    # script payload gone INCLUDING its decoy '</div>'; comment's decoy
    # tags gone; block closers became newlines; entities decoded
    assert out["clean_text"] == "Head\none & two <3>\nline2\ninline tail"
    assert out["n_lines"] == 4
    assert out["n_chars"] == len("Head\none & two <3>\nline2\ninline tail")


def test_html_extract_edges(spark):
    rows = [
        (1, ""),  # empty doc
        (2, "<p></p><div></div>"),  # tags only -> empty text
        (3, "no markup at all"),
        (4, "a &amp;amp; b"),  # &amp; decoded LAST: '&amp;amp;' -> '&amp;'
        (5, "<ul><li>x</li><li>y</li></ul>"),
    ]
    got = {
        r["doc_id"]: r
        for r in extract_html_text(_html_df(spark, rows)).collect()
    }
    assert got[1]["clean_text"] == "" and got[1]["n_lines"] == 0
    assert got[2]["clean_text"] == "" and got[2]["n_lines"] == 0
    assert got[3]["clean_text"] == "no markup at all"
    assert got[4]["clean_text"] == "a &amp; b"
    assert got[5]["clean_text"] == "x\ny"


def test_html_extract_is_pure_map(spark, sf_smoke):
    from candia_spark.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", F.col("text").alias("html")
    )
    plan = _plan_of(extract_html_text(docs))
    # load_table's single-row-group fan-out (round-robin) is the input's
    # repartition, not the operator's: no keyed exchange, no Python
    assert "Exchange hashpartitioning" not in plan
    assert "Python" not in plan and "Join" not in plan


def test_html_clean_column_standalone(spark):
    df = spark.createDataFrame([("<b>bold</b> move",)], "s string")
    assert df.select(html_clean_text("s").alias("c")).collect()[0]["c"] == (
        "bold move"
    )


# --- hard negatives --------------------------------------------------------


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label bigint"
    )


def test_hard_negatives_excludes_positives_and_ranks(spark):
    # query (id 0, label 0) points along x. Corpus: same-label near-twin
    # must be EXCLUDED; different-label vectors rank by cosine.
    corpus = _emb(
        spark,
        [
            (0, [1.0, 0.0], 0),
            (1, [0.99, 0.1], 0),  # positive (same label) — excluded
            (2, [0.9, 0.4], 1),  # hardest negative
            (3, [0.0, 1.0], 2),  # orthogonal negative
            (4, [-1.0, 0.0], 1),  # anti-aligned negative
        ],
    )
    qs = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    got = mine_hard_negatives(corpus, qs, k=3).orderBy("rank").collect()
    assert [r["neg_id"] for r in got] == [2, 3, 4]
    assert [r["rank"] for r in got] == [1, 2, 3]
    assert all(r["label"] != 0 for r in got)
    # integer scores: quantized dot of int8 lanes
    assert all(isinstance(r["score"], int) for r in got)


def test_hard_negatives_tie_break_by_id(spark):
    corpus = _emb(
        spark,
        [
            (0, [1.0, 0.0], 0),
            (7, [0.0, 1.0], 1),
            (3, [0.0, 1.0], 1),  # identical vector: tie -> smaller id first
        ],
    )
    qs = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    got = mine_hard_negatives(corpus, qs, k=2).orderBy("rank").collect()
    assert [r["neg_id"] for r in got] == [3, 7]


def test_hard_negatives_broadcasts_queries(spark, sf_smoke):
    from candia_spark.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    qs = emb.filter(F.col("vec_id") % 53 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    plan = _plan_of(mine_hard_negatives(emb, qs, k=5))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# --- product quantization --------------------------------------------------


def test_pq_encode_picks_nearest_codeword(spark):
    # 4-dim vectors, m=2 (2 lanes per subspace), 2 codewords = ids 0,1.
    # id 2 matches codeword 0 in sub 0 and codeword 1 in sub 1.
    corpus = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 1.0]),
            (1, [0.0, 1.0, 1.0, 0.0]),
            (2, [1.0, 0.1, 0.9, 0.1]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    cb = pq_codebook_first_k(corpus, m=2, codewords=2)
    assert cb.count() == 4  # 2 subs x 2 codewords
    enc = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in pq_encode(corpus, cb, m=2).collect()
    }
    assert enc[(0, 0)] == 0 and enc[(0, 1)] == 0
    assert enc[(1, 0)] == 1 and enc[(1, 1)] == 1
    assert enc[(2, 0)] == 0 and enc[(2, 1)] == 1


def test_pq_topk_self_is_rank1_on_codebook_members(spark, sf_smoke):
    # For a vector that IS a codeword source, ADC distance to itself is 0
    # in every subspace -> it must rank first for its own query.
    from candia_spark.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding"
    )
    first_id = emb.agg(F.min("vec_id")).collect()[0][0]
    qs = emb.filter(F.col("vec_id") == first_id).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = (
        pq_topk_adc(emb, qs, k=1, m=8, codewords=16)
        .filter(F.col("rank") == 1)
        .collect()[0]
    )
    assert top["vec_id"] == first_id and top["dist"] == 0


def test_pq_plan_broadcasts_codebook_and_lut(spark, sf_smoke):
    from candia_spark.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding"
    )
    qs = emb.filter(F.col("vec_id") % 59 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = _plan_of(pq_topk_adc(emb, qs, k=5))
    # the corpus-sided joins (codebook at encode, LUT at scoring) are
    # broadcasts — the corpus itself never broadcast-materializes
    assert plan.count("BroadcastExchange") >= 2
    assert "SortMergeJoin" not in plan


# --- deterministic shuffle -------------------------------------------------


def test_deterministic_shuffle_is_a_permutation_and_stable(spark):
    df = spark.range(0, 97).select(F.col("id").alias("doc_id"))
    a = deterministic_shuffle(df, n_shards=4, salt="s")
    rows = a.collect()
    assert len(rows) == 97
    assert len({(r["shard"], r["pos"]) for r in rows}) == 97  # injective
    for s in range(4):  # positions are 0..n_s-1 per shard (dense)
        ps = sorted(r["pos"] for r in rows if r["shard"] == s)
        assert ps == list(range(len(ps)))
    # pure function of (id, salt): a re-run under a different
    # partitioning is row-identical
    b = deterministic_shuffle(df.repartition(7), n_shards=4, salt="s")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, b.collect()))
    # a different salt draws a different permutation
    c = deterministic_shuffle(df, n_shards=4, salt="t")
    assert sorted(map(tuple, rows)) != sorted(map(tuple, c.collect()))


def test_deterministic_shuffle_rejects_bad_shards(spark):
    df = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="n_shards"):
        deterministic_shuffle(df, n_shards=0)


def test_deterministic_shuffle_no_global_sort(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    plan = _plan_of(deterministic_shuffle(df, n_shards=8))
    # exactly one exchange: the shard hash partitioning for the window;
    # no rangepartitioning (global sort) anywhere
    assert "rangepartitioning" not in plan.lower()
    assert plan.count("Exchange") == 1


# --- mixture planning ------------------------------------------------------


def test_mixture_epoch_plan_by_hand(spark):
    docs = spark.createDataFrame(
        [
            ("a", "one two three four"),  # 4 tokens
            ("a", "five six"),  # a: 6 total
            ("b", "x y z"),  # b: 3 total
            ("c", "ignored source"),
        ],
        "source string, text string",
    )
    got = {
        r["source"]: r
        for r in mixture_epoch_plan(
            docs, {"a": 3, "b": 1}, budget_tokens=40
        ).collect()
    }
    assert set(got) == {"a", "b"}  # c is not in the mixture
    # den=4: a target = 40*3//4 = 30 -> epochs ceil(30/6)=5
    assert got["a"]["available_tokens"] == 6
    assert got["a"]["target_tokens"] == 30 and got["a"]["epochs"] == 5
    # b target = 40*1//4 = 10 -> epochs ceil(10/3)=4
    assert got["b"]["target_tokens"] == 10 and got["b"]["epochs"] == 4


def test_mixture_epoch_plan_validates(spark):
    docs = spark.createDataFrame([("a", "x")], "source string, text string")
    with pytest.raises(ValueError, match="weights"):
        mixture_epoch_plan(docs, {"a": 0}, 10)
    with pytest.raises(ValueError, match="budget"):
        mixture_epoch_plan(docs, {"a": 1}, -1)


# --- char entropy ----------------------------------------------------------


def test_char_census_and_entropy_by_hand(spark):
    df = spark.createDataFrame(
        [(1, "aaab"), (2, ""), (3, "abcd")], "doc_id bigint, text string"
    )
    cnt = char_census_counts("text")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.size(cnt).alias("d"),
            F.coalesce(F.array_max(cnt), F.lit(0)).alias("top"),
            char_entropy_bits(cnt, F.length("text")).alias("ent"),
        ).collect()
    }
    # 'aaab': N=4 bitlen 3; a: 3*(3-2)=3, b: 1*(3-1)=2 -> 5
    assert out[1]["d"] == 2 and out[1]["top"] == 3 and out[1]["ent"] == 5
    assert out[2]["d"] == 0 and out[2]["top"] == 0 and out[2]["ent"] == 0
    # 'abcd': each 1*(3-1)=2 -> 8; uniform text maximizes the surrogate
    assert out[3]["d"] == 4 and out[3]["ent"] == 8
    # one-char-repeated text scores 0 only at power-of-two lengths where
    # bitlen(N)-bitlen(N)=0 — 'aaaa':
    e = (
        spark.createDataFrame([("aaaa",)], "text string")
        .select(char_entropy_bits(char_census_counts("text"), F.length("text")).alias("e"))
        .collect()[0]["e"]
    )
    assert e == 0


def test_char_entropy_is_pure_map(spark, sf_smoke):
    from candia_spark.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    cnt = char_census_counts("text")
    plan = _plan_of(
        docs.select("doc_id", char_entropy_bits(cnt, F.length("text")).alias("e"))
    )
    assert "Exchange hashpartitioning" not in plan
    assert "Generate" not in plan  # no explode — the no-char-blowup claim


# --- JL projection ---------------------------------------------------------


def test_jl_projection_by_hand(spark):
    from candia_spark.operators.similarity import jl_project_int8, jl_sign

    # dim 2, one unit vector along x: qvec = [127, 0]; proj[j] =
    # s(0,j)*127 exactly
    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id bigint, embedding array<float>"
    )
    proj = jl_project_int8(df, in_dim=2, out_dim=4, salt="t").collect()[0][
        "proj"
    ]
    assert proj == [jl_sign("t", 0, j) * 127 for j in range(4)]


def test_jl_projection_is_pure_map_and_salted(spark):
    from candia_spark.operators.similarity import jl_project_int8
    from candia_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    df = jl_project_int8(emb, in_dim=64, out_dim=8, salt="a")
    plan = _plan_of(df)
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan and "Python" not in plan
    # a different salt draws a different matrix
    other = jl_project_int8(emb, in_dim=64, out_dim=8, salt="b")
    a = {r["vec_id"]: r["proj"] for r in df.collect()}
    b = {r["vec_id"]: r["proj"] for r in other.collect()}
    assert any(a[k] != b[k] for k in a)


def test_jl_projection_validates(spark):
    from candia_spark.operators.similarity import jl_project_int8

    df = spark.createDataFrame(
        [(1, [1.0])], "vec_id bigint, embedding array<float>"
    )
    with pytest.raises(ValueError, match="dims"):
        jl_project_int8(df, in_dim=0, out_dim=4)


# --- whole-document packing ------------------------------------------------


def test_pack_whole_by_hand(spark):
    from candia_spark.operators.curation import pack_sequences_whole

    # budget 10: docs of 4,5,3,12,2 tokens in shard a; 10,1 in shard b
    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    docs = spark.createDataFrame(
        [
            (1, "a", words(4)),
            (2, "a", words(5)),
            (3, "a", words(3)),
            (4, "a", words(12)),
            (5, "a", words(2)),
            (6, "b", words(10)),
            (7, "b", words(1)),
        ],
        "doc_id bigint, source string, text string",
    )
    got = {
        r["doc_id"]: r
        for r in pack_sequences_whole(docs, budget=10).collect()
    }
    # a: d1 -> (0,0); d2 -> (0,4); d3 overflows -> (1,0); d4 oversize
    # alone -> (2,0) kept 10; d5 -> (3,0)
    assert (got[1]["seq_id"], got[1]["offset_in_seq"]) == (0, 0)
    assert (got[2]["seq_id"], got[2]["offset_in_seq"]) == (0, 4)
    assert (got[3]["seq_id"], got[3]["offset_in_seq"]) == (1, 0)
    assert (got[4]["seq_id"], got[4]["kept_tokens"]) == (2, 10)
    assert (got[5]["seq_id"], got[5]["offset_in_seq"]) == (3, 0)
    # b packs independently
    assert (got[6]["seq_id"], got[6]["kept_tokens"]) == (0, 10)
    assert (got[7]["seq_id"], got[7]["offset_in_seq"]) == (1, 0)


def test_pack_whole_never_straddles_and_fits_budget(spark, sf_smoke):
    from candia_spark.operators.curation import pack_sequences_whole
    from candia_spark.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").select(
        "source", "doc_id", "text"
    )
    out = pack_sequences_whole(docs, budget=60)
    # every (shard, seq) holds <= budget kept tokens — the no-straddle
    # invariant q51's chunker deliberately does not have
    over = (
        out.groupBy("shard", "seq_id")
        .agg(F.sum("kept_tokens").alias("s"))
        .filter(F.col("s") > 60)
        .count()
    )
    assert over == 0
    # oversize docs are alone and truncated to the budget
    alone = out.filter(F.col("n_tokens") > 60)
    assert alone.filter(F.col("kept_tokens") != 60).count() == 0
    assert alone.filter(F.col("offset_in_seq") != 0).count() == 0


def test_pack_whole_validates(spark):
    from candia_spark.operators.curation import pack_sequences_whole

    docs = spark.createDataFrame(
        [(1, "a", "x")], "doc_id bigint, source string, text string"
    )
    with pytest.raises(ValueError, match="budget"):
        pack_sequences_whole(docs, budget=0)


# --- IVF+PQ ----------------------------------------------------------------


def test_pq_ivf_subset_of_flat_pq_and_plan(spark, sf_smoke):
    import numpy as np

    from candia_spark.operators.similarity import pq_topk_adc, pq_topk_ivf
    from candia_spark.plans.ivf_pinned import PINNED_CENTROIDS_8x64
    from candia_spark.tables import load_table

    emb = load_table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding"
    )
    qs = emb.filter(F.col("vec_id") % 47 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cent = np.array(PINNED_CENTROIDS_8x64, dtype=np.float64)
    # with nprobe = ALL cells, IVF-PQ must equal flat PQ exactly (the
    # pruning is the ONLY approximation on top of q116's scoring)
    full = {
        tuple(r)
        for r in pq_topk_ivf(emb, qs, cent, k=5, nprobe=8).collect()
    }
    flat = {tuple(r) for r in pq_topk_adc(emb, qs, k=5).collect()}
    assert full == flat
    # pruned probing returns a subset of candidates per query, and the
    # scored distances agree with flat PQ wherever both rank a vector
    pruned = pq_topk_ivf(emb, qs, cent, k=5, nprobe=3)
    flat_d = {(r[0], r[1]): r[2] for r in flat}
    for r in pruned.collect():
        if (r["query_id"], r["vec_id"]) in flat_d:
            assert flat_d[(r["query_id"], r["vec_id"])] == r["dist"]
    plan = _plan_of(pruned)
    assert "SortMergeJoin" not in plan  # LUT/codebook broadcast; codes
    # join cells id-keyed — nothing corpus-sized broadcast-materializes


# --- WET source/sink -------------------------------------------------------


def test_wet_round_trip(spark, tmp_path):
    from candia_spark.sources.adapters import (
        read_wet_records,
        write_wet_records,
    )

    rows = [
        ("<urn:uuid:1>", "http://a.example/x", "2013-12-04T15:30:35Z",
         "first record text\nwith a second line"),
        ("<urn:uuid:2>", "http://b.example/y", "2014-01-01T00:00:00Z",
         "second record"),
        ("<urn:uuid:3>", "http://c.example/z", "2015-06-30T12:00:00Z",
         ""),  # empty payload survives
    ]
    df = spark.createDataFrame(
        rows, "record_id string, target_uri string, warc_date string, "
        "text string"
    )
    p = str(tmp_path / "wet")
    write_wet_records(df, p)
    got = {r["record_id"]: r for r in read_wet_records(spark, p).collect()}
    assert len(got) == 3
    for rid, uri, date, text in rows:
        r = got[rid]
        assert not r["_malformed"]
        assert r["target_uri"] == uri and r["warc_date"] == date
        assert r["text"] == text
        assert r["content_length"] == len(text.encode())


def test_wet_malformed_blocks_are_routed_not_dropped(spark, tmp_path):
    from candia_spark.sources.adapters import read_wet_records

    p = tmp_path / "bad.wet"
    p.write_text(
        "preamble junk before any record\r\n"
        "WARC/1.0\r\nWARC-Type: conversion\r\n"
        "WARC-Record-ID: <urn:uuid:9>\r\n"
        "WARC-Target-URI: http://ok.example/\r\n"
        "WARC-Date: 2020-01-01T00:00:00Z\r\n"
        "Content-Length: 2\r\n\r\nok\r\n"
        "WARC/1.0\r\nthis block has no headers at all\r\n"
    )
    out = read_wet_records(spark, str(p)).collect()
    good = [r for r in out if not r["_malformed"]]
    bad = [r for r in out if r["_malformed"]]
    assert len(good) == 1 and good[0]["text"] == "ok"
    assert good[0]["record_id"] == "<urn:uuid:9>"
    assert len(bad) == 2  # the preamble and the headerless block route


def test_wet_scan_is_jvm_only(spark, tmp_path):
    from candia_spark.sources.adapters import (
        read_wet_records,
        write_wet_records,
    )

    df = spark.createDataFrame(
        [("<u:1>", "http://x/", "2020-01-01T00:00:00Z", "t")],
        "record_id string, target_uri string, warc_date string, text string",
    )
    p = str(tmp_path / "wet2")
    write_wet_records(df, p)
    plan = _plan_of(read_wet_records(spark, p))
    assert "Python" not in plan and "Exchange" not in plan


# --- null-input contracts (the r10-r12 null-key defect class) --------------


def test_hard_negatives_null_label_is_a_negative(spark):
    from candia_spark.operators.similarity import mine_hard_negatives

    corpus = _emb(
        spark,
        [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.4], None),  # unlabeled: must still be a negative
            (2, [0.0, 1.0], 1),
        ],
    )
    qs = corpus.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    got = mine_hard_negatives(corpus, qs, k=3).orderBy("rank").collect()
    assert [r["neg_id"] for r in got] == [1, 2]
    assert got[0]["label"] is None


def test_html_extract_null_is_empty_document(spark):
    from candia_spark.operators.curation import extract_html_text

    out = extract_html_text(_html_df(spark, [(1, None)])).collect()[0]
    assert out["title"] == "" and out["clean_text"] == ""
    assert out["n_lines"] == 0 and out["n_chars"] == 0


def test_char_census_null_text_is_empty_census(spark):
    df = spark.createDataFrame([(1, None)], "doc_id bigint, text string")
    cnt = char_census_counts("text")
    r = df.select(
        F.size(cnt).alias("d"),
        char_entropy_bits(cnt, F.lit(0)).alias("e"),
    ).collect()[0]
    assert r["d"] == 0 and r["e"] == 0


# --- plan pins for the composed/planned queries ----------------------------


def test_mixture_plan_broadcasts_weights(spark):
    from candia_spark.operators.curation import mixture_epoch_plan

    docs = spark.createDataFrame(
        [("a", "x y"), ("b", "z")], "source string, text string"
    )
    plan = _plan_of(mixture_epoch_plan(docs, {"a": 1, "b": 2}, 100))
    # the k-row weight table broadcasts; the census is the only keyed agg
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_pack_whole_udf_sees_thin_rows_only(spark, sf_smoke):
    from candia_spark.operators.curation import pack_sequences_whole
    from candia_spark.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").select(
        "source", "doc_id", "text"
    )
    plan = _plan_of(pack_sequences_whole(docs, budget=60))
    # the grouped-map operator's input schema carries (shard, id,
    # n_tokens) — the text column must be projected away BEFORE the
    # Arrow exchange, not shipped per row into Python
    import re

    m = re.search(r"FlatMapGroupsInPandas.*", plan)
    assert m is not None and "text" not in m.group(0)


def test_web_curate_chain_plan_shape(spark, sf_smoke):
    from candia_spark.plans.queries import QUERY_REGISTRY

    plan = _plan_of(
        QUERY_REGISTRY["q120_web_curate_chain"].spark(spark, sf_smoke)
    )
    # extraction is a map; the dedup half is the q98/q108 keyed-shuffle
    # shape — no cartesian, no Python, census agg partially aggregated
    assert "CartesianProduct" not in plan and "Python" not in plan
    assert "partial_min" in plan or "partial_count" in plan


# --- blocklist filter -------------------------------------------------------


def test_blocklist_word_bounded_and_phrase(spark):
    from candia_spark.operators.curation import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "the slow query"),  # hit: 'slow'
            (2, "slowly but surely"),  # NO hit: word boundary
            (3, "a Merge--Conflict mess"),  # phrase across punctuation
            (4, "slow merge conflict"),  # two hits -> smallest first
            (5, None),  # NULL text: clean
            (6, "SLOW!"),  # case + trailing punct
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r
        for r in blocklist_filter(
            docs, ["slow", "merge conflict"]
        ).collect()
    }
    assert got[1]["blocked"] and got[1]["first_hit"] == "slow"
    assert not got[2]["blocked"] and got[2]["n_hits"] == 0
    assert got[3]["blocked"] and got[3]["first_hit"] == "merge conflict"
    assert got[4]["n_hits"] == 2 and got[4]["first_hit"] == "merge conflict"
    assert not got[5]["blocked"] and got[5]["first_hit"] == ""
    assert got[6]["blocked"]


def test_blocklist_is_pure_map_and_validates(spark, sf_smoke):
    from candia_spark.operators.curation import blocklist_filter
    from candia_spark.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    plan = _plan_of(blocklist_filter(docs, ["slow", "batch"]))
    assert "Exchange hashpartitioning" not in plan
    assert "Python" not in plan and "Join" not in plan
    with pytest.raises(ValueError, match="phrases"):
        blocklist_filter(docs, [])
    with pytest.raises(ValueError, match="phrases"):
        blocklist_filter(docs, ["ok", "   "])
