"""Deduplication operators for large-scale training-data pipelines: exact,
MinHash+LSH, SimHash, and exact n-gram Jaccard. All are pure DataFrame
plans (no Python UDFs) — hashing uses Spark's built-in xxhash64/md5, so
every stage stays in whole-stage codegen and scales linearly.

Scale design (the 100 TB story):
- exact dedup: one hash-groupBy shuffle on a 16-byte digest.
- MinHash+LSH: shingle explode -> per-doc minhash signature (groupBy min of
  k permuted hashes) -> band buckets -> bucket equi-join. Candidate pairs
  are bounded by band collisions, never the O(N^2) pair space.
- SimHash: one pass to a 64-bit signature; near-dup = equal signature (or
  banded sub-keys for hamming<=k retrieval).
- exact n-gram Jaccard: inverted-index self-join on shared shingles; use
  AFTER LSH at scale (verify candidates), standalone only at survey scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tokenization convention shared with the DuckDB oracles: lowercase, split
# on single spaces, drop empties.
def tokens_col(text_col: str = "text"):
    return F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per exact text digest.

    At 100 TB: the groupBy shuffles only (digest, id) pairs — bytes per
    row, not documents.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )


def word_ngrams(
    df: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    toks = tokens_col(text_col)
    # shingle i = tokens[i..i+n-1] joined by a separator. Guard short docs:
    # F.sequence(0, -1) would emit a DESCENDING [0, -1] sequence, not empty.
    shingles = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws("\x1f", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col), F.explode(shingles).alias("shingle"))
        .distinct()
    )


def word_ngram_hashes(
    df: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct word n-gram shingle HASHES per document: (id, shingle:
    bigint). Hashing before the distinct means the dedup shuffle carries
    16-byte rows instead of strings — use this wherever the shingle text
    itself is not needed (Jaccard counting, MinHash)."""
    toks = tokens_col(text_col)
    shingles = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws("\x1f", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select(F.col(id_col), F.explode(shingles).alias("__sh"))
        .select(F.col(id_col), F.xxhash64("__sh").alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 2,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
    max_shingle_df: int | None = None,
    max_shingle_frac: float | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs over word n-gram shingle sets:
    J(A,B) = |A∩B| / (|A|+|B|-|A∩B|) >= threshold, id_a < id_b.

    The 100 TB contract is LSH-then-verify, and both halves are enforced
    here, not just documented:

    - ``candidates`` (id_a, id_b — e.g. :func:`minhash_lsh_pairs` output):
      when given, intersections are computed ONLY for those pairs — the
      inverted index joins *through* the candidate list, so the work is
      linear in candidate-pair shingle mass, never quadratic in per-shingle
      document frequency.
    - ``max_shingle_df`` / ``max_shingle_frac``: standalone mode's guard
      against hot shingles (a stopword bigram shared by 1M docs is a
      10^12-pair explosion). Shingles with document frequency above the cap
      (absolute, or a fraction of the corpus doc count — fractional is
      scale-invariant and the recommended form) are dropped from the
      universe (index AND set sizes — Jaccard over the capped shingle
      space), standard MinHash practice.
    """
    # shuffle bigint shingle hashes, not strings: ~10x fewer bytes through
    # the distinct AND the self-join (64-bit collisions are ~df^2/2^64 —
    # negligible). Lazily localCheckpoint'ed: the plan consumes this subtree
    # three times (both pair-join sides + set sizes) and Catalyst does not
    # reuse the exchange across the differing aliases — without it the
    # tokenize/shingle/distinct chain runs 3x. Unlike persist(), checkpoint
    # blocks are released by the ContextCleaner as soon as the DataFrame is
    # garbage-collected — no per-call cache leak into the session.
    sh = word_ngram_hashes(df, n, text_col, id_col).localCheckpoint(eager=False)
    if max_shingle_df is not None or max_shingle_frac is not None:
        # the census reads the checkpointed index (one small shuffle), and
        # only the OVER-cap shingles — tiny by definition — flow into a
        # broadcast anti-join: the index itself never reshuffles for the cap
        cap: Column = F.lit(max_shingle_df).cast("double")
        if max_shingle_frac is not None:
            ndocs = df.select(
                F.count_distinct(F.col(id_col)).alias("__ndocs")
            )
            frac_cap = F.col("__ndocs") * F.lit(max_shingle_frac)
            cap = frac_cap if max_shingle_df is None else F.least(cap, frac_cap)
        census = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
        if max_shingle_frac is not None:
            census = census.crossJoin(F.broadcast(ndocs))
        hot = census.filter(F.col("__df") > cap).select("shingle")
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    if candidates is not None:
        # verify mode: explode each candidate pair to id_a's shingles, then
        # equi-join on (id_b, shingle) = set intersection per pair
        inter = (
            candidates.select("id_a", "id_b")
            .distinct()
            .join(a, "id_a")
            .join(b, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    else:
        inter = (
            a.join(b, "shingle")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    # sizes join AFTER the pair agg: the pair table is the big side but
    # both size joins broadcast (sizes is doc-count rows), measured faster
    # than carrying sizes through the 10^7-row shingle join
    out = (
        inter.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            (
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
            ).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", "n_common", "size_a", "size_b", "jaccard")


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 32,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature per document: for permutation i, the min over
    shingles of a seeded xxhash64. Output: (id, sig: array<bigint>).

    One explode + one groupBy; signature width is a column array, so the
    shuffle carries num_hashes longs per doc.

    Each shingle STRING is hashed exactly once; the k permutations are
    derived by re-hashing the resulting bigint with a per-permutation seed
    (xxhash64(h64, i)) — bigint hashing is ~wordlength work vs per-byte
    string hashing, so this is ~k-fold cheaper than hashing the string k
    times at identical uniformity.
    """
    sh = word_ngram_hashes(df, n, text_col, id_col).withColumnRenamed(
        "shingle", "h64"
    )
    hashed = sh.select(
        F.col(id_col),
        *[
            F.xxhash64(F.col("h64"), F.lit(i)).alias(f"h{i}")
            for i in range(num_hashes)
        ],
    )
    agg = hashed.groupBy(id_col).agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )
    return agg.select(
        F.col(id_col), F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash: documents agreeing
    on all rows of any band collide. Output: (id_a, id_b, n_bands_hit,
    est_jaccard = fraction of agreeing minhashes).

    Scale: pair generation happens inside band buckets only — a self-join
    on (band_idx, band_hash), never on the full doc set. Hot buckets are
    the skew risk: AQE skew-join handles moderate cases, and
    ``max_bucket_size`` (ENFORCED, default 1000) drops degenerate buckets
    (e.g. empty-text collisions) before the self-join — a bucket of B docs
    is B²/2 pairs, so an uncapped 1M-doc bucket is a 10¹²-pair explosion.
    Dropped buckets cost recall only for pairs whose every agreeing band is
    degenerate; real near-dup pairs agree on discriminative bands too.
    """
    rows_per_band = num_hashes // bands
    sh = word_ngram_hashes(df, n, text_col, id_col).withColumnRenamed(
        "shingle", "h64"
    )
    hashed = sh.select(
        F.col(id_col),
        *[
            F.xxhash64(F.col("h64"), F.lit(i)).alias(f"h{i}")
            for i in range(num_hashes)
        ],
    )
    agg = hashed.groupBy(id_col).agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )
    # lazy localCheckpoint: the shingle->signature pipeline (the expensive
    # 32-hash scan) runs ONCE; both self-join sides and the bucket-size
    # census read the materialized blocks, and the ContextCleaner frees
    # them when this plan is dropped (no persist leak).
    agg = agg.localCheckpoint(eager=False)
    # band hash straight off the bigint minhash columns (no string concat)
    banded = agg.select(
        F.col(id_col),
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.col(f"h{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    if max_bucket_size is not None:
        # degenerate-bucket census is tiny (only buckets over the cap) —
        # broadcast anti-join, no extra shuffle of the banded table
        hot = (
            banded.groupBy("band_idx", "band_hash")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_bucket_size)
            .select("band_idx", "band_hash")
        )
        banded = banded.join(
            F.broadcast(hot), ["band_idx", "band_hash"], "left_anti"
        )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"), "band_idx", "band_hash"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), "band_idx", "band_hash"
    )
    pairs = (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_bands_hit"),
            F.first("sig_a").alias("sig_a"),
            F.first("sig_b").alias("sig_b"),
        )
    )
    agree = F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int"))
    return pairs.select(
        "id_a",
        "id_b",
        "n_bands_hit",
        F.round(
            F.aggregate(agree, F.lit(0), lambda acc, v: acc + v) / F.lit(num_hashes), 6
        )
        .cast("double")
        .alias("est_jaccard"),
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document over word tokens: bit j of the signature
    is 1 iff the sum over tokens of sign(bit j of xxhash64(token)) is
    positive. Output: (id, simhash: bigint).

    Entirely built-in expressions: explode tokens, per-bit +-1 sums via
    bitwise ops, one groupBy.
    """
    toks = df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("tok"))
    h = F.xxhash64(F.col("tok"))
    per_bit = toks.select(
        F.col(id_col),
        *[
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias(f"b{j}")
            for j in range(64)
        ],
    )
    sums = per_bit.groupBy(id_col).agg(
        *[F.sum(f"b{j}").alias(f"b{j}") for j in range(64)]
    )
    sig = sums.select(
        F.col(id_col),
        sum(
            [
                F.when(
                    F.col(f"b{j}") > 0, F.shiftleft(F.lit(1).cast("bigint"), j)
                ).otherwise(F.lit(0).cast("bigint"))
                for j in range(64)
            ],
            F.lit(0).cast("bigint"),
        ).alias("simhash"),
    )
    return sig


def simhash_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Documents sharing an identical 64-bit SimHash (hamming-0 near-dups)."""
    sig = simhash_signatures(df, text_col, id_col)
    return (
        sig.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )
