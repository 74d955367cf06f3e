"""Reference golden-test parity (SURVEY.md §5): the exact spectrum-index
grid from models.py:206-225 and exact scan reconstruction (K4)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from candia_spark.operators.kernels import reconstruct_scans
from candia_spark.operators.relational import cross_index, explode_index


def test_spectrum_index_golden_grid(spark):
    """2 swaths x 2 rt_windows x ncomp {1,2} must produce the reference's
    exact id matrix (scripts/parafac/models.py:206-225): model_id in
    product order, scan = global ordinal over (model_id, spectrum_num)."""
    swaths = spark.createDataFrame([(0,), (1,)], ["swath_start"])
    rts = spark.createDataFrame([(0,), (1,)], ["rt_window"])
    ncomps = spark.createDataFrame([(1,), (2,)], ["ncomp"])
    model_index = cross_index([swaths, rts, ncomps], id_col="model_id")
    spectrum_index = explode_index(
        model_index,
        count_col="ncomp",
        order_cols=["swath_start", "rt_window", "ncomp"],
    )
    got = [
        (
            r["swath_start"],
            r["rt_window"],
            r["ncomp"],
            r["model_id"],
            r["spectrum_num"],
            r["scan"],
        )
        for r in spectrum_index.orderBy("scan").collect()
    ]
    expected = [
        (0, 0, 1, 0, 0, 0),
        (0, 0, 2, 1, 0, 1),
        (0, 0, 2, 1, 1, 2),
        (0, 1, 1, 2, 0, 3),
        (0, 1, 2, 3, 0, 4),
        (0, 1, 2, 3, 1, 5),
        (1, 0, 1, 4, 0, 6),
        (1, 0, 2, 5, 0, 7),
        (1, 0, 2, 5, 1, 8),
        (1, 1, 1, 6, 0, 9),
        (1, 1, 2, 7, 0, 10),
        (1, 1, 2, 7, 1, 11),
    ]
    assert got == expected


@pytest.fixture(scope="module")
def known_factors(spark):
    """Rank-2 factors for two slices with known dense reconstruction."""
    rng = np.random.default_rng(5)
    rows = []
    facs = {}
    for slice_key in ("a", "b"):
        mats = [rng.random((3, 2)), rng.random((4, 2)), rng.random((5, 2))]
        facs[slice_key] = mats
        for mode, mat in enumerate(mats):
            for (i, k), v in np.ndenumerate(mat):
                rows.append((slice_key, 2, mode, i, k, float(v)))
    df = spark.createDataFrame(
        rows, "slice_key string, ncomp int, mode int, row_idx int, comp int, value double"
    )
    return df, facs


def test_reconstruct_scans_exact(spark, known_factors):
    df, facs = known_factors
    out = reconstruct_scans(df, ["slice_key"]).collect()
    for slice_key, mats in facs.items():
        want = np.einsum("sk,tk,mk->stm", *mats)
        got = np.zeros_like(want)
        for r in out:
            if r["slice_key"] == slice_key:
                got[r["sample_no"], r["cycle"], r["mz_idx"]] = r["intensity"]
        assert np.allclose(got, want, atol=1e-12)


def test_reconstruct_component_subset(spark, known_factors):
    """Reconstructing only component 0 equals the rank-1 outer product —
    the reference's unimodal-only reconstruction path
    (reconstruct_scan.py:52-134)."""
    df, facs = known_factors
    out = reconstruct_scans(df, ["slice_key"], components=[0]).collect()
    mats = facs["a"]
    want = np.einsum(
        "s,t,m->stm", mats[0][:, 0], mats[1][:, 0], mats[2][:, 0]
    )
    got = np.zeros_like(want)
    for r in out:
        if r["slice_key"] == "a":
            got[r["sample_no"], r["cycle"], r["mz_idx"]] = r["intensity"]
    assert np.allclose(got, want, atol=1e-12)
