"""Reference golden-test parity (SURVEY.md §5): the exact spectrum-index
grid from models.py:206-225 and exact scan reconstruction (K4), plus the
q23/q24 PARAFAC golden-table recompute gate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from candia_spark.operators.kernels import reconstruct_scans
from candia_spark.operators.relational import cross_index, explode_index


@pytest.mark.parametrize(
    "sf_dir",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"],
)
def test_parafac_goldens_recompute(spark, sf_dir):
    """Recompute the q23/q24 golden tables from the operators at every
    keyed scale (both correctness-gate scales plus the bench-scale sf0.1)
    and assert the pinned values (verdict r4 #4).

    This makes two failure modes LOUD in pytest instead of surfacing as a
    cryptic zero-row/hash oracle mismatch at driver time:
    - the driver's parquet was regenerated with different row counts (the
      scale-key assert below names the fix: scripts/regen_goldens.py);
    - a numpy/BLAS lineage change moved the NN-ALS trajectory (the version
      assert distinguishes 'refresh goldens' from 'engine regressed').
    """
    from candia_spark.plans.queries import (
        GOLDEN_NUMPY_VERSION,
        GOLDEN_SCALE_KEYS,
        Q23_GOLDENS,
        Q24_GOLDENS,
        QUERY_REGISTRY,
    )

    assert np.__version__.startswith(GOLDEN_NUMPY_VERSION), (
        f"goldens were pinned under numpy {GOLDEN_NUMPY_VERSION}.x but this "
        f"env runs {np.__version__}: if q23/q24 values moved, refresh them "
        "with scripts/regen_goldens.py (an algorithm regression would move "
        "them under the SAME numpy too — check that first)"
    )
    n_lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert n_lineitem in GOLDEN_SCALE_KEYS, (
        f"{sf_dir} lineitem has {n_lineitem} rows but goldens are keyed for "
        f"{sorted(GOLDEN_SCALE_KEYS)} — the driver testdata was regenerated; "
        "re-pin with scripts/regen_goldens.py"
    )
    tag = GOLDEN_SCALE_KEYS[n_lineitem]

    got23 = {
        (tag, r["slice_key"], r["ncomp"]): (r["iterations"], round(r["rsq"], 2))
        for r in QUERY_REGISTRY["q23_parafac_decompose"]
        .spark(spark, sf_dir)
        .collect()
    }
    want23 = {k: v for k, v in Q23_GOLDENS.items() if k[0] == tag}
    assert got23 == want23, "q23 goldens drifted — scripts/regen_goldens.py"

    got24 = {
        (tag, r["slice_key"], r["comp"]): r["npeaks"]
        for r in QUERY_REGISTRY["q24_time_mode_peaks"]
        .spark(spark, sf_dir)
        .collect()
    }
    want24 = {k: v for k, v in Q24_GOLDENS.items() if k[0] == tag}
    assert got24 == want24, "q24 goldens drifted — scripts/regen_goldens.py"


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


def test_tensorize_slice_golden(spark):
    """The reference's own (commented-out) tensorize golden spec, revived:
    generate_slice_tensor.py:321-380 — 2 samples, 3 scans worth of points,
    expected 2x2x8 tensor with exact NaN placement. Our long format
    represents NaN cells as absent rows; sample ordinals follow the sorted
    sample-name contract (W9), so file=1 -> 0, file=2 -> 1."""
    from candia_spark.pipeline import tensorize_slices

    rows = [
        # sample file=1 (reference sample_11 + sample_12)
        ("file=1", 1, 1.01, 10.0, 100.0),
        ("file=1", 2, 1.02, 20.0, 200.0),
        ("file=1", 1, 3.02, 30.0, 300.0),
        ("file=1", 2, 3.03, 30.0, 333.0),
        # sample file=2 (reference sample_2)
        ("file=2", 1, 2.01, 11.0, 400.0),
        ("file=2", 2, 2.06, 22.0, 500.0),
        ("file=2", 1, 2.07, 22.0, 800.0),
        ("file=2", 2, 2.08, 33.0, 600.0),
    ]
    sliced = spark.createDataFrame(
        [(0.0, 0) + r for r in rows],
        "swath_lower_adjusted double, rt_window bigint, sample string,"
        " level int, rt double, mz double, intensity double",
    )
    tensor_long, mz_dim = tensorize_slices(
        sliced, mass_tol_ppm=40.0, min_tensor_points=1
    )
    # m/z dimension: (level, partition_start) sorted -> the reference's
    # expected_mz_indices order [10,11,22,30]_ms1 + [20,22,30,33]_ms2
    dim = {
        (r.level, r.mz_partition_start): r.mz_idx for r in mz_dim.collect()
    }
    assert dim == {
        (1, 10.0): 0, (1, 11.0): 1, (1, 22.0): 2, (1, 30.0): 3,
        (2, 20.0): 4, (2, 22.0): 5, (2, 30.0): 6, (2, 33.0): 7,
    }
    got = {
        (r.sample_no, r.cycle, r.mz_idx): r.intensity
        for r in tensor_long.collect()
    }
    # exactly the reference's expected_tensor non-NaN cells (sample axis
    # re-indexed to the sorted-name contract: file=1 -> 0, file=2 -> 1)
    assert got == {
        (0, 0, 0): 100.0, (0, 0, 4): 200.0,   # file=1 cycle of rt 1.01-1.02
        (0, 1, 3): 300.0, (0, 1, 6): 333.0,   # file=1 cycle of rt 3.02-3.03
        (1, 0, 1): 400.0, (1, 0, 5): 500.0,   # file=2 cycle of rt 2.01-2.06
        (1, 1, 2): 800.0, (1, 1, 7): 600.0,   # file=2 cycle of rt 2.07-2.08
    }
