"""Golden tests for the bio-domain scalar functions (SURVEY §2.7):
tryptic digestion, decoy rotate mutation, b/y fragment m/z — hand-computed
expectations from the public monoisotopic mass table."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from candia_spark.functions.bio import (
    clean_protein,
    decoy_rotate,
    fragment_mz,
    tryptic_peptides,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_clean_protein(spark):
    # B, J, O, U, X, Z and non-letters are stripped; case-folded
    assert _one(spark, clean_protein(F.lit("aBc-K r#2oZ"))) == "ACKR"


def test_tryptic_digestion(spark):
    # cleave after K/R unless followed by P; terminal K/R yields no empty
    cases = {
        "AAKPCCRDD": ["AAKPCCR", "DD"],  # KP suppressed, R|D cleaved
        "AKCKR": ["AK", "CK", "R"],  # terminal R: no trailing empty
        "MNQ": ["MNQ"],  # no cleavage sites
        "KK": ["K", "K"],
    }
    for seq, want in cases.items():
        got = _one(spark, tryptic_peptides(F.lit(seq)))
        assert got == want, seq


def test_decoy_rotate_matches_python_slices(spark):
    def py_rotate(f: str) -> str:
        return f[:-5] + f[-3:] + f[-5:-3]

    for f in ["ABCDEFGH", "ABCDE", "ABCD", "ABC", "AB", "A", "PEPTIDEK"]:
        assert _one(spark, decoy_rotate(F.lit(f))) == py_rotate(f), f
    assert _one(spark, decoy_rotate(F.lit("ABCDEFGH"))) == "ABCFGHDE"


def test_fragment_mz_golden(spark):
    # PEPTIDE: b1 = P + proton = 98.06004
    #          y6 = EPTIDE + water + proton = 703.31446
    # fragment lengths run 1..len-2 (reference range(1, len-1)), so for a
    # 7-residue peptide the longest prefix fragment is length 5
    df = spark.createDataFrame([Row(k=1, peptide="PEPTIDE")])
    out = fragment_mz(df, "peptide", ["k"], charges=(1, 2)).collect()
    got = {(r.ion, r.frag_len, r.charge): r.mz for r in out}
    assert got[("b", 1, 1)] == pytest.approx(98.06004, abs=1e-9)
    assert got[("y", 1, 1)] == pytest.approx(703.31446, abs=1e-9)
    # doubly-charged: (m + 2*proton) / 2
    assert got[("b", 1, 2)] == pytest.approx((97.05276 + 2 * 1.00728) / 2, abs=1e-9)
    lens = {r.frag_len for r in out}
    assert lens == {1, 2, 3, 4, 5}
    # 5 lengths x 2 ions x 2 charges
    assert len(out) == 20


def test_fragment_mz_short_peptides_yield_nothing(spark):
    df = spark.createDataFrame([Row(k=1, peptide="AK")])
    assert fragment_mz(df, "peptide", ["k"]).count() == 0
