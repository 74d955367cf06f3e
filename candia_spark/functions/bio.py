"""Bio-domain scalar functions (SURVEY §2.7 "Bio-domain"): theoretical b/y
fragment m/z generation, tryptic peptide digestion, and decoy mutation —
expressed entirely with JVM-side column functions (regex split, substring
arithmetic, map lookup, window cumsum); no Python UDFs.

Parity targets:
- ``all_fragments(peptide, charge, types=('b','y'))`` — reference
  scripts/util/msproc.py:709-719 (pyteomics fast_mass2 over prefix/suffix
  slices, fragment lengths ``range(1, len(peptide)-1)``, i.e. 1..len-2).
- tryptic digestion + decoy mutation — reference
  scripts/denovo/seqproc.py:108-150 (pyopenms ProteaseDigestion, default
  trypsin = cleave after K/R unless followed by P; the deterministic
  ``rotate`` mutation ``frag[:-5] + frag[-3:] + frag[-5:-3]``).

Numeric convention (cross-engine exactness): standard public monoisotopic
residue masses at 5 decimals, scaled by 1e5 into BIGINTs. Prefix masses are
exact integer sums (order-independent, no float accumulation drift), and
the only floating-point operation is the final division — so Spark and any
ANSI-SQL oracle produce bit-identical doubles. b = (prefix + z*proton)/z,
y = (total - prefix + water + z*proton)/z.

Scale: digestion/fragment fan-out is a narrow generator (explode) keyed by
the source row — no shuffle except the per-peptide cumsum window, which is
partitioned by (protein, peptide) and therefore embarrassingly parallel at
any corpus size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Standard monoisotopic residue masses (Da, 5 decimals), scaled by 1e5.
# Public values (Unimod/ExPASy); I and L are isobaric.
MONOISOTOPIC_SCALE = 100_000
AA_MONOISOTOPIC_X1E5: dict[str, int] = {
    "G": 5_702_146,
    "A": 7_103_711,
    "S": 8_703_203,
    "P": 9_705_276,
    "V": 9_906_841,
    "T": 10_104_768,
    "C": 10_300_919,
    "L": 11_308_406,
    "I": 11_308_406,
    "N": 11_404_293,
    "D": 11_502_694,
    "Q": 12_805_858,
    "K": 12_809_496,
    "E": 12_904_259,
    "M": 13_104_049,
    "H": 13_705_891,
    "F": 14_706_841,
    "R": 15_610_111,
    "Y": 16_306_333,
    "W": 18_607_931,
}
WATER_X1E5 = 1_801_056  # H2O 18.01056
PROTON_X1E5 = 100_728  # H+  1.00728

AA_ALPHABET = "".join(sorted(AA_MONOISOTOPIC_X1E5))

# Java regex: cleave after K or R when the next residue is not P. DuckDB's
# RE2 lacks lookaround, so oracles use the equivalent cut-position list
# formulation (see oracle_tryptic_cuts_sql below).
TRYPSIN_SPLIT_REGEX = r"(?<=[KR])(?!P)"


def aa_mass_map() -> Column:
    """Literal map column residue -> scaled monoisotopic mass (BIGINT)."""
    entries: list[Column] = []
    for aa, m in AA_MONOISOTOPIC_X1E5.items():
        entries.append(F.lit(aa))
        entries.append(F.lit(m))
    return F.create_map(*entries)


def clean_protein(col: Column | str) -> Column:
    """Uppercase and strip every character outside the 20-AA alphabet —
    turns arbitrary text into a valid residue string."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.upper(c), f"[^{AA_ALPHABET}]", "")


def tryptic_peptides(col: Column | str) -> Column:
    """Array of tryptic peptides: split after K/R not before P
    (seqproc.py:113-116 default ProteaseDigestion = trypsin). Trailing
    empty fragments from a terminal K/R are removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, TRYPSIN_SPLIT_REGEX), lambda p: F.length(p) > 0)


def decoy_rotate(col: Column | str) -> Column:
    """Deterministic 'rotate' decoy mutation of one peptide:
    ``frag[:-5] + frag[-3:] + frag[-5:-3]`` (seqproc.py:126-127), with
    Python's negative-slice clamping reproduced for short fragments."""
    c = F.col(col) if isinstance(col, str) else col
    ln = F.length(c)
    head_len = F.greatest(ln - 5, F.lit(0))
    tail_start = F.greatest(ln - 3, F.lit(0))
    return F.concat(
        F.substring(c, 1, head_len),
        c.substr(tail_start + 1, ln),
        c.substr(head_len + 1, tail_start - head_len),
    )


def fragment_mz(
    peptides: DataFrame,
    peptide_col: str,
    key_cols: Sequence[str],
    charges: Sequence[int] = (1, 2),
) -> DataFrame:
    """Theoretical b/y fragment m/z table for each peptide row.

    Emits one row per (key, fragment length l in 1..len-2, ion type in
    {b, y}, charge): ``frag_len``, ``ion``, ``charge``, ``mz`` — the
    reference's fragment enumeration (msproc.py:714-719: b ions are
    prefixes ``peptide[:l]``, y ions are suffixes ``peptide[l:]``).

    Exactness: per-residue scaled-integer masses cumsummed with a window
    ordered by position; the single final division produces bit-identical
    doubles in any engine.
    """
    pep = F.col(peptide_col)
    chars = peptides.select(
        *key_cols,
        peptide_col,
        F.explode(F.sequence(F.lit(1), F.length(pep))).alias("pos"),
    ).withColumn(
        "aa_mass",
        F.element_at(aa_mass_map(), F.expr(f"substr({peptide_col}, pos, 1)")),
    )
    w = Window.partitionBy(*key_cols, peptide_col).orderBy("pos")
    wall = Window.partitionBy(*key_cols, peptide_col)
    cum = chars.withColumn("prefix_mass", F.sum("aa_mass").over(w)).withColumn(
        "total_mass", F.sum("aa_mass").over(wall)
    )
    frag = cum.filter(F.col("pos") <= F.length(pep) - 2).withColumnRenamed(
        "pos", "frag_len"
    )
    frag = frag.select(
        *key_cols,
        peptide_col,
        "frag_len",
        "prefix_mass",
        "total_mass",
        F.explode(F.array(*[F.lit(z) for z in charges])).alias("charge"),
    )
    z = F.col("charge").cast("long")
    scale = F.lit(float(MONOISOTOPIC_SCALE))
    b_mz = (F.col("prefix_mass") + z * F.lit(PROTON_X1E5)) / (scale * z)
    y_mz = (
        F.col("total_mass")
        - F.col("prefix_mass")
        + F.lit(WATER_X1E5)
        + z * F.lit(PROTON_X1E5)
    ) / (scale * z)
    return frag.select(
        *key_cols,
        peptide_col,
        "frag_len",
        "charge",
        F.explode(
            F.array(
                F.struct(F.lit("b").alias("ion"), b_mz.alias("mz")),
                F.struct(F.lit("y").alias("ion"), y_mz.alias("mz")),
            )
        ).alias("f"),
    ).select(*key_cols, peptide_col, "frag_len", "charge", "f.ion", "f.mz")


def oracle_mass_values_sql(alias: str = "aa_mass") -> str:
    """VALUES CTE body mapping residue -> scaled mass for oracle SQL."""
    rows = ", ".join(f"('{aa}', {m})" for aa, m in AA_MONOISOTOPIC_X1E5.items())
    return f"{alias}(aa, m) AS (SELECT * FROM (VALUES {rows}))"
