"""mzXML spectra export (SURVEY.md §2.1 S9) — byte-compatible single-file
sink, driver-side over an ordered ``toLocalIterator()``.

Format contract reproduced from the reference's encoder behavior
(``scripts/util/msproc.py:55-60,229-420``; no code copied — the layout is
fixed by the public mzXML 3.2 schema and the reference's attribute
choices):

- header block with the sashimi 3.2 namespace, ``<msRun scanCount=...>``
  patched after all scans are known (msproc.py:367-390)
- one ``<scan>`` per mass-mode component: num, scanType="Full", msLevel,
  peaksCount, lowMz/highMz/basePeakMz/basePeakIntensity/totIonCurrent
  computed from the peak list (msproc.py:331-364)
- MS2 scans carry ``<precursorMz precursorIntensity=...>`` — the pseudo
  precursor is the argmax-intensity MS1 point of the component, else
  window center + jitter (msproc.py:297-307; K5)
- peaks = base64 of interleaved (mz, intensity) pairs as big-endian
  float32 ("network" order; msproc.py:511-521)
- trailing byte-offset ``<index name="scan">`` + ``<indexOffset>``
  (msproc.py:393-420) — written in one pass here (offsets tracked while
  writing, no re-read)

A single writer is the correct scale story: the output is one XML file
consumed by external search tools, ordered by scan number — writing is
O(result) on the driver while everything upstream stays distributed.
"""

from __future__ import annotations

import base64
from collections.abc import Iterable, Iterator

import numpy as np

MZXML_HEADER = (
    '<?xml version="1.0" encoding="ISO-8859-1"?>\n'
    '<mzXML xmlns="http://sashimi.sourceforge.net/schema_revision/mzXML_3.2"\n'
    'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"\n'
    'xsi:schemaLocation="http://sashimi.sourceforge.net/schema_revision/mzXML_3.2'
    ' http://sashimi.sourceforge.net/schema_revision/mzXML_3.2/mzXML_idx_3.2.xsd">\n'
    '<msRun scanCount="{scan_count}">\n'
)


def peaks_base64(mz: np.ndarray, intensity: np.ndarray) -> str:
    """Interleaved big-endian float32 (mz, intensity) pairs, base64."""
    pairs = np.empty(2 * len(mz), dtype=">f4")
    pairs[0::2] = mz
    pairs[1::2] = intensity
    return base64.standard_b64encode(pairs.tobytes()).decode()


def scan_xml(
    scan_no: int,
    mz: np.ndarray,
    intensity: np.ndarray,
    level: int = 2,
    prec_mz: float | None = None,
    prec_intensity: float | None = None,
) -> str:
    """One ``<scan>`` element (attribute set of msproc.py:331-364)."""
    if len(mz) == 0:
        return ""
    base_idx = int(np.argmax(intensity))
    parts = [
        f'<scan num="{scan_no}" scanType="Full"\n',
        f'msLevel="{level}"\n',
        f'peaksCount="{len(mz)}"\n',
        f'lowMz="{np.min(mz)}" ',
        f'highMz="{np.max(mz)}" ',
        f'basePeakMz="{mz[base_idx]}"\n',
        f'basePeakIntensity="{np.max(intensity)}"\n',
        f'totIonCurrent="{np.sum(intensity)}"\n',
        ">\n",
    ]
    if level == 2:
        parts.append(
            f'<precursorMz precursorIntensity="{prec_intensity}">'
            f"{prec_mz}</precursorMz>\n"
        )
    parts += [
        '<peaks compressionType="none"\n',
        'compressedLen="0"\n',
        'precision="32"\n',
        'byteOrder="network"\n',
        'contentType="m/z-int">',
        peaks_base64(mz, intensity),
        "</peaks>\n",
        "</scan>\n",
    ]
    return "".join(parts)


def write_mzxml(
    path: str,
    scans: Iterable[dict],
) -> int:
    """Write a complete indexed mzXML from an iterable of scan dicts
    (keys: scan_no, mz, intensity, level, prec_mz, prec_intensity) —
    typically ``df.toLocalIterator()`` rows regrouped per component.

    Returns the number of scans written. Single pass: scan byte offsets
    are recorded during the write, so no post-hoc re-read/rewrite (the
    reference re-reads the file twice; same bytes, one pass here).
    """
    scans = list(scans)
    header = MZXML_HEADER.format(scan_count=len(scans))
    offsets: list[tuple[int, int]] = []
    with open(path, "w", encoding="ISO-8859-1") as out:
        out.write(header)
        pos = len(header.encode("ISO-8859-1"))
        for s in scans:
            xml = scan_xml(
                s["scan_no"],
                np.asarray(s["mz"], dtype=float),
                np.asarray(s["intensity"], dtype=float),
                level=s.get("level", 2),
                prec_mz=s.get("prec_mz"),
                prec_intensity=s.get("prec_intensity"),
            )
            if not xml:
                continue
            offsets.append((s["scan_no"], pos))
            out.write(xml)
            pos += len(xml.encode("ISO-8859-1"))
        out.write("</msRun>\n")
        pos += len(b"</msRun>\n")
        index_offset = pos
        out.write('<index name = "scan">\n')
        for num, off in offsets:
            out.write(f'<offset id = "{num}">{off}</offset>\n')
        out.write("</index>\n")
        out.write(f"<indexOffset>{index_offset}</indexOffset>\n")
        out.write("</mzXML>\n")
    return len(offsets)


def read_mzxml(path: str) -> Iterator[dict]:
    """mzXML reader (second half of S10, SURVEY §2.1): parse an indexed
    mzXML file — including this module's own sink output — back into scan
    dicts (scan_no, mz, intensity, level, prec_mz, prec_intensity).

    Parity: the reference round-trips its exported mzXML into MGF via
    pyteomics (scripts/util/msproc.py:423-440); this reader provides the
    same capability without the dependency. The trailing byte-offset
    ``<index>`` is used to locate scans (validating the sink's index as a
    side effect), with a scan-tag fallback for files lacking one. Peaks
    decode as interleaved big-endian float32 (mz, intensity) pairs —
    bit-exact with what ``peaks_base64`` encoded.

    Scale: one XML file = one driver-side parse, mirroring the single-writer
    sink; corpus-level ingestion fans out one task per file upstream.
    """
    import re

    raw = open(path, "rb").read()
    text = raw.decode("ISO-8859-1")
    offsets: list[int] = []
    m = re.search(r"<indexOffset>(\d+)</indexOffset>", text)
    if m:
        index_block = text[int(m.group(1)) :]
        offsets = [int(x) for x in re.findall(r">(\d+)</offset>", index_block)]
    starts = offsets or [s.start() for s in re.finditer(r"<scan ", text)]
    for start in starts:
        if text[start : start + 5] != "<scan":
            raise ValueError(f"offset {start} does not point at a <scan> in {path}")
        end = text.index("</scan>", start)
        block = text[start:end]
        attrs = dict(re.findall(r'(\w+)="([^"]*)"', block))
        prec = re.search(
            r'<precursorMz precursorIntensity="([^"]*)">([^<]*)</precursorMz>',
            block,
        )
        peaks_m = re.search(r"contentType=\"m/z-int\">([^<]*)</peaks>", block)
        pairs = np.frombuffer(
            base64.standard_b64decode(peaks_m.group(1)), dtype=">f4"
        ) if peaks_m and peaks_m.group(1) else np.empty(0, dtype=">f4")
        yield {
            "scan_no": int(attrs["num"]),
            "level": int(attrs.get("msLevel", 2)),
            "mz": pairs[0::2].astype(np.float32),
            "intensity": pairs[1::2].astype(np.float32),
            "prec_mz": float(prec.group(2)) if prec else None,
            "prec_intensity": float(prec.group(1)) if prec else None,
        }


def convert_mzxml_to_mgf(input_mzxml: str, output_mgf: str) -> int:
    """S10: mzXML -> MGF (msproc.py:423-440 behavior — TITLE=scan=N and
    PEPMASS=(precursor mz, intensity) per spectrum)."""
    from candia_spark.sources.adapters import write_mgf

    return write_mgf(output_mgf, read_mzxml(input_mzxml))


def iter_component_scans(rows: Iterator, jitter_seed: int = 123) -> Iterator[dict]:
    """Group ordered long rows (model_id, comp, level, mz, intensity,
    window_center) into scan dicts with the K5 pseudo-precursor rule:
    precursor = argmax-intensity MS1 point, else window center + jitter
    (msproc.py:297-307). Rows MUST arrive sorted by (scan_no, mz) — use
    ``df.orderBy(...).toLocalIterator()``."""
    rng = np.random.default_rng(jitter_seed)
    current: int | None = None
    ms1: list[tuple[float, float]] = []
    ms2: list[tuple[float, float]] = []
    center = -1.0

    def flush():
        if current is None or not ms2:
            return None
        if ms1:
            prec_mz, prec_int = max(ms1, key=lambda t: t[1])
        else:
            prec_mz = center + float(rng.random()) * 0.1
            prec_int = 300 + float(rng.random())
        mz = np.array([m for m, _ in ms2])
        inten = np.array([i for _, i in ms2])
        return {
            "scan_no": current,
            "mz": mz,
            "intensity": inten,
            "level": 2,
            "prec_mz": prec_mz,
            "prec_intensity": prec_int,
        }

    for r in rows:
        scan_no = r["scan_no"]
        if scan_no != current:
            s = flush()
            if s:
                yield s
            current, ms1, ms2 = scan_no, [], []
        center = r["window_center"] if "window_center" in r else -1.0
        (ms1 if r["level"] == 1 else ms2).append((r["mz"], r["intensity"]))
    s = flush()
    if s:
        yield s
