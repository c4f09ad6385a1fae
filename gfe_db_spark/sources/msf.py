"""S2: multiple-sequence-alignment (MSF) source.

The reference loads per-locus GCG/MSF files with `AlignIO.read`
(ref app.py:97-124) into a driver-side dict used as a lookup side table.
Here the parse yields a DataFrame `(align_type, locus, hla_name,
aligned_seq)` that downstream joins broadcast (J1) — the Spark-native
form of that dict probe.

The parser reads the GCG MSF container format (public format: header up
to the `//` separator, then interleaved blocks of `name  seq-chunks`).
Files are tiny relative to the .dat (one per locus), so they parse on the
driver and become a broadcast-able DataFrame; at 100 TB scale the
alignment side stays a small dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ALIGNMENT_SCHEMA = T.StructType(
    [
        T.StructField("align_type", T.StringType()),  # genomic | nucleotide | protein
        T.StructField("locus", T.StringType()),
        T.StructField("hla_name", T.StringType()),
        T.StructField("aligned_seq", T.StringType()),
    ]
)

_TYPE_ALIASES = {
    "gen": "genomic",
    "genomic": "genomic",
    "nuc": "nucleotide",
    "nucleotide": "nucleotide",
    "prot": "protein",
    "protein": "protein",
}


def parse_msf_text(text: str) -> dict[str, str]:
    """Parse MSF body → {name: alignment string (gaps kept)}."""
    seqs: dict[str, list[str]] = {}
    in_body = False
    for line in text.splitlines():
        if not in_body:
            if line.strip().startswith("//"):
                in_body = True
            continue
        parts = line.split()
        if len(parts) < 2:
            continue
        name, chunks = parts[0], parts[1:]
        # alignment chunks are sequence/gap characters only
        if all(all(c.isalpha() or c in ".-~" for c in ch) for ch in chunks):
            seqs.setdefault(name, []).append("".join(chunks))
    return {name: "".join(chunks) for name, chunks in seqs.items()}


def alignment_files_from_paths(paths: list[str]) -> dict[tuple[str, str], str]:
    """Map MSF paths named by the reference convention ``<locus>_<type>.msf``
    (e.g. ``A_gen.msf`` → ``("gen", "HLA-A")``; ref app.py:97-124 builds the
    same keys from its alignments directory listing). The locus prefix is
    added the way the reference does unless the filename already carries it.
    """
    import os

    files: dict[tuple[str, str], str] = {}
    for path in paths:
        stem = os.path.splitext(os.path.basename(path))[0]
        if "_" not in stem:
            raise ValueError(
                f"MSF filename {path!r} not in '<locus>_<type>.msf' form"
            )
        locus, _, align_type = stem.rpartition("_")
        if align_type not in _TYPE_ALIASES:
            raise ValueError(
                f"unknown alignment type {align_type!r} in {path!r}; "
                f"expected one of {sorted(_TYPE_ALIASES)}"
            )
        if not locus.startswith("HLA-") and not locus.startswith("KIR"):
            locus = f"HLA-{locus}"
        files[(align_type, locus)] = path
    return files


def read_alignments(
    spark: SparkSession, files: dict[tuple[str, str], str]
) -> DataFrame:
    """files: {(align_type, locus): path} → alignment DataFrame.

    Names in MSF bodies lack the 'HLA-' prefix (ref app.py:117 adds it);
    we do the same.
    """
    rows = []
    for (align_type, locus), path in files.items():
        align_type = _TYPE_ALIASES[align_type]
        with open(path) as fh:
            for name, seq in parse_msf_text(fh.read()).items():
                rows.append((align_type, locus, f"HLA-{name}", seq))
    return spark.createDataFrame(rows, schema=ALIGNMENT_SCHEMA)
