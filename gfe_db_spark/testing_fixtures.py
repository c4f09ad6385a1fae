"""Deterministic GFE-domain fixture generator (FIXTURES.md §4): a mini IMGT release
pair (3550, 3560) in EMBL flat-file format, plus MSF alignments and an ARD
redux mapping."""

from __future__ import annotations

import os


def embl_record(
    allele_id: str,
    name: str,
    feats: list[tuple[str, int | None, str]],
    translation: str | None = None,
) -> str:
    """feats: (type, number-or-None, seq) in genomic order. A CDS over the
    exon spans is emitted when `translation` is given."""
    seq = "".join(s for _, _, s in feats)
    lines = [
        f"ID   {allele_id}; SV 1; standard; DNA; HUM; {len(seq)} BP.",
        f"DE   {name}, Human MHC sequence",
        f"FT   source          1..{len(seq)}",
        'FT                   /organism="Homo sapiens"',
    ]
    pos = 1
    spans: list[tuple[str, int | None, int, int]] = []
    exon_spans: list[tuple[int, int]] = []
    for ftype, num, s in feats:
        a, b = pos, pos + len(s) - 1
        spans.append((ftype, num, a, b))
        if ftype == "exon":
            exon_spans.append((a, b))
        pos += len(s)
    if translation is not None and exon_spans:
        loc = ",".join(f"{a}..{b}" for a, b in exon_spans)
        lines.append(f"FT   CDS             join({loc})")
        lines.append(f'FT                   /translation="{translation}"')
    for ftype, num, a, b in spans:
        lines.append(f"FT   {ftype:<16}{a}..{b}")
        if num is not None:
            lines.append(f'FT                   /number="{num}"')
    lines.append(f"SQ   Sequence {len(seq)} BP;")
    for i in range(0, len(seq), 60):
        chunk = seq[i : i + 60].lower()
        grouped = " ".join(chunk[j : j + 10] for j in range(0, len(chunk), 10))
        lines.append(f"     {grouped}")
    return "\n".join(lines)


# feature building blocks (4 bp each; lexicographic order is the accession order)
U1, U2, U2B = "ACAC", "AGAG", "CTCT"
E1, E1B, E2 = "AAAA", "CCCC", "TTTT"
I1, I1C = "GGGG", "TTAA"
BU1, BE1, BU2 = "ACGA", "CAAA", "GTGT"
DU1, DE1, DU2 = "AACC", "CCAA", "GGTT"

ALLELE_A1 = ("HLA00001", "HLA-A*01:01:01:01")
ALLELE_A2 = ("HLA00002", "HLA-A*01:02")
ALLELE_B1 = ("HLA00003", "HLA-B*07:02")
ALLELE_D1 = ("HLA00004", "DRB5*01:02")
ALLELE_SKIP = ("HLA00005", "HLA-DRB5*01:11")  # in SKIP_ALLELES
ALLELE_SHORT = ("HLA00006", "HLA-A*99:99")  # len(seq) <= 5 → filtered
ALLELE_A3 = ("HLA00007", "HLA-A*02:01")  # only in 3560


def _std_feats(u5, e1, i1, e2, u3):
    return [
        ("UTR", None, u5),
        ("exon", 1, e1),
        ("intron", 1, i1),
        ("exon", 2, e2),
        ("UTR", None, u3),
    ]


def release_records(release: str) -> list[str]:
    recs = [
        embl_record(*ALLELE_A1, _std_feats(U1, E1, I1, E2, U2), translation="MK"),
        embl_record(*ALLELE_A2, _std_feats(U1, E1B, I1, E2, U2B), translation="TK"),
        embl_record(
            *ALLELE_B1,
            [("UTR", None, BU1), ("exon", 1, BE1), ("UTR", None, BU2)],
            translation=None,  # no CDS → error channel
        ),
        embl_record(*ALLELE_D1, _std_feats(DU1, DE1, I1, E2, DU2), translation="MD"),
        embl_record(*ALLELE_SKIP, _std_feats(U1, E1, I1, E2, U2), translation="MK"),
        embl_record(*ALLELE_SHORT, [("exon", 1, "ACG")], translation=None),
    ]
    if release >= "3560":
        recs.append(
            embl_record(*ALLELE_A3, _std_feats(U1, E1, I1C, E2, U2), translation="MV")
        )
    return recs


def synthetic_allele_records(n: int, locus: str = "HLA-A") -> list[str]:
    """Deterministic realistic-shape alleles for throughput benchmarking:
    17 features each (5'UTR, exons 1-8, introns 1-7, 3'UTR — the HLA-A
    shape, ref docs/source/introduction.rst:33-38), ~2.3 kb of sequence,
    feature sequences drawn from bounded pools so the accession registry
    sees realistic cross-allele sharing."""
    import hashlib

    def dna(tag: str, ln: int) -> str:
        out: list[str] = []
        h = tag.encode()
        while len(out) < ln:
            h = hashlib.md5(h).digest()
            out.extend("ACGT"[b & 3] for b in h)
        return "".join(out[:ln])

    recs = []
    for i in range(n):
        feats: list[tuple[str, int | None, str]] = [
            ("UTR", None, dna(f"u5-{i % 37}", 120))
        ]
        for r in range(1, 9):
            feats.append(("exon", r, dna(f"e{r}-{(i * (r + 3)) % 61}", 150)))
            if r < 8:
                feats.append(("intron", r, dna(f"i{r}-{(i * (r + 5)) % 53}", 110)))
        feats.append(("UTR", None, dna(f"u3-{i % 41}", 90)))
        name = f"{locus}*{i // 100 + 1:02d}:{i % 100:02d}"
        recs.append(
            embl_record(f"HLA{10000 + i:05d}", name, feats, translation="M" * 20)
        )
    return recs


def write_synthetic_dat(tmpdir: str, release: str, n: int) -> str:
    path = os.path.join(tmpdir, f"hla.{release}.dat")
    with open(path, "w") as fh:
        for rec in synthetic_allele_records(n):
            fh.write(rec)
            fh.write("\n//\n")
    return path


def write_release_dat(tmpdir: str, release: str) -> str:
    path = os.path.join(tmpdir, f"hla.{release}.dat")
    with open(path, "w") as fh:
        for rec in release_records(release):
            fh.write(rec)
            fh.write("\n//\n")
    return path


# KIR allele names carry no 'HLA-' prefix; locus = name before '*'
ALLELE_KIR = ("KIR00001", "KIR2DL4*0010101")


def write_kir_dat(tmpdir: str) -> str:
    """One-record KIR.dat analog (ref constants.py:37) in the same EMBL
    envelope the HLA .dat uses."""
    rec = embl_record(
        ALLELE_KIR[0],
        ALLELE_KIR[1],
        [("UTR", None, U1), ("exon", 1, E1B), ("intron", 1, I1), ("exon", 2, E2), ("UTR", None, U2)],
        translation="MK",
    )
    path = os.path.join(tmpdir, "KIR.dat")
    with open(path, "w") as fh:
        fh.write(rec)
        fh.write("\n//\n")
    return path


MSF_A_GEN = """!!NA_MULTIPLE_ALIGNMENT

 A_gen.msf MSF: 20 Type: N Check: 0 ..

 Name: A*01:01:01:01 Len: 20 Check: 0 Weight: 1.0
 Name: A*01:02 Len: 20 Check: 0 Weight: 1.0

//

A*01:01:01:01  ACACAAAAGG GGTTTTAGAG
A*01:02        ACACCCCCGG GGTTTTCTCT
"""


def write_msf(tmpdir: str) -> dict[tuple[str, str], str]:
    path = os.path.join(tmpdir, "A_gen.msf")
    with open(path, "w") as fh:
        fh.write(MSF_A_GEN)
    return {("gen", "HLA-A"): path}


ARD_ROWS = [
    ("HLA-A*01:01:01:01", "G", "HLA-A*01:01:01G"),
    ("HLA-A*01:01:01:01", "lg", "HLA-A*01:01lg"),
    ("HLA-A*01:02", "G", "HLA-A*01:02G"),
]


def ard_mapping(spark):
    return spark.createDataFrame(ARD_ROWS, ["hla_name", "ard_name", "ard_id"])
