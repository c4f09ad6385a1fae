"""S1: distributed IMGT/HLA EMBL flat-file source.

The reference parses `hla.<release>.dat` with BioPython's sequential
`SeqIO.parse` (ref app.py:73-83) and loops one allele at a time
(app.py:597). Here the scan is Spark-native and partition-parallel:

  spark.read.text(lineSep="\\n//\\n")   -> one row per EMBL record,
                                           split at record terminators by
                                           the distributed text reader
  .mapInPandas(parse batch)             -> Arrow-batched pure-Python EMBL
                                           parse into typed allele rows

At 100 TB the record-split scan parallelizes across executors (text
splits are per-block; the lineSep record delimiter keeps records whole),
and the parser is CPU-bound per partition with no shuffle.

The parser implements the subset of the EMBL format the reference
consumes: ID, DE, FT (feature table with qualifiers + simple/join
locations), SQ sequence block. Feature-term semantics mirror
`get_features` (ref app.py:127-153):
  - a qualifier-free non-source/CDS feature among the record's first 3
    features is the five_prime_UTR;
  - features with a /number qualifier become `<type>_<number>`;
  - a qualifier-free non-source/CDS feature in last position is the
    three_prime_UTR.
CDS handling mirrors `get_cds` (ref app.py:157-175): bp from the CDS
location extract, aa from the /translation qualifier, null-safe (the
reference's NoneType crash, app.py:351-357, becomes an error-channel row).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gfe_db_spark.schemas import ALLELE_RECORD

_LOC_SPAN = re.compile(r"(\d+)\.\.(\d+)")


_COMPLEMENT = str.maketrans("ACGTUacgtu", "TGCAAtgcaa")


def _extract_location(seq: str, location: str) -> str:
    """Extract a feature subsequence for an EMBL location (1-based
    inclusive coordinates).

    Supported grammar — the subset the reference consumes from IMGT/HLA
    .dat files (ref app.py:127-175, BioPython `extract` semantics):
    `a..b`, `join(a..b,c..d,...)`, and `complement(...)` around either
    (extract the joined spans, then reverse-complement — minus-strand
    features). Anything outside it — partial `<a..>b` spans, spans beyond
    the sequence — raises, which the record parser converts into an
    error-channel row (ref error contract app.py:630-681) instead of a
    silently wrong sequence."""
    if "<" in location or ">" in location:
        raise ValueError(f"unsupported location grammar (partial span): {location!r}")
    loc = location.strip()
    reverse = False
    if loc.startswith("complement(") and loc.endswith(")"):
        reverse = True
        loc = loc[len("complement(") : -1]
    elif "complement" in loc:
        # nested/inner complements (per-span strand mixes) stay unsupported
        raise ValueError(f"unsupported location grammar (inner complement): {location!r}")
    spans = _LOC_SPAN.findall(loc)
    if not spans:
        raise ValueError(f"no coordinate spans in location: {location!r}")
    out = []
    for a, b in spans:
        a_i, b_i = int(a), int(b)
        if a_i < 1 or b_i < a_i or b_i > len(seq):
            raise ValueError(f"span {a_i}..{b_i} outside sequence of length {len(seq)}")
        out.append(seq[a_i - 1 : b_i])
    extracted = "".join(out)
    if reverse:
        return extracted.translate(_COMPLEMENT)[::-1]
    return extracted


def parse_embl_record(block: str) -> dict | None:
    """Parse one EMBL record block into an allele dict (schema
    ALLELE_RECORD). Returns None for empty blocks."""
    allele_id = None
    description_parts: list[str] = []
    seq_lines: list[str] = []
    in_seq = False
    # raw features: list of [type, location, {qualifier: value}]
    raw_feats: list[list] = []

    for line in block.splitlines():
        if not line.strip():
            continue
        tag, rest = line[:2], line[5:] if len(line) > 5 else ""
        if in_seq:
            if line.startswith("//"):
                break
            seq_lines.append(re.sub(r"[^A-Za-z]", "", line))
            continue
        if tag == "ID" and allele_id is None:
            allele_id = rest.split(";")[0].strip()
        elif tag == "DE":
            description_parts.append(rest.strip())
        elif tag == "FT":
            if line[5] not in (" ", ""):  # new feature: type + location
                parts = rest.split(None, 1)
                ftype = parts[0]
                floc = parts[1].strip() if len(parts) > 1 else ""
                raw_feats.append([ftype, floc, {}])
            elif raw_feats:
                q = rest.strip()
                if q.startswith("/"):
                    if "=" in q:
                        key, val = q[1:].split("=", 1)
                        raw_feats[-1][2][key] = val.strip('"')
                        raw_feats[-1].append(key)  # [3] = last open qualifier
                    else:
                        raw_feats[-1][2][q[1:]] = ""
                        raw_feats[-1].append(q[1:])
                else:
                    # continuation of the previous qualifier value or location
                    if len(raw_feats[-1]) > 3:
                        last_key = raw_feats[-1][-1]
                        raw_feats[-1][2][last_key] += q.strip('"')
                    else:
                        raw_feats[-1][1] += q
        elif tag == "SQ":
            in_seq = True

    if allele_id is None:
        return None

    description = " ".join(description_parts)
    sequence = "".join(seq_lines).upper()
    hla_name = description.split(",")[0].strip()
    locus = hla_name.split("*")[0]

    features: list[dict] = []
    cds_bp = None
    cds_aa = None
    parse_error = None
    if not sequence and (raw_feats or description_parts):
        parse_error = "missing or empty SQ sequence block"
        raw_feats = []  # nothing to extract against
    n = len(raw_feats)
    try:
        for i, feat in enumerate(raw_feats):
            ftype, floc, quals = feat[0], feat[1], feat[2]
            if ftype == "source":
                continue
            if ftype == "CDS":
                if "translation" in quals and floc:
                    cds_bp = _extract_location(sequence, floc)
                    cds_aa = quals["translation"].replace(" ", "")
                continue
            if "number" in quals:
                features.append(
                    {
                        "term": ftype,
                        "rank": int(quals["number"]),
                        "sequence": _extract_location(sequence, floc),
                    }
                )
            elif not quals and i < 3:
                features.append(
                    {"term": "five_prime_UTR", "rank": 1, "sequence": _extract_location(sequence, floc)}
                )
            elif not quals and i == n - 1:
                features.append(
                    {"term": "three_prime_UTR", "rank": 1, "sequence": _extract_location(sequence, floc)}
                )
    except Exception as e:  # error side-channel (ref app.py:630-667)
        parse_error = f"feature-parse: {e}"

    return {
        "allele_id": allele_id,
        "hla_name": hla_name,
        "locus": locus,
        "description": description,
        "sequence": sequence,
        "length": len(sequence),
        "features": features,
        "cds_bp": cds_bp,
        "cds_aa": cds_aa,
        "parse_error": parse_error,
    }


def read_imgt_dat(spark: SparkSession, path: str) -> DataFrame:
    """Distributed EMBL scan → typed allele DataFrame (schema ALLELE_RECORD)."""
    from gfe_db_spark.session import ship_package

    ship_package(spark)
    # One row per record: the text reader splits at the record terminator.
    records = spark.read.option("lineSep", "\n//\n").text(path)

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in ALLELE_RECORD.fields]
        for pdf in batches:
            rows = []
            for block in pdf["value"]:
                if block and block.strip():
                    rec = parse_embl_record(block)
                    if rec is not None:
                        rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return records.mapInPandas(parse_batches, schema=ALLELE_RECORD)
