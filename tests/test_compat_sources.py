"""CSV/NDJSON compatibility surface (SURVEY §2.1 S4-S8): round-trip the
build extracts through the reference's file formats and validate them the
way the reference's validation lambda does."""

from __future__ import annotations

import pytest

from gfe_db_spark.plans.accession import AccessionRegistry
from gfe_db_spark.plans.build import build_release
from gfe_db_spark.sources.compat import (
    list_artifacts,
    read_csv_all_string,
    read_csv_extract,
    validate_artifacts,
    write_csv_extract,
    write_error_ndjson,
)
from gfe_db_spark.sources.imgt import read_imgt_dat
from tests import gfe_fixtures as fx


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("compat")
    dat = fx.write_release_dat(str(root), "3550")
    registry = AccessionRegistry(spark, str(root / "registry"))
    return build_release(spark, read_imgt_dat(spark, dat), "3550", registry)


def test_csv_extract_roundtrip(spark, built, tmp_path):
    out = str(tmp_path / "csv")
    path = write_csv_extract(built.gfe_sequences, out, "gfe_sequences", "3550")
    assert path.endswith("gfe_sequences.3550.csv")

    # S5: contract-schema read preserves rows and columns
    back = read_csv_extract(spark, path, "gfe_sequences")
    assert back.count() == built.gfe_sequences.count()
    assert set(back.columns) == set(built.gfe_sequences.columns)

    # S6: all-string read — every dtype is string, same shape
    raw = read_csv_all_string(spark, path)
    assert all(t == "string" for _, t in raw.dtypes)
    assert raw.count() == back.count()


def test_validate_artifacts_gate(spark, built, tmp_path):
    out = str(tmp_path / "csv")
    for name in ("gfe_sequences", "all_features", "all_groups", "all_cds"):
        write_csv_extract(getattr(built, name), out, name, "3550")
    # all_alignments deliberately missing → is_valid_build must be False
    report = validate_artifacts(spark, out, "3550")
    rows = {r["filename"]: r for r in report.collect()}
    assert rows["gfe_sequences.3550.csv"]["is_valid_csv"]
    assert not rows["all_alignments.3550.csv"]["file_exists"]
    assert not all(r["is_valid_csv"] for r in rows.values())

    listing = list_artifacts(spark, out)
    assert listing.count() == 4


def test_error_ndjson_ledger(spark, built, tmp_path):
    path, n = write_error_ndjson(built.errors, str(tmp_path), "3550")
    assert path.endswith("errors.3550.ndjson")
    assert n == built.errors.count()  # tiny fixture: under the cap
    back = spark.read.json(path)
    if n:
        assert back.count() == n
