"""EMBL parser envelope: the supported grammar is exactly what the
reference consumes (ID/DE/FT simple+join locations/SQ, /number and
/translation qualifiers — ref app.py:127-175). Everything outside the
envelope must land in the error channel (parse_error → BuildTables.errors,
the ref error contract app.py:630-681), never in a silently wrong row."""

from __future__ import annotations

from gfe_db_spark.sources.imgt import parse_embl_record


def _record(ft_lines: list[str], seq: str = "ACGTACGTACGT", head: str | None = None) -> str:
    lines = [
        head or "ID   HLA99999; SV 1; standard; DNA; HUM; 12 BP.",
        "DE   HLA-A*77:77, Human MHC sequence",
        *ft_lines,
    ]
    if seq is not None:
        lines.append(f"SQ   Sequence {len(seq)} BP;")
        lines.append(f"     {seq.lower()}")
    return "\n".join(lines)


def test_join_location_multi_span():
    rec = parse_embl_record(
        _record(
            [
                "FT   CDS             join(1..4,9..12)",
                'FT                   /translation="MK"',
                "FT   exon            1..4",
                'FT                   /number="1"',
            ]
        )
    )
    assert rec["parse_error"] is None
    assert rec["cds_bp"] == "ACGT" + "ACGT"
    assert rec["features"][0]["sequence"] == "ACGT"


def test_multiline_qualifier_value_concatenates():
    rec = parse_embl_record(
        _record(
            [
                "FT   CDS             1..12",
                'FT                   /translation="MKVW',
                'FT                   TQRS"',
            ]
        )
    )
    assert rec["parse_error"] is None
    assert rec["cds_aa"] == "MKVWTQRS"


def test_complement_location_reverse_complements():
    # seq starts ACGT → complement(1..4) extracts revcomp = ACGT;
    # use 1..6 (ACGTAC) → revcomp GTACGT to make direction observable
    rec = parse_embl_record(
        _record(
            [
                "FT   exon            complement(1..6)",
                'FT                   /number="1"',
            ]
        )
    )
    assert rec["parse_error"] is None
    assert rec["features"][0]["sequence"] == "GTACGT"


def test_inner_complement_goes_to_error_channel():
    rec = parse_embl_record(
        _record(
            [
                "FT   exon            join(1..4,complement(9..12))",
                'FT                   /number="1"',
            ]
        )
    )
    assert rec["parse_error"] is not None
    assert "complement" in rec["parse_error"]


def test_partial_span_goes_to_error_channel():
    rec = parse_embl_record(
        _record(["FT   exon            <1..12", 'FT                   /number="1"'])
    )
    assert rec["parse_error"] is not None
    assert "partial" in rec["parse_error"]


def test_out_of_bounds_span_goes_to_error_channel():
    rec = parse_embl_record(
        _record(["FT   exon            1..999", 'FT                   /number="1"'])
    )
    assert rec["parse_error"] is not None
    assert "outside sequence" in rec["parse_error"]


def test_missing_sq_block_goes_to_error_channel():
    block = _record(
        ["FT   exon            1..4", 'FT                   /number="1"'], seq=None
    )
    rec = parse_embl_record(block)
    assert rec["parse_error"] is not None
    assert "SQ" in rec["parse_error"]


def test_unknown_line_tags_ignored():
    rec = parse_embl_record(
        "\n".join(
            [
                "ID   HLA99999; SV 1; standard; DNA; HUM; 12 BP.",
                "XX",
                "AC   HLA99999;",
                "DE   HLA-A*77:77, Human MHC sequence",
                "KW   kw1; kw2.",
                "FT   exon            1..4",
                'FT                   /number="1"',
                "SQ   Sequence 12 BP;",
                "     acgtacgtacgt",
            ]
        )
    )
    assert rec["parse_error"] is None
    assert rec["features"][0]["sequence"] == "ACGT"


def test_errors_surface_in_build_errors_table(spark, tmp_path):
    """End-to-end: a malformed record flows into BuildTables.errors (the
    exit-code-2 analog) while good records still build."""
    from gfe_db_spark.plans.accession import AccessionRegistry
    from gfe_db_spark.plans.build import build_release
    from gfe_db_spark.sources.imgt import read_imgt_dat
    from gfe_db_spark.testing_fixtures import release_records

    bad = _record(
        ["FT   exon            <1..12", 'FT                   /number="1"']
    )
    dat = tmp_path / "hla.3550.dat"
    dat.write_text("\n//\n".join([*release_records("3550"), bad]) + "\n//\n")

    alleles = read_imgt_dat(spark, str(dat))
    built = build_release(
        spark, alleles, "3550", AccessionRegistry(spark, str(tmp_path / "reg"))
    )
    errs = [(r["hla_name"], r["error"]) for r in built.errors.collect()]
    assert any(name == "HLA-A*77:77" and "partial" in err for name, err in errs)
    # the errored allele is NOT half-built as a GFE…
    assert built.gfe_sequences.filter("hla_name = 'HLA-A*77:77'").count() == 0
    # …and good alleles still build
    assert built.gfe_sequences.filter("hla_name = 'HLA-A*01:01:01:01'").count() == 1
