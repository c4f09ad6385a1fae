"""Thin re-export: fixtures live in the package so rows-only demo queries
(queries/graph.py gfe_end_to_end) can generate them too."""

from gfe_db_spark.testing_fixtures import *  # noqa: F401,F403
from gfe_db_spark.testing_fixtures import (  # noqa: F401
    ALLELE_A1, ALLELE_A2, ALLELE_A3, ALLELE_B1, ALLELE_D1, ALLELE_KIR,
    ALLELE_SHORT, ALLELE_SKIP, ARD_ROWS, E1, E1B, E2, I1, I1C, U1, U2, U2B,
    ard_mapping, embl_record, release_records, write_kir_dat, write_msf,
    write_release_dat,
)
