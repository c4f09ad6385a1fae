"""Sources: parquet star-schema loader, IMGT/EMBL flat-file parser, MSF
alignment parser, CSV compatibility readers (reference operators S1-S13)."""
