"""Plans: the build (ETL) path, the graph load (MERGE) path, the accession
registry, and the query/validation surface."""
