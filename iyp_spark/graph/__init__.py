"""Query surface + graph algorithms over the materialized triples table."""
