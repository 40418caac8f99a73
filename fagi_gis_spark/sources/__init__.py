"""Sources: deterministic derived layers + the input_hint images table.

``layers`` derives the FAGI data model (poi_a / poi_b / links / triples)
from the driver's parquet tables with pure-integer arithmetic that is
expressible identically in Spark SQL and DuckDB SQL — that shared
derivation is what lets the driver's DuckDB oracle replay every operator.

``images`` synthesizes the BASELINE.json ``input_hint`` table
(image_id, bytes, w, h, fmt, caption, phash) with real PNG payloads
(stdlib zlib encoder) for the PSNR/caption invariants.
"""
