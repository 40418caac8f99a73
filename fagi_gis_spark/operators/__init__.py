"""Operators: the FAGI operator inventory (SURVEY.md §2) as DataFrame
pipelines — fusion transformations, precedence dedup, spatial joins,
link discovery, metadata fusion, clustering, tiling."""
