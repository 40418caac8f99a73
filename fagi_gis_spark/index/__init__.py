"""Hierarchical spatial cell indexes (from scratch — no h3/s2 libraries).

Two schemes, mirroring the north rule's "H3 res 7-11 / S2" cell columns:

* ``tiles`` — WebMercator z/x/y quadtree cells (res 7..11). The primary
  index: pure JVM column expressions (whole-stage codegen, no Python), so
  cell encode survives 100 TB scans; also doubles as the z/x/y tile
  assignment for the raster<->vector tiling sink.
* ``cells`` — Morton (bit-interleave) lat/lon grid cells, an S2-like
  space-filling-curve id, used as the secondary/locality index.

The reference's GiST spatial index + CLUSTER physical ordering
(/root/reference/fagi-gis/src/main/resources/schema.sql:38-39,66-67) maps
to: cell-id columns + partition/bucket by cell + sort within partitions.
"""
