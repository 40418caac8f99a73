"""Pipeline plumbing: snapshot catalog (Iceberg-style), per-partition
lineage, idempotent resume, and the end-to-end runner."""
