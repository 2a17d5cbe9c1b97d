"""Metadata-clean parquet reads.

The driver-generated testdata parquet (and any store written through a
pandas detour) carries a ``pandas`` schema-metadata blob. pyarrow fails
to hash a schema whose metadata holds that blob (``unhashable type:
'dict'``), which defeats Ray Data's block-schema deduplication
(``set(schemas)`` in ``transform_pyarrow.unify_schemas``): every
unification walks all block schemas and the worker log fills with
"Failed to hash the schemas" warnings. Stripping the metadata at the
read restores the dedup fast path; the metadata carries nothing the
engine uses (all readers are Arrow-native, never pandas round-trips).
"""

from __future__ import annotations

import os


def read_parquet_clean(path, columns=None, **kwargs):
    """``ray.data.read_parquet`` with the file-level schema metadata
    stripped (see module doc). Single-file or uniform-schema file lists
    only — a hive-partitioned DIRECTORY read falls through untouched,
    because passing the first file's schema would drop the partition
    columns that live in the paths, not the files."""
    import pyarrow.parquet as pq
    import ray.data as rd

    first = path[0] if isinstance(path, (list, tuple)) else path
    if os.path.isdir(first):
        return rd.read_parquet(path, columns=columns, **kwargs)
    try:
        schema = pq.read_schema(first)
    except Exception:
        return rd.read_parquet(path, columns=columns, **kwargs)
    if schema.metadata:
        schema = schema.remove_metadata()
        if columns:
            # project to the selected columns: Ray applies the provided
            # schema to the POST-projection fragments, so a full-file
            # schema with a column subset trips an ArrowInvalid cast
            import pyarrow as pa

            schema = pa.schema([schema.field(c) for c in columns])
        kwargs["schema"] = schema
    return rd.read_parquet(path, columns=columns, **kwargs)
