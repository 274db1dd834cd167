"""Metadata-clean parquet reads.

Parquet files written through pandas carry a ``b'pandas'`` schema-metadata
blob (a dict); Ray Data's block-schema deduplication hashes schemas and the
dict metadata defeats the hash, logging a noisy
``Failed to hash the schemas (for deduplication): unhashable type: 'dict'``
warning from every read worker. Passing the file's own schema with
metadata stripped removes the noise (and the wasted unify work) without
changing a single value — the schema is read from the first file's footer
(one tiny metadata read, no data I/O).
"""

from __future__ import annotations

import glob
import os


def read_parquet_clean(paths, columns: list[str] | None = None, **kwargs):
    """``ray.data.read_parquet`` with the footer schema passed explicitly,
    metadata stripped (see module docstring). ``paths`` may be a file, a
    directory, or a list of files."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    first = paths
    if isinstance(paths, (list, tuple)):
        first = paths[0]
    if os.path.isdir(first):
        first = sorted(glob.glob(os.path.join(first, "*.parquet")))[0]
    schema = pq.read_schema(first).remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    return rd.read_parquet(paths, columns=columns, schema=schema, **kwargs)
