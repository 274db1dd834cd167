"""Arrow IPC (Feather v2) source/sink for Ray Data (which ships no
``read_feather``): one task per file in both directions, pyarrow's IPC
file codec doing the (de)serialization — zero-copy Arrow in and out.
IPC is the interchange format of the Arrow ecosystem (pandas
``to_feather``, polars ``write_ipc``, DuckDB ``COPY ... (FORMAT ...)``
pipelines), so this closes the "my upstream hands me .arrow files"
ingestion path next to the CSV / JSONL / ORC / WARC siblings.

- ``write_ipc``: one ``.arrow`` file per input block (distributed sink:
  each map task serializes its own block; file names carry the block's
  content hash, so re-running the same write is idempotent — the
  resumable-output contract of the parquet/ORC sinks).
- ``read_ipc``: ``read_binary_files`` (one task per file) + in-task
  ``pyarrow.ipc`` decode of the buffered bytes. Files are the
  parallelism unit — a single giant file reads in one task; shard
  uploads into many files (as ``write_ipc`` does) for a parallel read.
"""

from __future__ import annotations

import glob
import hashlib
import os


def write_ipc(ds, path: str) -> int:
    """Write the dataset as one IPC file per block; returns file count."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    os.makedirs(path, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"path": pa.array([], pa.string())})
        h = hashlib.sha256()
        for col in t.column_names:
            for chunk in t[col].chunks:
                for buf in chunk.buffers():
                    if buf is not None:
                        h.update(buf)
        out = os.path.join(path, f"block-{h.hexdigest()[:16]}.arrow")
        with ipc.new_file(out, t.schema) as w:
            w.write_table(t)
        return pa.table({"path": pa.array([out], pa.string())})

    written = ds.map_batches(dump, batch_size=None,
                             batch_format="pyarrow").to_pandas()
    return len(written)


def read_ipc(paths: list[str] | str):
    """IPC files/dir -> Dataset (one read task per file)."""
    import pyarrow as pa
    import ray.data as rd

    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(glob.glob(os.path.join(paths, "*.arrow")))
    ds = rd.read_binary_files(paths)

    def decode(t: pa.Table) -> pa.Table:
        import pyarrow.ipc as ipc
        tables = [ipc.open_file(pa.BufferReader(b)).read_all()
                  for b in t["bytes"].to_pylist()]
        return pa.concat_tables(tables) if tables else pa.table({})

    return ds.map_batches(decode, batch_format="pyarrow")
