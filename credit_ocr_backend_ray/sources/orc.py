"""ORC source/sink for Ray Data (which ships no ``read_orc``): one task
per file in both directions, pyarrow's ORC codec doing the actual
(de)serialization — zero-copy Arrow in and out.

- ``write_orc``: one ``.orc`` file per input block (a distributed sink:
  each map task serializes its own block; file names carry the block's
  content hash, so re-running the same write is idempotent — the
  resumable-output contract of the parquet sinks).
- ``read_orc``: ``read_binary_files`` (one task per file) + in-task
  ``pyarrow.orc`` decode of the buffered bytes.
"""

from __future__ import annotations

import glob
import hashlib
import os


def write_orc(ds, path: str) -> int:
    """Write the dataset as one ORC file per block; returns file count."""
    import pyarrow as pa
    import pyarrow.orc as orc

    os.makedirs(path, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"path": pa.array([], pa.string())})
        # content-hash file name: deterministic + idempotent re-writes
        h = hashlib.sha256()
        for col in t.column_names:
            for chunk in t[col].chunks:
                for buf in chunk.buffers():
                    if buf is not None:
                        h.update(buf)
        out = os.path.join(path, f"block-{h.hexdigest()[:16]}.orc")
        orc.write_table(t, out)
        return pa.table({"path": pa.array([out], pa.string())})

    written = ds.map_batches(dump, batch_size=None,
                             batch_format="pyarrow").to_pandas()
    return len(written)


def read_orc(paths: list[str] | str):
    """ORC files/dir -> Dataset (one read task per file)."""
    import pyarrow as pa
    import ray.data as rd

    if isinstance(paths, str) and os.path.isdir(paths):
        paths = sorted(glob.glob(os.path.join(paths, "*.orc")))
    ds = rd.read_binary_files(paths)

    def decode(t: pa.Table) -> pa.Table:
        import pyarrow.orc as orc
        tables = [orc.ORCFile(pa.BufferReader(b)).read()
                  for b in t["bytes"].to_pylist()]
        return pa.concat_tables(tables) if tables else pa.table({})

    return ds.map_batches(decode, batch_format="pyarrow")
