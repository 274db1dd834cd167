"""Vectorized JSON column parsing.

The reference stores semi-structured payloads as JSON strings (LLM
responses, ``src/llm/field_extractor.py``; job metadata blobs) and
parses them per record in Python. Here a whole Arrow column of
single-line JSON objects is parsed in ONE C call by framing it as
NDJSON for ``pyarrow.json.read_json`` — no Python-per-row loop in the
hot path. Rows that are null/empty parse as an empty object (all
extracted fields null); a row containing an embedded newline would
break the NDJSON framing, so the batch falls back to a stdlib
``json.loads`` loop (still a C parser per record) for correctness.
"""

from __future__ import annotations

import io
import json

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.json as pj


def parse_json_objects(col: pa.ChunkedArray | pa.Array) -> pa.Table:
    """Parse a string column of single-line JSON objects into a table
    with one column per JSON field (missing fields -> null)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    strs = pc.fill_null(arr, "{}")
    strs = pc.if_else(pc.equal(strs, ""), pa.scalar("{}"), strs)
    has_newline = pc.any(pc.match_substring(strs, "\n")).as_py()
    if not has_newline:
        payload = b"\n".join(s.encode() for s in strs.to_pylist())
        return pj.read_json(io.BytesIO(payload))
    objs = [json.loads(s) for s in strs.to_pylist()]
    keys = sorted({k for o in objs for k in o})
    return pa.table({k: [o.get(k) for o in objs] for k in keys})


def extract_json_field(t: pa.Table, col: str, field: str, out: str,
                       type: pa.DataType | None = None) -> pa.Table:
    """Append ``out`` = JSON field ``field`` extracted from string column
    ``col`` (vectorized NDJSON parse; see ``parse_json_objects``)."""
    parsed = parse_json_objects(t[col])
    if field in parsed.column_names:
        vals = parsed[field].combine_chunks()
        if type is not None:
            vals = vals.cast(type)
    else:
        vals = pa.nulls(t.num_rows, type or pa.int64())
    return t.append_column(out, vals)
