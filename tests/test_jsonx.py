"""Vectorized JSON column parsing (functions/jsonx.py): the NDJSON-framed
single-C-call fast path, null/empty handling, missing fields, and the
embedded-newline fallback."""

import pyarrow as pa


def test_parse_json_objects_fast_path():
    from credit_ocr_backend_ray.functions.jsonx import parse_json_objects

    col = pa.array(['{"k": 1, "s": "x"}', '{"k": 2}', None, ""])
    t = parse_json_objects(col)
    assert t["k"].to_pylist() == [1, 2, None, None]
    assert t["s"].to_pylist() == ["x", None, None, None]


def test_parse_json_objects_newline_fallback():
    from credit_ocr_backend_ray.functions.jsonx import parse_json_objects

    col = pa.array(['{"k":\n 5}', '{"k": 6}'])
    t = parse_json_objects(col)
    assert t["k"].to_pylist() == [5, 6]


def test_extract_json_field_typed_and_missing():
    from credit_ocr_backend_ray.functions.jsonx import extract_json_field

    t = pa.table({"props": ['{"k": 7}', '{"other": 1}']})
    out = extract_json_field(t, "props", "k", "k", pa.int64())
    assert out["k"].to_pylist() == [7, None]
    assert out["k"].type == pa.int64()
    # a field present in NO row still yields a typed all-null column
    out2 = extract_json_field(t, "props", "absent", "a", pa.int64())
    assert out2["a"].to_pylist() == [None, None]
