from credit_ocr_backend_ray.sources.synth import (  # noqa: F401
    INPUT_SCHEMA, page_row, rows_for_sf, synthesize_pages, pages_parquet_path,
)
