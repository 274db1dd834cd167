"""The library path end-to-end — the Ray restatement of the reference's
notebook flow (/root/reference/notebooks/credit_ocr_pipeline.ipynb, cells
10-17: analyze -> flatten -> normalize -> extract -> visualize -> report):

    synthesize pages -> run the extraction pipeline -> explode the
    per-field long table -> write the tabular report (a REAL .xlsx via
    the stdlib zip-of-XML sink, sinks/xlsx.py) -> render one annotated
    page raster (PNG).

Run:  python examples/quickstart.py [n_pages] [out_dir]
"""

from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/quickstart"

    import logging

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pyarrow as pa
    import ray.data as rd

    from credit_ocr_backend_ray.pipelines.extraction import run_extraction
    from credit_ocr_backend_ray.sources.synth import synthesize_pages
    from credit_ocr_backend_ray.stages.multimodal import PageRenderer

    # 1. input corpus (deterministic synthetic Common-Crawl-style pages)
    inp = synthesize_pages(n_pages)

    # 2. the full extraction pipeline (resumable shard groups + lineage)
    summary = run_extraction(inp, out_dir, n_groups=1)
    print(f"extracted {summary['rows']} pages "
          f"({summary['completed_docs_per_s']} docs/s)")

    out_files = sorted(glob.glob(os.path.join(out_dir, "group-*",
                                              "*.parquet")))
    ds = rd.read_parquet(out_files)

    # 3. relational long form: one row per extracted field (the
    # ExtrahierteDaten analogue) -> tabular report
    def explode(t: pa.Table) -> pa.Table:
        urls, names, values, confs = [], [], [], []
        for url, fields in zip(t["url"].to_pylist(),
                               t["fields"].to_pylist()):
            for f in fields or []:
                urls.append(url)
                names.append(f["name"])
                values.append(f["value"])
                confs.append(f["confidence"])
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "field": pa.array(names, pa.string()),
            "value": pa.array(values, pa.string()),
            "confidence": pa.array(confs, pa.float64()),
        })

    report = (ds.select_columns(["url", "fields"])
                .map_batches(explode, batch_format="pyarrow").to_pandas()
                .sort_values(["url", "field"]))
    report_path = os.path.join(out_dir, "fields_report.csv")
    report.to_csv(report_path, index=False)
    print(f"report: {report_path} ({len(report)} field rows)")

    # the reference's Excel export (notebook cell 17) — a real .xlsx via
    # the stdlib zip-of-XML sink (no openpyxl in this environment)
    from credit_ocr_backend_ray.sinks.xlsx import write_xlsx
    xlsx_path = os.path.join(out_dir, "fields_report.xlsx")
    write_xlsx(report, xlsx_path, sheet_name="Fields")
    print(f"report: {xlsx_path}")

    # 4. one annotated page raster (the ANNOTATED stage artifact)
    one = rd.read_parquet(out_files, columns=["url", "fields"]).limit(8)
    imgs = one.map_batches(PageRenderer, batch_format="pyarrow",
                           batch_size=8, concurrency=1).take_all()
    png_path = os.path.join(out_dir, "annotated_page1.png")
    with open(png_path, "wb") as f:
        f.write(imgs[0]["annotation"])  # real PNG (stdlib-zlib codec)
    print(f"annotation: {png_path} ({len(imgs[0]['annotation'])} bytes)")

    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
