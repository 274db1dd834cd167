"""One-command data-audit report — the round-5 evaluation layer in a
single composed run over the TPC-H-ish test tables: the report a data
platform publishes about a corpus before it feeds training or billing.

    orders  -> Benford digit screen, exact Gini + Theil (with the
               between-priority component), per-priority power sums
               and the pairwise Welch t matrix, Pareto/ABC classes
    documents -> NB quality-score calibration bins, per-source
               Jensen-Shannon drift
    events  -> week-over-week trend per type

Every number printed here is the same exact-integer statistic the
DuckDB oracles pin (tools/check_correctness.py) — this script is the
human-readable view of that layer.

Run:  python examples/audit_report.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import logging

    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entry

    q = entry.queries()

    def run(name):
        r = q[name](sf_dir)
        return r.to_pandas() if hasattr(r, "to_pandas") else r

    print(f"== data audit over {sf_dir} ==\n")

    g = run("order_gini").iloc[0]
    t = run("order_theil").iloc[0]
    print("orders / o_totalprice concentration:")
    print(f"  gini          {int(g['gini_micro']) / 1e6:.6f}"
          f"   (n={int(g['n'])})")
    print(f"  theil T       {int(t['theil_pico']) / 1e12:.6f}"
          f"   between-priority share "
          f"{int(t['between_pico']) / max(int(t['theil_pico']), 1):.4f}")

    abc = run("customer_abc")
    counts = abc["abc"].value_counts()
    print("  pareto/ABC    " + "  ".join(
        f"{k}:{counts.get(k, 0)}" for k in ("A", "B", "C"))
        + f"  (customers={len(abc)})")

    ben = run("price_benford")
    worst = ben.iloc[ben["delta_micro"].abs().idxmax()]
    print(f"  benford       worst digit {int(worst['digit'])}: "
          f"observed {int(worst['observed_micro']) / 1e4:.2f}% vs "
          f"expected {int(worst['expected_micro']) / 1e4:.2f}%\n")

    w = run("priority_welch_t")
    w = w.dropna(subset=["t_micro"])
    top = w.iloc[w["t_micro"].abs().astype("int64").idxmax()]
    print("orders / priority cohorts:")
    print(f"  strongest Welch contrast {top['key_a']} vs {top['key_b']}:"
          f" t={int(top['t_micro']) / 1e6:.3f}"
          f" (df~{int(top['df_micro']) / 1e6:.0f})\n")

    cal = run("nb_calibration")
    mono = bool(cal["pos_rate_micro"].is_monotonic_increasing)
    print("documents / NB quality score:")
    print(f"  calibration   {len(cal)} bins, positive-rate "
          f"monotone: {mono}")
    js = run("source_js_divergence").sort_values("js_pico",
                                                 ascending=False)
    hd = js.iloc[0]
    print(f"  JS drift      most divergent source {hd['source']}: "
          f"{int(hd['js_pico']) / 1e12:.6f} nats "
          f"(corpus median {int(js['js_pico'].median()) / 1e12:.6f})\n")

    wow = run("event_type_wow").dropna(subset=["wow_micro"])
    mv = wow.iloc[wow["wow_micro"].abs().idxmax()]
    print("events / weekly trend:")
    print(f"  largest WoW move: {mv['event_type']} week "
          f"{int(mv['week'])}: {float(mv['wow_micro']) / 1e4:+.2f}%")

    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
