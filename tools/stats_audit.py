"""Per-operator wall-time audit of a registered query: runs
``queries()[name](sf_dir)``, consumes the plan, and prints the trimmed
``Dataset.stats()`` operator table — the "wall-time dominated by useful
compute?" check. Usage:

    python tools/stats_audit.py <query> [sf_dir]
"""

from __future__ import annotations

import logging
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import ray
    ray.init(address="local", num_cpus=int(os.environ.get(
        "RAY_GRAFT_CPUS", "32")), include_dashboard=False,
        logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as e
    import ray.data as rd

    res = e.queries()[name](sf_dir)
    if not isinstance(res, rd.Dataset):
        print(f"{name}: driver-side result ({type(res).__name__}), "
              "no dataset stats")
        ray.shutdown()
        return 0
    res = res.materialize()
    stats = res.stats()
    # keep the operator headline lines; drop the per-block histograms
    keep = re.compile(
        r"^(Operator |\* Remote wall time|\* Output rows per task|"
        r"Dataset throughput|\s+\* Total time)")
    for line in stats.splitlines():
        if keep.match(line):
            print(line.rstrip())
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
