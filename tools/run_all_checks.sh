#!/usr/bin/env bash
# Everything the engine claims, in one command (~10 min):
#   unit/differential/property tests, the DuckDB oracle gate at two
#   scales, fault-tolerance probes, and the headline bench.
set -e
cd "$(dirname "$0")/.."
echo "== pytest =="
python -m pytest tests/ -q
echo "== oracle gate sf0.01 =="
python tools/check_correctness.py /root/testdata/sf0.01 | tail -1
echo "== oracle gate sf0.1 =="
python tools/check_correctness.py /root/testdata/sf0.1 | tail -1
echo "== actor-kill probe =="
python tools/chaos_probe.py 20000
echo "== driver-kill resume probe =="
python tools/resume_probe.py 20000
echo "== headline bench (32 cpus, sf0.1) =="
python bench.py
