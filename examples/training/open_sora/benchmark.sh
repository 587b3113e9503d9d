#!/usr/bin/env bash
# DCP benchmark recipe (reference examples/training/open_sora/benchmark.sh):
# runs the four legs; compare steps/s from the logged history. The
# in-process measured comparison (pad-to-max vs bucketed vs DCP, one JSON)
# is `python experiments/dcp_throughput.py` -> docs/dcp_throughput.json.
set -e
cd "$(dirname "$0")"
for leg in baseline dcp_intra dcp_inter dcp_inter_ckpt; do
  echo "== $leg"
  python train.py --config "configs/benchmarks/$leg.yaml" "$@"
done
