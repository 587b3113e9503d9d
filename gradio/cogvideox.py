"""Gradio demo: CogVideoX with/without PAB side by side.

Mirrors the reference `gradio/cogvideox.py` (~300 LoC): two engines sharing
weights, a prompt box, per-run latency readout. Requires the `gradio` wheel
(`pip install gradio`); this offline image does not carry it, so the module
raises a clear error at launch time while staying importable.
"""

from __future__ import annotations

import os
import sys
import time

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from videosys_tpu import CogVideoXConfig, VideoSysEngine  # noqa: E402


def build_engines(model_path: str = "THUDM/CogVideoX-2b"):
    dense = VideoSysEngine(CogVideoXConfig(model_path=model_path))
    pab = VideoSysEngine(CogVideoXConfig(model_path=model_path, enable_pab=True),
                         params=dense.driver_worker.params)
    return dense, pab


def generate_pair(dense, pab, prompt: str, steps: int = 50, seed: int = 0,
                  outdir: str = "./outputs"):
    results = {}
    for name, engine in (("dense", dense), ("pab", pab)):
        t0 = time.perf_counter()
        video = engine.generate(prompt, num_inference_steps=steps,
                                seed=seed).video[0]
        dt = time.perf_counter() - t0
        path = engine.save_video(video, os.path.join(outdir, f"{name}-{seed}"))
        results[name] = (path, dt)
    return results


def main():
    try:
        import gradio as gr
    except ImportError as e:
        raise SystemExit(
            "The gradio demo needs the `gradio` package (pip install gradio); "
            "it is not part of this offline image.") from e

    dense, pab = build_engines()

    def run(prompt, steps, seed):
        res = generate_pair(dense, pab, prompt, int(steps), int(seed))
        (p_dense, t_dense), (p_pab, t_pab) = res["dense"], res["pab"]
        return (p_dense, f"{t_dense:.1f}s", p_pab,
                f"{t_pab:.1f}s ({t_dense / t_pab:.2f}x)")

    with gr.Blocks(title="VideoSys-TPU: CogVideoX +/- PAB") as demo:
        prompt = gr.Textbox(label="Prompt", value="Sunset over the sea.")
        steps = gr.Slider(10, 100, value=50, step=1, label="Steps")
        seed = gr.Number(value=0, label="Seed")
        btn = gr.Button("Generate")
        with gr.Row():
            v1 = gr.Video(label="Dense")
            t1 = gr.Textbox(label="Dense latency")
            v2 = gr.Video(label="PAB")
            t2 = gr.Textbox(label="PAB latency")
        btn.click(run, [prompt, steps, seed], [v1, t1, v2, t2])
    demo.launch()


if __name__ == "__main__":
    main()
