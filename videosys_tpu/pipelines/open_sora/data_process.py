"""Resolution / aspect-ratio / frame-count resolution for Open-Sora.

The numeric bucket tables are extracted verbatim (as data) from the
reference's `videosys/pipelines/open_sora/data_process.py:39-497` into
`resolution_data.json` — they are model constants required for output parity,
like checkpoint hyperparameters.
"""

from __future__ import annotations

import json
import pathlib
import re

_DATA = json.loads(
    (pathlib.Path(__file__).parent / "resolution_data.json").read_text()
)
ASPECT_RATIO_MAP: dict = _DATA["ASPECT_RATIO_MAP"]
NUM_FRAMES_MAP: dict = _DATA["NUM_FRAMES_MAP"]
RESOLUTIONS: dict = _DATA["RESOLUTIONS"]


def get_image_size(resolution: str, aspect_ratio: str) -> tuple[int, int]:
    """(height, width) for a named resolution/AR bucket (data_process.py:474-478)."""
    ar_key = ASPECT_RATIO_MAP[aspect_ratio]
    table = RESOLUTIONS[resolution]["table"]
    if ar_key not in table:
        raise ValueError(f"aspect ratio {aspect_ratio} not found for {resolution}")
    h, w = table[ar_key]
    return int(h), int(w)


def get_num_frames(num_frames) -> int:
    """'2s'/'4x' style names or raw ints (data_process.py:495-498)."""
    if isinstance(num_frames, str) and num_frames in NUM_FRAMES_MAP:
        return int(NUM_FRAMES_MAP[num_frames])
    return int(num_frames)


_WHITESPACE_RE = re.compile(r"\s+")


def text_preprocessing(text: str) -> str:
    """Light prompt cleaning. The reference's `_clean_caption`
    (pipeline_open_sora.py:304-415) scrubs URLs/HTML/unicode artifacts with
    ftfy+bs4; those dependencies are optional here and the heavy cleaning is
    applied when available."""
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    try:
        import html

        text = html.unescape(html.unescape(text))
    except Exception:
        pass
    text = _WHITESPACE_RE.sub(" ", text).strip().lower()
    return text


def append_score_to_prompts(prompts, aes=None, flow=None, camera_motion=None):
    """Score-token suffixes Open-Sora was trained with (data_process.py
    equivalent of append_score_to_prompts in the reference pipeline)."""
    new_prompts = []
    for prompt in prompts:
        new_prompt = prompt
        if aes is not None and "aesthetic score:" not in prompt:
            new_prompt = f"{new_prompt} aesthetic score: {aes:.1f}."
        if flow is not None and "motion score:" not in prompt:
            new_prompt = f"{new_prompt} motion score: {flow:.1f}."
        if camera_motion is not None and "camera motion:" not in prompt:
            new_prompt = f"{new_prompt} camera motion: {camera_motion}."
        new_prompts.append(new_prompt)
    return new_prompts


def refine_prompt(prompt: str, model: str = "gpt-4o",
                  example_path: str = None) -> str:
    """Optional OpenAI prompt refinement (pipeline_open_sora.py:897-959).
    Needs the `openai` package and OPENAI_API_KEY; raises a clear error when
    unavailable (offline images) instead of failing mid-generate."""
    try:
        from openai import OpenAI
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "Prompt refinement needs the `openai` package and an API key; "
            "pass the raw prompt or install openai.") from e
    sys_prompt = (
        "You need to refine user's input prompt. The user's input prompt is "
        "used for video generation task. You need to refine the user's "
        "prompt to make it more suitable for the task. The refined prompt "
        "should pay attention to all objects in the video. The description "
        "should be useful for AI to re-generate the video. The description "
        "should be no more than six sentences. The refined prompt should be "
        "in English.")
    client = OpenAI()
    out = client.chat.completions.create(
        model=model,
        messages=[{"role": "system", "content": sys_prompt},
                  {"role": "user", "content": prompt}],
        temperature=0.01, max_tokens=250)
    return out.choices[0].message.content


def add_watermark(video_path: str, watermark_path: str,
                  output_path: str = None) -> str:
    """Watermark overlay (pipeline_open_sora.py:962-972 shells out to
    ffmpeg). Uses the ffmpeg binary when present; raises clearly otherwise."""
    import shutil
    import subprocess

    if shutil.which("ffmpeg") is None:  # pragma: no cover
        raise RuntimeError("watermarking needs the ffmpeg binary on PATH")
    output_path = output_path or video_path.replace(".mp4", "_watermarked.mp4")
    cmd = ["ffmpeg", "-y", "-i", video_path, "-i", watermark_path,
           "-filter_complex", "[1][0]scale2ref=oh*mdar:ih*0.1[logo][video];"
           "[video][logo]overlay", output_path]
    subprocess.run(cmd, check=True, capture_output=True)
    return output_path
