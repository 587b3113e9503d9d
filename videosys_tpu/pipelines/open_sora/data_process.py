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
