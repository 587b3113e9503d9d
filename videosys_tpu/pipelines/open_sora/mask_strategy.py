"""Open-Sora condition-frame masking + looped generation helpers.

Behavioral reference: `videosys/pipelines/open_sora/pipeline_open_sora.py`
(MASK_DEFAULT/parse_mask_strategy :797-816, find_nearest_point :819-823,
apply_mask_strategy :826-855, append_generated :858-873, dframe_to_frame
:876-878, collect_references_batch — VAE-encode reference images/videos).

A mask strategy string is `;`-separated groups of up to six `,`-separated
fields `loop_id, ref_id, ref_start, target_start, length, edit_ratio`
(defaults "0,0,0,0,1,0"): write `length` latent frames of reference `ref_id`
into the target starting at `target_start`, and denoise them only for the
first `edit_ratio` fraction of the schedule (0 = keep frozen).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

MASK_DEFAULT = ["0", "0", "0", "0", "1", "0"]


def parse_mask_strategy(mask_strategy: Optional[str]) -> List[list]:
    """(:800-816)."""
    out: List[list] = []
    if not mask_strategy:
        return out
    for mask in mask_strategy.split(";"):
        group = mask.split(",")
        assert 1 <= len(group) <= 6, f"Invalid mask strategy: {mask}"
        group = group + MASK_DEFAULT[len(group):]
        out.append([int(g) for g in group[:5]] + [float(group[5])])
    return out


def find_nearest_point(value: int, point: int, max_value: int) -> int:
    """(:819-823): snap to the nearest multiple of `point`."""
    t = value // point
    if value % point > point / 2 and t < max_value // point - 1:
        t += 1
    return t * point


def apply_mask_strategy(
    z: np.ndarray,
    refs: Sequence[Optional[Sequence[np.ndarray]]],
    mask_strategies: Sequence[Optional[str]],
    loop_i: int,
    align: Optional[int] = None,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Write reference latents into z and build the per-frame edit mask
    (:826-855). z: [B, C, T, h, w]; each ref: [C, T_ref, h, w].
    Returns (z, mask [B, T] float) — mask None when no strategy applies."""
    z = np.array(z)
    masks = []
    any_mask = False
    for i, strategy in enumerate(mask_strategies):
        mask = np.ones((z.shape[2],), np.float32)
        for mst in parse_mask_strategy(strategy):
            loop_id, m_id, m_ref_start, m_target_start, m_length, edit_ratio = mst
            if loop_id != loop_i:
                continue
            any_mask = True
            ref = np.asarray(refs[i][m_id])
            if m_ref_start < 0:
                m_ref_start += ref.shape[1]
            if m_target_start < 0:
                m_target_start += z.shape[2]
            if align is not None:
                m_ref_start = find_nearest_point(m_ref_start, align, ref.shape[1])
                m_target_start = find_nearest_point(m_target_start, align,
                                                    z.shape[2])
            m_length = min(m_length, z.shape[2] - m_target_start,
                           ref.shape[1] - m_ref_start)
            z[i, :, m_target_start:m_target_start + m_length] = \
                ref[:, m_ref_start:m_ref_start + m_length]
            mask[m_target_start:m_target_start + m_length] = edit_ratio
        masks.append(mask)
    if not any_mask:
        return z, None
    return z, np.stack(masks)


def append_generated(
    vae, vae_params, generated_video, refs, mask_strategies,
    loop_i: int, condition_frame_length: int, condition_frame_edit: float,
    rng,
) -> Tuple[list, list]:
    """Loop mode: encode the previous clip and condition the next loop on its
    last `condition_frame_length` latent frames (:858-873)."""
    ref_x = np.asarray(vae.encode(vae_params, generated_video, rng))
    refs = list(refs)
    mask_strategies = list(mask_strategies)
    for j in range(len(refs)):
        if refs[j] is None:
            refs[j] = [ref_x[j]]
        else:
            refs[j] = list(refs[j]) + [ref_x[j]]
        prefix = "" if not mask_strategies[j] else mask_strategies[j] + ";"
        mask_strategies[j] = (
            f"{prefix}{loop_i},{len(refs[j]) - 1},"
            f"-{condition_frame_length},0,{condition_frame_length},"
            f"{condition_frame_edit}")
    return refs, mask_strategies


def dframe_to_frame(num: int) -> int:
    """latent frames -> pixel frames under the 17->5 temporal VAE (:876-878)."""
    assert num % 5 == 0, f"Invalid num: {num}"
    return num // 5 * 17


def load_reference(path_or_array, vae, vae_params, image_size, rng,
                   num_frames: Optional[int] = None) -> np.ndarray:
    """collect_references_batch equivalent: read an image/video, resize-crop
    to `image_size`, VAE-encode -> latents [C, T_ref, h, w]."""
    if isinstance(path_or_array, np.ndarray):
        pixels = path_or_array
    else:
        import cv2

        from videosys_tpu.training.datasets import _resize_crop

        H, W = image_size
        path = str(path_or_array)
        if path.lower().endswith((".png", ".jpg", ".jpeg", ".webp")):
            img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
            frames = [_resize_crop(img, H, W)]
        else:
            cap = cv2.VideoCapture(path)
            frames = []
            while True:
                ok, frame = cap.read()
                if not ok or (num_frames and len(frames) >= num_frames):
                    break
                frames.append(_resize_crop(
                    cv2.cvtColor(frame, cv2.COLOR_BGR2RGB), H, W))
            cap.release()
        pixels = np.stack(frames).astype(np.float32) / 127.5 - 1.0
        pixels = np.transpose(pixels, (3, 0, 1, 2))  # [C, T, H, W]
    z = vae.encode(vae_params, jnp.asarray(pixels)[None], rng)
    return np.asarray(z[0])
