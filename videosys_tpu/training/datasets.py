"""Training datasets.

Behavioral reference: `videosys/training/datasets/open_sora/datasets.py`
(VariableVideoTextDataset :131-228, DummyVariableVideoTextDataset :229-448
with zipf/uniform synthetic size distributions, preprocessed-latents mode)
and `utils.py:239-336` (MaskGenerator).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class Sample:
    index: int
    num_frames: int
    height: int
    width: int
    text: str
    path: Optional[str] = None


class VariableVideoTextDataset:
    """CSV-driven dataset: columns (path, text, num_frames, height, width)
    (datasets.py:131-228). Video pixels are loaded lazily per item; when only
    shapes are needed (bucketing/profiling) no IO happens."""

    def __init__(self, csv_path: str, transform=None):
        import pandas as pd

        self.df = pd.read_csv(csv_path)
        self.transform = transform

    def __len__(self):
        return len(self.df)

    def shape_of(self, i: int) -> Tuple[int, int, int]:
        row = self.df.iloc[i]
        return int(row["num_frames"]), int(row["height"]), int(row["width"])

    def shapes(self) -> List[Tuple[int, int, int]]:
        return [self.shape_of(i) for i in range(len(self))]

    def __getitem__(self, i: int) -> Sample:
        row = self.df.iloc[i]
        return Sample(i, int(row["num_frames"]), int(row["height"]),
                      int(row["width"]), str(row.get("text", "")),
                      row.get("path"))

    def load_video(self, i: int, target_thw: Tuple[int, int, int],
                   frame_interval: int = 1, seed: int = 0) -> np.ndarray:
        """Read + transform to the bucket shape -> [C, T, H, W] in [-1, 1]
        (read_video.py read_video_cv2 :213-248 + the video_transforms suite;
        temporal_random_crop utils.py:76-86 picks a random T*interval window
        strided by frame_interval)."""
        import cv2

        from videosys_tpu.training.video_transforms import get_transforms_video

        sample = self[i]
        T, H, W = target_thw
        cap = cv2.VideoCapture(sample.path)
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) or sample.num_frames
        keep = temporal_random_crop(total, T, frame_interval, seed + i)
        frames = []
        idx = 0
        want = set(keep.tolist())
        last_needed = int(keep[-1])
        while idx <= last_needed and len(frames) < T:
            ok, frame = cap.read()
            if not ok:
                break
            if idx in want:
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            idx += 1
        cap.release()
        if not frames:
            raise IOError(f"cannot read {sample.path}")
        while len(frames) < T:
            frames.append(frames[-1])
        clip = np.stack(frames[:T])  # [T, H, W, C] uint8
        tfm = self.transform or get_transforms_video("resize_crop", (H, W))
        video = tfm(clip)
        return np.ascontiguousarray(np.transpose(video, (3, 0, 1, 2)))


def temporal_random_crop(total: int, num_frames: int, frame_interval: int,
                         seed: int = 0) -> np.ndarray:
    """Frame indices of a random temporal window (reference
    training/datasets/open_sora/utils.py:76-86)."""
    span = min(num_frames * frame_interval, total)
    rng = np.random.default_rng(seed)
    start = int(rng.integers(0, max(total - span, 0) + 1))
    idx = np.arange(start, start + span, frame_interval)[:num_frames]
    if len(idx) == 0:
        idx = np.zeros((1,), np.int64)
    return idx


class DummyVariableVideoTextDataset:
    """Synthetic dataset with zipf/uniform size distributions
    (datasets.py:229-448, _build_dummy_dataset :268). Used by the scheduler
    dry-run test (tests/test_sampler.py in the reference)."""

    def __init__(
        self,
        size: int = 1000,
        distribution: str = "zipf",  # zipf | uniform
        seed: int = 0,
        frames_choices: Tuple[int, ...] = (1, 34, 51, 102),
        resolution_choices: Tuple[Tuple[int, int], ...] = (
            (144, 256), (240, 426), (360, 640), (480, 854), (720, 1280)),
        in_channels: int = 4,
    ):
        rng = np.random.default_rng(seed)
        self.in_channels = in_channels
        if distribution == "zipf":
            f_w = 1.0 / np.arange(1, len(frames_choices) + 1) ** 1.5
            r_w = 1.0 / np.arange(1, len(resolution_choices) + 1) ** 1.5
        else:
            f_w = np.ones(len(frames_choices))
            r_w = np.ones(len(resolution_choices))
        f_w, r_w = f_w / f_w.sum(), r_w / r_w.sum()
        fi = rng.choice(len(frames_choices), size=size, p=f_w)
        ri = rng.choice(len(resolution_choices), size=size, p=r_w)
        self._shapes = [
            (frames_choices[a], *resolution_choices[b]) for a, b in zip(fi, ri)
        ]

    def __len__(self):
        return len(self._shapes)

    def shapes(self) -> List[Tuple[int, int, int]]:
        return list(self._shapes)

    def shape_of(self, i: int) -> Tuple[int, int, int]:
        return self._shapes[i]

    def load_latents(self, indices, latent_thw, rng_seed: int = 0) -> np.ndarray:
        """Synthetic pre-encoded latents [B, C, T', h, w] (ProfileDataIter
        semantics, profiler.py:121-149)."""
        rng = np.random.default_rng(rng_seed)
        t, h, w = latent_thw
        return rng.standard_normal(
            (len(indices), self.in_channels, t, h, w)).astype(np.float32)


class MaskGenerator:
    """Frame-conditioning mask sampler (utils.py:239-336): mixes mask types
    by ratio; returns bool [B, T] (True = denoise this frame)."""

    TYPES = ("identity", "random", "mask_head", "mask_tail", "mask_head_tail",
             "quarter_head", "quarter_tail", "quarter_head_tail",
             "interpolate", "image")

    def __init__(self, mask_ratios: dict):
        assert abs(sum(mask_ratios.values()) - 1.0) < 1e-6
        for k in mask_ratios:
            assert k in self.TYPES, f"unknown mask type {k}"
        self.types = list(mask_ratios.keys())
        self.probs = np.array([mask_ratios[k] for k in self.types])

    def _single(self, T: int, rng) -> np.ndarray:
        kind = rng.choice(self.types, p=self.probs)
        mask = np.ones(T, dtype=bool)
        if T == 1 or kind == "identity":
            return mask
        if kind == "image":
            return mask  # single-frame handled upstream
        edit = max(1, int(rng.integers(1, max(2, T // 4))))
        quarter = max(1, T // 4)
        if kind == "random":
            mask[rng.choice(T, size=edit, replace=False)] = False
        elif kind == "mask_head":
            mask[:edit] = False
        elif kind == "mask_tail":
            mask[-edit:] = False
        elif kind == "mask_head_tail":
            mask[:edit] = False
            mask[-edit:] = False
        elif kind == "quarter_head":
            mask[:quarter] = False
        elif kind == "quarter_tail":
            mask[-quarter:] = False
        elif kind == "quarter_head_tail":
            mask[:quarter] = False
            mask[-quarter:] = False
        elif kind == "interpolate":
            mask[::2] = False
        return mask

    def __call__(self, batch: int, T: int, seed: int = 0) -> np.ndarray:
        rng = np.random.default_rng(seed)
        return np.stack([self._single(T, rng) for _ in range(batch)])


def prepare_dataloader(dataset, bucket_config: dict, batch_multiplier: int = 1,
                       seed: int = 0, planner=None, frame_interval: int = 1,
                       drop_last: bool = True):
    """API-parity shim for the reference's `prepare_dataloader`
    (training/datasets/open_sora/dataloader.py:25-103): builds the bucket +
    sampler pair; iteration yields `BatchPlan`s whose `micro_batches()` are
    the collated gas groups (the torch DataLoader/worker pool has no role
    under SPMD — batches are assembled on the host by the train loop)."""
    from videosys_tpu.training.buckets import Bucket
    from videosys_tpu.training.sampler import VariableVideoBatchSampler

    bucket = Bucket(bucket_config)
    sampler = VariableVideoBatchSampler(
        bucket, dataset.shapes(), batch_multiplier=batch_multiplier,
        seed=seed, planner=planner, frame_interval=frame_interval,
        drop_last=drop_last)
    return sampler, bucket


class PreprocessedLatentDataset:
    """Pre-encoded training data: the consumer of `examples/training/
    open_sora/preprocess.py` outputs (latent_{i}.npy + text_{i}.npz + a
    preprocessed.csv with the original pixel shapes for bucketing).

    Reference counterpart: the preprocessed-latents branch of
    `videosys/training/datasets/open_sora/datasets.py` (VariableVideoText-
    Dataset with data_process='pre_process'), whose IO rides torch's native
    DataLoader workers. Here IO goes through `videosys_tpu.native`'s C++
    read pool when it is available on the host: `load_latents` submits every
    file of a micro-batch concurrently, and `prefetch` lets the train loop
    push the whole plan's reads behind the current device step (GIL-free).
    Falls back to plain np.load when the native library can't build."""

    def __init__(self, csv_path: str, native_threads: int = 4):
        import pandas as pd

        self.df = pd.read_csv(csv_path)
        self._headers: dict = {}   # path -> (shape, dtype, payload_offset)
        self._pending: dict = {}   # index -> (job, dst)
        self._pool = None
        if native_threads > 0:
            from videosys_tpu import native

            if native.available():
                self._npy_header = native.npy_header
                self._pool = native.NativeReadPool(native_threads)

    def __len__(self):
        return len(self.df)

    def shape_of(self, i: int) -> Tuple[int, int, int]:
        row = self.df.iloc[i]
        return int(row["num_frames"]), int(row["height"]), int(row["width"])

    def shapes(self) -> List[Tuple[int, int, int]]:
        return [self.shape_of(i) for i in range(len(self))]

    def __getitem__(self, i: int) -> Sample:
        row = self.df.iloc[i]
        return Sample(i, int(row["num_frames"]), int(row["height"]),
                      int(row["width"]), str(row.get("text", "")),
                      row.get("latent_path"))

    # ------------------------------------------------------------------ #
    # latents
    # ------------------------------------------------------------------ #
    def _header(self, path: str):
        h = self._headers.get(path)
        if h is None:
            h = self._npy_header(path)
            self._headers[path] = h
        return h

    def _submit(self, i: int) -> None:
        if i in self._pending:
            return
        path = str(self.df.iloc[i]["latent_path"])
        shape, dtype, off = self._header(path)
        dst = np.empty(shape, dtype)
        self._pending[i] = (self._pool.submit(path, dst, offset=off), dst)

    def prefetch(self, indices) -> None:
        """Queue the latent reads for `indices` on the native pool (no-op on
        the numpy fallback). Safe to call with indices already in flight."""
        if self._pool is not None:
            for i in indices:
                self._submit(int(i))

    def _read_one(self, i: int) -> np.ndarray:
        if self._pool is None:
            return np.load(str(self.df.iloc[i]["latent_path"]))
        self._submit(i)
        job, dst = self._pending.pop(i)
        self._pool.wait(job)
        return dst

    def load_latents(self, indices, latent_thw, rng_seed: int = 0) -> np.ndarray:
        """[B, C, t, h, w] float32. Submits all of `indices` before waiting on
        any, so a micro-batch's files stream concurrently."""
        self.prefetch(indices)
        lat = np.stack([self._read_one(int(i)) for i in indices])
        if tuple(lat.shape[2:]) != tuple(latent_thw):
            raise ValueError(
                f"preprocessed latents are {lat.shape[2:]}, bucket wants "
                f"{tuple(latent_thw)} — re-run preprocess.py with the "
                f"bucket's (frames, height, width)")
        return lat.astype(np.float32)

    # ------------------------------------------------------------------ #
    # captions (train.py text_embed_fn contract)
    # ------------------------------------------------------------------ #
    def text_embeds(self, indices):
        """(y [B, L, D] float32, kv_mask [B, L] bool) from the stored npz."""
        ys, masks = [], []
        for i in indices:
            with np.load(str(self.df.iloc[int(i)]["text_path"])) as z:
                ys.append(np.asarray(z["y"], np.float32))
                masks.append(np.asarray(z["mask"], bool))
        return np.stack(ys), np.stack(masks)

    def close(self):
        if self._pool is not None:
            self._pool.close()
            self._pool = None
