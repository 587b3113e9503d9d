"""Native IO runtime: C++ read pool + PreprocessedLatentDataset.

The reference's preprocessed-latents training path rides torch DataLoader
native workers; these tests cover the TPU-native equivalent (GIL-free
pread pool, videosys_tpu/native) and its training integration."""

import os

import numpy as np
import pytest

from videosys_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native reader unavailable: {native.why_unavailable()}")


def _write_npy(path, arr):
    np.save(path, arr)
    return path


def test_native_pool_parity_and_errors(tmp_path):
    rng = np.random.default_rng(0)
    arrs = [rng.random((3, 5, 7)).astype(np.float16) for _ in range(8)]
    pool = native.NativeReadPool(3)
    jobs = []
    for i, a in enumerate(arrs):
        p = _write_npy(tmp_path / f"a{i}.npy", a)
        shape, dtype, off = native.npy_header(p)
        assert shape == a.shape and dtype == a.dtype
        dst = np.empty(shape, dtype)
        jobs.append((pool.submit(str(p), dst, offset=off), dst, a))
    for job, dst, a in jobs:
        pool.wait(job)
        np.testing.assert_array_equal(dst, a)
    # double wait -> KeyError
    with pytest.raises(KeyError):
        pool.wait(jobs[0][0])
    # missing file -> OSError(ENOENT) at wait time
    dst = np.empty((4,), np.float32)
    j = pool.submit(str(tmp_path / "missing.bin"), dst)
    with pytest.raises(OSError):
        pool.wait(j)
    # short file -> EIO
    short = tmp_path / "short.bin"
    short.write_bytes(b"abc")
    dst = np.empty((16,), np.uint8)
    j = pool.submit(str(short), dst)
    with pytest.raises(OSError):
        pool.wait(j)
    pool.close()


def _make_preprocessed_dir(tmp_path, n=4, lat_shape=(4, 5, 8, 8), L=8, D=16):
    import pandas as pd

    rng = np.random.default_rng(1)
    rows = []
    for i in range(n):
        lat = rng.standard_normal((lat_shape)).astype(np.float16)
        lp = str(tmp_path / f"latent_{i}.npy")
        np.save(lp, lat)
        tp = str(tmp_path / f"text_{i}.npz")
        np.savez(tp, y=rng.standard_normal((L, D)).astype(np.float16),
                 mask=np.arange(L) < (i + 2))
        rows.append({"path": f"v{i}.mp4", "latent_path": lp, "text_path": tp,
                     "text": f"clip {i}", "num_frames": 51, "height": 240,
                     "width": 426})
    csv = str(tmp_path / "preprocessed.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)
    return csv


def test_preprocessed_latent_dataset(tmp_path):
    from videosys_tpu.training.datasets import PreprocessedLatentDataset

    csv = _make_preprocessed_dir(tmp_path)
    ds = PreprocessedLatentDataset(csv)
    assert len(ds) == 4
    assert ds.shape_of(0) == (51, 240, 426)
    # prefetch then load; repeated prefetch of in-flight indices is safe
    ds.prefetch([0, 1, 2])
    ds.prefetch([1, 2, 3])
    lat = ds.load_latents([2, 0], (5, 8, 8))
    assert lat.shape == (2, 4, 5, 8, 8) and lat.dtype == np.float32
    ref = np.load(str(tmp_path / "latent_2.npy")).astype(np.float32)
    np.testing.assert_array_equal(lat[0], ref)
    # shape mismatch is a clear error
    with pytest.raises(ValueError, match="re-run preprocess"):
        ds.load_latents([0], (5, 4, 4))
    y, m = ds.text_embeds([1, 3])
    assert y.shape == (2, 8, 16) and m.shape == (2, 8)
    assert m[0].sum() == 3 and m[1].sum() == 5
    ds.close()
    # numpy fallback path gives identical results
    ds2 = PreprocessedLatentDataset(csv, native_threads=0)
    np.testing.assert_array_equal(ds2.load_latents([2, 0], (5, 8, 8)), lat)


def test_preprocessed_dataset_trains(tmp_path):
    """End to end: preprocess.py artifacts -> PreprocessedLatentDataset ->
    run_training consumes real latents/captions through the native pool."""
    import jax

    from videosys_tpu.models.transformers.stdit3 import STDiT3Config
    from videosys_tpu.training.datasets import PreprocessedLatentDataset
    from videosys_tpu.training.train import TrainConfig, run_training

    # bucket 240p/51f -> latent (T//17*5, H//8, W//8) = (15, 30, 53)
    csv = _make_preprocessed_dir(tmp_path, n=6, lat_shape=(4, 15, 30, 53),
                                 L=8, D=16)
    ds = PreprocessedLatentDataset(csv)
    cfg = TrainConfig(
        model=STDiT3Config(depth=2, hidden_size=32, num_heads=2,
                           caption_channels=16, model_max_length=8,
                           patch_size=(1, 2, 2), dtype=jax.numpy.float32),
        bucket_config={"240p": {51: (1.0, 2)}},
        epochs=1, log_every=1, ckpt_every=0, seed=0)
    state, ema, hist = run_training(cfg, dataset=ds,
                                    text_embed_fn=ds.text_embeds)
    assert hist and all(np.isfinite(h["loss"]) for h in hist)
    ds.close()
