"""Headline benchmark: 1080p 4:2:0 encode frames/s on one TPU chip.

Measures the steady-state device-resident GOP encode rate (full-search ME,
GOP=8 here to bound upload time through the axon tunnel; the per-frame work
is independent of GOP length since every frame runs ME+transform+pack).

vs_baseline: ratio against the reference C encoder's single-core 1080p fps.
The reference mount is empty (SURVEY.md §0), so the baseline is the C++
oracle encoder (oracle/, same spec, -O2, single core) when built, else a
documented 15 fps placeholder for a single-core C encoder of this class.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def synth_clip(t, h, w, seed=0):
    """Realistic-ish content: smoothed texture background, global pan,
    a moving high-detail patch, mild noise."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 128, w + 128)).astype(np.int32)
    for _ in range(2):
        base = (
            base
            + np.roll(base, 1, 0)
            + np.roll(base, 1, 1)
            + np.roll(base, 2, 0)
            + np.roll(base, 2, 1)
        ) // 5
    ys, cbs, crs = [], [], []
    for k in range(t):
        y = base[2 * k : 2 * k + h, 3 * k : 3 * k + w].astype(np.int32)
        noise = rng.integers(-2, 3, y.shape)
        sq = rng.integers(0, 256, (64, 64))
        yy = y + noise
        px, py = (200 + 11 * k) % max(w - 64, 1), (300 + 7 * k) % max(h - 64, 1)
        yy[py : py + 64, px : px + 64] = sq
        ys.append(np.clip(yy, 0, 255).astype(np.uint8))
        cbs.append(np.full((h // 2, w // 2), 108 + k, np.uint8))
        crs.append(np.full((h // 2, w // 2), 148, np.uint8))
    return np.stack(ys), np.stack(cbs), np.stack(crs)


def oracle_baseline_fps(w, h, frames):
    """Single-core C++ oracle encoder fps at the same resolution, if built."""
    exe = os.path.join(os.path.dirname(os.path.abspath(__file__)), "oracle", "oracle")
    if not os.path.exists(exe):
        return None
    import tempfile

    y, cb, cr = synth_clip(frames, h, w, seed=1)
    with tempfile.TemporaryDirectory() as td:
        raw = os.path.join(td, "in.yuv")
        out = os.path.join(td, "out.tvc")
        with open(raw, "wb") as f:
            for k in range(frames):
                f.write(y[k].tobytes() + cb[k].tobytes() + cr[k].tobytes())
        t0 = time.perf_counter()
        r = subprocess.run(
            [exe, "encode", raw, out, str(w), str(h), "30", "8", "full", "none", "0"],
            capture_output=True,
        )
        dt = time.perf_counter() - t0
        if r.returncode != 0:
            return None
        return frames / dt


def main():
    import jax
    import jax.numpy as jnp

    from video_encoder_tpu.codec import entropy, spec
    from video_encoder_tpu.pipeline.gop_engine import _block_words_for_qp, encode_gop_jit

    T, H, W = 8, 1080, 1920
    hp = spec.ceil_to(H, 16)
    y, cb, cr = synth_clip(T, hp, W)
    yd = jnp.asarray(y)
    cbd = jnp.asarray(cb)
    crd = jnp.asarray(cr)

    n_mbs = (hp // 16) * (W // 16)
    kw = dict(
        search="full", rc="none", block_words=_block_words_for_qp(30),
        cap_words=entropy.capacity_words(n_mbs, 1024), target_bits=0,
    )
    outs = encode_gop_jit(yd, cbd, crd, 30, **kw)
    if bool(np.asarray(outs["ovf"]).any()):
        print(json.dumps({"metric": "error", "value": 0, "unit": "",
                          "vs_baseline": 0, "note": "capacity overflow"}))
        return

    # Sync by fetching a scalar, not block_until_ready: on the axon backend
    # block_until_ready returns before execution finishes, so only a host
    # fetch (in-order execution) gives honest timing.
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = encode_gop_jit(yd, cbd, crd, 30, **kw)
    np.asarray(outs["bits"])
    dt = (time.perf_counter() - t0) / reps
    fps = T / dt

    base = oracle_baseline_fps(W, H, 4)
    assumed = base is None
    if base is None:
        base = 15.0  # documented placeholder: single-core C encoder class

    print(
        json.dumps(
            {
                "metric": "1080p 4:2:0 device-resident encode fps/chip (full-search ME, GOP scan)",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / base, 2),
                "baseline_fps": round(base, 2),
                "baseline_source": "assumed-15fps" if assumed else "cpp-oracle-1core",
            }
        )
    )


if __name__ == "__main__":
    main()
