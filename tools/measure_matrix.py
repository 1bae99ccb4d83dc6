"""Measure the BASELINE.md clip matrix on the real chip: device-resident
encode fps at 640x360 / 720p / 1080p / 4K for both ME modes, plus native
C++ decode fps and the single-core oracle encode baseline.

Writes tools/matrix_results.json and prints a markdown table.

Usage: python tools/measure_matrix.py [--quick]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import synth_clip

RESOLUTIONS = [
    ("640x360", 640, 360),
    ("1280x720", 1280, 720),
    ("1920x1080", 1920, 1080),
    ("3840x2160", 3840, 2160),
]


def device_fps(w, h, search, t_frames, reps):
    import jax
    import jax.numpy as jnp

    from video_encoder_tpu.codec import entropy, spec
    from video_encoder_tpu.pipeline.gop_engine import encode_gop_jit

    from video_encoder_tpu.pipeline.gop_engine import _block_words_for_qp

    hp = spec.ceil_to(h, 16)
    y, cb, cr = synth_clip(t_frames, hp, w)
    yd, cbd, crd = jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr)
    n_mbs = (hp // 16) * (w // 16)
    kw = dict(search=search, rc="none",
              block_words=_block_words_for_qp(30),  # the production budget
              cap_words=entropy.capacity_words(n_mbs, 1024), target_bits=0,
              emit="chunks")  # r5: GopEngine's production emission
    outs = encode_gop_jit(yd, cbd, crd, 30, **kw)
    np.asarray(outs["bits"])  # host fetch: block_until_ready lies on axon
    ovf = bool(np.asarray(outs["ovf"]).any())
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = encode_gop_jit(yd, cbd, crd, 30, **kw)
    bits = np.asarray(outs["bits"]).astype(np.int64)
    dt = (time.perf_counter() - t0) / reps
    return t_frames / dt, ovf, float(bits.mean() / 1000.0)


def oracle_fps(w, h, search, frames):
    exe = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "oracle", "oracle")
    if not os.path.exists(exe):
        return None
    import tempfile

    from video_encoder_tpu.codec import spec

    hp = spec.ceil_to(h, 16)
    y, cb, cr = synth_clip(frames, hp, w, seed=1)
    with tempfile.TemporaryDirectory() as td:
        raw = os.path.join(td, "in.yuv")
        with open(raw, "wb") as f:
            for k in range(frames):
                f.write(y[k][:h].tobytes())
                f.write(cb[k][: h // 2].tobytes())
                f.write(cr[k][: h // 2].tobytes())
        r = subprocess.run(
            [exe, "encode", raw, os.path.join(td, "o.tvc"), str(w), str(h),
             "30", "30", search, "none", "0"],
            capture_output=True, text=True)
        if r.returncode != 0:
            return None
        return json.loads(r.stdout)["fps"]


def native_decode_fps(w, h, frames):
    """Encode on device then time the C++ decode."""
    import io

    from video_encoder_tpu.codec import golden, native, spec
    from video_encoder_tpu.codec.bitstream import OrderedMux
    from video_encoder_tpu.codec.config import EncoderConfig
    from video_encoder_tpu.pipeline.gop_engine import GopEngine

    if not native.available():
        return None
    hp = spec.ceil_to(h, 16)
    y, cb, cr = synth_clip(frames, hp, w)
    fr = [golden.Frame.from_planes(y[k][:h], cb[k][: h // 2], cr[k][: h // 2])
          for k in range(frames)]
    cfg = EncoderConfig(width=w, height=h, gop_n=frames, base_qp=30, search="diamond")
    pk, _ = GopEngine(cfg).encode_gop(fr, 0)
    buf = io.BytesIO()
    mux = OrderedMux(buf, cfg, frames)
    for p in pk:
        mux.push(p)
    data = buf.getvalue()
    native.decode_stream(data, w, h, frames)  # warm/validate
    t0 = time.perf_counter()
    native.decode_stream(data, w, h, frames)
    return frames / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--res", default="", help="only this resolution, e.g. 1920x1080")
    a = ap.parse_args()
    t_frames = 4 if a.quick else 8
    reps = 2 if a.quick else 4

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "matrix_results.json")
    rows = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            rows = [r for r in json.load(f) if r["resolution"] != a.res]
    for name, w, h in RESOLUTIONS:
        if a.res and name != a.res:
            continue
        row = {"resolution": name}
        for search in ("full", "diamond"):
            fps, ovf, kbits = device_fps(w, h, search, t_frames, reps)
            row[f"tpu_{search}_fps"] = round(fps, 2)
            if ovf:
                row[f"tpu_{search}_ovf"] = True
            base = oracle_fps(w, h, search, 2 if h > 720 else 4)
            row[f"oracle_{search}_fps"] = round(base, 2) if base else None
            if base:
                row[f"speedup_{search}"] = round(fps / base, 1)
        dec = native_decode_fps(w, h, t_frames)
        row["native_decode_fps"] = round(dec, 1) if dec else None
        rows.append(row)
        print(json.dumps(row), flush=True)

    rows.sort(key=lambda r: int(r["resolution"].split("x")[0]))
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)

    print("\n| resolution | TPU full fps | oracle full | x | TPU diamond fps "
          "| oracle diamond | x | TPU hier fps | oracle hier | x "
          "| C++ decode fps |")
    print("|---|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['resolution']} | {r['tpu_full_fps']} | {r['oracle_full_fps']} "
              f"| {r.get('speedup_full','-')} | {r['tpu_diamond_fps']} "
              f"| {r['oracle_diamond_fps']} | {r.get('speedup_diamond','-')} "
              f"| {r.get('tpu_hier_fps','-')} | {r.get('oracle_hier_fps','-')} "
              f"| {r.get('speedup_hier','-')} "
              f"| {r['native_decode_fps']} |")


if __name__ == "__main__":
    main()
