"""CLI driver (reference component C1, SURVEY.md §2): parse args, open
files, run the pipeline, report stats.

    python -m video_encoder_tpu.cli encode -i in.yuv -W 1920 -H 1080 -o out.tvc
    python -m video_encoder_tpu.cli decode -i out.tvc -o dec.yuv
    python -m video_encoder_tpu.cli info   -i out.tvc
    python -m video_encoder_tpu.cli psnr   -a ref.yuv -b dec.yuv -W 1920 -H 1080
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

from .codec.bitstream import read_stream_header
from .codec.config import EncoderConfig
from .io import yuv
from .utils.metrics import RunSummary, psnr


def _add_dims(p):
    p.add_argument("-W", "--width", type=int, default=0)
    p.add_argument("-H", "--height", type=int, default=0)


def cmd_encode(a) -> int:
    w, h, fps, frames = yuv.open_clip(a.input, a.width, a.height)
    cfg = EncoderConfig(
        width=w, height=h, gop_n=a.gop, base_qp=a.qp, search=a.search,
        rc=a.rc, target_kbps=a.kbps, fps_num=fps[0], fps_den=fps[1],
        format_version=a.format, chroma_qp_offset=a.chroma_qp_offset,
        quant_bias=a.quant_bias, vbv_kbits=a.vbv_kbits,
        quant_matrix=a.quant_matrix,
    )
    n_frames = a.frames
    if n_frames == 0:
        if a.input.endswith(".y4m"):
            print("error: --frames required for y4m input", file=sys.stderr)
            return 2
        n_frames = yuv.count_yuv_frames(a.input, w, h)

    from .pipeline.encoder import encode_clip, GoldenEngine

    if a.engine == "golden":
        engine = GoldenEngine()
    elif a.engine == "device":
        from .pipeline.device_engine import DeviceEngine

        engine = DeviceEngine()
    else:  # "gop" — the production GOP-resident path
        engine = None

    # validate two-pass preconditions BEFORE truncating the output file
    if a.two_pass:
        import dataclasses

        if a.kbps <= 0:
            print("error: --two-pass requires --kbps", file=sys.stderr)
            return 2
        if cfg.rc == "adaptive":
            print("error: --two-pass allocates qp at the GOP level; "
                  "use --rc none|bitrate|vbv", file=sys.stderr)
            return 2
        if cfg.rc == "none":
            cfg = dataclasses.replace(cfg, rc="bitrate")

    on_frame = (lambda s: print(s.to_json(), file=sys.stderr)) if a.verbose else None
    t0 = time.perf_counter()
    with open(a.output, "wb") as fo:
        if a.two_pass:
            from .pipeline.encoder import encode_clip_twopass

            if engine is None:
                from .pipeline.gop_engine import GopEngine

                engine = GopEngine(cfg)  # GOP-resident engine, both passes
            summary = encode_clip_twopass(
                cfg, lambda: yuv.open_clip(a.input, a.width, a.height)[3],
                fo, n_frames, engine=engine, on_frame=on_frame,
            )
        elif engine is None:
            summary = _encode_gop_resident(cfg, frames, fo, n_frames, a.verbose)
        else:
            summary = encode_clip(
                cfg, frames, fo, n_frames, engine=engine,
                on_frame=on_frame,
            )
    wall = time.perf_counter() - t0
    out = json.loads(summary.to_json())
    out["wall_s"] = round(wall, 3)
    out["wall_fps"] = round(summary.frames / wall, 2) if wall else 0
    print(json.dumps(out))
    return 0


def _encode_gop_resident(cfg, frames, fo, n_frames, verbose):
    """Production path: GOP-resident device encode + ordered mux."""
    from .codec.bitstream import OrderedMux
    from .codec.golden import Frame
    from .pipeline.gop_engine import GopEngine

    eng = GopEngine(cfg)
    mux = OrderedMux(fo, cfg, n_frames)
    summary = RunSummary()
    gop: list[Frame] = []
    start = 0
    count = 0
    pending = None  # double-buffer: GOP k computes while k+1 reads/uploads

    def drain(handle):
        pk, st = eng.encode_gop_finish(handle)
        for p in pk:
            mux.push(p)
        for s in st:
            summary.add(s)
            if verbose:
                print(s.to_json(), file=sys.stderr)

    for planes in frames:
        if count >= n_frames:
            break
        gop.append(Frame.from_planes(*planes))
        count += 1
        if len(gop) == cfg.gop_n:
            handle = eng.encode_gop_start(gop, start)
            if pending is not None:
                drain(pending)
            pending = handle
            start += len(gop)
            gop = []
    if gop:
        handle = eng.encode_gop_start(gop, start)
        if pending is not None:
            drain(pending)
        pending = handle
    if pending is not None:
        drain(pending)
    mux.close()
    return summary


def cmd_decode(a) -> int:
    from .pipeline import decoder

    t0 = time.perf_counter()
    with open(a.input, "rb") as fi:
        if a.engine == "native":
            from .codec import native

            if not native.available():
                print("warning: native lib unavailable, using golden", file=sys.stderr)
                a.engine = "golden"
        if a.engine == "native":
            info, frames = decoder.decode_clip_native(fi)
        elif a.engine == "gop":
            info, frames = decoder.decode_clip_gop(fi)
        elif a.engine == "device":
            info, frames = decoder.decode_clip(fi, decoder.DeviceDecodeEngine())
        else:
            info, frames = decoder.decode_clip(fi)
        n = 0
        with open(a.output, "wb") as fo:
            for y, cb, cr in frames:
                yuv.write_yuv_frame(fo, y, cb, cr)
                n += 1
    wall = time.perf_counter() - t0
    print(json.dumps({"frames": n, "width": info.width, "height": info.height,
                      "wall_s": round(wall, 3),
                      "fps": round(n / wall, 2) if wall else 0}))
    return 0


def cmd_info(a) -> int:
    with open(a.input, "rb") as f:
        info = read_stream_header(f)
    print(json.dumps(info.__dict__))
    return 0


def cmd_psnr(a) -> int:
    with open(a.a, "rb") as fa, open(a.b, "rb") as fb:
        stats = []
        for (ya, cba, cra), (yb, cbb, crb) in zip(
            yuv.read_yuv_frames(fa, a.width, a.height),
            yuv.read_yuv_frames(fb, a.width, a.height),
        ):
            stats.append(
                (psnr(ya, yb), psnr(cba, cbb), psnr(cra, crb))
            )
    if not stats:
        print("error: no frames", file=sys.stderr)
        return 1
    arr = np.minimum(np.array(stats), 999.0)  # lossless planes -> cap (valid JSON)
    print(json.dumps({
        "frames": len(stats),
        "psnr_y": round(float(arr[:, 0].mean()), 3),
        "psnr_cb": round(float(arr[:, 1].mean()), 3),
        "psnr_cr": round(float(arr[:, 2].mean()), 3),
    }))
    return 0


def main(argv=None) -> int:
    import os

    if os.environ.get("TVC_PLATFORM"):
        # e.g. TVC_PLATFORM=cpu — applied before any backend use; needed
        # because the axon sitecustomize pins JAX_PLATFORMS at startup
        import jax

        jax.config.update("jax_platforms", os.environ["TVC_PLATFORM"])
    ap = argparse.ArgumentParser(prog="video_encoder_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("encode", help="raw YUV/Y4M -> TVC1")
    e.add_argument("-i", "--input", required=True)
    e.add_argument("-o", "--output", required=True)
    _add_dims(e)
    e.add_argument("--gop", type=int, default=30)
    e.add_argument("--qp", type=int, default=28)
    e.add_argument("--search", choices=["full", "diamond", "hier"],
                   default="diamond")
    e.add_argument("--rc", choices=["none", "adaptive", "bitrate", "vbv", "mb"],
                   default="none")
    e.add_argument("--kbps", type=int, default=0)
    e.add_argument("--vbv-kbits", type=int, default=0,
                   help="rc=vbv buffer size (0 = 8x per-frame target)")
    e.add_argument("--two-pass", action="store_true",
                   help="two-pass GOP-level rate allocation (needs --kbps; "
                        "reads the input twice)")
    e.add_argument("--frames", type=int, default=0, help="0 = all")
    e.add_argument("--engine", choices=["gop", "device", "golden"], default="gop")
    e.add_argument("--format", type=int, choices=[1, 2, 3], default=1,
                   help="bitstream format: 1=TVC1, 2=v2 (mv pred, DC DPCM), "
                        "3=v3 (I-frame intra pred, quant matrix)")
    e.add_argument("--quant-matrix", action="store_true",
                   help="v3: per-frequency quant matrix (SPEC.md 13.2)")
    e.add_argument("--quant-bias", type=int, default=8,
                   help="AC quantizer rounding bias /16; 8=midpoint, "
                        "lower=deadzone (fewer bits, encoder-side only)")
    e.add_argument("--chroma-qp-offset", type=int, default=0,
                   help="v2 only: chroma QP offset in [-12, 12]")
    e.add_argument("-v", "--verbose", action="store_true")
    e.set_defaults(fn=cmd_encode)

    d = sub.add_parser("decode", help="TVC1 -> raw YUV")
    d.add_argument("-i", "--input", required=True)
    d.add_argument("-o", "--output", required=True)
    d.add_argument("--engine", choices=["native", "gop", "device", "golden"], default="native")
    d.set_defaults(fn=cmd_decode)

    inf = sub.add_parser("info", help="dump stream header")
    inf.add_argument("-i", "--input", required=True)
    inf.set_defaults(fn=cmd_info)

    p = sub.add_parser("psnr", help="PSNR between two raw YUV files")
    p.add_argument("-a", required=True)
    p.add_argument("-b", required=True)
    _add_dims(p)
    p.set_defaults(fn=cmd_psnr)

    a = ap.parse_args(argv)
    try:
        return a.fn(a)
    except (ValueError, FileNotFoundError, OSError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
