"""Bound the ingest pipeline (r3 VERDICT item 8): how much of the
upload cost does the encode_gop_start/finish double-buffering actually
hide, and what e2e fps does a production link project to?

Measures, with an IN-MEMORY uint8 frame source (no disk, no y4m parse):

  upload_ms     per-GOP host->device transfer alone (device_put + sync)
  compute_ms    device-resident encode alone (data already on device)
  serial_ms     upload then encode, strictly sequential per GOP
  pipelined_ms  the production start/finish overlap (GOP k+1 uploads
                while GOP k computes)

hidden_ms = serial - pipelined is the overlap the async pipeline buys.
Production projection: e2e_fps(link) = T / (max(compute, upload*scale) +
residual) where scale rescales the measured tunnel upload to the target
link bandwidth; the dev-container tunnel moves uint8 at ~26 MB/s while a
production PCIe host moves >10 GB/s, making upload ~negligible there —
the projection makes that arithmetic explicit instead of asserting it.

Writes tools/ingest_bound_results.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import synth_clip
    from video_encoder_tpu.codec import spec
    from video_encoder_tpu.codec.config import EncoderConfig
    from video_encoder_tpu.codec.golden import Frame
    from video_encoder_tpu.pipeline.gop_engine import GopEngine

    H, W, T, NGOPS = 1080, 1920, 8, 6
    hp = spec.ceil_to(H, 16)
    cfg = EncoderConfig(width=W, height=H, gop_n=T, base_qp=30, search="full")
    eng = GopEngine(cfg)

    # in-memory source: NGOPS distinct GOPs (distinct so no caching effects)
    gops = []
    for g in range(NGOPS):
        y, cb, cr = synth_clip(T, hp, W, seed=g + 1)
        gops.append([Frame.from_planes(y[t], cb[t], cr[t]) for t in range(T)])

    results = {"platform": jax.default_backend(), "shape": f"{W}x{H}",
               "gop": T, "n_gops": NGOPS}
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "ingest_bound_results.json")

    # warm the program
    eng.encode_gop(gops[0], 0)

    # upload alone
    t0 = time.perf_counter()
    for g in gops:
        y = jnp.asarray(np.stack([f.y for f in g]))
        cb = jnp.asarray(np.stack([f.cb for f in g]))
        cr = jnp.asarray(np.stack([f.cr for f in g]))
        jax.block_until_ready((y, cb, cr))
        np.asarray(y[0, :1, :1])  # host-fetch sync (axon)
    upload_ms = (time.perf_counter() - t0) / NGOPS * 1e3
    bytes_per_gop = int(1.5 * hp * W * T)
    results["upload_ms_per_gop"] = round(upload_ms, 1)
    results["upload_MBs"] = round(bytes_per_gop / upload_ms / 1e3, 1)

    # compute alone (device-resident). Sync uploads with HOST FETCHES:
    # block_until_ready returns early on the axon backend (repo memory),
    # which silently bled upload time into this measurement.
    ys = [jnp.asarray(np.stack([f.y for f in g])) for g in gops]
    cbs = [jnp.asarray(np.stack([f.cb for f in g])) for g in gops]
    crs = [jnp.asarray(np.stack([f.cr for f in g])) for g in gops]
    for a in (*ys, *cbs, *crs):
        np.asarray(a[0, :1, :1])
    # Per-dispatch host-fetch sync: chains of >1 in-flight GOP program
    # over DISTINCT argument arrays measure ~10x slower on the axon
    # tunnel than the same program looped on one array (an axon queueing
    # artifact, not device time — bench.py's same-array loop shows the
    # true 9-11 ms/frame). Each sync costs one ~24 ms tunnel round trip,
    # which slightly overstates compute; both effects are tunnel-only.
    t0 = time.perf_counter()
    for k in range(NGOPS):
        outs = eng._run(ys[k], cbs[k], crs[k], cfg.base_qp, xl=False)
        np.asarray(outs["bits"])
    compute_ms = (time.perf_counter() - t0) / NGOPS * 1e3
    results["compute_ms_per_gop"] = round(compute_ms, 1)
    results["compute_note"] = (
        "per-dispatch sync incl ~24 ms tunnel round trip each; "
        "device-resident rate is bench.py's (same-array loop)"
    )

    # serial: upload then encode, per GOP, synchronized
    t0 = time.perf_counter()
    for g in gops:
        pk, st = eng.encode_gop(g, 0)
    serial_ms = (time.perf_counter() - t0) / NGOPS * 1e3
    results["serial_ms_per_gop"] = round(serial_ms, 1)

    # pipelined: the CLI's start/finish double buffering
    t0 = time.perf_counter()
    pending = None
    for g in gops:
        h = eng.encode_gop_start(g, 0)
        if pending is not None:
            eng.encode_gop_finish(pending)
        pending = h
    eng.encode_gop_finish(pending)
    pipelined_ms = (time.perf_counter() - t0) / NGOPS * 1e3
    results["pipelined_ms_per_gop"] = round(pipelined_ms, 1)
    results["hidden_ms_per_gop"] = round(serial_ms - pipelined_ms, 1)
    results["e2e_fps_pipelined"] = round(T / pipelined_ms * 1e3, 2)
    results["device_resident_fps"] = round(T / compute_ms * 1e3, 2)

    # production-link projection. The compute column above is polluted by
    # tunnel artifacts (see compute_note), so the projection uses the
    # DEVICE-RESIDENT rate bench.py measures (same program, same-array
    # loop, one sync) as the compute term; the host-side residual (mux
    # glue + packetization python) is taken from the serial run minus its
    # upload and device terms.
    # steady-state device ms/frame from the committed fused-pack record,
    # else a conservative 11 ms/frame
    dev_ms_frame = 11.0
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "check_fused_pack_results.json")) as f:
            dev_ms_frame = json.load(f)["gop_1080p"]["ms_per_frame"]
    except (OSError, KeyError):
        pass
    dev_ms = dev_ms_frame * T
    residual = max(serial_ms - upload_ms - dev_ms, 0.0)
    results["host_residual_ms_per_gop"] = round(residual, 1)
    for name, gbs in (("pcie_16GBs", 16.0), ("pcie_4GBs", 4.0)):
        up = bytes_per_gop / (gbs * 1e9) * 1e3
        proj = max(dev_ms, up) + residual
        results[f"projected_e2e_fps_{name}"] = round(T / proj * 1e3, 2)
    results["projection_method"] = (
        "fps = T / (max(device_ms, upload_ms@link) + residual); device_ms"
        " = bench-style device-resident rate (tools/"
        "check_fused_pack_results.json), residual = measured serial -"
        " measured upload - device_ms (host mux glue + packetization)"
    )

    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
