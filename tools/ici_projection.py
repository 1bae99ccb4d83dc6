"""Cycle-accounted ICI/DCN projection for the multi-chip encode paths
(r3 VERDICT item 4c): turn the >=80% 1->N scaling target (BASELINE.json
configs 4-5) into a calculation a pod run can falsify.

Method: every collective in the sharded programs moves a statically-known
byte count per frame (the shard_map programs have static shapes — the
numbers below are exact, not sampled). Combined with the measured per-chip
frame time (tools/check_fused_pack_results.json, else 10.5 ms) and public
per-chip link bandwidths, that gives per-frame communication time and a
projected scaling efficiency under two bracketing assumptions:

  serial  = compute / (compute + comm)      (no compute/comm overlap)
  overlap = compute / max(compute, comm)    (perfect overlap)

Link-bandwidth assumptions (stated, conservative):
  v5e ICI: 1600 Gbit/s per chip total (public TPU v5e spec), 4 links ->
           50 GB/s one-way per neighbor link.
  DCN:     200 Gbit/s NIC per host -> 25 GB/s.

Collective inventory per P-frame (from the actual programs):
  DP  (gop axis, parallel/gop_parallel.py): ZERO bytes — GOPs are closed
      under prediction; the only sync is the host mux.
  TP  (tile rows, parallel/tiles.py exchange_halo): each non-boundary
      shard sends 16 luma recon rows up + down and 8 chroma rows x2
      planes up + down; recon dtype int32 today (a uint8 carry — ROADMAP
      traffic item — would quarter it; both are tabulated).
  SP  (ring, parallel/ring.py): the whole recon frame + RC scalars hop to
      the ring neighbor every frame.
  rc=mb on 2-D tiles: one psum + all_gather of per-MB bit estimates
      (int32 per MB) along 'tc' — bytes counted, invariably negligible.

Writes tools/ici_projection.json and prints the BASELINE.md table.
"""

import json
import os

ICI_LINK_GBS = 50.0   # one-way GB/s per v5e neighbor link (1600 Gbit/s / 4)
DCN_GBS = 25.0        # per-host GB/s (200 Gbit NIC)
GB = 1e9


def tile_halo_bytes(w: int, dtype_bytes: int) -> int:
    """Bytes SENT per non-boundary shard per P-frame (each direction uses
    a different neighbor link; we count the per-link max, i.e. one
    direction), luma 16 rows + 2 chroma planes x 8 rows at W/2."""
    luma = 16 * w * dtype_bytes
    chroma = 2 * 8 * (w // 2) * dtype_bytes
    return luma + chroma


def ring_bytes(h: int, w: int, dtype_bytes: int) -> int:
    """Recon frame (Y + Cb + Cr) + RC scalars per ring hop."""
    return int(1.5 * h * w) * dtype_bytes + 8


def rc_mb_bytes(h: int, w: int, sc: int) -> int:
    """psum + all_gather of per-MB int32 estimates along 'tc' (ring algo:
    each chip sends its shard (sc-1) times for the gather + once for the
    psum ~ 2x shard size, upper bound)."""
    n_mbs = (h // 16) * (w // 16)
    return 2 * 4 * n_mbs // sc * (sc - 1)


def main():
    res_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "merge_budget_results.json")
    ms_1080 = 10.5
    try:
        with open(res_path) as f:
            ms_1080 = json.load(f)["1080p_gop30_qp30"]["ms"]
    except (OSError, KeyError):
        pass
    # 4K compute scales ~4x the 1080p per-frame time on one chip (matrix
    # table); per-shard compute divides by the shard count.
    shapes = {"1080p": (1088, 1920, ms_1080), "4K": (2176, 3840, 4 * ms_1080)}

    rows = []
    out = {"assumptions": {
        "ici_link_one_way_GBs": ICI_LINK_GBS, "dcn_GBs": DCN_GBS,
        "compute_ms_per_frame_1080p_1chip": ms_1080,
        "method": "static per-frame collective bytes / link bandwidth; "
                  "serial = c/(c+t), overlap = c/max(c,t)"}}

    def add(name, n, comp_ms, bytes_per_frame, bw_gbs):
        t_ms = bytes_per_frame / (bw_gbs * GB) * 1e3
        serial = comp_ms / (comp_ms + t_ms)
        overlap = comp_ms / max(comp_ms, t_ms)
        rows.append((name, n, round(comp_ms, 3), bytes_per_frame,
                     round(t_ms, 4), round(serial, 4), round(overlap, 4)))

    for label, (h, w, ms1) in shapes.items():
        # DP over GOPs: zero bytes at any N
        add(f"DP gop-parallel {label}", "any N", ms1, 0, ICI_LINK_GBS)
        # TP tile rows, ICI, int32 and uint8 recon
        for n in (4, 8):
            add(f"TP tiles x{n} {label} int32 recon", n, ms1 / n,
                tile_halo_bytes(w, 4), ICI_LINK_GBS)
            add(f"TP tiles x{n} {label} uint8 recon", n, ms1 / n,
                tile_halo_bytes(w, 1), ICI_LINK_GBS)
        # SP ring, ICI
        add(f"SP ring x8 {label} int32 recon", 8, ms1,
            ring_bytes(h, w, 4), ICI_LINK_GBS)
        add(f"SP ring x8 {label} uint8 recon", 8, ms1,
            ring_bytes(h, w, 1), ICI_LINK_GBS)
        # multi-host: DP over DCN (mux only — zero), TP across 2 hosts:
        # only the one inter-host seam crosses DCN
        add(f"TP tiles 2 hosts x4 {label} seam over DCN int32", 8, ms1 / 8,
            tile_halo_bytes(w, 4), DCN_GBS)
        # rc=mb collective on 2-D tiles (sc=4)
        add(f"rc=mb tc-gather sc=4 {label}", 4, ms1 / 4,
            rc_mb_bytes(h, w, 4), ICI_LINK_GBS)

    out["rows"] = [dict(zip(
        ("path", "chips", "compute_ms_per_shard", "bytes_per_frame",
         "comm_ms", "eff_serial", "eff_overlap"), r)) for r in rows]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ici_projection.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)

    print("| path | chips | compute ms/shard | bytes/frame | comm ms "
          "| eff (serial) | eff (overlap) |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(str(x) for x in r) + " |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
