"""A/B the SEA-pruned full-search kernel against the exhaustive one
(r4 verdict items 3+7: ME is the single biggest measured stage at 4K —
11.6 of 34.8 ms — and the remaining lever is algorithmic candidate
reduction).

Measures, on the real chip, for 1080p and 4K:
- exhaustive (default) vs SEA (TVC_SEA=1) standalone full-search ms
- mv/sad bit-equality between the two (the SEA prune is exact: skipped
  rows satisfy SAD >= LB > best-so-far >= final min strictly)
- rows evaluated exactly per tile (of 33) via full_search_sea_stats
- a worst-case row: i.i.d.-random cur/ref, where column-sum bounds cannot
  prune (documented honesty row — SEA pays only its bound overhead)
- the ref-noise sweep that decided the default: the engine searches
  against the previous RECON, and at qp~30 its quantization noise floors
  the best SAD ~256*E|err| above what partial-sum bounds can reach —
  measured zero pruning at noise ±8, so SEA ships opt-in, not default
  (in-engine A/B: 28.5 -> 26.9 fps at 4K with SEA forced on).

Writes tools/exp_sea_results.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def synth_pair(h, w, seed=0):
    """bench.py-class content: smoothed texture, (2, 3) pan, random patch,
    +-2 noise — the pruning-realistic case."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h + 128, w + 128)).astype(np.int32)
    for _ in range(2):
        base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
                + np.roll(base, 2, 0) + np.roll(base, 2, 1)) // 5
    ref = base[:h, :w].copy()
    cur = base[2 : 2 + h, 3 : 3 + w].copy()
    cur += rng.integers(-2, 3, cur.shape)
    sq = rng.integers(0, 256, (64, 64))
    cur[300:364, 200:264] = sq
    return (jnp.asarray(np.clip(cur, 0, 255), jnp.int32),
            jnp.asarray(ref, jnp.int32))


def time_case(fn, cur, ref, reps):
    out = fn(cur, ref)
    jax.block_until_ready(out)
    np.asarray(out[0])  # host fetch: honest sync on the axon backend
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(cur, ref)
    np.asarray(out[0])
    return (time.perf_counter() - t0) / reps * 1e3, out


def fresh_full_search():
    """Fresh jitted callable per config (jax caches executables on callable
    identity — the r3 measurement-artifact lesson)."""
    from video_encoder_tpu.ops.pallas import sad as psad

    return jax.jit(lambda c, r: psad.full_search(c, r))


def main():
    results = {"_meta": {"platform": jax.default_backend(), "reps": 10}}
    from video_encoder_tpu.ops.pallas import sad as psad

    for name, (h, w) in {"1080p": (1088, 1920), "4K": (2160, 3840)}.items():
        cur, ref = synth_pair(h, w)
        os.environ["TVC_SEA"] = "0"
        ms_off, out_off = time_case(fresh_full_search(), cur, ref, 10)
        os.environ["TVC_SEA"] = "1"
        ms_on, out_on = time_case(fresh_full_search(), cur, ref, 10)
        eq = all(bool(jnp.array_equal(a, b)) for a, b in zip(out_off, out_on))
        _, _, _, cnt = jax.jit(psad.full_search_sea_stats)(cur, ref)
        cnt = np.asarray(cnt)
        results[name] = {
            "exhaustive_ms": round(ms_off, 3),
            "sea_ms": round(ms_on, 3),
            "speedup": round(ms_off / ms_on, 2),
            "mv_sad_equal": eq,
            "rows_of_33_mean": round(float(cnt.mean()), 2),
            "rows_of_33_max": int(cnt.max()),
        }
        print(name, results[name])

    # worst case: i.i.d. random content, bounds cannot prune
    rng = np.random.default_rng(7)
    h, w = 1088, 1920
    cur = jnp.asarray(rng.integers(0, 256, (h, w)), jnp.int32)
    ref = jnp.asarray(rng.integers(0, 256, (h, w)), jnp.int32)
    os.environ["TVC_SEA"] = "0"
    ms_off, out_off = time_case(fresh_full_search(), cur, ref, 10)
    os.environ["TVC_SEA"] = "1"
    ms_on, out_on = time_case(fresh_full_search(), cur, ref, 10)
    eq = all(bool(jnp.array_equal(a, b)) for a, b in zip(out_off, out_on))
    _, _, _, cnt = jax.jit(psad.full_search_sea_stats)(cur, ref)
    results["1080p_random_worstcase"] = {
        "exhaustive_ms": round(ms_off, 3),
        "sea_ms": round(ms_on, 3),
        "overhead_pct": round((ms_on / ms_off - 1) * 100, 1),
        "mv_sad_equal": eq,
        "rows_of_33_mean": round(float(np.asarray(cnt).mean()), 2),
    }
    print("worst", results["1080p_random_worstcase"])

    # the deciding measurement: pruning vs ref noise (recon error proxy)
    os.environ["TVC_SEA"] = "1"
    h, w = 2160, 3840
    cur, _ = synth_pair(h, w)
    base, _ = synth_pair(h, w, seed=0)
    sweep = {}
    for nz in (0, 2, 4, 8):
        refn = jnp.clip(
            base + jnp.asarray(
                np.random.default_rng(9).integers(-nz, nz + 1, (h, w))),
            0, 255).astype(jnp.int32)
        _, _, _, cnt = jax.jit(psad.full_search_sea_stats)(cur, refn)
        sweep[f"ref_noise_pm{nz}"] = round(float(np.asarray(cnt).mean()), 1)
    results["4K_rows_vs_ref_noise"] = sweep
    results["_decision"] = (
        "SEA ships OPT-IN (TVC_SEA=1): engine refs are qp~30 recons whose "
        "noise floor kills pruning (rows_of_33 -> 33 at ±8); forced-on "
        "in-engine A/B measured 28.5 -> 26.9 fps at 4K GOP=8."
    )
    print("noise sweep:", sweep)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "exp_sea_results.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
