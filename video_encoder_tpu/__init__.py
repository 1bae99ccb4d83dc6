"""video_encoder_tpu — a TPU-native video encode/decode engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of the
`arkanis/video-encoder` C pipeline (see SURVEY.md; the reference mount was
empty, so parity targets BASELINE.json's attested feature set): block motion
estimation (full ±16 / diamond SAD), 8×8 integer transform + per-MB
quantization, zigzag + Exp-Golomb entropy coding with a two-pass parallel
bit-pack, bit-exact reconstruction/decode, GOP/tile sharding over a device
mesh with collective reference-frame/halo exchange, and an in-order host mux.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: GOP-program compiles through the axon
# remote-compile relay cost minutes; cache them across processes. The dir
# is namespaced by a host-CPU-feature fingerprint: XLA:CPU AOT executables
# record the compile machine's features and loading them on a different
# host warns "could lead to execution errors such as SIGILL" — and did
# segfault the r3 test suite when a stale container's artifacts survived
# in the unnamespaced dir.
try:  # pragma: no cover - environment dependent
    import hashlib as _hashlib
    import os as _os

    import jax as _jax

    try:
        with open("/proc/cpuinfo") as _f:
            _flags = next((l for l in _f if l.startswith("flags")), "")
        _fp = _hashlib.md5(_flags.encode()).hexdigest()[:8]
    except OSError:
        _fp = "nofp"
    _cache = _os.environ.get(
        "TVC_JAX_CACHE", _os.path.expanduser(f"~/.tvc_jax_cache-{_fp}")
    )
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
