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
# remote-compile relay cost minutes; cache them across processes.
try:  # pragma: no cover - environment dependent
    import os as _os

    import jax as _jax

    _cache = _os.environ.get("TVC_JAX_CACHE", _os.path.expanduser("~/.tvc_jax_cache"))
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
