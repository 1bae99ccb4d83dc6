"""Aux subsystems (SURVEY.md §5): checkpoint/resume byte-exactness, failure
recovery with fault injection, temporal ring pipeline, stage timers."""

import io
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from video_encoder_tpu.codec import golden
from video_encoder_tpu.codec.config import EncoderConfig
from video_encoder_tpu.parallel.failover import (
    FaultInjector, GopFailure, encode_gops_with_recovery,
)
from video_encoder_tpu.pipeline.encoder import (
    GoldenGopAdapter, encode_clip, encode_clip_resumable,
)

from conftest import make_clip


def test_checkpoint_resume_byte_identical(tmp_path, rng):
    clip = make_clip(rng, 48, 32, 6)
    cfg = EncoderConfig(width=48, height=32, gop_n=2, base_qp=27)
    eng = GoldenGopAdapter(cfg)

    # uninterrupted reference
    buf = io.BytesIO()
    encode_clip(cfg, clip, buf, n_frames=6)
    ref_bytes = buf.getvalue()

    # interrupted: engine that dies after 2 GOPs
    class Dying:
        def __init__(self):
            self.n = 0

        def encode_gop(self, frames, first):
            self.n += 1
            if self.n > 2:
                raise KeyboardInterrupt
            return eng.encode_gop(frames, first)

    out = tmp_path / "o.tvc"
    ck = str(tmp_path / "ck.json")
    with pytest.raises(KeyboardInterrupt):
        encode_clip_resumable(cfg, clip, str(out), 6, Dying(), ck)

    # resume with a healthy engine
    summary = encode_clip_resumable(cfg, clip, str(out), 6, eng, ck)
    assert summary.frames == 6
    assert out.read_bytes() == ref_bytes
    import os

    assert not os.path.exists(ck)  # cleared on completion


def test_checkpoint_config_mismatch(tmp_path, rng):
    from video_encoder_tpu.pipeline import checkpoint as ckpt

    cfg1 = EncoderConfig(width=48, height=32, gop_n=2, base_qp=27)
    cfg2 = EncoderConfig(width=48, height=32, gop_n=3, base_qp=27)
    p = str(tmp_path / "ck.json")
    ckpt.save(p, ckpt.EncodeState(cfg1.config_hash(), 2, 100, 2, 999, 1.0, 60.0))
    assert ckpt.load(p, cfg1) is not None
    with pytest.raises(ValueError):
        ckpt.load(p, cfg2)


def test_failover_reencodes_failed_gop(rng):
    clip = make_clip(rng, 48, 32, 4)
    cfg = EncoderConfig(width=48, height=32, gop_n=2, base_qp=27)
    eng = GoldenGopAdapter(cfg)
    frames = [golden.Frame.from_planes(*f) for f in clip]
    gops = [frames[0:2], frames[2:4]]

    ref = encode_gops_with_recovery(eng, gops, [0, 2])
    fault = FaultInjector({2}, times=1)
    got = encode_gops_with_recovery(eng, gops, [0, 2], fault=fault)
    assert fault.injected == 1
    assert [p.to_bytes() for p in got] == [p.to_bytes() for p in ref]


def test_failover_falls_back_to_survivor(rng):
    clip = make_clip(rng, 48, 32, 2)
    cfg = EncoderConfig(width=48, height=32, gop_n=2, base_qp=27)
    eng = GoldenGopAdapter(cfg)
    frames = [golden.Frame.from_planes(*f) for f in clip]
    fault = FaultInjector({0}, times=5)  # primary keeps failing
    got = encode_gops_with_recovery(
        eng, [frames], [0], fallback=eng, max_retries=2, fault=fault
    )
    assert len(got) == 2

    fault = FaultInjector({0}, times=5)
    with pytest.raises(GopFailure):
        encode_gops_with_recovery(eng, [frames], [0], max_retries=2, fault=fault)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 fake devices")
def test_ring_pipeline_equals_single(rng):
    from video_encoder_tpu.parallel.ring import RingEncoder
    from video_encoder_tpu.pipeline.gop_engine import GopEngine

    d, t, h, w = 4, 3, 32, 48
    cfg = EncoderConfig(width=w, height=h, gop_n=t, base_qp=30, search="full")
    streams = []
    for s in range(d):
        clip = make_clip(rng, w, h, t)
        streams.append([golden.Frame.from_planes(*f) for f in clip])

    eng = GopEngine(cfg)
    ref = [eng.encode_gop(streams[s], s * t)[0] for s in range(d)]

    mesh = Mesh(np.array(jax.devices()[:d]), ("ring",))
    ring = RingEncoder(cfg, mesh)
    got = ring.encode_streams(streams, [s * t for s in range(d)])
    for s in range(d):
        assert all(
            a.to_bytes() == b.to_bytes() for a, b in zip(ref[s], got[s])
        ), f"stream {s} mismatch"


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 fake devices")
def test_ring_pipeline_unequal_streams(rng):
    """Drain/fill generalization: 3 streams of lengths 3/2/1 on a 4-device
    ring produce exactly the packets of per-stream single-device encodes."""
    from video_encoder_tpu.parallel.ring import RingEncoder
    from video_encoder_tpu.pipeline.gop_engine import GopEngine

    d, h, w = 4, 32, 48
    lens = [3, 2, 1]
    cfg = EncoderConfig(width=w, height=h, gop_n=3, base_qp=30, search="full")
    streams = []
    for s, t in enumerate(lens):
        clip = make_clip(rng, w, h, t)
        streams.append([golden.Frame.from_planes(*f) for f in clip])

    eng = GopEngine(cfg)
    ref = [eng.encode_gop(streams[s], s * 10)[0] for s in range(len(lens))]

    mesh = Mesh(np.array(jax.devices()[:d]), ("ring",))
    ring = RingEncoder(cfg, mesh)
    got = ring.encode_streams(streams, [s * 10 for s in range(len(lens))])
    assert [len(g) for g in got] == lens
    for s in range(len(lens)):
        assert all(
            a.to_bytes() == b.to_bytes() for a, b in zip(ref[s], got[s])
        ), f"stream {s} mismatch"


def test_stage_timer_and_eventlog():
    import io as _io
    import time

    from video_encoder_tpu.utils.trace import EventLog, StageTimer

    t = StageTimer()
    with t.stage("read"):
        time.sleep(0.01)
    with t.stage("read"):
        pass
    with t.stage("mux"):
        pass
    rep = t.report()
    assert rep["read"]["count"] == 2 and rep["read"]["total_s"] >= 0.01
    sink = _io.StringIO()
    log = EventLog(sink)
    log.emit("gop", first=0, frames=8)
    rec = json.loads(sink.getvalue())
    assert rec["event"] == "gop" and rec["frames"] == 8
