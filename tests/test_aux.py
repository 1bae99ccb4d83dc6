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
    fault = FaultInjector({0}, times=4)  # primary keeps failing
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


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 fake devices")
@pytest.mark.parametrize("rc", ["bitrate", "vbv"])
def test_ring_pipeline_with_rate_control(rng, rc):
    """The ring hop carries RC state (qp, vbv fullness) with the recon, so
    rc='bitrate'/'vbv' streams follow the exact single-device trajectory
    (VERDICT r1 weak #3)."""
    from video_encoder_tpu.parallel.ring import RingEncoder
    from video_encoder_tpu.pipeline.gop_engine import GopEngine

    d, t, h, w = 4, 4, 32, 48
    cfg = EncoderConfig(
        width=w, height=h, gop_n=t, base_qp=30, search="full",
        rc=rc, target_kbps=64, fps_num=10,
    )
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
        assert [p.to_bytes() for p in got[s]] == [
            p.to_bytes() for p in ref[s]
        ], f"stream {s} mismatch under rc={rc}"


def test_failover_catches_real_engine_errors(rng):
    """Recovery must engage for genuine device failures (XlaRuntimeError is
    a RuntimeError subclass), not only the injected GopFailure
    (VERDICT r1 weak #4)."""
    clip = make_clip(rng, 48, 32, 2)
    cfg = EncoderConfig(width=48, height=32, gop_n=2, base_qp=27)
    eng = GoldenGopAdapter(cfg)
    frames = [golden.Frame.from_planes(*f) for f in clip]

    class FlakyEngine:
        def __init__(self, fails):
            self.fails = fails
            self.calls = 0

        def encode_gop(self, gop, first):
            self.calls += 1
            if self.fails > 0:
                self.fails -= 1
                raise RuntimeError("RESOURCE_EXHAUSTED: fake device OOM")
            return eng.encode_gop(gop, first)

    # transient failure: retried on the primary
    flaky = FlakyEngine(fails=1)
    got = encode_gops_with_recovery(flaky, [frames], [0], max_retries=2)
    assert len(got) == 2 and flaky.calls == 2

    # persistent primary failure: rerouted to the fallback once
    dead = FlakyEngine(fails=100)
    got = encode_gops_with_recovery(
        dead, [frames], [0], fallback=eng, max_retries=2
    )
    assert len(got) == 2

    # fallback also failing must raise, not loop forever
    with pytest.raises(RuntimeError):
        encode_gops_with_recovery(
            dead, [frames], [0], fallback=FlakyEngine(fails=100), max_retries=2
        )

    # programming errors propagate immediately (not retried)
    class Buggy:
        def encode_gop(self, gop, first):
            raise TypeError("bug")

    with pytest.raises(TypeError):
        encode_gops_with_recovery(Buggy(), [frames], [0], max_retries=2)


def test_mux_invariants_raise(rng):
    import io as _io

    from video_encoder_tpu.codec.bitstream import FramePacket, OrderedMux

    cfg = EncoderConfig(width=48, height=32, gop_n=2, base_qp=27)
    mux = OrderedMux(_io.BytesIO(), cfg, 3)
    pkt = FramePacket(0, 0, 27, 32, b"\x00\x00\x00\x00")
    mux.push(pkt)
    with pytest.raises(ValueError, match="already muxed"):
        mux.push(pkt)
    mux.push(FramePacket(2, 1, 27, 32, b"\x00\x00\x00\x00"))
    with pytest.raises(ValueError, match="duplicate"):
        mux.push(FramePacket(2, 1, 27, 32, b"\x00\x00\x00\x00"))
    with pytest.raises(ValueError, match="missing frames"):
        mux.close()


def test_resume_validates_byte_offset(tmp_path, rng):
    """A checkpoint pointing past the stream's end means lost data; resume
    must refuse instead of silently writing at a gap (VERDICT r1 weak #6)."""
    from video_encoder_tpu.pipeline import checkpoint
    from video_encoder_tpu.pipeline.bitstream_writer import open_stream_for_resume

    cfg = EncoderConfig(width=48, height=32, gop_n=2, base_qp=27)
    path = str(tmp_path / "s.tvc")
    f = open_stream_for_resume(path, cfg, 4, None)
    f.write(b"\xaa" * 64)
    f.close()
    size = 64 + 24  # payload + header

    good = checkpoint.EncodeState(cfg.config_hash(), 2, size, 2, 0, 0.0, 0.0)
    f = open_stream_for_resume(path, cfg, 4, good)
    f.close()

    ahead = checkpoint.EncodeState(cfg.config_hash(), 2, size + 999, 2, 0, 0.0, 0.0)
    with pytest.raises(ValueError, match="exceeds stream size"):
        open_stream_for_resume(path, cfg, 4, ahead)

    inside_hdr = checkpoint.EncodeState(cfg.config_hash(), 0, 3, 0, 0, 0.0, 0.0)
    with pytest.raises(ValueError, match="header"):
        open_stream_for_resume(path, cfg, 4, inside_hdr)

    other = EncoderConfig(width=48, height=32, gop_n=4, base_qp=30)
    mismatch = checkpoint.EncodeState(other.config_hash(), 2, size, 2, 0, 0.0, 0.0)
    with pytest.raises(ValueError, match="different config"):
        open_stream_for_resume(path, other, 4, mismatch)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 fake devices")
def test_ring_pipeline_v4_equals_single(rng):
    """Format v4 (half-pel motion) on the temporal ring (r4 verdict item 9:
    ring was v4-safe by construction — it routes through
    encode_frame_traced — but no test pinned it). Byte-equality vs the
    single-device GOP engine, rc=vbv riding the ring state too."""
    from video_encoder_tpu.parallel.ring import RingEncoder
    from video_encoder_tpu.pipeline.gop_engine import GopEngine

    d, t, h, w = 2, 3, 32, 48
    cfg = EncoderConfig(width=w, height=h, gop_n=t, base_qp=28, search="full",
                        format_version=4, chroma_qp_offset=2, rc="vbv",
                        target_kbps=400, fps_num=30, fps_den=1)
    streams = []
    for s in range(d):
        clip = make_clip(rng, w, h, t)
        streams.append([golden.Frame.from_planes(*f) for f in clip])

    eng = GopEngine(cfg)
    ref = [eng.encode_gop(streams[s], s * t)[0] for s in range(d)]
    mesh = Mesh(np.array(jax.devices()[:d]), ("ring",))
    got = RingEncoder(cfg, mesh).encode_streams(
        streams, [s * t for s in range(d)])
    for s in range(d):
        assert all(a.to_bytes() == b.to_bytes()
                   for a, b in zip(ref[s], got[s])), f"stream {s} mismatch"
