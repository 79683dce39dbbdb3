"""Streaming pipeline (bounded-memory long-video path) parity.

infer_video_depth_streaming must reproduce infer_video_depth bit-exactly:
both run the same cached-keyframe window graph and the same stitch scan,
only the frame delivery differs (iterator + O(window) residency vs full
array). Edge cases mirror the window math: short video (< one window),
exact window boundary, odd tails.
"""
import numpy as np
import pytest

import jax

from video_depth_anything_tpu.config import ModelConfig, ViTConfig
from video_depth_anything_tpu.models.video_depth import init_params
from video_depth_anything_tpu.pipeline import VideoDepthPipeline

from test_precision_budget import synthetic_video


@pytest.fixture(scope="module")
def pipe():
    cfg = ModelConfig(
        encoder="_tinystream",
        vit_override=ViTConfig(embed_dim=64, depth=2, num_heads=2),
        features=32,
        out_channels=(32, 32, 32, 32), taps=(0, 0, 1, 1))
    params = init_params(jax.random.PRNGKey(0), cfg)
    return VideoDepthPipeline(cfg, params, use_pallas=False)


@pytest.mark.parametrize("n", [10, 23, 32, 50, 54])
def test_streaming_matches_batch(pipe, n):
    frames = synthetic_video(n=n, hw=(42, 56))
    ref, _ = pipe.infer_video_depth(frames, input_size=28)
    chunks = list(pipe.infer_video_depth_streaming(iter(frames),
                                                   input_size=28))
    got = np.concatenate(chunks, axis=0)
    assert got.shape == ref.shape == (n, 42, 56)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("n", [10, 50, 100])
def test_chunked_streaming_matches_batch(pipe, n):
    """windows_per_batch>1 streaming (dedup-encode chunks) must match the
    batch path exactly — lifts the old streaming/batching exclusivity
    (VERDICT r3 item 5)."""
    frames = synthetic_video(n=n, hw=(42, 56))
    ref, _ = pipe.infer_video_depth(frames, input_size=28, fp32=True,
                                    windows_per_batch=2)
    chunks = list(pipe.infer_video_depth_streaming(
        iter(frames), input_size=28, fp32=True, windows_per_batch=2))
    got = np.concatenate(chunks, axis=0)
    assert got.shape == ref.shape == (n, 42, 56)
    if n >= 50:  # both paths run identical C=2 chunks -> bit parity
        np.testing.assert_array_equal(got, ref)
    else:
        # single-window video: the batch API clamps windows_per_batch to
        # k_total=1 (sequential path) while chunked streaming pads to C=2,
        # so conv batching reassociates at fp32 epsilon
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_chunked_streaming_on_mesh_matches_single_device():
    """Streaming + mesh (formerly NotImplementedError): chunked streaming
    over a 4x2 mesh equals the single-device batch output."""
    from video_depth_anything_tpu.parallel import make_mesh

    cfg = ModelConfig(
        encoder="_tinystreammesh",
        vit_override=ViTConfig(embed_dim=64, depth=2, num_heads=2),
        features=32,
        out_channels=(32, 32, 32, 32), taps=(0, 0, 1, 1))
    params = init_params(jax.random.PRNGKey(0), cfg)
    frames = synthetic_video(n=100, hw=(42, 56))

    single = VideoDepthPipeline(cfg, params, use_pallas=False)
    ref, _ = single.infer_video_depth(frames, input_size=28, fp32=True)

    mesh = make_mesh(n_data=4, n_model=2)
    sharded = VideoDepthPipeline(cfg, params, mesh=mesh, use_pallas=False)
    chunks = list(sharded.infer_video_depth_streaming(
        iter(frames), input_size=28, fp32=True, windows_per_batch=4))
    got = np.concatenate(chunks, axis=0)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_incremental_writer_matches_batch_writer(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from video_depth_anything_tpu.utils.video_io import (IncrementalVideoWriter,
                                                         read_video_frames,
                                                         save_video)

    frames = synthetic_video(n=9, hw=(32, 48))
    a, b = str(tmp_path / "a.mp4"), str(tmp_path / "b.mp4")
    save_video(frames, a, fps=10)
    with IncrementalVideoWriter(b, fps=10) as w:
        for f in frames:
            w.append(f)
    fa, _ = read_video_frames(a)
    fb, _ = read_video_frames(b)
    assert fa.shape == fb.shape == (9, 32, 48, 3)
    # same codec settings -> decoded content matches to compression noise
    assert np.mean(np.abs(fa.astype(np.int16) - fb.astype(np.int16))) < 2.0


def test_stream_video_frames_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from video_depth_anything_tpu.utils.video_io import (read_video_frames,
                                                         stream_video_frames)

    frames = synthetic_video(n=12, hw=(32, 48))
    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 32))
    for f in frames:
        w.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    w.release()

    batch, fps_a = read_video_frames(path)
    it, fps_b, hw = stream_video_frames(path)
    streamed = np.stack(list(it))
    assert fps_a == fps_b and hw == (32, 48)
    np.testing.assert_array_equal(streamed, batch)


def test_stream_video_frames_abandoned_releases_decoder(tmp_path):
    """Closing the frame generator early must unblock and end the decoder
    thread (it would otherwise sit in q.put forever with the capture open)."""
    import threading
    import time

    cv2 = pytest.importorskip("cv2")
    from video_depth_anything_tpu.utils.video_io import (save_video,
                                                         stream_video_frames)

    frames = synthetic_video(n=40, hw=(32, 48))
    path = str(tmp_path / "v.mp4")
    save_video(frames, path, fps=10)

    before = {t.ident for t in threading.enumerate()}
    it, fps, hw = stream_video_frames(path, prefetch=2)
    next(it)  # start the generator so its finally-cleanup is armed
    it.close()

    deadline = time.time() + 5.0
    while time.time() < deadline:
        extra = [t for t in threading.enumerate()
                 if t.ident not in before and t.is_alive()]
        if not extra:
            break
        time.sleep(0.05)
    assert not extra, f"decoder thread leaked: {extra}"


def test_streaming_int8_matches_batch_int8():
    """--int8 + --streaming: first-window calibration sees identical frames
    in both paths, so streaming int8 must match batch int8 bit-exactly."""
    cfg = ModelConfig(
        encoder="_tinystream8",
        vit_override=ViTConfig(embed_dim=64, depth=2, num_heads=2),
        features=32,
        out_channels=(32, 32, 32, 32), taps=(0, 0, 1, 1))
    params = init_params(jax.random.PRNGKey(0), cfg)
    pipe8 = VideoDepthPipeline(cfg, params, use_pallas=False, quant="int8")
    frames = synthetic_video(n=50, hw=(42, 56))
    ref, _ = pipe8.infer_video_depth(frames, input_size=28)
    chunks = list(pipe8.infer_video_depth_streaming(iter(frames),
                                                    input_size=28))
    got = np.concatenate(chunks, axis=0)
    np.testing.assert_array_equal(got, ref)


def test_depth_spool_equivalence_and_bounded_memory(tmp_path):
    """DepthSpool output == concatenate(chunks) with the exact global range,
    and spooling a video far larger than one chunk keeps host allocations
    O(chunk) (tracemalloc peak), making --streaming bounded end to end."""
    import tracemalloc

    from video_depth_anything_tpu.utils.video_io import (DepthSpool,
                                                         depth_visualization)

    rng = np.random.default_rng(0)
    chunks = [rng.standard_normal((10, 64, 64)).astype(np.float32)
              for _ in range(100)]  # 16 MB total, 160 KB per chunk
    ref = np.concatenate(chunks, axis=0)

    spool = DepthSpool(str(tmp_path / "d.spool.f32"))
    tracemalloc.start()
    for c in chunks:
        spool.append(c)
    mm = spool.finish()
    # touch the memmap the way the writers do (block reads)
    s = 0.0
    for i in range(0, len(mm), 16):
        s += float(np.asarray(mm[i:i + 16]).sum())
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    assert peak < 4 * 1024 * 1024, f"peak {peak} bytes — not bounded"
    assert mm.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(mm[::17]), ref[::17])
    assert (spool.min, spool.max) == (float(ref.min()), float(ref.max()))
    # vis normalization from the running range == from the full array
    np.testing.assert_array_equal(
        depth_visualization(ref[:4], value_range=(spool.min, spool.max)),
        depth_visualization(np.concatenate([ref[:4], ref.reshape(1000, 64, 64)]),
                            )[:4])
    del mm
    spool.cleanup()
    import os
    assert not os.path.exists(spool.path)


def test_save_depth_video_streamed_matches_save_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from video_depth_anything_tpu.utils.video_io import (
        DepthSpool, read_video_frames, save_depth_video_streamed, save_video)

    rng = np.random.default_rng(1)
    depths = rng.standard_normal((9, 32, 48)).astype(np.float32)
    a, b = str(tmp_path / "a.mp4"), str(tmp_path / "b.mp4")
    save_video(depths, a, fps=10, is_depths=True)

    spool = DepthSpool(str(tmp_path / "d.f32"))
    for i in range(0, 9, 4):
        spool.append(depths[i:i + 4])
    mm = spool.finish()
    save_depth_video_streamed(mm, b, 10, (spool.min, spool.max),
                              chunk_frames=4)
    fa, _ = read_video_frames(a)
    fb, _ = read_video_frames(b)
    assert fa.shape == fb.shape
    assert np.mean(np.abs(fa.astype(np.int16) - fb.astype(np.int16))) < 2.0
    del mm
    spool.cleanup()


def test_ffmpeg_decode_backend_matches_cv2(tmp_path):
    """The decord-class ffmpeg raw-pipe backend (VERDICT r2 'missing' #4)
    reproduces the cv2 backend's frame count, stride selection, max_res
    geometry, and pixels (yuv->rgb rounding differs between libswscale and
    cv2 by +-1/255 on a few pixels -> small tolerance, not exactness)."""
    pytest.importorskip("imageio_ffmpeg")
    from video_depth_anything_tpu.utils.video_io import (read_video_frames,
                                                         save_video,
                                                         stream_video_frames)

    frames = synthetic_video(n=20, hw=(36, 60))
    path = str(tmp_path / "clip.mp4")
    save_video(frames, path, fps=10)

    # full-res + fps stride (10 -> 5 fps = keep n%2==0) + max_len
    a, fps_a = read_video_frames(path, 7, 5, -1, decode_backend="cv2")
    b, fps_b = read_video_frames(path, 7, 5, -1, decode_backend="ffmpeg")
    assert fps_a == fps_b and a.shape == b.shape == (7, 36, 60, 3)
    assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 4

    # max_res binds: both resize with cv2.INTER_AREA on the consumer side
    c, _ = read_video_frames(path, -1, -1, 24, decode_backend="cv2")
    d, _ = read_video_frames(path, -1, -1, 24, decode_backend="ffmpeg")
    assert c.shape == d.shape and c.shape[1:3] == (14, 24)
    assert np.abs(c.astype(np.int16) - d.astype(np.int16)).max() <= 4

    # streaming wrapper drains the subprocess pipe; early close() must
    # terminate ffmpeg instead of deadlocking on the pipe
    full, _ = read_video_frames(path, decode_backend="ffmpeg")
    it, _, hw = stream_video_frames(path, decode_backend="ffmpeg")
    assert hw == (36, 60)
    got = np.stack([next(it), next(it)])
    it.close()
    np.testing.assert_array_equal(got, full[:2])


class _FakePipeReader:
    """Stands in for imageio_ffmpeg.read_frames: first next() yields the
    probe meta dict, then raw RGB24 frame bytes; close() is recorded so
    tests can assert the subprocess-termination contract."""

    def __init__(self, frames, meta, stride):
        self._it = iter(np.asarray(frames)[::stride])
        self.meta = dict(meta)
        self.closed = False
        self._sent_meta = False

    def __iter__(self):
        return self

    def __next__(self):
        if not self._sent_meta:
            self._sent_meta = True
            return self.meta
        return next(self._it).tobytes()

    def close(self):
        self.closed = True


def _install_fake_imageio_ffmpeg(monkeypatch, videos):
    """sys.modules['imageio_ffmpeg'] stub backed by `videos`:
    {path: (frames [N,H,W,3] uint8 as-decoded, meta dict)}. Honors the
    select-filter stride _ffmpeg_decode_iter passes via output_params.
    Returns the list of readers handed out (for close() assertions)."""
    import re
    import sys
    import types

    readers = []

    def read_frames(path, pix_fmt="rgb24", output_params=None):
        assert pix_fmt == "rgb24"
        stride = 1
        for p in output_params or []:
            m = re.search(r"mod\(n\\,(\d+)\)", p)
            if m:
                stride = int(m.group(1))
        frames, meta = videos[path]
        r = _FakePipeReader(frames, meta, stride)
        readers.append(r)
        return r

    mod = types.SimpleNamespace(read_frames=read_frames)
    monkeypatch.setitem(sys.modules, "imageio_ffmpeg", mod)
    return readers


def test_ffmpeg_decode_iter_mocked_pipe(monkeypatch):
    """Executes _ffmpeg_decode_iter's full logic (probe, stride select,
    max_res resize, rotation swap, byte validation, early-exit close) in CI
    against a mocked pipe — the real-binary equivalence test above skips on
    images without imageio-ffmpeg (VERDICT r3 weak #5)."""
    import cv2

    from video_depth_anything_tpu.utils.video_io import (read_video_frames,
                                                         stream_video_frames)

    src = synthetic_video(n=12, hw=(36, 60))
    meta = {"size": (60, 36), "fps": 10.0}
    readers = _install_fake_imageio_ffmpeg(
        monkeypatch, {"v.mp4": (src, meta)})

    # identity: full decode, fps passthrough
    a, fps = read_video_frames("v.mp4", decode_backend="ffmpeg")
    assert fps == 10.0
    np.testing.assert_array_equal(a, src)

    # fps stride (10 -> 5 fps: keep n%2==0) + max_len truncation
    b, fps_b = read_video_frames("v.mp4", 4, 5, -1, decode_backend="ffmpeg")
    assert fps_b == 5
    np.testing.assert_array_equal(b, src[::2][:4])
    # early max_len exit must have closed the pipe reader deterministically
    assert readers[-1].closed

    # max_res: consumer-side cv2.INTER_AREA, identical to the cv2 backend's
    c, _ = read_video_frames("v.mp4", -1, -1, 24, decode_backend="ffmpeg")
    want = np.stack([cv2.resize(f, (24, 14), interpolation=cv2.INTER_AREA)
                     for f in src])
    assert c.shape == (12, 14, 24, 3)
    np.testing.assert_array_equal(c, want)

    # streaming wrapper: background thread drains the pipe; close() after
    # two frames terminates the reader instead of deadlocking
    it, fps_s, hw = stream_video_frames("v.mp4", decode_backend="ffmpeg")
    assert (fps_s, hw) == (10.0, (36, 60))
    got = np.stack([next(it), next(it)])
    it.close()
    np.testing.assert_array_equal(got, src[:2])


def test_ffmpeg_decode_iter_rotation_and_bad_pipe(monkeypatch):
    """Rotation metadata swaps the pipe geometry (ADVICE r3 #2); a stream
    whose frames disagree with the probe fails with a clear error instead
    of a garbled reshape."""
    from video_depth_anything_tpu.utils.video_io import read_video_frames

    # A portrait phone clip: container says 64x48 (w,h) + rotate=90, the
    # autorotated pipe actually carries 48-wide, 64-tall frames.
    rot = synthetic_video(n=5, hw=(64, 48))
    # Garbage stream: probe claims 60x36 but the pipe carries 48x36 frames.
    bad = synthetic_video(n=3, hw=(36, 48))
    _install_fake_imageio_ffmpeg(monkeypatch, {
        "rot.mp4": (rot, {"size": (64, 48), "fps": 8.0, "rotate": "90"}),
        "bad.mp4": (bad, {"size": (60, 36), "fps": 8.0}),
    })

    r, _ = read_video_frames("rot.mp4", decode_backend="ffmpeg")
    np.testing.assert_array_equal(r, rot)

    with pytest.raises(ValueError, match="decode_backend='cv2'"):
        read_video_frames("bad.mp4", decode_backend="ffmpeg")


def test_explicit_ffmpeg_backend_raises_when_unavailable(monkeypatch):
    """An explicit decode_backend='ffmpeg' must fail loudly (not silently
    decode in-process) when imageio-ffmpeg is missing; the env-var path
    keeps the soft fallback but warns."""
    import sys
    import warnings

    from video_depth_anything_tpu.utils.video_io import _resolve_backend

    # Poison the import so the test is deterministic on hosts that DO have
    # imageio-ffmpeg installed.
    monkeypatch.setitem(sys.modules, "imageio_ffmpeg", None)
    with pytest.raises(ImportError, match="imageio-ffmpeg"):
        _resolve_backend("ffmpeg")
    monkeypatch.setenv("VDA_DECODE_BACKEND", "ffmpeg")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert _resolve_backend(None) == "cv2"
    assert any("falling back to cv2" in str(w.message) for w in rec)


def test_transfer_fp16_transport(pipe):
    """Opt-in fp16 depth TRANSPORT: outputs stay fp32, match the fp32
    transport within fp16 readout rounding (2^-11 relative), and the
    streaming path is bit-identical to the batch path in the same mode."""
    cfg, params = pipe.cfg, pipe.params
    hp = VideoDepthPipeline(cfg, params, use_pallas=False,
                            transfer_fp16=True)
    frames = synthetic_video(n=50, hw=(42, 56))
    ref, _ = pipe.infer_video_depth(frames, input_size=28)
    got, _ = hp.infer_video_depth(frames, input_size=28)
    assert got.dtype == np.float32 and got.shape == ref.shape
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() <= 2.0 ** -10 * scale

    chunks = list(hp.infer_video_depth_streaming(iter(frames),
                                                 input_size=28))
    np.testing.assert_array_equal(np.concatenate(chunks, axis=0), got)
