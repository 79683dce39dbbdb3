"""Host-side video decode/encode feeding the TPU pipeline.

Capability parity with reference utils/dc_utils.py:19-86 (decord/imageio
paths): fps-stride resampling, max_res downscale-to-even, max_len
truncation, inferno/grayscale depth visualization. Decode backends: OpenCV
(default — its yuv->rgb rounding defines the golden outputs) and a
decord-class ffmpeg raw-pipe subprocess (decode_backend="ffmpeg" /
VDA_DECODE_BACKEND=ffmpeg; see _ffmpeg_decode_iter, tools/bench_decode.py).
"""
from __future__ import annotations

import numpy as np

try:
    import cv2
    _CV2 = True
except ImportError:  # pragma: no cover
    _CV2 = False


def _ensure_even(v: int) -> int:
    return v if v % 2 == 0 else v + 1


def _open_video(video_path: str, target_fps: float, max_res: int):
    """Shared decode preamble: -> (cap, fps, stride, scale_hw, out_hw).

    fps-stride resampling + max_res downscale-to-even semantics of the
    reference (dc_utils.py:22-51)."""
    assert _CV2, "OpenCV required for video decode"
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {video_path}")
    original_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    scale_hw = None
    if max_res > 0 and max(h, w) > max_res:
        scale = max_res / max(h, w)
        scale_hw = (_ensure_even(round(h * scale)), _ensure_even(round(w * scale)))
    fps = original_fps if target_fps <= 0 else target_fps
    stride = max(round(original_fps / fps), 1)
    return cap, fps, stride, scale_hw, (scale_hw or (h, w))


def _decode_frame(frame, scale_hw):
    frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    if scale_hw is not None:
        frame = cv2.resize(frame, (scale_hw[1], scale_hw[0]),
                           interpolation=cv2.INTER_AREA)
    return frame


def _ffmpeg_decode_iter(video_path: str, target_fps: float, max_res: int):
    """decord-class decode backend: ffmpeg demux+decode+stride-select in a
    separate PROCESS, raw RGB24 over a pipe -> (iterator, fps, out_hw).

    The reference leans on decord for decode throughput
    (dc_utils.py:19-69); cv2.VideoCapture decodes in-process on the
    pipeline's own core and converts BGR->RGB per frame in Python. This
    backend moves decode + fps-stride dropping + RGB conversion into an
    ffmpeg subprocess (true decode/compute overlap even without threads
    to spare), keeping only the reference-exact cv2.INTER_AREA resize on
    the consumer side so max_res output stays bit-identical to the cv2
    backend. Stride select uses the same round(orig_fps/target) integer
    stride as _open_video. Select with tools/bench_decode.py; opt in via
    decode_backend="ffmpeg" or VDA_DECODE_BACKEND=ffmpeg (cv2 stays the
    default: its yuv->rgb rounding defines the repo's golden outputs, and
    ffmpeg's differs by +-1/255 on a few pixels)."""
    import imageio_ffmpeg

    # Probe stream geometry/fps first (cheap: header only, count=0 frames).
    probe = imageio_ffmpeg.read_frames(video_path, pix_fmt="rgb24")
    meta = next(probe)
    probe.close()
    w, h = meta["size"]
    # Rotation/display-matrix metadata: ffmpeg autorotates the decoded
    # output (matching cv2's behavior), so a 90/270 stream has transposed
    # geometry vs the probe's container size — swap to match the pipe.
    rotate = int(float(meta.get("rotate") or 0)) % 360
    if rotate in (90, 270):
        w, h = h, w
    original_fps = meta.get("fps") or 30.0
    scale_hw = None
    if max_res > 0 and max(h, w) > max_res:
        scale = max_res / max(h, w)
        scale_hw = (_ensure_even(round(h * scale)), _ensure_even(round(w * scale)))
    fps = original_fps if target_fps <= 0 else target_fps
    stride = max(round(original_fps / fps), 1)

    out_params = []
    if stride > 1:
        # display-order frame index n % stride == 0: the cv2 path's exact
        # keep rule (dc_utils.py:58-62). -vsync 0 (not -fps_mode, which only
        # exists in ffmpeg >= 5.1) so the 4.x binaries bundled with older
        # imageio-ffmpeg work; 5+ accepts -vsync as a deprecated alias.
        out_params += ["-vf", f"select=not(mod(n\\,{stride}))",
                       "-vsync", "0"]
    reader = imageio_ffmpeg.read_frames(video_path, pix_fmt="rgb24",
                                        output_params=out_params)
    next(reader)  # meta

    def frames():
        try:
            for raw in reader:
                if len(raw) != h * w * 3:
                    raise ValueError(
                        f"ffmpeg pipe frame is {len(raw)} bytes, expected "
                        f"{h}x{w}x3={h * w * 3} (probe size {meta['size']}, "
                        f"rotate={rotate}); the stream geometry disagrees "
                        "with the probe — use decode_backend='cv2'")
                f = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
                if scale_hw is not None:
                    f = cv2.resize(f, (scale_hw[1], scale_hw[0]),
                                   interpolation=cv2.INTER_AREA)
                yield f
        finally:
            reader.close()

    return frames(), fps, (scale_hw or (h, w))


def _resolve_backend(decode_backend):
    import os
    backend = decode_backend or os.environ.get("VDA_DECODE_BACKEND", "cv2")
    if backend not in ("cv2", "ffmpeg"):
        raise ValueError(f"unknown decode backend {backend!r} "
                         "(expected 'cv2' or 'ffmpeg')")
    if backend == "ffmpeg":
        try:
            import imageio_ffmpeg  # noqa: F401
        except ImportError:
            if decode_backend == "ffmpeg":
                # Explicit request (CLI --decode_backend ffmpeg): silently
                # decoding in-process instead would invalidate any perf A/B
                # the user is running — fail loudly.
                raise ImportError(
                    "decode_backend='ffmpeg' requires imageio-ffmpeg, which "
                    "is not installed; omit the flag to use cv2") from None
            import warnings
            warnings.warn("VDA_DECODE_BACKEND=ffmpeg but imageio-ffmpeg is "
                          "not installed; falling back to cv2")
            backend = "cv2"
    return backend


def read_video_frames(video_path: str, process_length: int = -1,
                      target_fps: float = -1, max_res: int = -1,
                      decode_backend: str | None = None):
    """-> (frames [N,H,W,3] uint8 RGB, fps). Mirrors dc_utils.py:22-69."""
    if _resolve_backend(decode_backend) == "ffmpeg":
        import contextlib
        it, fps, _ = _ffmpeg_decode_iter(video_path, target_fps, max_res)
        frames = []
        # closing() so an early break deterministically runs the
        # generator's finally (terminating the ffmpeg subprocess + pipe)
        # instead of relying on CPython refcounting.
        with contextlib.closing(it):
            for f in it:
                frames.append(f)
                if process_length > 0 and len(frames) >= process_length:
                    break
        if not frames:
            raise ValueError(f"no frames decoded from {video_path}")
        return np.stack(frames, axis=0), fps
    cap, fps, stride, scale_hw, _ = _open_video(video_path, target_fps, max_res)
    frames = []
    count = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if count % stride == 0:
            frames.append(_decode_frame(frame, scale_hw))
            if process_length > 0 and len(frames) >= process_length:
                break
        count += 1
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {video_path}")
    return np.stack(frames, axis=0), fps


def stream_video_frames(video_path: str, process_length: int = -1,
                        target_fps: float = -1, max_res: int = -1,
                        prefetch: int = 64,
                        decode_backend: str | None = None):
    """Streaming decode: -> (frame iterator, fps, (h, w)).

    Same fps-stride/max_res/max_len semantics as read_video_frames, but a
    background thread decodes into a bounded queue so decode overlaps
    device compute (pipeline.infer_video_depth_streaming) and host memory
    stays O(prefetch) instead of O(video). SURVEY §7 "hard parts": host
    decode throughput must overlap device compute for long 1280-res videos.
    With decode_backend="ffmpeg" the thread drains the subprocess pipe of
    _ffmpeg_decode_iter instead of running cv2 decode in-process.
    """
    import queue
    import threading

    if _resolve_backend(decode_backend) == "ffmpeg":
        src_it, fps, out_hw = _ffmpeg_decode_iter(video_path, target_fps,
                                                  max_res)
        cap = None
    else:
        cap, fps, stride, scale_hw, out_hw = _open_video(video_path,
                                                         target_fps, max_res)
        src_it = None
    q: queue.Queue = queue.Queue(maxsize=max(prefetch, 1))
    stop = object()
    abandoned = threading.Event()  # consumer gone: unblock q.put, release cap

    def put(item) -> bool:
        while not abandoned.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                pass
        return False

    def worker():
        try:
            if src_it is not None:  # ffmpeg backend: stride/scale done there
                emitted = 0
                for frame in src_it:
                    if abandoned.is_set() or not put(frame):
                        break
                    emitted += 1
                    if process_length > 0 and emitted >= process_length:
                        break
                return
            count, emitted = 0, 0
            while not abandoned.is_set():
                ok, frame = cap.read()
                if not ok:
                    break
                if count % stride == 0:
                    if not put(_decode_frame(frame, scale_hw)):
                        break
                    emitted += 1
                    if process_length > 0 and emitted >= process_length:
                        break
                count += 1
        except Exception as e:  # surface decode errors on the consumer side
            put(e)
        finally:
            if src_it is not None:
                src_it.close()  # terminates the ffmpeg subprocess
            else:
                cap.release()
            put(stop)

    threading.Thread(target=worker, daemon=True).start()

    def frames():
        # If the consumer abandons the generator (exception mid-stream,
        # early break), close() runs this finally and the decoder thread
        # exits instead of blocking forever on the bounded queue with an
        # open VideoCapture.
        try:
            while True:
                item = q.get()
                if item is stop:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            abandoned.set()

    gen = frames()
    # A generator that is created but never iterated skips the finally on
    # close(); a finalizer on the generator object itself still unblocks
    # the decoder thread when the caller drops it un-started.
    import weakref
    weakref.finalize(gen, abandoned.set)
    return gen, fps, out_hw


def _inferno_lut() -> np.ndarray:
    import matplotlib
    return np.asarray(matplotlib.colormaps["inferno"].colors)  # [256, 3] float


def depth_visualization(depths: np.ndarray, grayscale: bool = False,
                        value_range=None) -> np.ndarray:
    """Global min-max normalized depth video -> uint8 RGB (dc_utils.py:74-83).

    value_range: optional (min, max) computed elsewhere (e.g. DepthSpool's
    exact running range in streaming mode) — per-element identical to
    letting this function scan `depths` itself."""
    if value_range is not None:
        d_min, d_max = float(value_range[0]), float(value_range[1])
    else:
        d_min, d_max = float(depths.min()), float(depths.max())
    denom = (d_max - d_min) or 1.0
    norm = ((depths - d_min) / denom * 255).astype(np.uint8)
    if grayscale:
        return np.repeat(norm[..., None], 3, axis=-1)
    lut = (_inferno_lut() * 255).astype(np.uint8)
    return lut[norm]


def _save_video_ffmpeg(frames: np.ndarray, output_path: str,
                       fps: float) -> bool:
    """libx264 crf18 via imageio-ffmpeg when available — matches the
    reference encoder settings (dc_utils.py:72-86). Returns False when the
    plugin or the codec is missing so the caller can fall back to cv2.

    The whole encode is inside the try: imageio spawns ffmpeg lazily on the
    first append_data, so a missing libx264 surfaces there, not in
    get_writer — a partial file is removed and the cv2 fallback still runs.
    """
    try:
        import imageio
        with imageio.get_writer(output_path, fps=fps, macro_block_size=1,
                                codec="libx264",
                                ffmpeg_params=["-crf", "18"]) as writer:
            for f in frames:
                writer.append_data(f)
        return True
    except Exception:
        try:
            import os
            os.remove(output_path)
        except OSError:
            pass
        return False


class IncrementalVideoWriter:
    """Append-as-you-go mp4 writer for streaming mode: frames are encoded
    as they arrive instead of being held in host RAM. Prefers libx264 crf18
    (imageio-ffmpeg, reference parity); falls back to cv2 mp4v when the
    plugin is missing. Use as a context manager or call close()."""

    def __init__(self, output_path: str, fps: float):
        self.path = output_path
        self.fps = fps
        self._w = None
        self._kind = None

    def _open(self, first_frame: np.ndarray):
        # imageio spawns ffmpeg lazily on the first append_data, so a
        # missing/libx264-less ffmpeg only surfaces there — probe with the
        # first frame INSIDE the try, like _save_video_ffmpeg does, and
        # fall back to cv2 (which reopens/overwrites the path).
        try:
            import imageio
            w = imageio.get_writer(self.path, fps=self.fps,
                                   macro_block_size=1, codec="libx264",
                                   ffmpeg_params=["-crf", "18"])
            w.append_data(first_frame)
            self._w, self._kind = w, "imageio"
        except Exception:
            try:  # don't leak the ffmpeg subprocess of a half-opened writer
                if "w" in locals():
                    w.close()
            except Exception:
                pass
            assert _CV2, "OpenCV required for video encode"
            h, w = first_frame.shape[:2]
            self._w = cv2.VideoWriter(self.path,
                                      cv2.VideoWriter_fourcc(*"mp4v"),
                                      self.fps, (w, h))
            if not self._w.isOpened():
                raise IOError(f"cannot open video writer for {self.path}")
            self._kind = "cv2"
            self._w.write(cv2.cvtColor(first_frame, cv2.COLOR_RGB2BGR))

    def append(self, frame_rgb: np.ndarray):
        if self._w is None:
            self._open(frame_rgb)
        elif self._kind == "imageio":
            self._w.append_data(frame_rgb)
        else:
            self._w.write(cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2BGR))

    def close(self):
        if self._w is not None:
            if self._kind == "imageio":
                self._w.close()
            else:
                self._w.release()
            self._w = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def save_video(frames: np.ndarray, output_path: str, fps: float = 10,
               is_depths: bool = False, grayscale: bool = False) -> None:
    """Write an mp4 (dc_utils.py:72-86 contract). frames: [N,H,W,3] uint8 RGB
    or [N,H,W] float depth when is_depths. Prefers libx264 crf18 (reference
    parity); falls back to OpenCV mp4v when no ffmpeg plugin is present."""
    if is_depths:
        frames = depth_visualization(np.asarray(frames), grayscale)
    frames = np.asarray(frames)
    if _save_video_ffmpeg(frames, output_path, fps):
        return
    assert _CV2, "OpenCV required for video encode"
    h, w = frames.shape[1:3]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(output_path, fourcc, fps, (w, h))
    if not writer.isOpened():
        raise IOError(f"cannot open video writer for {output_path}")
    for f in frames:
        writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    writer.release()


class DepthSpool:
    """File-backed spill buffer making streaming inference bounded-memory
    end to end.

    The vis/npz writers need GLOBAL min-max normalization (dc_utils.py:74-83
    contract), so a naive streaming driver still accumulates every depth
    frame in host RAM until EOF. DepthSpool instead appends each chunk to a
    raw float32 file (O(chunk) resident) while accumulating the EXACT
    running min/max, then finish() maps the file back read-only as an
    [N, H, W] np.memmap — the writers stream pages from disk and the depth
    video is never resident. Per-element output is identical to the
    accumulate-then-normalize path (same min/max, same elements).
    """

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "wb")
        self.count = 0
        self.hw = None
        self.min = np.inf
        self.max = -np.inf

    def append(self, chunk: np.ndarray) -> None:
        chunk = np.ascontiguousarray(chunk, dtype=np.float32)
        assert chunk.ndim == 3, chunk.shape
        if self.hw is None:
            self.hw = chunk.shape[1:]
        assert chunk.shape[1:] == self.hw, (chunk.shape, self.hw)
        if chunk.size:
            self.min = min(self.min, float(chunk.min()))
            self.max = max(self.max, float(chunk.max()))
        chunk.tofile(self._f)
        self.count += chunk.shape[0]

    def finish(self) -> np.ndarray:
        """Close the write side and return the read-only [N,H,W] memmap."""
        self._f.close()
        if self.count == 0:
            return np.zeros((0, 0, 0), np.float32)
        return np.memmap(self.path, dtype=np.float32, mode="r",
                         shape=(self.count, *self.hw))

    def cleanup(self) -> None:
        """Remove the spill file (call after all writers are done)."""
        import os
        try:
            if not self._f.closed:
                self._f.close()
            os.remove(self.path)
        except OSError:
            pass


def save_depth_video_streamed(depths, output_path: str, fps: float,
                              value_range, grayscale: bool = False,
                              chunk_frames: int = 64) -> None:
    """save_video(is_depths=True) for a memmap/large array: encodes through
    IncrementalVideoWriter in chunk_frames blocks so only O(chunk) frames
    are resident. value_range = (global min, global max); with DepthSpool's
    exact range the encoded frames are identical to save_video's."""
    with IncrementalVideoWriter(output_path, fps) as w:
        for i in range(0, len(depths), chunk_frames):
            block = np.asarray(depths[i:i + chunk_frames])
            for f in depth_visualization(block, grayscale,
                                         value_range=value_range):
                w.append(f)
