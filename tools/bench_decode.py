"""Host video-decode throughput: cv2.VideoCapture vs the ffmpeg raw-pipe
backend (utils/video_io.py::_ffmpeg_decode_iter).

The reference uses decord for decode throughput (dc_utils.py:19-69);
this image has cv2 + imageio-ffmpeg. The ffmpeg backend moves decode,
fps-stride dropping, and yuv->rgb into a subprocess, so the consumer core
only copies raw RGB24 from the pipe (and cv2-resizes when max_res binds).
On a multi-core production host the subprocess overlaps the pipeline's
own host work; on this 1-core box the win is bounded to the BGR->RGB
python-loop conversion cv2 pays per kept frame.

Run: python tools/bench_decode.py [video] [max_res]
Writes one line per backend: frames, seconds, fps.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_depth_anything_tpu.utils.video_io import read_video_frames  # noqa: E402

VIDEO = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/assets/example_videos/davis_rollercoaster.mp4"
MAX_RES = int(sys.argv[2]) if len(sys.argv) > 2 else -1


def bench(backend: str):
    t0 = time.perf_counter()
    frames, fps = read_video_frames(VIDEO, -1, -1, MAX_RES,
                                    decode_backend=backend)
    dt = time.perf_counter() - t0
    print(f"{backend:7s} {len(frames):5d} frames  {dt:7.2f} s  "
          f"{len(frames)/dt:7.1f} fps  {frames.shape[1]}x{frames.shape[2]}",
          flush=True)
    return frames


def main():
    import numpy as np
    try:
        import imageio_ffmpeg  # noqa: F401
    except ImportError:
        sys.exit("imageio-ffmpeg not installed (this image lacks it — the "
                 "same optional dependency class as the reference's decord); "
                 "the ffmpeg backend would silently resolve to cv2, so the "
                 "A/B is meaningless here. Run on a host with imageio-ffmpeg.")
    a = bench("cv2")
    b = bench("ffmpeg")
    if a.shape == b.shape:
        d = np.abs(a.astype(np.int16) - b.astype(np.int16))
        print(f"pixel delta: max {d.max()}  mean {d.mean():.4f} "
              f"(yuv->rgb rounding differs between libswscale and cv2)")
    else:
        print(f"shape mismatch: {a.shape} vs {b.shape}")


if __name__ == "__main__":
    main()
