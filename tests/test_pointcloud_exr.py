"""Output writers: PLY point clouds and EXR roundtrips."""
import numpy as np

from video_depth_anything_tpu.utils.exr import read_exr_z, write_exr_z
from video_depth_anything_tpu.utils.pointcloud import (read_ply,
                                                       unproject_depth,
                                                       write_ply)


def test_exr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    depth = rng.random((37, 53)).astype(np.float32) * 80
    path = str(tmp_path / "d.exr")
    write_exr_z(path, depth)
    back = read_exr_z(path)
    np.testing.assert_array_equal(back, depth)


def test_exr_native_zip_roundtrip(tmp_path):
    """Native C++ codec (ZIP/ZIPS) -> pure-python reader."""
    import pytest

    from video_depth_anything_tpu.native import load

    if load() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(1)
    depth = (rng.random((45, 61)).astype(np.float32) * 10).round(3)
    for comp in ("zips", "zip"):
        path = str(tmp_path / f"d_{comp}.exr")
        write_exr_z(path, depth, compression=comp)
        back = read_exr_z(path)
        np.testing.assert_array_equal(back, depth)
    # compression actually shrinks smooth data
    smooth = np.tile(np.linspace(0, 1, 61, dtype=np.float32), (45, 1))
    p0 = str(tmp_path / "s0.exr")
    p1 = str(tmp_path / "s1.exr")
    write_exr_z(p0, smooth, compression="none")
    write_exr_z(p1, smooth, compression="zip")
    import os
    assert os.path.getsize(p1) < os.path.getsize(p0)
    np.testing.assert_array_equal(read_exr_z(p1), smooth)


def test_exr_batch_writer(tmp_path):
    from video_depth_anything_tpu.utils.exr import write_exr_batch

    rng = np.random.default_rng(2)
    depths = rng.random((3, 20, 30)).astype(np.float32)
    paths = [str(tmp_path / f"f{i}.exr") for i in range(3)]
    write_exr_batch(paths, depths)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(read_exr_z(p), depths[i])


def test_unproject_pinhole():
    depth = np.full((10, 16), 2.0, np.float32)
    pts, _ = unproject_depth(depth, focal_x=8.0, focal_y=8.0)
    assert pts.shape == (160, 3)
    np.testing.assert_allclose(pts[:, 2], 2.0)
    # center pixel ~ optical axis
    center = pts.reshape(10, 16, 3)[5, 8]
    np.testing.assert_allclose(center[:2], [0.0, 0.0], atol=0.25 * 2)


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    depth = rng.random((6, 8)).astype(np.float32) * 10
    color = rng.integers(0, 255, (6, 8, 3), np.uint8)
    pts, cols = unproject_depth(depth, 5.0, 5.0, color)
    path = str(tmp_path / "p.ply")
    write_ply(path, pts, cols)
    rp, rc = read_ply(path)
    np.testing.assert_allclose(rp, pts, rtol=1e-6)
    np.testing.assert_allclose(rc, cols, atol=1 / 255.0)


def test_native_loader_uses_prebuilt_so_without_source(tmp_path, monkeypatch):
    """Installed-package scenario: a prebuilt libvda_native.so with no
    exr_codec.cpp next to it must load (not raise FileNotFoundError), and a
    failing staleness rebuild must not discard a loadable .so."""
    import os
    import shutil

    import pytest

    from video_depth_anything_tpu import native

    so = native._SO
    if not os.path.exists(so):
        if native.load() is None:
            pytest.skip("native codec not buildable in this environment")
    shutil.copy(so, tmp_path / "libvda_native.so")
    monkeypatch.setattr(native, "_DIR", str(tmp_path))
    monkeypatch.setattr(native, "_SO", str(tmp_path / "libvda_native.so"))
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    lib = native.load()
    assert lib is not None

    # stale .so + unbuildable source: the existing .so must still be used
    (tmp_path / "exr_codec.cpp").write_text("this is not C++")
    os.utime(tmp_path / "libvda_native.so",
             (0, 0))  # force mtime older than the source
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    assert native.load() is not None
