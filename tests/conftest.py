"""Test configuration: force CPU backend with 8 virtual devices.

All tests run on a virtual 8-device CPU mesh so that multi-chip sharding
(pjit over jax.sharding.Mesh) is exercised without TPU hardware. Must run
before the first `import jax` anywhere.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate" not in _flags:
    # 8 virtual device threads share one physical core here; XLA CPU's
    # collective rendezvous hard-aborts the process (F-check in
    # rendezvous.cc) when a starved participant misses its default 40 s
    # window. Raise the ceilings so oversubscription waits, not aborts.
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
               " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["XLA_FLAGS"] = _flags

# This image pre-imports jax from a sitecustomize (TPU plugin registration),
# so the env vars above are too late for jax.config — override explicitly
# before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
assert jax.device_count() == 8, jax.devices()

# Repo root importable (package + entry files live there).
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def pytest_configure(config):
    # The PyTorch reference (golden oracle for parity tests) needs a couple of
    # modules that are not in this image. Shim the trivial ones so the
    # reference code stays importable; heavyweight deps (xformers, decord)
    # already have in-repo fallbacks in the reference itself.
    import types

    if "easydict" not in sys.modules:
        easydict = types.ModuleType("easydict")

        class EasyDict(dict):
            def __init__(self, *args, **kwargs):
                super().__init__(*args, **kwargs)
                self.__dict__ = self

        easydict.EasyDict = EasyDict
        sys.modules["easydict"] = easydict

    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            torchvision = types.ModuleType("torchvision")
            transforms = types.ModuleType("torchvision.transforms")

            class Compose:
                def __init__(self, fns):
                    self.fns = fns

                def __call__(self, sample):
                    for f in self.fns:
                        sample = f(sample)
                    return sample

            transforms.Compose = Compose

            # Minimal TF.functional over PIL — same PIL calls real
            # torchvision makes for PIL inputs (resize/crop/to_tensor/normalize).
            functional = types.ModuleType("torchvision.transforms.functional")

            def _tf_resize(img, size, interpolation=None):
                from PIL import Image as _Image
                if isinstance(size, (list, tuple)):
                    new_h, new_w = size
                else:
                    w, h = img.size
                    if w <= h:
                        new_w, new_h = size, max(int(round(h * size / w)), size)
                    else:
                        new_h, new_w = size, max(int(round(w * size / h)), size)
                resample = interpolation if interpolation is not None \
                    else _Image.BILINEAR
                return img.resize((new_w, new_h), resample)

            def _tf_crop(img, i, j, h, w):
                return img.crop((j, i, j + w, i + h))

            def _tf_to_tensor(pic):
                import numpy as _np
                import torch as _torch
                arr = _np.array(pic)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                t = _torch.from_numpy(arr.transpose(2, 0, 1)).contiguous()
                if t.dtype == _torch.uint8:
                    t = t.float().div(255.0)
                return t.float()

            def _tf_normalize(tensor, mean, std):
                import torch as _torch
                mean = _torch.tensor(mean).view(-1, 1, 1)
                std = _torch.tensor(std).view(-1, 1, 1)
                return (tensor - mean) / std

            functional.resize = _tf_resize
            functional.crop = _tf_crop
            functional.to_tensor = _tf_to_tensor
            functional.normalize = _tf_normalize
            transforms.functional = functional
            torchvision.transforms = transforms
            sys.modules["torchvision"] = torchvision
            sys.modules["torchvision.transforms"] = transforms
            sys.modules["torchvision.transforms.functional"] = functional
