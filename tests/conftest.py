"""Test configuration: virtual 8-device CPU mesh + reference-parity harness.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware. The `refmodules` fixture imports the
*reference PyTorch implementation* from /root/reference (read-only) for
numerical parity testing — with CUDA calls patched to no-ops and unavailable
third-party modules (ipdb, open3d) stubbed out.
"""

import os
import sys
import types

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# Tests run the Pallas kernels in interpret mode, where every mechanism is
# exercised regardless of hardware provenness — enable them all so module
# wiring and parity coverage are independent of the production fail-safe
# defaults in kernels/flags.py.
os.environ.setdefault("GT_TPU_ENABLE_KERNELS", "all")

# The image's sitecustomize imports jax and pins the TPU ('axon') platform
# before conftest runs, so env vars alone are too late — override via config.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"


def _install_reference_stubs():
    """Stub modules the reference imports but this image lacks."""
    if "ipdb" not in sys.modules:
        ipdb = types.ModuleType("ipdb")
        ipdb.set_trace = lambda *a, **k: None
        sys.modules["ipdb"] = ipdb
    if "open3d" not in sys.modules:
        # Minimal open3d stand-in: the reference only needs
        # io.read_point_cloud for its cached kernel-disposition .ply
        # (binary_little_endian float64 vertices).
        o3d = types.ModuleType("open3d")
        io_mod = types.ModuleType("open3d.io")

        class _Pcd:
            def __init__(self, points):
                self.points = points

        def read_point_cloud(path):
            with open(path, "rb") as f:
                data = f.read()
            header_end = data.index(b"end_header\n") + len(b"end_header\n")
            header = data[:header_end].decode()
            count = int(
                [line for line in header.splitlines() if line.startswith("element vertex")][0].split()[-1]
            )
            assert "binary_little_endian" in header and "float64" in header
            pts = np.frombuffer(data[header_end:], dtype="<f8", count=count * 3)
            return _Pcd(pts.reshape(count, 3).copy())

        io_mod.read_point_cloud = read_point_cloud
        o3d.io = io_mod
        sys.modules["open3d"] = o3d
        sys.modules["open3d.io"] = io_mod
    if "geotransformer.ext" not in sys.modules:
        # The reference's compiled CPU extension; parity tests exercise the
        # pure-torch modules only, so a raising stub is enough.
        ext = types.ModuleType("geotransformer.ext")

        def _unavailable(*a, **k):
            raise NotImplementedError("reference C++ extension not built in tests")

        ext.grid_subsampling = _unavailable
        ext.radius_neighbors = _unavailable
        sys.modules["geotransformer.ext"] = ext
    if "easydict" not in sys.modules:
        easydict = types.ModuleType("easydict")

        class EasyDict(dict):
            def __getattr__(self, name):
                try:
                    return self[name]
                except KeyError as exc:
                    raise AttributeError(name) from exc

            def __setattr__(self, name, value):
                self[name] = value

        easydict.EasyDict = EasyDict
        sys.modules["easydict"] = easydict


def _patch_torch_cuda():
    """Make reference `.cuda()` calls no-ops on this CPU-only image."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


@pytest.fixture(scope="session")
def refmodules():
    """Import reference torch modules for parity tests."""
    _install_reference_stubs()
    _patch_torch_cuda()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import geotransformer.modules as modules  # noqa: F401

    return modules


@pytest.fixture()
def rng():
    return np.random.default_rng(7351)
