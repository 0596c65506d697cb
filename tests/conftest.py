"""Test configuration: pin the suite to CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (no TPU pod in CI).
Two mechanisms, because env vars alone are NOT reliable — the axon TPU
plugin ignores ``JAX_PLATFORMS``:

1. env vars set before JAX initializes (work in ordinary environments),
2. ``jax_default_device`` pinned to an explicit CPU device object (works
   everywhere; routes all eager + uncommitted-jit work to the host CPU so
   the suite never compiles against the real chip).

TPU-only tests opt back in with the ``tpu`` marker and explicit device
placement (see tests/test_tpu_smoke.py).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import jax
import pytest

_cpus = jax.local_devices(backend="cpu")
jax.config.update("jax_default_device", _cpus[0])


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: runs on the real TPU chip (skipped when absent)"
    )

FIXTURE_DIR = pathlib.Path(__file__).parent / "fixtures" / "input"


@pytest.fixture(scope="session")
def ply_fixture(tmp_path_factory) -> str:
    """The committed deterministic fixture cloud (the reference layout's
    tests/fixtures/input/pcl_frame1.ply), regenerated on the fly if absent."""
    committed = FIXTURE_DIR / "pcl_frame1.ply"
    if committed.exists():
        return str(committed)
    import cwipc_util_tpu as cwipc

    path = tmp_path_factory.mktemp("fixtures") / "pcl_frame1.ply"
    gen = cwipc.cwipc_synthetic(0, 1000)
    gen.start()
    pc = gen.get()
    gen.stop()
    assert pc is not None
    cwipc.cwipc_write(str(path), pc, cwipc.CWIPC_FLAGS_BINARY)
    pc.free()
    return str(path)
