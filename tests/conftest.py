"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh (no TPU pod in CI);
the env vars must be set before JAX initializes.
"""

import os

# Hard override: the host environment pre-sets JAX_PLATFORMS=axon (the real
# TPU); tests must run on CPU with 8 virtual devices for the mesh tests.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import pytest

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
