"""Multi-device sharding tests on the 8-way virtual CPU mesh."""

import jax
import numpy as np
import pytest

import cwipc_util_tpu as cwipc
from cwipc_util_tpu.parallel.mesh import make_mesh
from cwipc_util_tpu.parallel.pointaxis import sharded_downsample


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    return make_mesh()


class TestPointAxisSharding:
    def test_sharded_downsample_matches_single_device(self, mesh):
        gen = cwipc.cwipc_synthetic(0, 4000)
        gen.start()
        pc = gen.get()
        gen.stop()
        cellsize = 0.05

        expected = cwipc.cwipc_downsample(pc, cellsize)
        fused = sharded_downsample(mesh, pc._access_buffer(), cellsize)
        n = int(fused.count)
        assert n == expected.count()

        # same voxel set (order differs)
        inv = np.float32(1.0) / np.float32(cellsize)
        got_xyz = np.asarray(fused.xyz[:n])
        exp = expected.get_numpy_matrix(onlyGeometry=True)
        got_keys = {tuple(k) for k in np.floor(got_xyz * inv).astype(np.int64)}
        exp_keys = {tuple(k) for k in np.floor(exp.astype(np.float32) * inv).astype(np.int64)}
        assert got_keys == exp_keys

    def test_camera_fusion_dryrun(self, mesh):
        """The full multi-camera fusion step (the dryrun_multichip path)."""
        import __graft_entry__ as graft

        graft.dryrun_multichip(len(jax.devices()))
