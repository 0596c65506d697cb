"""Pallas kernel parity tests (interpret mode on the CPU test platform)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cwipc_util_tpu.ops import outliers
from cwipc_util_tpu.ops.pallas_window_knn import BLOCK, window_knn_mean_distance


class TestWindowKnnKernel:
    @pytest.mark.parametrize("count", [4000, 4096, 100, 0])
    def test_matches_xla_path(self, count):
        rng = np.random.default_rng(count)
        cap = 2 * BLOCK
        xyz = jnp.asarray(np.sort(rng.random((cap, 3), dtype=np.float32), axis=0))
        c = jnp.int32(count)
        ref = np.asarray(outliers._mean_knn_dist_window(xyz, c, 30, window=32))
        got = np.asarray(window_knn_mean_distance(xyz, c, 30, window=32))
        assert np.allclose(ref, got, atol=1e-6), np.abs(ref - got).max()

    def test_remove_outliers_method(self):
        rng = np.random.default_rng(1)
        cap = 2 * BLOCK
        n = 4000
        pts = np.sort(rng.random((cap, 3), dtype=np.float32), axis=0)
        from cwipc_util_tpu.core.buffers import buffer_from_arrays

        z = np.zeros(cap, np.uint8)
        buf = buffer_from_arrays(pts, z, z, z, z, capacity=cap)
        buf = type(buf)(xyz=buf.xyz, rgba=buf.rgba, count=jnp.int32(n))
        a = outliers.remove_outliers(buf, 30, jnp.float32(1.0), method="window")
        b = outliers.remove_outliers(buf, 30, jnp.float32(1.0), method="window_pallas")
        assert int(a.count) == int(b.count)
        na, nb = np.asarray(a.xyz[: int(a.count)]), np.asarray(b.xyz[: int(b.count)])
        assert np.array_equal(na, nb)
