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


class TestSegmentReduceKernel:
    @pytest.mark.parametrize("count,nruns", [(3500, 300), (4096, 500), (100, 7), (0, 1)])
    def test_matches_numpy_oracle(self, count, nruns):
        from cwipc_util_tpu.ops.pallas_segment_reduce import (
            B as SRB,
            segment_reduce_sorted,
        )

        rng = np.random.default_rng(count + nruns)
        cap = 4 * SRB
        if count:
            lens = rng.multinomial(count, np.ones(nruns) / nruns)
            keys = np.repeat(
                np.sort(rng.choice(1 << 29, size=nruns, replace=False)).astype(np.int32), lens
            )[:count]
        else:
            keys = np.zeros(0, np.int32)
        smk = np.full(cap, np.iinfo(np.int32).max, np.int32)
        smk[: len(keys)] = keys
        sfr = rng.integers(0, 1 << 30, size=cap).astype(np.int32)
        srgba = rng.integers(-(2**31), 2**31, size=cap).astype(np.int32)
        out, nseg = segment_reduce_sorted(
            jnp.asarray(smk), jnp.asarray(sfr), jnp.asarray(srgba),
            jnp.int32(len(keys)), out_capacity=2048,
        )
        out = np.asarray(out)
        uniq, inv = np.unique(keys, return_inverse=True)
        assert int(nseg) == len(uniq)
        if not len(keys):
            return
        r = ((srgba[: len(keys)] >> 16) & 0xFF).astype(np.float64)
        tile = ((srgba[: len(keys)].astype(np.int64) >> 24) & 0xFF).astype(np.int64)
        for s in range(len(uniq)):
            sel = inv == s
            assert int(out[8, s]) + int(out[9, s]) * 32768 == uniq[s]
            assert abs(out[3, s] - r[sel].sum()) < 1e-2
            assert int(out[6, s]) == sel.sum()
            assert int(out[7, s]) == np.bitwise_or.reduce(tile[sel])
