"""Core API tests, mirroring the oracle set of the reference's
python/test_cwipc_util.py (struct/array round trips, serialization round
trips, leak accounting, synthetic source behavior, op invariants)."""

import os
import struct

import numpy as np
import pytest

import cwipc_util_tpu as cwipc


def _build_pointcloud():
    points = cwipc.cwipc_point_array(
        values=[(1, 2, 3, 0x10, 0x20, 0x30, 1), (4, 5, 6, 0x40, 0x50, 0x60, 2)]
    )
    return cwipc.cwipc_from_points(points, 0)


def _verify_pointcloud(pc, tiled=False):
    points = pc.get_points()
    assert len(points) > 1
    p0 = (points[0].x, points[0].y, points[0].z)
    p1 = (points[-1].x, points[-1].y, points[-1].z)
    assert p0 != p1
    if tiled:
        assert points[0].tile != points[-1].tile


class TestModulePathParity:
    """Import-path parity with the reference package layout."""

    def test_hardware_plugin_modules_raise_like_reference(self):
        # reference: cwipc/kinect.py is `from _cwipc_kinect import *`,
        # which ImportErrors when the plugin repo is not installed
        import importlib

        for mod in ("kinect", "orbbec", "realsense2"):
            with pytest.raises(ImportError):
                importlib.import_module(f"cwipc_util_tpu.{mod}")

    def test_lazy_host_ownership_protocol(self):
        """Host-backed clouds (file/decode/from_points path) follow the
        same ownership protocol as device-backed ones: the leak oracle
        counts them, clone/detach transfer correctly, ops materialize
        the device buffer on demand, and freed access raises."""
        import cwipc_util_tpu as cwipc

        base = cwipc.cwipc_dangling_allocations(False)
        pc = cwipc.cwipc_from_points(
            [(0.0, 0.0, 0.0, 1, 2, 3, 1), (1.0, 0.0, 0.0, 4, 5, 6, 1)], 5
        )
        assert cwipc.cwipc_dangling_allocations(False) == base + 1
        c = pc.clone()
        assert cwipc.cwipc_dangling_allocations(False) == base + 2
        d = c.detach()
        assert cwipc.cwipc_dangling_allocations(False) == base + 2
        # detached original is dead: count() warn-returns 0 (reference
        # freed-object semantics), point access raises
        assert c.count() == 0
        with pytest.raises(cwipc.CwipcError):
            c._access_buffer()
        # an op materializes the device buffer lazily
        down = cwipc.cwipc_downsample(d, 10.0)
        assert down.count() == 1
        assert d.count() == 2  # host view still intact
        for x in (pc, d, down):
            x.free()
        with pytest.raises(cwipc.CwipcError):
            d.get_points()
        assert cwipc.cwipc_dangling_allocations(False) == base

    def test_multicoarse_alias(self):
        from cwipc_util_tpu.registration import multicoarse

        assert multicoarse.MultiCameraCoarseAruco is not None
        assert multicoarse.MultiCameraCoarse is not None


class TestPointStructs:
    def test_point(self):
        p = cwipc.cwipc_point(1, 2, 3, 0x10, 0x20, 0x30, 0)
        assert (p.x, p.y, p.z, p.r, p.g, p.b) == (1, 2, 3, 0x10, 0x20, 0x30)

    def test_pointarray(self):
        p = cwipc.cwipc_point_array(count=10)
        assert (p[0].x, p[0].r) == (0, 0)
        assert (p[9].x, p[9].r) == (0, 0)
        with pytest.raises(IndexError):
            p[10].x

    def test_pointarray_filled(self):
        p = cwipc.cwipc_point_array(
            values=[(1, 2, 3, 0x10, 0x20, 0x30, 0), (4, 5, 6, 0x40, 0x50, 0x60, 0)]
        )
        assert len(p) == 2
        assert (p[0].x, p[0].r) == (1, 0x10)
        assert (p[1].z, p[1].b) == (6, 0x60)
        with pytest.raises(IndexError):
            p[2].x


class TestPointcloudObject:
    def test_from_points_empty(self):
        points = cwipc.cwipc_point_array(values=[])
        pc = cwipc.cwipc_from_points(points, 0)
        assert len(pc.get_points()) == 0

    def test_from_points(self):
        points = cwipc.cwipc_point_array(
            values=[(1, 2, 3, 0x10, 0x20, 0x30, 1), (4, 5, 6, 0x40, 0x50, 0x60, 2)]
        )
        pc = cwipc.cwipc_from_points(points, 0)
        assert pc.count() == len(points)
        newpoints = pc.get_points()
        for op, np_ in zip(points, newpoints):
            assert op == np_

    def test_numpy_array_roundtrip(self):
        pc = _build_pointcloud()
        arr = pc.get_numpy_array()
        assert arr.shape[0] == pc.count()
        pc2 = cwipc.cwipc_from_numpy_array(arr, 0)
        assert list(pc.get_points()) == list(pc2.get_points())

    def test_numpy_matrix_roundtrip(self):
        pc = _build_pointcloud()
        m = pc.get_numpy_matrix()
        assert m.shape == (pc.count(), 7)
        pc2 = cwipc.cwipc_from_numpy_matrix(m, 0)
        assert list(pc.get_points()) == list(pc2.get_points())

    def test_timestamp_cellsize(self):
        timestamp = 0x11223344556677
        pc = cwipc.cwipc_from_points(
            [(0, 0, 0, 0, 0, 0, 1), (1, 0, 0, 0, 0, 0, 1), (2, 0, 0, 0, 0, 0, 1), (3, 0, 0, 0, 0, 0, 1)],
            timestamp,
        )
        assert pc.timestamp() == timestamp
        pc._set_timestamp(timestamp + 1)
        assert pc.timestamp() == timestamp + 1
        assert pc.cellsize() == 0
        pc._set_cellsize(0.1)
        assert abs(pc.cellsize() - 0.1) < 1e-6
        # negative cellsize triggers the reference's guess heuristic
        pc._set_cellsize(-1)
        assert abs(pc.cellsize() - 1.0) < 1e-6

    def test_dangling_allocations(self):
        old = cwipc.cwipc_dangling_allocations(True)
        pc = _build_pointcloud()
        assert cwipc.cwipc_dangling_allocations(True) == old + 1
        pc.free()
        assert cwipc.cwipc_dangling_allocations(True) == old

    def test_clone(self):
        old = cwipc.cwipc_dangling_allocations(False)
        pc = _build_pointcloud()
        new_pc = pc.clone()
        assert cwipc.cwipc_dangling_allocations(False) == old + 2
        assert pc.count() == new_pc.count()
        assert pc.timestamp() == new_pc.timestamp()
        pc.free()
        new_pc.free()
        assert cwipc.cwipc_dangling_allocations(False) == old

    def test_metadata_empty(self):
        pc = _build_pointcloud()
        metadata = pc.access_metadata()
        assert metadata is not None
        assert metadata.count() == 0


class TestSerialization:
    def test_read(self, ply_fixture):
        pc = cwipc.cwipc_read(ply_fixture, 1234)
        assert pc.timestamp() == 1234
        _verify_pointcloud(pc)

    def test_read_nonexistent(self, ply_fixture):
        with pytest.raises(cwipc.CwipcError):
            cwipc.cwipc_read(ply_fixture + ".nonexistent", 1234)

    def test_write_ascii_roundtrip(self, tmp_path):
        pc = _build_pointcloud()
        filename = str(tmp_path / "test.ply")
        cwipc.cwipc_write(filename, pc)
        pc2 = cwipc.cwipc_read(filename, 0)
        assert list(pc.get_points()) == list(pc2.get_points())

    def test_write_binary_roundtrip(self, tmp_path):
        pc = _build_pointcloud()
        filename = str(tmp_path / "test.ply")
        cwipc.cwipc_write(filename, pc, cwipc.CWIPC_FLAGS_BINARY)
        pc2 = cwipc.cwipc_read(filename, 0)
        assert list(pc.get_points()) == list(pc2.get_points())

    def test_write_nonexistent(self):
        pc = _build_pointcloud()
        with pytest.raises(cwipc.CwipcError):
            cwipc.cwipc_write(os.path.join("nonexistent_dir", "non", "existent.ply"), pc)

    def test_read_element_before_vertex(self, tmp_path):
        """PLY data of elements declared BEFORE vertex must be skipped, not
        parsed as vertex records (ply.py:_skip_element_data)."""
        filename = str(tmp_path / "pre.ply")
        with open(filename, "w") as fp:
            fp.write(
                "ply\nformat ascii 1.0\n"
                "element edge 2\nproperty int v1\nproperty int v2\n"
                "element vertex 2\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
                "end_header\n"
                "0 1\n1 0\n"
                "1 2 3 10 20 30\n4 5 6 40 50 60\n"
            )
        pc = cwipc.cwipc_read(filename, 0)
        pts = list(pc.get_points())
        assert len(pts) == 2
        assert (pts[0].x, pts[0].y, pts[0].z) == (1.0, 2.0, 3.0)
        assert (pts[1].r, pts[1].g, pts[1].b) == (40, 50, 60)

    def test_read_red_without_green_blue(self, tmp_path):
        """A partial color triplet must produce zeros for the missing
        channels, not an uncaught TypeError."""
        filename = str(tmp_path / "gray.ply")
        with open(filename, "w") as fp:
            fp.write(
                "ply\nformat ascii 1.0\n"
                "element vertex 1\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\n"
                "end_header\n"
                "1 2 3 77\n"
            )
        pc = cwipc.cwipc_read(filename, 0)
        p = list(pc.get_points())[0]
        assert (p.r, p.g, p.b) == (77, 0, 0)

    def test_debugdump_roundtrip(self, tmp_path):
        pc = _build_pointcloud()
        filename = str(tmp_path / "test.cwipcdump")
        cwipc.cwipc_write_debugdump(filename, pc)
        pc2 = cwipc.cwipc_read_debugdump(filename)
        assert list(pc.get_points()) == list(pc2.get_points())

    def test_debugdump_nonexistent(self, tmp_path):
        pc = _build_pointcloud()
        with pytest.raises(cwipc.CwipcError):
            cwipc.cwipc_write_debugdump(str(tmp_path / "no" / "such" / "dir.cwipcdump"), pc)

    def test_packet_roundtrip(self):
        pc = _build_pointcloud()
        pc._set_cellsize(0.25)
        pc._set_timestamp(4567)
        packet = pc.get_packet()
        pc2 = cwipc.cwipc_from_packet(packet)
        assert pc.timestamp() == pc2.timestamp()
        assert pc.cellsize() == pc2.cellsize()
        assert list(pc.get_points()) == list(pc2.get_points())
        assert packet == pc2.get_packet()

    def test_packet_header_layout(self):
        """The packet header must be bit-compatible with the reference."""
        pc = _build_pointcloud()
        pc._set_timestamp(0x1122334455667788)
        packet = bytes(pc.get_packet())
        hdr, magic, ts, cellsize, unused, size = struct.unpack("<4sIQfIQ", packet[:32])
        assert hdr == b"cpcd"
        assert magic == 0x20210208
        assert ts == 0x1122334455667788
        assert size == pc.count() * 16
        assert len(packet) == 32 + size


class TestLogging:
    def test_logger_callback(self):
        messages = []

        def cb(level, message):
            messages.append((level, message.decode("utf8")))

        cwipc.cwipc_log_configure(cwipc.CWIPC_LOG_LEVEL_DEBUG, cb)
        cwipc._cwipc_log_emit(cwipc.CWIPC_LOG_LEVEL_DEBUG, "test_module", "This is a test log message")
        assert any("This is a test log message" in m for _, m in messages)
        assert all(lvl == cwipc.CWIPC_LOG_LEVEL_DEBUG for lvl, m in messages if "test log message" in m)
        cwipc.cwipc_log_configure(cwipc.CWIPC_LOG_LEVEL_WARNING, None)


class TestSynthetic:
    def test_basic(self):
        pcs = cwipc.cwipc_synthetic()
        assert pcs.start()
        assert pcs.available(True)
        assert not pcs.eof()
        pc = pcs.get()
        assert pc is not None
        _verify_pointcloud(pc)
        assert pc.count() == 160000
        assert abs(pc.cellsize() - 2.0 / 400) < 1e-6
        pcs.stop()

    def test_available_false(self):
        pcs = cwipc.cwipc_synthetic(5)
        assert pcs.start()
        assert pcs.available(True)
        pc = pcs.get()
        assert pc is not None
        assert not pcs.available(False)
        pcs.stop()

    def test_nonexistent_metadata(self):
        pcs = cwipc.cwipc_synthetic()
        assert not pcs.is_metadata_requested("nonexistent-metadata")
        pcs.request_metadata("nonexistent-metadata")
        assert pcs.is_metadata_requested("nonexistent-metadata")
        pcs.stop()

    def test_metadata(self):
        pcs = cwipc.cwipc_synthetic()
        pcs.request_metadata("test-angle")
        assert pcs.is_metadata_requested("test-angle")
        assert pcs.start()
        pc = pcs.get()
        assert pc is not None
        ap = pc.access_metadata()
        assert ap.count() == 1
        assert ap.name(0) == "test-angle"
        assert ap.description(0) == ""
        assert ap.size(0) == 4
        assert len(ap.data(0)) == 4
        pcs.stop()

    def test_nonexistent_auxiliary_operation(self):
        pcs = cwipc.cwipc_synthetic()
        assert pcs.start()
        assert not pcs.auxiliary_operation("nonexistent-auxop", bytes(), bytearray(4))
        pcs.stop()

    def test_auxiliary_operation(self):
        pcs = cwipc.cwipc_synthetic()
        assert pcs.start()
        angle = 42.0
        inbuf = struct.pack("f", angle)
        outbuf = bytearray(struct.pack("f", 0))
        assert pcs.auxiliary_operation("test-setangle", inbuf, outbuf)
        (newangle,) = struct.unpack("f", outbuf)
        assert newangle == angle
        pcs.stop()

    def test_args(self):
        pcs = cwipc.cwipc_synthetic(10, 1000)
        assert pcs.start()
        assert pcs.available(True)
        assert not pcs.eof()
        pc = pcs.get()
        assert pc is not None
        _verify_pointcloud(pc)
        assert pc.count() == 31 * 31
        pcs.stop()

    def test_tiled_interface(self):
        pcs = cwipc.cwipc_synthetic()
        assert pcs.maxtile() == 3
        assert pcs.get_tileinfo_dict(0) == {
            "normal": {"x": 0, "y": 0, "z": 0},
            "cameraName": b"synthetic",
            "ncamera": 2,
            "cameraMask": 0,
        }
        assert pcs.get_tileinfo_dict(1) == {
            "normal": {"x": 0, "y": 0, "z": 1},
            "cameraName": b"synthetic-right",
            "ncamera": 1,
            "cameraMask": 1,
        }
        assert pcs.get_tileinfo_dict(2) == {
            "normal": {"x": 0, "y": 0, "z": -1},
            "cameraName": b"synthetic-left",
            "ncamera": 1,
            "cameraMask": 2,
        }
        pcs.stop()

    def test_config_interface(self):
        pcs = cwipc.cwipc_synthetic()
        assert not pcs.reload_config("auto")
        assert not pcs.reload_config('{"dummy":0}')
        with pytest.raises(cwipc.CwipcError):
            pcs.get_config()
        pcs.stop()


class TestCompileCache:
    """The persistent compilation cache is on by default and actually hits
    across processes (core/compile_cache.py; VERDICT r4 weak #1 — the
    register E2E's 30x compile wall).  Count-based: cache files written by
    the first process, hit events and an unchanged file count in the
    second."""

    SCRIPT = r"""
import json, os
import cwipc_util_tpu  # importing the package enables the cache
import jax, jax.numpy as jnp
events = []
from jax._src import monitoring
monitoring.register_event_listener(lambda name, **kw: events.append(name))
f = jax.jit(lambda x: (x @ x.T).sum() * 3)
f(jnp.ones((64, 32), jnp.float32)).block_until_ready()
d = jax.config.jax_compilation_cache_dir
print(json.dumps({
    "dir": d,
    "nfiles": len(os.listdir(d)) if d and os.path.isdir(d) else 0,
    "hits": sum(1 for e in events if "cache_hits" in e),
    "misses": sum(1 for e in events if "cache_misses" in e),
}))
"""

    def _run(self, cache_dir, extra_env=None):
        import json
        import subprocess
        import sys

        env = dict(os.environ)
        env["PYTHONPATH"] = str(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)
        # an explicit jax cache dir outranks CWIPC_JAX_CACHE_DIR by
        # design — strip any inherited one so this test controls the
        # subprocess's cache
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        env["CWIPC_JAX_CACHE_DIR"] = str(cache_dir)
        # CPU-only processes default the cache OFF (XLA:CPU AOT-loader
        # log noise; see core/compile_cache.py) — force it on here so the
        # cross-process hit mechanics stay pinned on the CPU backend.
        env["CWIPC_JAX_CACHE"] = "1"
        env.update(extra_env or {})
        rv = subprocess.run(
            [sys.executable, "-c", self.SCRIPT],
            capture_output=True, text=True, timeout=240, env=env,
        )
        assert rv.returncode == 0, rv.stderr[-800:]
        return json.loads(rv.stdout.strip().splitlines()[-1])

    def test_cross_process_cache_hit(self, tmp_path):
        cache = tmp_path / "jc"
        first = self._run(cache)
        assert first["dir"] == str(cache)
        assert first["nfiles"] >= 1, first
        assert first["misses"] >= 1 and first["hits"] == 0, first
        second = self._run(cache)
        assert second["hits"] >= 1, second
        assert second["nfiles"] == first["nfiles"], (first, second)

    def test_opt_out(self, tmp_path):
        out = self._run(tmp_path / "jc2", {"CWIPC_JAX_CACHE": "0"})
        assert not out["dir"]
        assert out["hits"] == 0 and out["misses"] == 0

    def test_cpu_only_default_off(self, tmp_path):
        """A plain JAX_PLATFORMS=cpu process leaves the cache unconfigured
        by default (no AOT-loader log noise in the suite/CLI subprocesses)."""
        out = self._run(tmp_path / "jc3", {"CWIPC_JAX_CACHE": ""})
        assert not out["dir"]
