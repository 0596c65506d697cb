"""DASH packager sink: push streams to a low-latency DASH ingest server.

Re-implementation of the reference's lldpkg binding
(reference: python/cwipc/net/sink_lldpkg.py): a ctypes binding to the
external SIGNALS `lldash_packager` shared library (found via the
SIGNALS_SMD_PATH environment variable), exposing the rawsink interface with
one DASH stream per (tile, quality); tile geometry rides in the stream
descriptor's repurposed SRD fields (sink_lldpkg.py:25-38).

The SIGNALS libraries are an external commercial component; when they are
not installed this module loads but the factory raises a clear CwipcError
(same behavior as the reference on a system without SIGNALS).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import time
from typing import List, Optional, Union

from ..core.errors import CwipcError
from ..utils.stats import Stats
from .abstract import (
    VRT_4CC,
    cwipc_quality_description,
    cwipc_rawsink_abstract,
    cwipc_tileinfo_dict,
    vrt_fourcc_type,
)

_lldpkg_dll_reference = None


def _lldpkg_dll(libname: Optional[str] = None):
    """Load the external lldash_packager library (cached)."""
    global _lldpkg_dll_reference
    if _lldpkg_dll_reference is not None:
        return _lldpkg_dll_reference
    if libname is None:
        libname = os.environ.get("SIGNALS_SMD_PATH")
        if libname and os.path.isdir(libname):
            libname = os.path.join(libname, "liblldash_packager.so")
        if not libname:
            libname = ctypes.util.find_library("lldash_packager")
    if not libname or not os.path.exists(libname):
        raise CwipcError(
            "lldpkg: SIGNALS lldash_packager library not found"
            " (set SIGNALS_SMD_PATH to its directory)"
        )
    dll = ctypes.CDLL(libname)
    # signatures of the SIGNALS SMD packager entry points
    dll.lldpkg_create.restype = ctypes.c_void_p
    dll.lldpkg_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    dll.lldpkg_destroy.argtypes = [ctypes.c_void_p]
    dll.lldpkg_push_buffer.restype = ctypes.c_bool
    dll.lldpkg_push_buffer.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_size_t,
    ]
    _lldpkg_dll_reference = dll
    return dll


class _LLDashPackagerSink(cwipc_rawsink_abstract):
    """Rawsink pushing each stream to a DASH ingest URL."""

    def __init__(self, url: str, seg_dur_ms: int = 10000, timeshift_buffer_ms: int = 30000, verbose: bool = False):
        self.dll = _lldpkg_dll()
        self.url = url
        self.seg_dur_ms = seg_dur_ms
        self.timeshift_buffer_ms = timeshift_buffer_ms
        self.verbose = verbose
        self.fourcc = 0
        self.producer = None
        self.handle: Optional[ctypes.c_void_p] = None
        self.streams: List[dict] = []
        self.stats = Stats(f"lldpkg:{url}")

    def set_fourcc(self, fourcc: vrt_fourcc_type) -> None:
        self.fourcc = VRT_4CC(fourcc)

    def set_producer(self, producer) -> None:
        self.producer = producer

    def add_stream(
        self,
        tilenum: Optional[int] = None,
        tiledesc: Optional[cwipc_tileinfo_dict] = None,
        qualitydesc: Optional[cwipc_quality_description] = None,
    ) -> int:
        # Tile geometry rides in the repurposed SRD fields of the stream
        # descriptor (normal vector scaled to integers).
        desc = dict(
            fourcc=self.fourcc,
            tilenum=tilenum or 0,
            srd=self._srd_from_tile(tiledesc),
            quality=qualitydesc or {},
        )
        self.streams.append(desc)
        return len(self.streams) - 1

    def _srd_from_tile(self, tiledesc: Optional[cwipc_tileinfo_dict]):
        if not tiledesc:
            return (0, 0, 0, 0)
        normal = tiledesc.get("normal", {})
        return (
            int(normal.get("x", 0) * 1000),
            int(normal.get("y", 0) * 1000),
            int(normal.get("z", 0) * 1000),
            tiledesc.get("cameraMask", 0),
        )

    def start(self) -> None:
        handle = self.dll.lldpkg_create(
            b"cwipc_util_tpu",
            len(self.streams),
            None,
            self.url.encode("utf8"),
            self.seg_dur_ms,
            self.timeshift_buffer_ms,
            0,
        )
        if not handle:
            raise CwipcError(f"lldpkg: cannot create packager for {self.url}")
        self.handle = ctypes.c_void_p(handle)

    def stop(self) -> None:
        if self.handle:
            self.dll.lldpkg_destroy(self.handle)
            self.handle = None

    def feed(self, buffer: Union[bytes, bytearray], stream_index: Optional[int] = None) -> bool:
        if self.handle is None:
            return False
        data = bytes(buffer)
        t0 = time.time()
        ok = self.dll.lldpkg_push_buffer(self.handle, stream_index or 0, data, len(data))
        self.stats.add("push_duration", time.time() - t0)
        self.stats.add("packetsize", len(data), isInt=True)
        return bool(ok)

    def statistics(self) -> None:
        self.stats.print()


def cwipc_sink_lldpkg(url: str, verbose: bool = False, **kwargs) -> cwipc_rawsink_abstract:
    """Rawsink pushing multi-stream DASH to a low-latency ingest server."""
    return _LLDashPackagerSink(url, verbose=verbose, **kwargs)
