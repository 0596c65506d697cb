"""DASH playout source: receive (tiled) streams from a low-latency DASH CDN.

Re-implementation of the reference's lldplay binding
(reference: python/cwipc/net/source_lldplay.py): a ctypes binding to the
external SIGNALS `lldash_play` shared library with stream discovery, a
per-tile rawsource view, and enable/disable-stream quality selection
(source_lldplay.py:57-163).

The SIGNALS libraries are an external commercial component; without them
the factories raise a clear CwipcError (matching the reference's behavior
on systems without SIGNALS).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import queue
import time
from typing import List, Optional

from ..core.errors import CwipcError
from ..utils.stats import Stats
from .abstract import (
    VRT_4CC,
    cwipc_activerawmultisource_abstract,
    cwipc_activerawsource_abstract,
    cwipc_multistream_description,
    cwipc_rawsource_abstract,
    vrt_fourcc_type,
)
from .peek_queue import PeekQueue

_lldplay_dll_reference = None


def _lldplay_dll(libname: Optional[str] = None):
    global _lldplay_dll_reference
    if _lldplay_dll_reference is not None:
        return _lldplay_dll_reference
    if libname is None:
        libname = os.environ.get("SIGNALS_SMD_PATH")
        if libname and os.path.isdir(libname):
            libname = os.path.join(libname, "liblldash_play.so")
        if not libname:
            libname = ctypes.util.find_library("lldash_play")
    if not libname or not os.path.exists(libname):
        raise CwipcError(
            "lldplay: SIGNALS lldash_play library not found"
            " (set SIGNALS_SMD_PATH to its directory)"
        )
    dll = ctypes.CDLL(libname)
    dll.lldplay_create.restype = ctypes.c_void_p
    dll.lldplay_create.argtypes = [ctypes.c_char_p, ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    dll.lldplay_destroy.argtypes = [ctypes.c_void_p]
    dll.lldplay_play.restype = ctypes.c_bool
    dll.lldplay_play.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    dll.lldplay_get_stream_count.restype = ctypes.c_int
    dll.lldplay_get_stream_count.argtypes = [ctypes.c_void_p]
    dll.lldplay_grab_frame.restype = ctypes.c_size_t
    dll.lldplay_grab_frame.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
    ]
    dll.lldplay_enable_stream.restype = ctypes.c_bool
    dll.lldplay_enable_stream.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    dll.lldplay_disable_stream.restype = ctypes.c_bool
    dll.lldplay_disable_stream.argtypes = [ctypes.c_void_p, ctypes.c_int]
    _lldplay_dll_reference = dll
    return dll


class _TileView(cwipc_rawsource_abstract):
    """Per-tile rawsource view over the shared playout session."""

    def __init__(self, parent: "_LLDashPlaySource", tile: int):
        self.parent = parent
        self.tile = tile
        self.queue: PeekQueue = PeekQueue(maxsize=2)
        self.fourcc = 0

    def set_fourcc(self, fourcc: vrt_fourcc_type) -> None:
        self.fourcc = VRT_4CC(fourcc)

    def get(self) -> Optional[bytes]:
        if self.eof():
            return None
        return self.queue.get()

    def available(self, wait: bool = False) -> bool:
        if not self.queue.empty():
            return True
        if wait and not self.parent.stopped:
            return self.queue.dont_get(timeout=2.0) is not None
        return False

    def eof(self) -> bool:
        return self.parent.stopped and self.queue.empty()

    def statistics(self) -> None:
        pass


class _LLDashPlaySource(cwipc_activerawmultisource_abstract):
    """Shared playout session; pump thread fans frames to per-tile views."""

    def __init__(self, url: str, verbose: bool = False):
        import threading

        self.dll = _lldplay_dll()
        self.url = url
        self.verbose = verbose
        self.stopped = False
        self.handle: Optional[ctypes.c_void_p] = None
        self.tiles: List[_TileView] = []
        self.stats = Stats(f"lldplay:{url}")
        self._thread = threading.Thread(target=self._pump, daemon=True)

    def start(self) -> bool:
        if self.handle is not None:
            # idempotent: the CLI factory starts the session for stream
            # discovery, then the synchronizer's start cascade reaches it
            # again
            return True
        handle = self.dll.lldplay_create(b"cwipc_util_tpu", None, b"", 0)
        if not handle:
            raise CwipcError(f"lldplay: cannot create player")
        self.handle = ctypes.c_void_p(handle)
        if not self.dll.lldplay_play(self.handle, self.url.encode("utf8")):
            raise CwipcError(f"lldplay: cannot play {self.url}")
        n = self.dll.lldplay_get_stream_count(self.handle)
        self.tiles = [_TileView(self, i) for i in range(max(1, n))]
        self._thread.start()
        return True

    def stop(self) -> None:
        self.stopped = True
        if self._thread.is_alive():
            self._thread.join(timeout=2)
        if self.handle:
            self.dll.lldplay_destroy(self.handle)
            self.handle = None

    def _pump(self) -> None:
        bufsize = 10 * 1024 * 1024
        buf = ctypes.create_string_buffer(bufsize)
        while not self.stopped and self.handle:
            got_any = False
            for i, view in enumerate(self.tiles):
                n = self.dll.lldplay_grab_frame(self.handle, i, buf, bufsize, None)
                if n > 0:
                    # bounded wait, then drop-oldest: a LIVE consumer gets
                    # every frame (the short grace covers scheduling jitter),
                    # while an unconsumed tile cannot stall the shared pump
                    # forever — it degrades to newest-frames-only
                    payload = buf.raw[:n]
                    try:
                        view.queue.put(payload, timeout=0.2)
                    except queue.Full:
                        while True:
                            try:
                                view.queue.put(payload, block=False)
                                break
                            except queue.Full:
                                try:
                                    view.queue.get(block=False)
                                except queue.Empty:
                                    continue
                    self.stats.add("packetsize", n, isInt=True)
                    got_any = True
            if not got_any:
                time.sleep(0.005)

    def get_tile_count(self) -> int:
        return len(self.tiles)

    def get_description(self) -> cwipc_multistream_description:
        return [[{}] for _ in self.tiles]

    def get_tile_source(self, tileIdx: int) -> cwipc_rawsource_abstract:
        return self.tiles[tileIdx]

    def select_tile_quality(self, tileIdx: int, qualityIdx: int) -> None:
        if self.handle:
            self.dll.lldplay_enable_stream(self.handle, tileIdx, qualityIdx)

    def statistics(self) -> None:
        self.stats.print()


class _SingleStreamView(cwipc_activerawsource_abstract):
    """Single-stream adapter over the multisource (the non-tiled factory).

    Consumer threads (e.g. the decoder) may poll before ``start()`` has
    finished stream discovery — every accessor must tolerate the
    not-yet-started state instead of indexing an empty tile list."""

    def __init__(self, url: str, verbose: bool = False):
        self.multi = _LLDashPlaySource(url, verbose)
        self._fourcc: Optional[vrt_fourcc_type] = None

    def set_fourcc(self, fourcc: vrt_fourcc_type) -> None:
        # normal call order is set_fourcc() (decoder construction) BEFORE
        # start() discovers the streams — remember it and apply at start
        self._fourcc = fourcc
        if self.multi.tiles:
            self.multi.tiles[0].set_fourcc(fourcc)

    def start(self) -> bool:
        ok = self.multi.start()
        if ok and self._fourcc is not None and self.multi.tiles:
            self.multi.tiles[0].set_fourcc(self._fourcc)
        return ok

    def stop(self) -> None:
        self.multi.stop()

    def get(self) -> Optional[bytes]:
        if not self.multi.tiles:
            return None
        return self.multi.get_tile_source(0).get()

    def available(self, wait: bool = False) -> bool:
        if not self.multi.tiles:
            return False
        return self.multi.get_tile_source(0).available(wait)

    def eof(self) -> bool:
        if not self.multi.tiles:
            return self.multi.stopped
        return self.multi.get_tile_source(0).eof()

    def statistics(self) -> None:
        self.multi.statistics()


def cwipc_source_lldplay(url: str, verbose: bool = False) -> cwipc_activerawsource_abstract:
    """Rawsource playing a (single-stream) low-latency DASH URL."""
    return _SingleStreamView(url, verbose=verbose)


def cwipc_multisource_lldplay(url: str, verbose: bool = False) -> cwipc_activerawmultisource_abstract:
    """Tiled multi-quality rawsource playing a low-latency DASH URL."""
    return _LLDashPlaySource(url, verbose=verbose)
