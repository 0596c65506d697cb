"""TCP client rawsource: connect, read 16-byte frames, queue payloads.

Re-implementation of the reference's netclient
(reference: python/cwipc/net/source_netclient.py): a thread connects to
host:port, reads the ``=LLQ`` frame header + payload, checks the fourcc and
pushes payloads into a bounded PeekQueue.  Connection-refused counts as EOF
(failure-tolerance contract, source_netclient.py:122-126); switchport()
reconnects for quality switching.

The multi-tile variant opens one client per tile at
port + tile*nQuality + quality (source_netclient.py:201-252).
"""

from __future__ import annotations

import socket
import struct
import threading
import time
from typing import List, Optional

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
from .sink_netserver import HEADER_FORMAT, HEADER_SIZE


class _NetClientSource(threading.Thread, cwipc_activerawsource_abstract):
    QUEUE_SIZE = 2

    def __init__(self, address: str, verbose: bool = False):
        threading.Thread.__init__(self, daemon=True)
        self.name = f"cwipc_util_tpu._NetClientSource:{address}"
        host, _, port = address.partition(":")
        self.host = host or "localhost"
        self.port = int(port or 4303)
        self.verbose = verbose
        self.fourcc: int = 0
        self.queue: PeekQueue = PeekQueue(maxsize=self.QUEUE_SIZE)
        self.running = False
        self._eof = False
        self.sock: Optional[socket.socket] = None
        self._switch_lock = threading.Lock()
        self._want_port: Optional[int] = None
        self.stats = Stats(f"netclient:{self.host}:{self.port}")

    def set_fourcc(self, fourcc: vrt_fourcc_type) -> None:
        self.fourcc = VRT_4CC(fourcc)

    def start(self) -> bool:
        # idempotent: tiled factories start clients for stream discovery and
        # the synchronizer's start cascade reaches them again
        if self.running:
            return True
        self.running = True
        threading.Thread.start(self)
        return True

    def stop(self) -> None:
        self.running = False
        with self._switch_lock:
            if self.sock:
                try:
                    self.sock.close()
                except OSError:
                    pass
                self.sock = None
        if self.is_alive():
            self.join(timeout=2)

    def switchport(self, port: int) -> None:
        """Reconnect to a different port (quality switching)."""
        with self._switch_lock:
            self._want_port = port
            if self.sock:
                try:
                    self.sock.close()
                except OSError:
                    pass
                self.sock = None

    def eof(self) -> bool:
        return self._eof and self.queue.empty()

    def available(self, wait: bool = False) -> bool:
        if not self.queue.empty():
            return True
        if wait and not self._eof:
            return self.queue.dont_get(timeout=2.0) is not None
        return False

    def get(self) -> Optional[bytes]:
        if self.eof():
            return None
        return self.queue.get()

    def _connect(self) -> Optional[socket.socket]:
        with self._switch_lock:
            if self._want_port is not None:
                self.port = self._want_port
                self._want_port = None
        try:
            sock = socket.create_connection((self.host, self.port), timeout=5)
            sock.settimeout(None)  # connect timeout only; streams may idle
            return sock
        except OSError:
            return None

    def _recv_all(self, sock: socket.socket, n: int) -> Optional[bytes]:
        chunks = []
        remaining = n
        while remaining > 0:
            chunk = sock.recv(remaining)
            if not chunk:
                return None
            chunks.append(chunk)
            remaining -= len(chunk)
        return b"".join(chunks)

    def run(self) -> None:
        sock = self._connect()
        if sock is None:
            # connection refused counts as EOF
            if self.verbose:
                print(f"netclient: connection to {self.host}:{self.port} refused")
            self._eof = True
            return
        self.sock = sock
        while self.running:
            try:
                hdr = self._recv_all(sock, HEADER_SIZE)
            except OSError:
                hdr = None
            if hdr is None:
                with self._switch_lock:
                    pending_switch = self._want_port is not None
                if pending_switch:
                    sock = self._connect()
                    if sock is not None:
                        self.sock = sock
                        continue
                break
            fourcc, length, timestamp = struct.unpack(HEADER_FORMAT, hdr)
            if self.fourcc and fourcc != self.fourcc:
                print(f"netclient: unexpected fourcc 0x{fourcc:08x}")
                break
            try:
                payload = self._recv_all(sock, length)
            except OSError:
                payload = None
            if payload is None:
                break
            self.stats.add("packetsize", length, isInt=True)
            self.stats.add("latency", max(0.0, time.time() - timestamp / 1000.0))
            self.queue.put(payload)
        self._eof = True
        try:
            sock.close()
        except OSError:
            pass

    def statistics(self) -> None:
        self.stats.print()


class _NetClientMultiSource(cwipc_activerawmultisource_abstract):
    """One netclient per tile; port block = base + tile*nQuality + quality."""

    def __init__(self, address: str, nTile: int, nQuality: int, verbose: bool = False):
        host, _, port = address.partition(":")
        self.host = host or "localhost"
        self.base_port = int(port or 4303)
        self.nTile = nTile
        self.nQuality = nQuality
        self.verbose = verbose
        self.sources: List[_NetClientSource] = [
            _NetClientSource(f"{self.host}:{self.base_port + t * nQuality}", verbose)
            for t in range(nTile)
        ]

    def start(self) -> bool:
        return all(s.start() for s in self.sources)

    def stop(self) -> None:
        for s in self.sources:
            s.stop()

    def get_tile_count(self) -> int:
        return self.nTile

    def get_description(self) -> cwipc_multistream_description:
        return [
            [dict(quality=q) for q in range(self.nQuality)] for _ in range(self.nTile)
        ]

    def get_tile_source(self, tileIdx: int) -> cwipc_rawsource_abstract:
        return self.sources[tileIdx]

    def select_tile_quality(self, tileIdx: int, qualityIdx: int) -> None:
        port = self.base_port + tileIdx * self.nQuality + qualityIdx
        self.sources[tileIdx].switchport(port)

    def statistics(self) -> None:
        for s in self.sources:
            s.statistics()


def cwipc_source_netclient(address: str, verbose: bool = False) -> cwipc_activerawsource_abstract:
    """Rawsource reading frames from a cwipc netserver at host:port."""
    return _NetClientSource(address, verbose=verbose)


def cwipc_multisource_netclient(
    address: str, nTile: int, nQuality: int, verbose: bool = False
) -> cwipc_activerawmultisource_abstract:
    """Tiled rawsource: one TCP stream per tile with quality switching."""
    return _NetClientMultiSource(address, nTile, nQuality, verbose=verbose)
