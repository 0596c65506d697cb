"""cwipcdump / packet serialization — bit-compatible with the reference.

Wire/file format (reference: include/cwipc_util/api.h:53-66):

    32-byte header: char hdr[4]="cpcd", uint32 magic=0x20210208,
                    uint64 timestamp, float cellsize, uint32 unused,
                    uint64 size(bytes of point data)
    followed by `size` bytes of packed 16-byte cwipc_point records.

The same layout is used for in-memory packets (`copy_packet`,
src/cwipc_util.cpp:252-290) and .cwipcdump files
(src/cwipc_util.cpp:499-641).
"""

from __future__ import annotations

import struct

import numpy as np

from ..core.buffers import POINT_DTYPE, POINT_SIZE
from ..core.errors import CwipcError
from ..core.pointcloud import cwipc_pointcloud_wrapper

CWIPC_CWIPCDUMP_HEADER = b"cpcd"
CWIPC_CWIPCDUMP_VERSION = 0x20210208

_HDR_FMT = "<4sIQfIQ"
_HDR_SIZE = struct.calcsize(_HDR_FMT)
assert _HDR_SIZE == 32


def packet_from_pointcloud(pc: cwipc_pointcloud_wrapper) -> bytearray:
    data = pc.get_bytes()
    hdr = struct.pack(
        _HDR_FMT,
        CWIPC_CWIPCDUMP_HEADER,
        CWIPC_CWIPCDUMP_VERSION,
        pc.timestamp(),
        pc.cellsize(),
        0,
        len(data),
    )
    return bytearray(hdr) + data


def pointcloud_from_packet(packet: bytes) -> cwipc_pointcloud_wrapper:
    if len(packet) < _HDR_SIZE:
        raise CwipcError("cwipc_from_packet: packet too short")
    hdr, magic, timestamp, cellsize, _unused, size = struct.unpack_from(
        _HDR_FMT, packet, 0
    )
    if hdr != CWIPC_CWIPCDUMP_HEADER:
        raise CwipcError("cwipc_from_packet: bad header")
    if magic != CWIPC_CWIPCDUMP_VERSION:
        raise CwipcError("cwipc_from_packet: bad version")
    if len(packet) - _HDR_SIZE != size or size % POINT_SIZE != 0:
        raise CwipcError("cwipc_from_packet: inconsistent size")
    # host-backed: the raw packet bytes ARE the POINT_DTYPE layout.  ONE
    # copy (the wrapper must own mutable storage — callers reuse packet
    # buffers); the previous form also materialized a bytes slice first,
    # doubling the memcpy traffic on the 2.5 MB streaming hot path.
    pts = np.frombuffer(packet, dtype=POINT_DTYPE, offset=_HDR_SIZE).copy()
    return cwipc_pointcloud_wrapper(
        None, timestamp, cellsize, _host_points=pts
    )


def write_debugdump(filename: str, pc: cwipc_pointcloud_wrapper) -> int:
    try:
        with open(filename, "wb") as fp:
            fp.write(packet_from_pointcloud(pc))
    except OSError as e:
        raise CwipcError(f"cwipc_write_debugdump: {filename}: {e.strerror}") from e
    return 0


def read_debugdump(filename: str) -> cwipc_pointcloud_wrapper:
    try:
        with open(filename, "rb") as fp:
            data = fp.read()
    except OSError as e:
        raise CwipcError(f"cwipc_read_debugdump: {filename}: {e.strerror}") from e
    try:
        return pointcloud_from_packet(data)
    except CwipcError as e:
        raise CwipcError(f"cwipc_read_debugdump: {filename}: {e}") from e
