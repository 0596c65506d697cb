"""cwipc toproxy: push pointcloud packets to a cwipc proxy server.

Reference: python/cwipc/scripts/cwipc_toproxy.py (legacy path): grabs
clouds and sends them as 24-byte-header packets to a cwipc_proxy receiver.
"""

import socket
import struct
import sys

from ..net.proxy import CWIPC_POINT_PACKETHEADER_MAGIC, _PKT_FMT
from ._scriptsupport import (
    ArgumentParser,
    activesource_factory_from_args,
    beginOfRun,
    endOfRun,
)


def main() -> int:
    parser = ArgumentParser(description="Push pointclouds to a cwipc proxy")
    parser.add_argument("host", nargs="?", default="localhost")
    parser.add_argument("port", nargs="?", type=int, default=8887)
    args = parser.parse_args()
    beginOfRun(args)
    source = activesource_factory_from_args(args)()
    source.start()
    sock = socket.create_connection((args.host, args.port), timeout=5)
    # explicit --count wins verbatim; only an OMITTED count defaults to 10
    count = args.count if args.count is not None else 10
    sent = 0
    while sent < count and not source.eof():
        if not source.available(True):
            continue
        pc = source.get()
        if pc is None:
            break
        data = bytes(pc.get_bytes())
        hdr = struct.pack(
            _PKT_FMT, CWIPC_POINT_PACKETHEADER_MAGIC, len(data), pc.timestamp(), pc.cellsize(), 0
        )
        sock.sendall(hdr + data)
        sock.recv(8)  # timestamp ack
        pc.free()
        sent += 1
    sock.close()
    source.stop()
    endOfRun(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
