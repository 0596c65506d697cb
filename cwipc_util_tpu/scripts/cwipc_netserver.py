"""cwipc netserver: pure-Python TCP relay (ingest -> fan-out).

Re-implementation of the reference's relay
(reference: python/cwipc/scripts/cwipc_netserver.py): an IngestServer
receives frames pushed by `cwipc forward --forward`, a ForwardServer fans
them out to any number of clients; per-client queue bounded at 10.
"""

import queue
import socket
import struct
import sys
import threading
import time
from typing import List

from ..net.sink_netserver import HEADER_FORMAT, HEADER_SIZE
from ._scriptsupport import BaseArgumentParser, beginOfRun, endOfRun

DEFAULT_INGEST_PORT = 4303
DEFAULT_SERVE_PORT = 4304
CLIENT_QUEUE_SIZE = 10


class Relay:
    def __init__(self, ingest_port: int, serve_port: int, verbose: bool = False, oneshot: bool = False):
        self.verbose = verbose
        self.oneshot = oneshot
        self.clients: List[queue.Queue] = []
        self.clients_lock = threading.Lock()
        self.done = threading.Event()
        self.ingest_sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.ingest_sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.ingest_sock.bind(("", ingest_port))
        self.ingest_sock.listen(1)
        self.ingest_sock.settimeout(0.5)
        self.serve_sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.serve_sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.serve_sock.bind(("", serve_port))
        self.serve_sock.listen(4)
        self.serve_sock.settimeout(0.5)

    def _recv_all(self, conn, n):
        chunks, remaining = [], n
        while remaining > 0:
            chunk = conn.recv(remaining)
            if not chunk:
                return None
            chunks.append(chunk)
            remaining -= len(chunk)
        return b"".join(chunks)

    def ingest_loop(self) -> None:
        while not self.done.is_set():
            try:
                conn, addr = self.ingest_sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            if self.verbose:
                print(f"netserver: ingest connection from {addr}", flush=True)
            while not self.done.is_set():
                hdr = self._recv_all(conn, HEADER_SIZE)
                if hdr is None:
                    break
                _, length, _ = struct.unpack(HEADER_FORMAT, hdr)
                payload = self._recv_all(conn, length)
                if payload is None:
                    break
                packet = hdr + payload
                with self.clients_lock:
                    for q in self.clients:
                        try:
                            q.put(packet, block=False)
                        except queue.Full:
                            pass
            conn.close()
            if self.oneshot:
                self.done.set()

    def serve_loop(self) -> None:
        while not self.done.is_set():
            try:
                conn, addr = self.serve_sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            if self.verbose:
                print(f"netserver: client connection from {addr}", flush=True)
            q: queue.Queue = queue.Queue(maxsize=CLIENT_QUEUE_SIZE)
            with self.clients_lock:
                self.clients.append(q)
            threading.Thread(target=self._client_loop, args=(conn, q), daemon=True).start()

    def _client_loop(self, conn, q) -> None:
        try:
            while not self.done.is_set():
                try:
                    packet = q.get(timeout=0.5)
                except queue.Empty:
                    continue
                conn.sendall(packet)
        except OSError:
            pass
        finally:
            with self.clients_lock:
                if q in self.clients:
                    self.clients.remove(q)
            conn.close()

    def run(self) -> None:
        t1 = threading.Thread(target=self.ingest_loop, daemon=True)
        t2 = threading.Thread(target=self.serve_loop, daemon=True)
        t1.start()
        t2.start()
        try:
            while not self.done.is_set():
                time.sleep(0.2)
        except KeyboardInterrupt:
            self.done.set()
        self.ingest_sock.close()
        self.serve_sock.close()


def main() -> int:
    parser = BaseArgumentParser(description="Pointcloud stream relay")
    parser.add_argument("--port", type=int, default=DEFAULT_INGEST_PORT, help="Ingest port")
    parser.add_argument("--serveport", type=int, default=DEFAULT_SERVE_PORT, help="Client serving port")
    parser.add_argument("--oneshot", action="store_true", help="Exit after the producer disconnects")
    args = parser.parse_args()
    beginOfRun(args)
    relay = Relay(args.port, args.serveport, verbose=args.verbose > 0, oneshot=args.oneshot)
    relay.run()
    endOfRun(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
