"""cwipc grab: capture pointclouds and write them to files.

Re-implementation of the reference's grab script
(reference: python/cwipc/scripts/cwipc_grab.py): source -> FileWriter sink
writing ply / cwipcdump / cwicpc files named by a pattern.
"""

import os
import sys
import threading
from typing import Optional

from .. import CWIPC_FLAGS_BINARY, cwipc_write, cwipc_write_debugdump
from ..core.pointcloud import cwipc_pointcloud_wrapper
from ..utils.stats import Stats
from ._scriptsupport import (
    ArgumentParser,
    SourceServer,
    activesource_factory_from_args,
    beginOfRun,
    endOfRun,
)


class FileWriter:
    """Sink writing each fed cloud to a file named by the pattern."""

    def __init__(self, dirname: str, pattern: str, flags: int = 0, compressed: bool = False, verbose: bool = False):
        self.dirname = dirname
        self.pattern = pattern
        self.flags = flags
        self.compressed = compressed
        self.verbose = verbose
        self.count_written = 0
        self.producer = None
        self.stats = Stats("grab")
        self.encoder = None
        if compressed:
            from ..codec import cwipc_new_encoder

            self.encoder = cwipc_new_encoder()

    def set_producer(self, producer) -> None:
        self.producer = producer

    def _write_aux(self, pc: cwipc_pointcloud_wrapper) -> None:
        """Write RGB/depth aux images as PNG and skeletons as JSON, named by
        timestamp (the reference's filename-pattern machinery,
        python/cwipc/scripts/cwipc_grab.py)."""
        md = pc._metadata
        if md is None:
            return
        import json

        for i in range(md.count()):
            name = md.name(i)
            ts = pc.timestamp()
            if name.startswith("rgb") or name.startswith("depth"):
                try:
                    img = md.get_image(i)
                except (ValueError, KeyError):
                    continue
                try:
                    import cv2

                    out = os.path.join(self.dirname, f"{name}-{ts}.png")
                    cv2.imwrite(out, img[..., ::-1] if img.ndim == 3 else img)
                except ImportError:
                    pass
            elif name.startswith("skeleton"):
                from ..core.pointcloud import parse_skeleton_collection

                n_s, n_j, joints = parse_skeleton_collection(md.data(i))
                out = os.path.join(self.dirname, f"{name}-{ts}.json")
                with open(out, "w") as fp:
                    json.dump(
                        dict(
                            n_skeletons=n_s,
                            n_joints=n_j,
                            joints=[
                                dict(confidence=j.confidence, x=j.x, y=j.y, z=j.z,
                                     q_w=j.q_w, q_x=j.q_x, q_y=j.q_y, q_z=j.q_z)
                                for j in joints
                            ],
                        ),
                        fp,
                    )

    def feed(self, pc: cwipc_pointcloud_wrapper) -> None:
        self._write_aux(pc)
        filename = os.path.join(self.dirname, self.pattern % pc.timestamp())
        if filename.endswith(".cwipcdump"):
            cwipc_write_debugdump(filename, pc)
        elif filename.endswith(".cwicpc"):
            assert self.encoder is not None
            self.encoder.feed(pc)
            with open(filename, "wb") as fp:
                fp.write(self.encoder.get_bytes())
        else:
            cwipc_write(filename, pc, self.flags)
        self.count_written += 1
        if self.verbose:
            print(f"grab: wrote {filename}")
        pc.free()

    def statistics(self) -> None:
        print(f"filewriter: written={self.count_written}")


def main() -> int:
    parser = ArgumentParser(description="Capture pointclouds to files")
    parser.add_argument("--cwipcdump", action="store_true", help="Save as .cwipcdump (default: .ply)")
    parser.add_argument("--compress", action="store_true", help="Save as compressed .cwicpc")
    parser.add_argument("--binary", action="store_true", help="Save as binary .ply")
    parser.add_argument("outputdir", help="Directory to write the files to")
    args = parser.parse_args()
    beginOfRun(args)
    if not os.path.isdir(args.outputdir):
        print(f"{sys.argv[0]}: no such directory: {args.outputdir}")
        return -1
    if args.cwipcdump:
        pattern, flags, compressed = "pointcloud-%d.cwipcdump", 0, False
    elif args.compress:
        pattern, flags, compressed = "pointcloud-%d.cwicpc", 0, True
    else:
        pattern, flags, compressed = "pointcloud-%d.ply", (CWIPC_FLAGS_BINARY if args.binary else 0), False

    source = activesource_factory_from_args(args)()
    writer = FileWriter(args.outputdir, pattern, flags, compressed, verbose=args.verbose > 0)
    server = SourceServer(source, writer, args)
    thread = threading.Thread(target=server.run, name="cwipc_grab.source", daemon=True)
    writer.set_producer(thread)
    thread.start()
    thread.join()
    server.stop()
    if args.verbose:
        server.statistics()
        writer.statistics()
    endOfRun(args)
    return 0 if writer.count_written else 1


if __name__ == "__main__":
    sys.exit(main())
