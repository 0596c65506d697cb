"""cwipc test_aligner: exercise a multicamera aligner on a file.

Reference: python/cwipc/scripts/cwipc_test_aligner.py.
"""

import sys

from .. import cwipc_read, cwipc_read_debugdump, cwipc_write
from ..registration import multicamera
from ._scriptsupport import BaseArgumentParser, beginOfRun, endOfRun


def _read_any(fn):
    if fn.endswith(".cwipcdump"):
        return cwipc_read_debugdump(fn)
    return cwipc_read(fn, 0)


def main() -> int:
    parser = BaseArgumentParser(description="Test a multicamera alignment algorithm on a tiled file")
    parser.add_argument("--algorithm", default="MultiCameraIterative", help="Multicamera algorithm class name")
    parser.add_argument("--correspondence", type=float, help="Max correspondence distance")
    parser.add_argument("--output", metavar="FILE", help="Write the aligned cloud to FILE")
    parser.add_argument("pointcloud", help="Tiled pointcloud file")
    args = parser.parse_args()
    beginOfRun(args)

    pc = _read_any(args.pointcloud)
    cls = getattr(multicamera, args.algorithm, None)
    if cls is None:
        print(f"Unknown algorithm {args.algorithm}.{multicamera.HELP_MULTICAMERA_ALGORITHMS}")
        return 1
    aligner = cls()
    aligner.verbose = args.verbose > 0
    aligner.set_tiled_pointcloud(pc)
    if args.correspondence:
        aligner.set_max_correspondence(args.correspondence)
    ok = aligner.run()
    print(aligner.report_change())
    if not ok:
        print("test_aligner: alignment failed")
        return 1
    if args.output:
        cwipc_write(args.output, aligner.get_result_pointcloud_full())
        print(f"test_aligner: wrote {args.output}")
    endOfRun(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
