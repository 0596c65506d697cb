"""cwipc test_aligner: exercise a multicamera aligner on a file.

Reference: python/cwipc/scripts/cwipc_test_aligner.py.
"""

import sys

from .. import cwipc_read, cwipc_read_debugdump, cwipc_write
from ..registration import analyze as analyze_mod
from ..registration import fine as fine_mod
from ..registration import multicamera
from ._scriptsupport import BaseArgumentParser, beginOfRun, endOfRun


def _read_any(fn):
    if fn.endswith(".cwipcdump"):
        return cwipc_read_debugdump(fn)
    return cwipc_read(fn, 0)


def main() -> int:
    parser = BaseArgumentParser(description="Test a multicamera alignment algorithm on a tiled file")
    parser.add_argument("--algorithm", "--algorithm_multicamera", dest="algorithm", default="MultiCameraIterative", help="Multicamera algorithm class name")
    parser.add_argument("--algorithm_fine", help="Pairwise aligner class name")
    parser.add_argument("--algorithm_analyzer", help="Analyzer class name")
    parser.add_argument("--correspondence", type=float, help="Max correspondence distance")
    parser.add_argument("--togroundtruth", metavar="PLYFILE", help="Align every tile to a ground-truth cloud instead")
    parser.add_argument("--plot", metavar="FILE", help="Write per-camera analysis plots to FILE")
    parser.add_argument("--help_algorithms", action="store_true", help="List algorithm class names and exit")
    parser.add_argument("--output", metavar="FILE", help="Write the aligned cloud to FILE")
    parser.add_argument("pointcloud", nargs="?", help="Tiled pointcloud file")
    args = parser.parse_args()
    if args.help_algorithms:
        print(multicamera.HELP_MULTICAMERA_ALGORITHMS)
        print(fine_mod.HELP_FINE_ALIGNMENT_ALGORITHMS)
        print(analyze_mod.HELP_ANALYZER_ALGORITHMS)
        return 0
    if not args.pointcloud:
        print("test_aligner: a pointcloud file is required")
        return 1
    beginOfRun(args)

    pc = _read_any(args.pointcloud)
    if args.togroundtruth:
        cls = multicamera.MultiCameraToGroundTruth
    else:
        cls = getattr(multicamera, args.algorithm, None)
    if cls is None:
        print(f"Unknown algorithm {args.algorithm}.{multicamera.HELP_MULTICAMERA_ALGORITHMS}")
        return 1
    aligner = cls()
    aligner.verbose = args.verbose > 0
    if args.togroundtruth:
        aligner.set_groundtruth_pointcloud(_read_any(args.togroundtruth))
    if args.algorithm_fine:
        aligner.set_aligner_class(getattr(fine_mod, args.algorithm_fine))
    if args.algorithm_analyzer:
        aligner.set_analyzer_class(getattr(analyze_mod, args.algorithm_analyzer))
    aligner.set_tiled_pointcloud(pc)
    if args.correspondence:
        aligner.set_max_correspondence(args.correspondence)
    ok = aligner.run()
    print(aligner.report_change())
    if not ok:
        print("test_aligner: alignment failed")
        return 1
    if args.plot:
        from ..registration.plot import plot_analysis_results

        results = [r for r in getattr(aligner, "post_analysis_results", []) if r is not None]
        if results:
            plot_analysis_results(results, filename=args.plot, title="After alignment")
            print(f"test_aligner: wrote {args.plot}")
    if args.output:
        cwipc_write(args.output, aligner.get_result_pointcloud_full())
        print(f"test_aligner: wrote {args.output}")
    endOfRun(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
