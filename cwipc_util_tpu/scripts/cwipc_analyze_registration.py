"""cwipc analyze_registration: analyzer suite on a tiled file, with plots.

Reference: python/cwipc/scripts/cwipc_analyze_registration.py.
"""

import sys

from .. import cwipc_read, cwipc_read_debugdump
from ..registration.analyze import DEFAULT_ANALYZER_ALGORITHM, HELP_ANALYZER_ALGORITHMS
from ..registration.util import cwipc_tilefilter_masked, get_tiles_used
from ._scriptsupport import BaseArgumentParser, beginOfRun, endOfRun


def _read_any(fn):
    if fn.endswith(".cwipcdump"):
        return cwipc_read_debugdump(fn)
    return cwipc_read(fn, 0)


def main() -> int:
    parser = BaseArgumentParser(description="Analyze registration quality of a tiled pointcloud")
    parser.add_argument("--correspondence", type=float, default=0.1, help="Max correspondence distance")
    parser.add_argument("--measure", default="mean", help="Correspondence measure: mean, median, tmean, mode")
    parser.add_argument("--plot", metavar="FILE", help="Write a histogram plot to FILE")
    parser.add_argument("--ignore_floor", action="store_true", help="Exclude floor points")
    parser.add_argument("pointcloud", help="Tiled pointcloud file")
    args = parser.parse_args()
    beginOfRun(args)

    pc = _read_any(args.pointcloud)
    tiles = get_tiles_used(pc)
    if len(tiles) < 2:
        print(f"analyze_registration: {args.pointcloud} has fewer than 2 tiles")
        return 1
    all_results = []
    for tilemask in tiles:
        src = cwipc_tilefilter_masked(pc, tilemask)
        others = 0
        for t in tiles:
            if t != tilemask:
                others |= t
        ref = cwipc_tilefilter_masked(pc, others)
        analyzer = DEFAULT_ANALYZER_ALGORITHM()
        analyzer.verbose = args.verbose > 0
        analyzer.set_correspondence_measure(args.measure)
        analyzer.set_max_correspondence_distance(args.correspondence)
        analyzer.set_ignore_floor(args.ignore_floor)
        analyzer.set_source_pointcloud(src, tilemask)
        analyzer.set_reference_pointcloud(ref)
        analyzer.run()
        results = analyzer.get_results()
        all_results.append(results)
        print(f"tile {tilemask}: {results.tostr()}")
    if args.plot:
        from ..registration.plot import plot_analysis_results

        plot_analysis_results(all_results, filename=args.plot)
    endOfRun(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
