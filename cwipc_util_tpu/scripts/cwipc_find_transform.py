"""cwipc find_transform: pairwise ICP between two files/tiles.

Full flow parity with the reference
(reference: python/cwipc/scripts/cwipc_find_transform.py): before/after
alignment analysis printout, auto correspondence threshold from the
pre-analysis, --dump writes color-coded combined before/after clouds,
--output saves the aligned result, --plot shows the distance
distributions, and the result prints as a ready-to-use
``--filter 'transform44(...)'`` expression.
"""

import sys

import numpy as np

from .. import (
    cwipc_colormap,
    cwipc_join,
    cwipc_read,
    cwipc_read_debugdump,
    cwipc_write,
)
from ..registration import fine
from ..registration.analyze import RegistrationAnalyzer
from ..registration.util import cwipc_tilefilter_masked
from ._scriptsupport import BaseArgumentParser, beginOfRun, endOfRun


def _read_any(fn):
    if fn.endswith(".cwipcdump"):
        return cwipc_read_debugdump(fn)
    return cwipc_read(fn, 0)


def _dump_pointclouds(filename, source, target, verbose):
    """Color-coded combined dump: source red, target green (reference
    dump_pointclouds)."""
    if verbose:
        print(f"Dumping point clouds to {filename}")
    colored_source = cwipc_colormap(source, 0xFFFFFFFF, 0xAAFF0000)
    colored_target = cwipc_colormap(target, 0xFFFFFFFF, 0xAA00FF00)
    combined = cwipc_join(colored_source, colored_target)
    cwipc_write(filename, combined)
    colored_source.free()
    colored_target.free()
    combined.free()


def _analyze(label, source, target, measures, verbose, plot):
    analyzer = RegistrationAnalyzer()
    analyzer.verbose = verbose
    analyzer.set_source_pointcloud(source)
    analyzer.set_reference_pointcloud(target)
    if measures:
        analyzer.set_correspondence_measure(*measures)
    analyzer.run()
    results = analyzer.get_results()
    print(f"{label} alignment: {results.tostr()}")
    if plot:
        from ..registration.plot import plot_analysis_results

        plot_analysis_results([results], filename=plot if isinstance(plot, str) else None,
                              title=label)
    return results


def main() -> int:
    parser = BaseArgumentParser(description="Find the transform aligning one cloud/tile to another")
    parser.add_argument("--algorithm", default="RegistrationComputer_ICP_Generalized", help="Fine alignment algorithm class name")
    parser.add_argument("--correspondence", type=float, default=-1, help="Max correspondence distance (default: from the pre-analysis)")
    parser.add_argument("--measure", action="append", metavar="METHOD", help="Correspondence measure(s): mean, median, tmean, mode")
    parser.add_argument("--sourcetile", type=int, help="Tile mask selecting the source points")
    parser.add_argument("--targettile", "--referencetile", dest="targettile", type=int, help="Tile mask selecting the target points")
    parser.add_argument("--plot", metavar="FILE", help="Write distance-distribution plots to FILE")
    parser.add_argument("--dump", action="store_true", help="Dump color-coded combined before/after clouds to files")
    parser.add_argument("--output", metavar="FILE", help="Write the aligned source cloud to FILE")
    parser.add_argument("source", help="Source pointcloud file")
    parser.add_argument("target", nargs="?", help="Target pointcloud file (default: same as source)")
    args = parser.parse_args()
    beginOfRun(args)
    verbose = args.verbose > 0

    src = _read_any(args.source)
    tgt = _read_any(args.target) if args.target else src.clone()
    if args.sourcetile:
        src = cwipc_tilefilter_masked(src, args.sourcetile)
    if args.targettile:
        tgt = cwipc_tilefilter_masked(tgt, args.targettile)

    fnmod = f"_{args.sourcetile or 0}_{args.targettile or 0}" if (args.sourcetile or args.targettile) else ""
    if args.dump:
        _dump_pointclouds(f"find_transform_before{fnmod}.ply", src, tgt, verbose)

    pre = _analyze("Before", src, tgt, args.measure, verbose, False)
    correspondence = args.correspondence
    if correspondence < 0:
        correspondence = pre.minCorrespondence

    cls = getattr(fine, args.algorithm, None)
    if cls is None:
        print(f"Unknown algorithm {args.algorithm}.{fine.HELP_FINE_ALIGNMENT_ALGORITHMS}")
        return 1
    print(f"Using aligner {cls.__name__} with correspondence threshold {correspondence}")
    aligner = cls()
    aligner.verbose = verbose
    aligner.set_source_pointcloud(src)
    aligner.set_reference_pointcloud(tgt)
    aligner.set_correspondence(correspondence)
    if not aligner.run():
        print("find_transform: alignment failed")
        return 1
    transform = aligner.get_result_transformation()
    result = aligner.get_result_pointcloud()

    if args.dump:
        cwipc_write(f"find_transform_result{fnmod}.ply", result)
        _dump_pointclouds(f"find_transform_after{fnmod}.ply", result, tgt, verbose)
    _analyze("After", result, tgt, args.measure, verbose, args.plot)
    if args.output:
        cwipc_write(args.output, result)

    np.set_printoptions(suppress=True, precision=6)
    print(np.asarray(transform))
    rows = ", ".join(
        "[" + ", ".join(f"{v:.6f}" for v in row) + "]"
        for row in np.asarray(transform)
    )
    print(f"Transform filter needed: --filter 'transform44([{rows}])'")
    endOfRun(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
