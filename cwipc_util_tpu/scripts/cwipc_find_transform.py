"""cwipc find_transform: pairwise ICP between two files/tiles.

Reference: python/cwipc/scripts/cwipc_find_transform.py — runs a pairwise
aligner between two clouds (or two tiles of one cloud) and prints the 4x4.
"""

import sys

import numpy as np

from .. import cwipc_read, cwipc_read_debugdump
from ..registration import fine
from ..registration.util import cwipc_tilefilter_masked
from ._scriptsupport import BaseArgumentParser, beginOfRun, endOfRun


def _read_any(fn):
    if fn.endswith(".cwipcdump"):
        return cwipc_read_debugdump(fn)
    return cwipc_read(fn, 0)


def main() -> int:
    parser = BaseArgumentParser(description="Find the transform aligning one cloud/tile to another")
    parser.add_argument("--algorithm", default="RegistrationComputer_ICP_Generalized", help="Fine alignment algorithm class name")
    parser.add_argument("--correspondence", type=float, help="Max correspondence distance")
    parser.add_argument("--sourcetile", type=int, help="Tile mask selecting the source points")
    parser.add_argument("--referencetile", type=int, help="Tile mask selecting the reference points")
    parser.add_argument("source", help="Source pointcloud file")
    parser.add_argument("reference", nargs="?", help="Reference pointcloud file (default: same as source)")
    args = parser.parse_args()
    beginOfRun(args)

    src = _read_any(args.source)
    ref = _read_any(args.reference) if args.reference else src.clone()
    if args.sourcetile:
        src = cwipc_tilefilter_masked(src, args.sourcetile)
    if args.referencetile:
        ref = cwipc_tilefilter_masked(ref, args.referencetile)

    cls = getattr(fine, args.algorithm, None)
    if cls is None:
        print(f"Unknown algorithm {args.algorithm}.{fine.HELP_FINE_ALIGNMENT_ALGORITHMS}")
        return 1
    aligner = cls()
    aligner.verbose = args.verbose > 0
    aligner.set_source_pointcloud(src)
    aligner.set_reference_pointcloud(ref)
    if args.correspondence:
        aligner.set_correspondence(args.correspondence)
    if not aligner.run():
        print("find_transform: alignment failed")
        return 1
    np.set_printoptions(suppress=True, precision=6)
    print(aligner.get_result_transformation())
    endOfRun(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
