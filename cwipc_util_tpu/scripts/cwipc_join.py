"""cwipc join: merge pointcloud files into one.

Reference: python/cwipc/scripts/cwipc_join.py.
"""

import sys

from .. import cwipc_join_multi, cwipc_read, cwipc_read_debugdump, cwipc_write, cwipc_write_debugdump
from ._scriptsupport import BaseArgumentParser, beginOfRun, endOfRun


def _read_any(fn: str):
    if fn.endswith(".cwipcdump"):
        return cwipc_read_debugdump(fn)
    return cwipc_read(fn, 0)


def main() -> int:
    parser = BaseArgumentParser(description="Join pointcloud files into one")
    parser.add_argument("output", help="Output file (.ply or .cwipcdump)")
    parser.add_argument("inputs", nargs="+", help="Input files")
    args = parser.parse_args()
    beginOfRun(args)
    pcs = [_read_any(fn) for fn in args.inputs]
    joined = cwipc_join_multi(pcs)
    if args.output.endswith(".cwipcdump"):
        cwipc_write_debugdump(args.output, joined)
    else:
        cwipc_write(args.output, joined)
    print(f"join: {joined.count()} points -> {args.output}")
    endOfRun(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
