"""cwipc play: view recorded pointcloud files (positional input argument).

Reference: python/cwipc/scripts/cwipc_play.py — view for files/recordings.
"""

import sys

from ._scriptsupport import BaseArgumentParser, beginOfRun
from . import cwipc_view


def main() -> int:
    # `play INPUT` is `view --playback INPUT`; rewrite argv and delegate.
    argv = sys.argv[1:]
    positional = [a for a in argv if not a.startswith("-")]
    if positional:
        argv = [a for a in argv if a != positional[0]]
        argv = ["--playback", positional[0]] + argv
    sys.argv = [sys.argv[0].replace("play", "view")] + argv
    return cwipc_view.main()


if __name__ == "__main__":
    sys.exit(main())
