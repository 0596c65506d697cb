"""cwipc copy: convert recordings between formats (grab from playback).

Reference: python/cwipc/scripts/cwipc_copy.py — the same FileWriter
machinery as grab, with a positional input.
"""

import sys

from . import cwipc_grab


def main() -> int:
    argv = sys.argv[1:]
    positional = [a for a in argv if not a.startswith("-")]
    if len(positional) >= 2:
        inp, outp = positional[0], positional[1]
        argv = [a for a in argv if a not in (inp,)]
        argv = ["--playback", inp] + argv
        sys.argv = [sys.argv[0].replace("copy", "grab")] + argv
    else:
        sys.argv = [sys.argv[0].replace("copy", "grab")] + argv
    return cwipc_grab.main()


if __name__ == "__main__":
    sys.exit(main())
