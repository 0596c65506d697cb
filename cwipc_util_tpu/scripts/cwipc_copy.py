"""cwipc copy: convert recordings between formats (grab from playback).

Reference: python/cwipc/scripts/cwipc_copy.py — the same FileWriter
machinery as grab, with a positional input.
"""

import sys

from . import cwipc_grab


# Options that consume a following value: their values must not be
# mistaken for positional arguments when rewriting argv.  The sets differ
# per delegation target — e.g. --rgb takes a value in grab (an image
# extension) but is a store_true in view.
_BASE_VALUE_FLAGS = {
    "--cameraconfig", "--proxy", "--netclient", "--lldplay",
    "--mt-netclient", "--mt-lldplay", "--playback", "--npoints", "--fps",
    "--count", "--inpoint", "--outpoint", "--filter", "--logging",
}
GRAB_VALUE_FLAGS = _BASE_VALUE_FLAGS | {
    "--compress_param", "--rgb", "--depth", "--skeleton", "--fpattern",
}
VIEW_VALUE_FLAGS = _BASE_VALUE_FLAGS | {"--latencies"}


def _positionals(argv, value_flags=GRAB_VALUE_FLAGS):
    out = []
    skip = False
    for a in argv:
        if skip:
            skip = False
            continue
        if a.startswith("-"):
            if a in value_flags and "=" not in a:
                skip = True
            continue
        out.append(a)
    return out


def main() -> int:
    argv = sys.argv[1:]
    positional = _positionals(argv)
    if len(positional) >= 2:
        inp = positional[0]
        idx = argv.index(inp)
        argv = argv[:idx] + argv[idx + 1 :]
        argv = ["--playback", inp] + argv
    sys.argv = [sys.argv[0].replace("copy", "grab")] + argv
    return cwipc_grab.main()


if __name__ == "__main__":
    sys.exit(main())
