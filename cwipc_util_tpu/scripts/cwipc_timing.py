"""cwipc timing: per-cloud timestamp/latency CSV from timestamps metadata.

Reference: python/cwipc/scripts/cwipc_timing.py.
"""

import sys
import time

from ._scriptsupport import (
    ArgumentParser,
    activesource_factory_from_args,
    beginOfRun,
    endOfRun,
)


def main() -> int:
    parser = ArgumentParser(description="Measure per-cloud timing of a source")
    parser.add_argument("--output", metavar="FILE", help="Write CSV to FILE (default stdout)")
    args = parser.parse_args()
    beginOfRun(args)
    source = activesource_factory_from_args(args)()
    source.request_metadata("timestamps")
    source.start()
    out = open(args.output, "w") if args.output else sys.stdout
    out.write("seq,timestamp_ms,received_ms,latency_ms\n")
    seq = 0
    count = args.count or 10
    while not source.eof() and seq < count:
        if not source.available(True):
            continue
        pc = source.get()
        if pc is None:
            break
        now_ms = int(time.time() * 1000)
        out.write(f"{seq},{pc.timestamp()},{now_ms},{now_ms - pc.timestamp()}\n")
        pc.free()
        seq += 1
    source.stop()
    if args.output:
        out.close()
    endOfRun(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
