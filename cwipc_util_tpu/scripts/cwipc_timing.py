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
    parser.add_argument("--details", action="store_true", help="Also print every record as it is captured")
    parser.add_argument("--savergb", type=int, default=0, metavar="N", help="Save every Nth RGB aux image next to the CSV")
    args = parser.parse_args()
    beginOfRun(args)
    source = activesource_factory_from_args(args)()
    try:
        source.request_metadata("timestamps")
    except Exception:
        # playback sources have no per-stage timestamps metadata (the
        # reference raises and crashes here; degrading to frame
        # timestamps keeps the CSV useful for recordings)
        print("cwipc_timing: source has no timestamps metadata; "
              "frame timestamps only", file=sys.stderr)
    source.start()
    out = open(args.output, "w") if args.output else sys.stdout
    out.write("seq,timestamp_ms,received_ms,latency_ms,frame_duration_ms,pointcount,aux\n")
    seq = 0
    prev_ts = None
    savergb_counter = args.savergb
    # explicit --count wins verbatim; only an OMITTED count defaults to 10
    # (`or` would also coerce --count 0 and cap long recordings)
    count = args.count if args.count is not None else 10
    while not source.eof() and seq < count:
        if not source.available(True):
            continue
        pc = source.get()
        if pc is None:
            break
        now_ms = int(time.time() * 1000)
        ts = pc.timestamp()
        frame_duration = "" if prev_ts is None else str(ts - prev_ts)
        prev_ts = ts
        md = pc._metadata
        n_aux = md.count() if md is not None else 0
        record = f"{seq},{ts},{now_ms},{now_ms - ts},{frame_duration},{pc.count()},{n_aux}"
        out.write(record + "\n")
        if args.details:
            print(f"timing: {record}", file=sys.stderr)
            if md is not None:
                for i in range(n_aux):
                    name = md.name(i)
                    if "timestamps" in name:
                        print(f"timing:   {name}: {md.description(i)}", file=sys.stderr)
        if args.savergb and md is not None:
            savergb_counter -= 1
            if savergb_counter <= 0:
                savergb_counter = args.savergb
                for i in range(n_aux):
                    if md.name(i).startswith("rgb"):
                        try:
                            import cv2

                            img = md.get_image(i)
                            cv2.imwrite(f"timing-rgb-{ts}.png",
                                        img[..., ::-1] if img.ndim == 3 else img)
                        except (ImportError, ValueError, KeyError):
                            pass
        pc.free()
        seq += 1
    source.stop()
    if args.output:
        out.close()
    endOfRun(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
