"""Example: view the synthetic source in the software viewer
(reference: examples/viewsynthetic.py).  Pass --nodisplay for headless
environments (counts frames without opening a window)."""

import sys
import threading

import cwipc_util_tpu as cwipc
from cwipc_util_tpu.io.visualizer import Visualizer


def view(source, headless: bool, max_frames: int) -> None:
    """Feed clouds from `source` into the Visualizer from a producer
    thread — the same source -> producer -> viewer-sink shape as the
    `cwipc view` script (scripts/cwipc_view.py)."""
    viz = Visualizer(nodisplay=headless)

    def feeder() -> None:
        shown = 0
        # also stop when the viewer quits (q): the producer must not
        # keep pulling frames from an infinite source
        while shown < max_frames and not source.eof() and not viz.stopped:
            if not source.available(True):
                break
            pc = source.get()
            if pc is None:
                break
            viz.feed(pc)
            shown += 1
        viz.stop()

    producer = threading.Thread(target=feeder, daemon=True)
    viz.set_producer(producer)
    producer.start()
    viz.run()
    producer.join(timeout=10)


def main() -> None:
    headless = "--nodisplay" in sys.argv
    gen = cwipc.cwipc_synthetic(10, 20000)
    gen.start()
    view(gen, headless, max_frames=30 if headless else 10**9)
    gen.stop()


if __name__ == "__main__":
    main()
