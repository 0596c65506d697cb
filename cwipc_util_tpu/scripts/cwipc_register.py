"""cwipc register: the full camera calibration orchestrator.

Re-implementation of the reference's register script
(reference: python/cwipc/scripts/cwipc_register.py:61-685): create or load a
cameraconfig, run coarse (fiducial) registration when the matrices are
identity or --coarse is given, align the floor, run fine multicamera
alignment, and save the matrices plus the proposed capture cellsize.
Supports --noregister (config generation only), --nofine/--nocoarse/
--nofloor stage skips, --conf_init key=value overrides, and recordings
(playback directories with a cameraconfig.json).
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional

import numpy as np

from .. import cwipc_join_multi, cwipc_write
from ..registration import coarse as coarse_mod
from ..registration import fine as fine_mod
from ..registration import multicamera as multicam_mod
from ..registration.cameraconfig import CameraConfig, default_cameraconfig
from ..registration.util import get_tiles_used
from ._scriptsupport import (
    ArgumentParser,
    activesource_factory_from_args,
    beginOfRun,
    endOfRun,
)


class Registrator:
    def __init__(self, args):
        self.args = args
        self.verbose = args.verbose > 0
        self.cameraconfig: Optional[CameraConfig] = None
        self.capturer = None

    # -- capture ---------------------------------------------------------------

    def open_capturer(self):
        factory = activesource_factory_from_args(self.args, autoConfig=False)
        self.capturer = factory()
        if not self.capturer.start():
            raise RuntimeError("register: cannot start capturer")

    def capture_pointcloud(self, count: int = 3):
        """Capture a few frames and keep the last (warm-up discard)."""
        pc = None
        for _ in range(count):
            if not self.capturer.available(True):
                continue
            new_pc = self.capturer.get()
            if new_pc is not None:
                if pc is not None:
                    pc.free()
                pc = new_pc
        if pc is None:
            raise RuntimeError("register: could not capture a pointcloud")
        return pc

    # -- config -----------------------------------------------------------------

    def load_cameraconfig(self) -> None:
        filename = self.args.cameraconfig or "cameraconfig.json"
        self.cameraconfig = CameraConfig(filename)
        if os.path.exists(filename):
            self.cameraconfig.load()
        else:
            config_bytes = None
            try:
                config_bytes = self.capturer.get_config()
            except Exception:
                pass
            if config_bytes:
                self.cameraconfig.load(config_bytes)
            else:
                # build a fresh config from the capturer's tile layout
                ncam = max(1, self.capturer.maxtile() - 1)
                data = default_cameraconfig("synthetic", [str(i) for i in range(ncam)])
                import json

                self.cameraconfig.load(json.dumps(data).encode("utf8"))
        for override in self.args.conf_init or []:
            self.cameraconfig.set_entry_from_string(override)

    def apply_config_to_capturer(self) -> None:
        if self.cameraconfig and self.capturer:
            try:
                self.capturer.reload_config(self.cameraconfig.get_json_data())
            except Exception:
                pass

    # -- stages -------------------------------------------------------------------

    def coarse_registration(self, pc) -> bool:
        algo_cls = (
            coarse_mod.MultiCameraCoarseColorTarget
            if self.args.tabletop
            else coarse_mod.MultiCameraCoarseAruco
        )
        algo = algo_cls()
        algo.verbose = self.verbose
        algo.set_tiled_pointcloud(pc)
        ok = algo.run()
        if ok:
            for i, T in enumerate(algo.get_result_transformations()):
                if i < self.cameraconfig.camera_count():
                    old = self.cameraconfig.get_transform(i).get_matrix()
                    self.cameraconfig.set_transform(i, np.asarray(T) @ old)
        return ok

    def floor_registration(self, pc) -> bool:
        algo = multicam_mod.MultiCameraToFloor()
        algo.verbose = self.verbose
        algo.set_aligner_class(fine_mod.RegistrationComputer_ICP_Point2Point)
        algo.set_tiled_pointcloud(pc)
        ok = algo.run()
        if ok:
            self._merge_transforms(algo.get_result_transformations(), pc)
        return ok

    def fine_registration(self, pc) -> bool:
        algo = multicam_mod.DEFAULT_MULTICAMERA_ALGORITHM()
        if self.args.guided:
            algo = multicam_mod.MultiCameraIterativeInteractive()
        algo.verbose = self.verbose
        algo.set_tiled_pointcloud(pc)
        if self.args.correspondence:
            algo.set_max_correspondence(self.args.correspondence)
        ok = algo.run()
        if ok:
            print(algo.report_change())
            self._merge_transforms(algo.get_result_transformations(), pc)
            self.proposed_cellsize = algo.proposed_cellsize
        return ok

    def _merge_transforms(self, transforms: List[np.ndarray], pc) -> None:
        tiles = get_tiles_used(pc)
        for cam_idx, T in enumerate(transforms):
            if cam_idx >= self.cameraconfig.camera_count():
                break
            old = self.cameraconfig.get_transform(cam_idx).get_matrix()
            self.cameraconfig.set_transform(cam_idx, np.asarray(T) @ old)

    # -- main -------------------------------------------------------------------------

    def run(self) -> int:
        self.proposed_cellsize = 0.0
        self.open_capturer()
        self.load_cameraconfig()
        if self.args.noregister:
            self.cameraconfig.save()
            print(f"register: wrote {self.cameraconfig.filename} (no registration)")
            return 0

        pc = self.capture_pointcloud()
        n_tiles = len(get_tiles_used(pc))
        if self.verbose:
            print(f"register: captured {pc.count()} points in {n_tiles} tiles")

        want_coarse = self.args.coarse or (
            self.cameraconfig.all_identity() and not self.args.nocoarse
        )
        if want_coarse:
            if self.coarse_registration(pc):
                print("register: coarse registration done")
                self.apply_config_to_capturer()
                pc = self.capture_pointcloud()
            else:
                print("register: coarse registration failed (continuing)")

        if not self.args.nofloor:
            if self.floor_registration(pc):
                print("register: floor alignment done")
                self.apply_config_to_capturer()
                pc = self.capture_pointcloud()

        if not self.args.nofine and n_tiles > 1:
            if self.fine_registration(pc):
                print("register: fine alignment done")
            else:
                print("register: fine alignment failed")

        self.cameraconfig.save()
        print(f"register: wrote {self.cameraconfig.filename}")
        if self.proposed_cellsize:
            print(f"register: proposed cellsize {self.proposed_cellsize:.4f}")
        if self.args.output:
            aligned = self.capture_pointcloud()
            cwipc_write(self.args.output, aligned)
        self.capturer.stop()
        return 0


def main() -> int:
    parser = ArgumentParser(description="Register (calibrate/align) multiple cameras")
    parser.add_argument("--coarse", action="store_true", help="Force coarse (marker) registration")
    parser.add_argument("--nocoarse", action="store_true", help="Skip coarse registration")
    parser.add_argument("--nofloor", action="store_true", help="Skip floor alignment")
    parser.add_argument("--nofine", action="store_true", help="Skip fine alignment")
    parser.add_argument("--noregister", action="store_true", help="Only create the cameraconfig")
    parser.add_argument("--guided", action="store_true", help="Interactive step-by-step walkthrough")
    parser.add_argument("--tabletop", action="store_true", help="Use the color-target coarse method")
    parser.add_argument("--correspondence", type=float, help="Max correspondence distance")
    parser.add_argument("--conf_init", action="append", metavar="KEY=VALUE", help="Override cameraconfig entries")
    parser.add_argument("--output", metavar="FILE", help="Write the final aligned capture to FILE")
    args = parser.parse_args()
    beginOfRun(args)
    rv = Registrator(args).run()
    endOfRun(args)
    return rv


if __name__ == "__main__":
    sys.exit(main())
