"""cwipc create_analysis_test: build registration test fixtures.

Re-implementation of the reference's fixture generator
(reference: python/cwipc/scripts/cwipc_create_analysis_test.py): take a
cloud (synthetic by default), split it into simulated camera tiles, add
noise, and perturb each tile with a known ground-truth transform — the
input for registration tests with a known answer.
"""

import json
import math
import sys

import numpy as np

from .. import cwipc_write, cwipc_write_debugdump
from ..filters.noise import NoiseFilter
from ..filters.simulatecams import SimulatecamsFilter
from ..registration.util import cwipc_transform
from ._scriptsupport import ArgumentParser, activesource_factory_from_args, beginOfRun, endOfRun


def perturbation(seed: int, max_translation: float, max_rotation: float) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = rng.uniform(-max_translation, max_translation, 3)
    angle = rng.uniform(-max_rotation, max_rotation)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]])
    R = np.identity(3) + math.sin(angle) * K + (1 - math.cos(angle)) * (K @ K)
    T = np.identity(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def main() -> int:
    parser = ArgumentParser(description="Create a registration analysis test fixture")
    parser.add_argument("--ncamera", type=int, default=4, help="Number of simulated cameras")
    parser.add_argument("--noise", type=float, default=0.002, help="Per-point noise distance")
    parser.add_argument("--translation", type=float, default=0.02, help="Max per-camera translation")
    parser.add_argument("--rotation", type=float, default=0.05, help="Max per-camera rotation (radians)")
    parser.add_argument("--seed", type=int, default=42, help="Ground-truth RNG seed")
    parser.add_argument("output", help="Output pointcloud file (.ply or .cwipcdump)")
    args = parser.parse_args()
    beginOfRun(args)
    if not args.synthetic and not args.playback:
        args.synthetic = True

    source = activesource_factory_from_args(args)()
    source.start()
    pc = source.get()
    source.stop()
    assert pc is not None

    # soft assignment: points near sector boundaries go to either camera,
    # giving the tiles the overlap fine alignment needs
    pc = SimulatecamsFilter(args.ncamera, hard=False, seed=args.seed).filter(pc)
    if args.noise:
        pc = NoiseFilter(args.noise, seed=args.seed + 1).filter(pc)

    # perturb each tile with a known transform; save the ground truth
    from .. import cwipc_join_multi, cwipc_tilefilter

    parts = []
    ground_truth = {}
    for cam in range(args.ncamera):
        tilemask = 1 << cam
        tile_pc = cwipc_tilefilter(pc, tilemask)
        T = perturbation(args.seed + cam, args.translation, args.rotation)
        parts.append(cwipc_transform(tile_pc, T))
        # the aligner should recover the inverse
        ground_truth[str(tilemask)] = np.linalg.inv(T).tolist()
    out = cwipc_join_multi(parts)

    if args.output.endswith(".cwipcdump"):
        cwipc_write_debugdump(args.output, out)
    else:
        cwipc_write(args.output, out)
    gt_file = args.output + ".gt.json"
    with open(gt_file, "w") as fp:
        json.dump(ground_truth, fp, indent=2)
    print(f"create_analysis_test: wrote {args.output} ({out.count()} points) and {gt_file}")
    endOfRun(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
