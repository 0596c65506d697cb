"""The `cwipc` command dispatcher.

Re-implementation of the reference's __main__
(reference: python/cwipc/__main__.py:138-158): `cwipc <subcommand>`
delegates to cwipc_util_tpu.scripts.cwipc_<subcommand>.main(); specials:

* version  — print version
* check    — run install self-checks
* python   — run the interpreter with cwipc importable
* parallel — run 2-3 cwipc commands as subprocesses with a stagger
  (the multi-process test harness, __main__.py:91-136)
"""

from __future__ import annotations

import importlib
import os
import subprocess
import sys
import time
from typing import List

SUBCOMMANDS = [
    "view",
    "play",
    "grab",
    "copy",
    "forward",
    "netserver",
    "join",
    "timing",
    "toproxy",
    "register",
    "analyze_registration",
    "find_transform",
    "test_aligner",
    "create_analysis_test",
]

PARALLEL_STAGGER_SECONDS = float(os.environ.get("CWIPC_PARALLEL_STAGGER", "2"))


def _usage() -> int:
    print(f"Usage: {os.path.basename(sys.argv[0])} SUBCOMMAND [args]", file=sys.stderr)
    print(f"Subcommands: version, check, python, parallel, {', '.join(SUBCOMMANDS)}", file=sys.stderr)
    return 2


def run_parallel(argv: List[str]) -> int:
    """Run `--`-separated cwipc commands as staggered subprocesses."""
    commands: List[List[str]] = [[]]
    for arg in argv:
        if arg == "--":
            commands.append([])
        else:
            commands[-1].append(arg)
    commands = [c for c in commands if c]
    if not 2 <= len(commands) <= 3:
        print("cwipc parallel: expected 2 or 3 commands separated by --", file=sys.stderr)
        return 2
    procs = []
    for i, cmd in enumerate(commands):
        full = [sys.executable, "-m", "cwipc_util_tpu"] + cmd
        procs.append(subprocess.Popen(full))
        if i < len(commands) - 1:
            time.sleep(PARALLEL_STAGGER_SECONDS)
    status = 0
    for p in procs:
        p.wait()
        status = status or p.returncode
    return status


def run_check() -> int:
    """Install self-check: core round trips + module probes."""
    import numpy as np

    import cwipc_util_tpu as cwipc

    print(f"cwipc_util_tpu version {cwipc.cwipc_get_version()}")
    pc = cwipc.cwipc_from_points([(1, 2, 3, 4, 5, 6, 7)], 42)
    assert pc.count() == 1
    packet = pc.get_packet()
    pc2 = cwipc.cwipc_from_packet(packet)
    assert list(pc.get_points()) == list(pc2.get_points())
    print("cwipc_util_tpu: core: ok")
    gen = cwipc.cwipc_synthetic(0, 1000)
    gen.start()
    spc = gen.get()
    gen.stop()
    assert spc is not None and spc.count() > 0
    print("cwipc_util_tpu: synthetic: ok")
    from cwipc_util_tpu import codec

    enc = codec.cwipc_new_encoder()
    enc.feed(spc)
    dec = codec.cwipc_new_decoder()
    dec.feed(enc.get_bytes())
    dpc = dec.get()
    assert dpc is not None and dpc.count() > 0
    print("cwipc_util_tpu: codec: ok")
    for mod in ("kinect", "realsense2", "orbbec"):
        ok = cwipc.cwipc_check_module(mod)
        print(f"cwipc_util_tpu: capturer {mod}: {'ok' if ok else 'not installed'}")
    print("cwipc_util_tpu: check: all ok")
    return 0


def main() -> int:
    if len(sys.argv) < 2:
        return _usage()
    subcommand = sys.argv[1]
    argv = sys.argv[2:]
    if subcommand in ("-h", "--help", "help"):
        return _usage()
    if subcommand == "version":
        import cwipc_util_tpu

        print(cwipc_util_tpu.cwipc_get_version())
        return 0
    if subcommand == "check":
        return run_check()
    if subcommand == "python":
        os.execv(sys.executable, [sys.executable] + argv)
    if subcommand == "parallel":
        return run_parallel(argv)
    if subcommand not in SUBCOMMANDS:
        print(f"cwipc: unknown subcommand {subcommand}", file=sys.stderr)
        return _usage()
    module = importlib.import_module(f".scripts.cwipc_{subcommand}", package="cwipc_util_tpu")
    sys.argv = [f"cwipc {subcommand}"] + argv
    return module.main()


if __name__ == "__main__":
    sys.exit(main())
