"""`gs_benchmark` console entry point (reference `fs3dgs_benchmark/cli.py:5-24`,
registered in `setup.py:119`)."""

from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] in ("runall", "run"):
        argv = argv[1:]
    elif argv and argv[0] in ("-h", "--help"):
        print("usage: gs_benchmark runall -c config.yaml [--dry] [--python P]")
        return 0
    from .benchmark import main as bench_main
    bench_main(argv)
    return 0


if __name__ == "__main__":
    sys.exit(main())
