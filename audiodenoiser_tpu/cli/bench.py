"""Console entry point delegating to the repo-root benchmark."""

import os
import runpy
import sys


def main(argv=None):
    root_bench = os.path.join(os.path.dirname(__file__), "..", "..", "bench.py")
    root_bench = os.path.abspath(root_bench)
    if os.path.exists(root_bench):
        sys.argv = ["bench.py"] + (argv or sys.argv[1:])
        runpy.run_path(root_bench, run_name="__main__")
    else:  # installed without the repo: inline import
        from bench import main as bench_main  # type: ignore

        bench_main(argv)


if __name__ == "__main__":
    main()
