"""Plot benchmark03 logs: GB/s vs size (cf. benchmark03/postprocess.py)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from common import plot_logs  # noqa: E402

if __name__ == "__main__":
    logdir = sys.argv[1] if len(sys.argv) > 1 else "."
    plot_logs(logdir, "Size", "GB/s", "Matrix size M = N", "GB/s")
