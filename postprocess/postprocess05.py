"""Plot benchmark05 logs: GDOF/s vs nelmt (cf. benchmark05/postprocess.py)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from common import plot_logs  # noqa: E402

if __name__ == "__main__":
    logdir = sys.argv[1] if len(sys.argv) > 1 else "."
    plot_logs(logdir, "nelmt", "DOF/s", "Number of elmt.", "DOF (1e9/s)")
