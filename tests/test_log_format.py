"""Golden-format tests: emitted logs must honor the postprocess parsing
contract (token[1]=size, tokens[3:]=values, substring selectors), and the
postprocess scripts must produce a .png from them (SURVEY.md §4 implication
(c))."""

import io
import os
import subprocess
import sys

from tpu_bench.core.reporting import Reporter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_line_contract():
    buf = io.StringIO()
    rep = Reporter("Benchmark01 : L2 norm reduction", stream=buf)
    rep.emit("Size", 1024, ["A", "B"], [1.23456789012, 2.0],
             [3.14159265358979, 2.5e-3], "GB/s")
    lines = buf.getvalue().splitlines()
    assert lines[0] == "-" * 32
    assert lines[1].startswith("Benchmark01")
    data = [l for l in lines if "Size" in l and "GB/s" in l]
    assert len(data) == 1
    toks = data[0].split()
    assert toks[1] == "1024"
    assert [float(v) for v in toks[3:]] == [3.141592654, 0.0025]
    norm_line = [l for l in lines if "norm:" in l][0]
    assert norm_line.split()[3] == "1.23456789"  # 10 significant digits


def test_postprocess_runs(tmp_path):
    log = tmp_path / "outfile.log"
    with open(log, "w") as f:
        rep = Reporter("Benchmark02 : Vector Addition", stream=f)
        for size in (1024, 2048, 4096):
            rep.emit("Size", size, ["XLA", "Pallas"], [1.0, 1.0],
                     [size * 0.001, size * 0.0012], "GB/s")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "postprocess", "postprocess02.py"),
         str(tmp_path)],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "outfile.png").exists()
