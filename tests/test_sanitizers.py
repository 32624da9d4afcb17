"""ASAN/UBSAN run of the C++ oracle (SURVEY.md §5 race detection/sanitizers).

Builds the sanitized CLI and round-trips real data through it; any heap
error / UB aborts the process and fails the test.
"""

import pathlib
import shutil
import subprocess

import numpy as np
import pytest

CPP = pathlib.Path(__file__).resolve().parents[1] / "cpp"


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_oracle_under_asan(tmp_path):
    r = subprocess.run(["make", "-s", "san"], cwd=CPP, capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr
    exe = CPP / "build" / "quantref_asan"
    data = np.random.default_rng(0).standard_normal(100_000).astype(
        np.float32)
    f = tmp_path / "x.f32"
    data.tofile(f)
    for bits in ("8", "4"):
        r = subprocess.run(
            [str(exe), "roundtrip", str(f), "--bits", bits],
            capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "mse" in r.stdout
