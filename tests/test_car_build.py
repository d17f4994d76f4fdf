"""Builds the native car/ stack and runs its ctest suites.

Also exercises the C++ <-> Python wire contract: the predict_live ZMQ
message format parsed by the C++ nn_comm subscriber.
"""

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CAR_DIR = os.path.join(REPO, "car")
BUILD_DIR = os.path.join(CAR_DIR, "build")


requires_toolchain = pytest.mark.skipif(
    shutil.which("cmake") is None or shutil.which("g++") is None,
    reason="C++ toolchain unavailable",
)


@pytest.fixture(scope="module")
def car_build():
    generator = ["-G", "Ninja"] if shutil.which("ninja") else []
    subprocess.run(
        ["cmake", "-S", CAR_DIR, "-B", BUILD_DIR, *generator],
        check=True,
        capture_output=True,
    )
    subprocess.run(
        ["cmake", "--build", BUILD_DIR], check=True, capture_output=True
    )
    return BUILD_DIR


@requires_toolchain
class TestCarStack:
    def test_ctest_suites_pass(self, car_build):
        result = subprocess.run(
            ["ctest", "--output-on-failure"],
            cwd=car_build,
            capture_output=True,
            text=True,
        )
        assert result.returncode == 0, result.stdout + result.stderr
        assert "100% tests passed" in result.stdout

    def test_tools_built_and_report_usage(self, car_build):
        for tool in ("kia_steering_angle", "kia_steering_manual", "kia_steering_nn"):
            path = os.path.join(car_build, tool)
            assert os.path.exists(path), tool
            # Without hardware flags the tools must fail fast with usage help.
            result = subprocess.run([path], capture_output=True, text=True)
            assert result.returncode == 1
            assert "usage" in result.stderr.lower()

    def test_firmware_sketch_shares_host_headers(self):
        sketch = os.path.join(
            CAR_DIR, "firmware", "kia-spoof-steering-box",
            "kia-spoof-steering-box.ino",
        )
        with open(sketch) as f:
            text = f.read()
        assert "pgcar/steering_commands.h" in text
        assert "pgcar/voltage_smoothing.h" in text
