"""Byte-exact golden-output tests for the data CLIs.

The oracle tests validate numerics; these validate the *serialized bytes*
(key order, rounding, indentation — the reference's nlohmann dump(2)
conventions, /root/reference/src/io/json_converters.cc:137-202). Each CLI
runs on the committed inputs under tests/golden/inputs and its outputs must
match tests/golden/expected byte for byte. Any intentional format change
must regenerate the fixtures: python tools/make_goldens.py
"""

import os
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from make_goldens import EXPECTED, INPUTS, golden_cases  # noqa: E402

_CASES = golden_cases()


@pytest.mark.parametrize(
    "name,cli_main,argv_fn,outputs",
    _CASES,
    ids=[c[0] for c in _CASES],
)
def test_golden_bytes(name, cli_main, argv_fn, outputs, tmp_path):
    if not os.path.isdir(EXPECTED):
        pytest.skip("golden fixtures not generated (tools/make_goldens.py)")
    out_dir = str(tmp_path)
    for out in outputs:
        os.makedirs(os.path.dirname(os.path.join(out_dir, out)) or out_dir,
                    exist_ok=True)
    rc = cli_main(argv_fn(INPUTS, out_dir))
    assert rc in (0, None), f"{name} exited {rc}"
    for out in outputs:
        got_path = os.path.join(out_dir, out)
        want_path = os.path.join(EXPECTED, out)
        assert os.path.exists(got_path), f"{name} did not write {out}"
        with open(got_path, "rb") as f:
            got = f.read()
        with open(want_path, "rb") as f:
            want = f.read()
        if got != want:
            # Find the first differing line for an actionable message.
            got_lines = got.decode(errors="replace").splitlines()
            want_lines = want.decode(errors="replace").splitlines()
            for i, (g, w) in enumerate(zip(got_lines, want_lines)):
                if g != w:
                    raise AssertionError(
                        f"{name}:{out} drifted at line {i + 1}:\n"
                        f"  got:  {g[:200]}\n  want: {w[:200]}\n"
                        "If intentional, regenerate: python tools/make_goldens.py"
                    )
            raise AssertionError(
                f"{name}:{out} length drifted ({len(got)} vs {len(want)} "
                "bytes); regenerate via tools/make_goldens.py if intentional"
            )
