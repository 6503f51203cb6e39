"""Mosaic AOT compile regression tests (no hardware needed).

Compiles the flat-lane megakernel for a v5e compile-only topology via
the LOCAL libtpu (scripts/aot_compile_check.py).  Interpret-mode parity
tests cannot see Mosaic compile failures — the ragged-chunk
ApplyVectorLayoutPass SIGABRT and the k5 VMEM overflow both passed
interpret tests and crashed only at real compile — so the benchmark
block shapes are pinned here.  Each case runs in a subprocess (a Mosaic
crash SIGABRTs the compiling process).
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
CHECK = REPO / "scripts" / "aot_compile_check.py"


def _have_local_tpu_compiler() -> bool:
    try:
        import libtpu  # noqa: F401
        return True
    except ImportError:
        return False


pytestmark = pytest.mark.skipif(
    not _have_local_tpu_compiler(),
    reason="local libtpu compiler not available",
)

# The 512px benchmark decoder-tail + encoder shapes the flat kernel
# dispatches on (ops/pallas/flatblock._flat_eligible policy + the
# "flat-all" experiment set).
CASES = [
    ("flat", 16, 16, 3, 6, 512, 8),    # decoder block 13 / encoder block 1
    ("flat", 40, 40, 5, 4, 512, 8),    # decoder blocks 8-9 (k5, chunked)
]


@pytest.mark.parametrize(
    "case", CASES, ids=lambda c: f"{c[0]}-{c[1]}-{c[2]}k{c[3]}t{c[4]}@{c[5]}"
)
def test_kernel_compiles_for_v5e(case):
    env = dict(os.environ)
    # Clear the axon tunnel plugin BEFORE interpreter start (its
    # sitecustomize registers at import) so compilation is local.
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = ""
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    proc = subprocess.run(
        [sys.executable, str(CHECK), *map(str, case)],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, (
        f"AOT compile failed (rc={proc.returncode}):\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )
    assert "COMPILED OK" in proc.stdout
