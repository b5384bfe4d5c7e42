"""Runtime shape-check hook (utils/typecheck.py): the jaxtyping+typeguard
import hook over the signal codec, mirroring the reference's
jaxtyping+beartype hook (reference __main__.py:2-7).

Runs in subprocesses: an import hook only affects modules imported after
installation, and the main test process has long since imported the codec.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent

GOOD = """
from osu_dreamer_tpu.utils.typecheck import install_typecheck
assert install_typecheck()
import numpy as np
from osu_dreamer_tpu.signal.hits import events_signal
sig = events_signal([10.0, 50.0], np.linspace(0, 100, 32))
assert sig.shape == (32,)
print("GOOD-OK")
"""

BAD = """
from osu_dreamer_tpu.utils.typecheck import install_typecheck
assert install_typecheck()
import numpy as np
from osu_dreamer_tpu.signal.hits import decode_hit_signal
try:
    decode_hit_signal(np.zeros((5, 32)))  # wrong channel count: 7 expected
except Exception as e:
    assert "TypeCheck" in type(e).__name__ or "jaxtyped" in str(e), (type(e), e)
    print("BAD-CAUGHT")
else:
    raise SystemExit("shape violation was not caught")
"""

OFF = """
import os
os.environ["OSU_DREAMER_TYPECHECK"] = "0"
from osu_dreamer_tpu.utils.typecheck import install_typecheck
assert not install_typecheck()
print("OFF-OK")
"""


def run(code: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, capture_output=True, text=True,
        timeout=180,
    )
    assert proc.returncode == 0, f"{proc.stdout}\n{proc.stderr}"
    return proc.stdout


def test_good_shapes_pass():
    assert "GOOD-OK" in run(GOOD)


def test_bad_shapes_caught():
    assert "BAD-CAUGHT" in run(BAD)


def test_env_opt_out():
    assert "OFF-OK" in run(OFF)
