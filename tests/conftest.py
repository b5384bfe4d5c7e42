"""Test configuration: run JAX on CPU.

Multi-device (mesh/sharding) tests run in a *subprocess* with
``--xla_force_host_platform_device_count=8`` (see tests/test_parallel.py) —
the TPU-world "fake backend" for testing distributed code without a pod
(SURVEY.md §4). The flag is not set here because it slows every XLA:CPU
compile ~10x, which would tax the whole suite.
"""

import os
import sys

# The ambient environment registers a tunneled TPU backend in every python
# process via sitecustomize (keyed on PALLAS_AXON_POOL_IPS), whose remote
# session setup can block for minutes. That registration happened before this
# file runs, so scrubbing the env here is too late — re-exec the test process
# once with the accelerator env removed and JAX pinned to CPU.
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    clean = {k: v for k, v in os.environ.items() if "AXON" not in k.upper()}
    clean.pop("PJRT_LIBRARY_PATH", None)
    clean["JAX_PLATFORMS"] = "cpu"
    os.execvpe(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], clean)

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


SAMPLE_OSU = """osu file format v14

[General]
AudioFilename: audio.mp3
AudioLeadIn: 0
Mode: 0

[Editor]
BeatDivisor: 4

[Metadata]
Title: Test Song
TitleUnicode: Test Song
Artist: Test Artist
ArtistUnicode: Test Artist
Creator: tester
Version: Insane

[Difficulty]
HPDrainRate: 6
CircleSize: 4
OverallDifficulty: 8
ApproachRate: 9
SliderMultiplier: 1.8
SliderTickRate: 1

[Events]
//Background and Video events
2,20000,24000

[TimingPoints]
1000,500,4,2,0,60,1,0
9000,-50,4,2,0,60,0,0

[HitObjects]
64,64,1000,5,0,0:0:0:0:
128,96,1500,1,2,0:0:0:0:
192,128,2000,1,8,0:0:0:0:
256,192,2500,12,0,3500,0:0:0:0:
100,100,4000,2,0,L|300:100,1,180
100,200,6000,2,4,P|200:250|300:200,2,200
100,300,9000,6,0,B|200:350|200:350|300:300|400:330,1,250
"""


@pytest.fixture
def sample_osu_text():
    return SAMPLE_OSU
