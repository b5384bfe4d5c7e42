"""Test configuration: run JAX on CPU.

Multi-device (mesh/sharding) tests run in a *subprocess* with
``--xla_force_host_platform_device_count=8`` (see tests/test_parallel.py) —
the TPU-world "fake backend" for testing distributed code without a pod
(SURVEY.md §4). The flag is not set here because it slows every XLA:CPU
compile ~10x, which would tax the whole suite.
"""

import os

# the ambient environment points JAX at a (slow, tunneled) accelerator via a
# sitecustomize that registers the plugin at interpreter start — BEFORE this
# conftest runs — so the env var alone does not stick; the config.update
# below is what actually pins the backend. Both are set so subprocesses
# inherit the env. NOTE: avoid running two jax processes concurrently in
# this environment; the ambient sitecustomize opens a TPU relay session per
# process and concurrent sessions can block each other for minutes.
os.environ["JAX_PLATFORMS"] = "cpu"
# a truthy PALLAS_AXON_POOL_IPS makes sitecustomize re-register the relay in
# every subprocess (incl. spawn pools); clear it for children
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except Exception:
    pass

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
