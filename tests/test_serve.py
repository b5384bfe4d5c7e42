"""Serving subsystem: resident GeneratorService + HTTP front-end.

Covers (with a tiny randomly-initialized artifact — structure, not quality):
- single blocking generate -> structurally valid .osz bytes;
- cross-request batching: concurrent same-signature requests share one
  device dispatch (stats assert batches < requests);
- seeded requests run solo and are reproducible;
- per-song conditioning survives batching (different diff counts never
  co-batch; same-count different-value diffs do, via the LDM's (S, D, 5)
  labels path);
- the HTTP surface end-to-end over a real socket (healthz / stats /
  generate, error paths).
"""

import concurrent.futures as cf
import io
import os
import sys
import threading
import zipfile
from pathlib import Path

import numpy as np
import pytest

from osu_dreamer_tpu.audio import SR
from osu_dreamer_tpu.data.synth import write_wav

TINY = None  # built once in the artifact fixture


def _tiny_ldm_args():
    from osu_dreamer_tpu.models.diffusion import DiffusionModelArgs
    from osu_dreamer_tpu.models.diffusion.model import BackboneArgs
    from osu_dreamer_tpu.models.inference.model import LDMArgs
    from osu_dreamer_tpu.models.latent import LatentModelArgs
    from osu_dreamer_tpu.models.latent.model import StackArgs
    from osu_dreamer_tpu.models.style import StyleModelArgs

    return LDMArgs(
        latent=LatentModelArgs(
            emb_dim=4, style_dim=8, n_downs=2, stride=3, h_dim=16,
            stack=StackArgs(n_layers=1, expand=2, radius=1),
            style_head_dim=8, style_heads=2,
        ),
        diffusion=DiffusionModelArgs(
            emb_dim=4, a_dim=16, style_dim=8, global_cond_dim=16,
            backbone_dim=16, u_head_dim=8,
            backbone=BackboneArgs(depth=1, expand=2, head_dim=8, n_heads=2, radius=1),
        ),
        style=StyleModelArgs(style_dim=8, label_features=16, h_dim=16, depth=1, expand=2),
    )


@pytest.fixture(scope="module")
def artifact_path(tmp_path_factory) -> Path:
    """a tiny random-weights inference artifact (no training)"""
    import jax
    import jax.numpy as jnp

    from osu_dreamer_tpu.audio import A_DIM
    from osu_dreamer_tpu.models.inference.artifact import build_artifact_bytes
    from osu_dreamer_tpu.models.inference.model import LDM

    args = _tiny_ldm_args()
    model = LDM(args)
    chunk = args.latent.chunk_size
    spec = jnp.zeros((1, 4 * chunk, A_DIM))
    labels = jnp.zeros((1, 5))
    params = model.init(jax.random.PRNGKey(0), spec, labels, jax.random.PRNGKey(1), 2)

    path = tmp_path_factory.mktemp("artifact") / "inference.odt"
    path.write_bytes(build_artifact_bytes(args, params))
    return path


def _wav_bytes(tmp_path: Path, seconds: float, freq: float = 220.0) -> bytes:
    t = np.arange(int(SR * seconds)) / SR
    p = tmp_path / f"w{freq:.0f}_{seconds:.2f}.wav"
    write_wav(p, np.sin(2 * np.pi * freq * t).astype(np.float32) * 0.5)
    return p.read_bytes()


def _check_osz(name: str, data: bytes, n_osu: int, audio_name: str = "audio.wav"):
    assert name.endswith(".osz")
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        names = z.namelist()
        assert audio_name in names
        osu = [n for n in names if n.endswith(".osu")]
        assert len(osu) == n_osu
        text = z.read(osu[0]).decode()
    for section in ("[General]", "[Metadata]", "[TimingPoints]", "[HitObjects]"):
        assert section in text
    return text


@pytest.fixture(scope="module")
def service(artifact_path):
    from osu_dreamer_tpu.serve import GeneratorService

    svc = GeneratorService(artifact_path, max_batch=4, batch_window_ms=150.0)
    yield svc
    svc.close()


@pytest.mark.slow
class TestService:
    def test_single_generate(self, service, tmp_path):
        audio = _wav_bytes(tmp_path, 2.0)
        name, osz = service.generate(
            audio, sample_steps=2, title="T", artist="A", seed=7
        )
        text = _check_osz(name, osz, 1)
        assert "Title: T" in text
        assert service.snapshot_stats()["requests"] >= 1

    def test_seeded_reproducible(self, service, tmp_path):
        audio = _wav_bytes(tmp_path, 2.0)
        kw = dict(sample_steps=2, title="T", artist="A", seed=123)
        _, a = service.generate(audio, **kw)
        _, b = service.generate(audio, **kw)
        # identical byte-for-byte .osu entries (zip metadata may differ)
        za = zipfile.ZipFile(io.BytesIO(a))
        zb = zipfile.ZipFile(io.BytesIO(b))
        for n in za.namelist():
            assert za.read(n) == zb.read(n)

    def test_concurrent_requests_batch(self, service, tmp_path):
        # same length bucket + same #diffs + steps -> one device dispatch.
        # Different diff VALUES per request must still co-batch (per-song
        # labels path); the batch window is long enough to catch all 3.
        audio = _wav_bytes(tmp_path, 2.0)
        before = service.snapshot_stats()
        diffs = [[(2.0, 5.0, 5.0, 3.0, 4.0)], [(5.0, 9.0, 8.0, 4.0, 6.0)], [(7.0, 10.0, 9.0, 4.5, 6.0)]]

        start = threading.Barrier(3)

        def go(d):
            start.wait()
            return service.generate(audio, diffs=d, sample_steps=2)

        with cf.ThreadPoolExecutor(3) as ex:
            results = list(ex.map(go, diffs))
        for name, osz in results:
            _check_osz(name, osz, 1)
        after = service.snapshot_stats()
        n_req = after["requests"] - before["requests"]
        n_batch = after["batches"] - before["batches"]
        assert n_req == 3
        assert n_batch < n_req, "concurrent same-signature requests did not co-batch"

    def test_multi_diff(self, service, tmp_path):
        audio = _wav_bytes(tmp_path, 1.5)
        diffs = [(3.0, 7.0, 6.0, 3.0, 5.0), (6.0, 9.5, 8.5, 4.0, 6.0)]
        name, osz = service.generate(audio, diffs=diffs, sample_steps=2, seed=1)
        _check_osz(name, osz, 2)

    def test_bad_diff_rejected(self, service):
        with pytest.raises(ValueError):
            service.generate(b"\0" * 64, diffs=[(1.0, 2.0)])

    def test_work_bounds_rejected(self, service):
        with pytest.raises(ValueError):
            service.generate(b"\0" * 64, sample_steps=10**9)
        with pytest.raises(ValueError):
            service.generate(b"\0" * 64, style_guidance=float("nan"))
        with pytest.raises(ValueError):
            service.generate(b"\0" * 64, diffs=[(1.0, 2, 3, 4, 5)] * 17)

    def test_close_fails_stranded_requests(self, artifact_path):
        """a request enqueued around close() gets an error, not a 600 s
        hang (enqueue re-checks closed under the lock; close drains)"""
        from osu_dreamer_tpu.serve import GeneratorService

        svc = GeneratorService(artifact_path, max_batch=2, batch_window_ms=10.0)
        svc.close()
        with pytest.raises(RuntimeError):
            svc.generate(b"\0" * 64, sample_steps=2, timeout=5.0)


@pytest.mark.slow
def test_multi_device_serving(artifact_path, tmp_path):
    """DP serving on an 8-virtual-CPU-device mesh (subprocess, same pattern
    as tests/test_parallel.py): concurrent requests shard over the data
    mesh, every dispatch pads to a multiple of the mesh size, outputs are
    structurally valid .osz bytes"""
    import subprocess

    audio_path = tmp_path / "song.wav"
    t = np.arange(int(SR * 1.5)) / SR
    write_wav(audio_path, np.sin(2 * np.pi * 220 * t).astype(np.float32) * 0.5)

    env = {
        **{k: v for k, v in os.environ.items() if "AXON" not in k.upper()},
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache_mc",
    }
    env.pop("PJRT_LIBRARY_PATH", None)

    code = f"""
import concurrent.futures as cf, io, zipfile
from osu_dreamer_tpu.serve import GeneratorService

svc = GeneratorService({str(artifact_path)!r}, max_batch=8, batch_window_ms=200.0)
assert svc.n_devices == 8, svc.n_devices
assert svc._song_sharding is not None
audio = open({str(audio_path)!r}, "rb").read()

def go(i):
    return svc.generate(audio, sample_steps=2, title=f"t{{i}}", artist="mp")

with cf.ThreadPoolExecutor(3) as ex:
    results = list(ex.map(go, range(3)))
for name, osz in results:
    with zipfile.ZipFile(io.BytesIO(osz)) as z:
        assert any(n.endswith(".osu") for n in z.namelist())
stats = svc.snapshot_stats()
assert stats["requests"] == 3
# every dispatch padded to a multiple of the mesh size (8)
total_rows = stats["batched_rows"] + stats["padded_rows"]
assert total_rows % 8 == 0, stats
svc.close()
print("multi-device serving ok:", stats["batches"], "dispatches")
"""
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env, cwd=Path(__file__).parent.parent,
        capture_output=True, text=True, timeout=560,
    )
    assert proc.returncode == 0, f"child failed:\n{proc.stdout}\n{proc.stderr}"
    assert "multi-device serving ok" in proc.stdout


@pytest.mark.slow
class TestHTTP:
    @pytest.fixture(scope="class")
    def server(self, artifact_path):
        # own service: MapServer.close() closes its service, and the
        # module-scoped one must survive for any later module in the session
        from osu_dreamer_tpu.serve import GeneratorService, MapServer

        svc = GeneratorService(artifact_path, max_batch=2, batch_window_ms=10.0)
        with MapServer(svc, host="127.0.0.1", port=0) as s:
            yield s

    def _url(self, server, path):
        host, port = server.address
        return f"http://{host}:{port}{path}"

    def test_healthz_and_stats(self, server):
        import json
        import urllib.request

        with urllib.request.urlopen(self._url(server, "/healthz"), timeout=10) as r:
            h = json.load(r)
        assert h["ok"] and h["devices"] >= 1
        with urllib.request.urlopen(self._url(server, "/stats"), timeout=10) as r:
            s = json.load(r)
        assert "requests" in s and "queued" in s

    def test_generate_roundtrip(self, server, tmp_path):
        import urllib.request

        audio = _wav_bytes(tmp_path, 1.5, freq=330.0)
        url = self._url(
            server,
            "/generate?sample_steps=2&seed=5&title=Net&artist=Srv"
            "&diff=4,8,7,4,5&name=song.wav",
        )
        req = urllib.request.Request(url, data=audio, method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.status == 200
            disp = r.headers["Content-Disposition"]
            osz = r.read()
        assert 'filename="Srv - Net.osz"' in disp
        text = _check_osz("x.osz", osz, 1, audio_name="song.wav")
        assert "Title: Net" in text

    def test_generate_snap_divisor(self, server, tmp_path):
        """per-request ?snap_divisor=4 (service default off): every emitted
        hit time lands on the inferred timing point's quarter-beat grid"""
        import urllib.request

        audio = _wav_bytes(tmp_path, 2.0, freq=261.0)
        url = self._url(
            server, "/generate?sample_steps=2&seed=9&snap_divisor=4&name=s.wav"
        )
        req = urllib.request.Request(url, data=audio, method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            osz = r.read()
        text = _check_osz("x.osz", osz, 1, audio_name="s.wav")

        tp0 = text.split("[TimingPoints]")[1].strip().splitlines()[0]
        offset, beat_len = (float(v) for v in tp0.split(",")[:2])
        tick = beat_len / 4.0
        times = [
            int(line.split(",")[2])
            for line in text.split("[HitObjects]")[1].strip().splitlines()
            if line
        ]
        for t in times:
            k = round((t - offset) / tick)
            assert abs(t - (offset + k * tick)) <= 1.0, (t, offset, tick)
        assert all(b > a for a, b in zip(times, times[1:])), times

    def test_bad_requests(self, server):
        import json
        import urllib.error
        import urllib.request

        # unknown path
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(self._url(server, "/nope"), timeout=10)
        assert e.value.code == 404

        # malformed diff
        req = urllib.request.Request(
            self._url(server, "/generate?diff=1,2"), data=b"x" * 64, method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 400
        assert "diff" in json.load(e.value)["error"]

        # empty body
        req = urllib.request.Request(self._url(server, "/generate"), data=b"", method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 400

        # negative snap divisor
        req = urllib.request.Request(
            self._url(server, "/generate?snap_divisor=-1"),
            data=b"x" * 64, method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 400
        assert "snap_divisor" in json.load(e.value)["error"]

        # unbounded device work rejected (steps/guidance are jit statics)
        for q in ("sample_steps=100000000", "style_guidance=inf",
                  "diff=" + "&diff=".join(["1,2,3,4,5"] * 17)):
            req = urllib.request.Request(
                self._url(server, f"/generate?{q}"),
                data=b"x" * 64, method="POST",
            )
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req, timeout=10)
            assert e.value.code == 400, q

    def test_hostile_names_sanitized(self, server, tmp_path):
        """zip-slip audio names and CRLF titles must not reach the zip
        entry or the response headers"""
        import urllib.parse
        import urllib.request

        audio = _wav_bytes(tmp_path, 1.0, freq=440.0)
        name = urllib.parse.quote("../../../../etc/passwd.wav")
        title = urllib.parse.quote('x"\r\nSet-Cookie: pwn=1')
        url = self._url(
            server,
            f"/generate?sample_steps=2&seed=3&name={name}&title={title}&artist=a",
        )
        req = urllib.request.Request(url, data=audio, method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            disp = r.headers["Content-Disposition"]
            osz = r.read()
        # injection-safe: no CR/LF survives, and the filename's quoting is
        # intact (exactly the two delimiting quotes). Literal "Set-Cookie"
        # TEXT inside the quoted value is harmless.
        assert "\r" not in disp and "\n" not in disp
        assert disp.count('"') == 2
        with zipfile.ZipFile(io.BytesIO(osz)) as z:
            for n in z.namelist():
                assert ".." not in n and not n.startswith("/"), n


@pytest.mark.slow
class TestSerializePool:
    def test_pool_decode_matches_inline(self, artifact_path, tmp_path):
        """the .osu-decode worker pool (serialize_workers >= 2) produces the
        same entries as inline decode (seeded request, byte equality)"""
        from osu_dreamer_tpu.serve import GeneratorService

        audio = _wav_bytes(tmp_path, 2.0)
        kw = dict(sample_steps=2, title="T", artist="A", seed=99)

        inline = GeneratorService(
            artifact_path, max_batch=1, batch_window_ms=5.0,
            serialize_workers=1,
        )
        try:
            _, a = inline.generate(audio, **kw)
            assert inline.serialize_workers == 1
        finally:
            inline.close()

        pooled = GeneratorService(
            artifact_path, max_batch=1, batch_window_ms=5.0,
            serialize_workers=2,
        )
        try:
            assert pooled.serialize_workers == 2
            assert pooled.health()["serialize_workers"] == 2
            _, b = pooled.generate(audio, **kw)
        finally:
            pooled.close()

        za = zipfile.ZipFile(io.BytesIO(a))
        zb = zipfile.ZipFile(io.BytesIO(b))
        assert sorted(za.namelist()) == sorted(zb.namelist())
        for n in za.namelist():
            assert za.read(n) == zb.read(n)
