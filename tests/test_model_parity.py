"""Seed-matched NUMERICAL parity of the models vs the reference (SURVEY.md §7
step 7: "seed-matched numerical comparison vs reference on CPU").

The reference's diffusion/style model files are pure torch nn.Modules (CPU
torch is available here; only its *training* stack needs lightning/CUDA), so
these tests instantiate the reference model, transplant its weights into the
JAX model, and assert the forward functions agree to float32 tolerance on
shared inputs. This pins every layout/ordering decision: qkv head packing,
rotary halves, FiLM scale/shift/gate split order, SwiGLU v|g split, fp32
norm placement, u-head conv arithmetic, softplus distance scaling.

The latent (stage-1) model intentionally deviates from the reference's
conv-stride U-Net (reshape-mean pooling / repeat upsampling — see COVERAGE.md
§2.6), so exact weight transfer does not apply there; its behavior is covered
by round-trip and training tests instead.

The reference runs as a black-box oracle inside these tests only; no
reference code is executed at build time and none is copied.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REFERENCE / "osu_dreamer" / "models" / "diffusion" / "model.py").exists(),
    reason="reference snapshot not mounted",
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_models():
    """import the reference model modules (CPU torch); the style model pulls
    in the data layer whose native deps get the same stubs the codec parity
    suite uses"""
    rosu = types.ModuleType("rosu_pp_py")
    rosu.Beatmap = object
    rosu.Performance = object
    stubs = {"rosu_pp_py": rosu}
    for name in ("torchcodec", "torchcodec.decoders", "resonators"):
        stubs[name] = types.ModuleType(name)
    ad = types.ModuleType("torchcodec.decoders._audio_decoder")
    ad.AudioDecoder = object  # type: ignore[attr-defined]
    stubs["torchcodec.decoders._audio_decoder"] = ad
    stubs["torchcodec.decoders"].AudioDecoder = object  # type: ignore[attr-defined]
    stubs["torchcodec.decoders"].__path__ = []  # type: ignore[attr-defined]
    stubs["resonators"].ResonatorBank = object  # type: ignore[attr-defined]

    def purge_reference():
        # drop cached reference modules so suites that import the reference
        # with their own stubs (test_reference_parity) see a clean slate
        for n in [
            k for k in sys.modules
            if k == "osu_dreamer" or k.startswith("osu_dreamer.")
        ]:
            sys.modules.pop(n, None)

    inserted = [n for n in stubs if n not in sys.modules]
    for n in inserted:
        sys.modules[n] = stubs[n]
    sys.path.insert(0, str(REFERENCE))
    purge_reference()
    try:
        import osu_dreamer.models.diffusion.model as ref_diffusion
        import osu_dreamer.models.style.model as ref_style

        yield types.SimpleNamespace(diffusion=ref_diffusion, style=ref_style)
    finally:
        sys.path.remove(str(REFERENCE))
        for n in inserted:
            sys.modules.pop(n, None)
        purge_reference()


def _dense(sd, name, conv=False):
    w = sd[f"{name}.weight"]
    if conv:
        w = w[..., 0]  # (out, in, 1) -> (out, in)
    return {"kernel": np.ascontiguousarray(w.T), "bias": sd[f"{name}.bias"]}


def _dwconv(sd, name):
    # torch depthwise Conv1d (C, 1, K) -> flax (K, 1, C)
    return {
        "kernel": np.ascontiguousarray(sd[f"{name}.weight"].transpose(2, 1, 0)),
        "bias": sd[f"{name}.bias"],
    }


def _swiglu(sd, t):
    return {
        "dw_kernel": np.ascontiguousarray(sd[f"{t}.proj_vg.0.weight"][:, 0, :].T),
        "dw_bias": sd[f"{t}.proj_vg.0.bias"],
        "vg_kernel": np.ascontiguousarray(sd[f"{t}.proj_vg.1.weight"][..., 0].T),
        "vg_bias": sd[f"{t}.proj_vg.1.bias"],
        "out_kernel": np.ascontiguousarray(sd[f"{t}.proj_o.weight"][..., 0].T),
        "out_bias": sd[f"{t}.proj_o.bias"],
    }


class TestDiffusionParity:
    # small but non-trivial: 2 layers, 2 heads, radius 1
    EMB, A, S, CG, D, U = 4, 12, 6, 16, 32, 8
    DEPTH, HEADS, HEAD_DIM = 2, 2, 8

    @pytest.fixture(scope="class")
    def pair(self, ref_models):
        import jax, jax.numpy as jnp

        from osu_dreamer_tpu.models.diffusion import DiffusionModel, DiffusionModelArgs
        from osu_dreamer_tpu.models.diffusion.model import BackboneArgs

        rm = ref_models.diffusion
        torch.manual_seed(0)
        ref = rm.DiffusionModel(
            emb_dim=self.EMB, a_dim=self.A, style_dim=self.S,
            args=rm.DiffusionModelArgs(
                global_cond_dim=self.CG, backbone_dim=self.D, u_head_dim=self.U,
                backbone_args=rm.BackboneArgs(
                    depth=self.DEPTH, expand=2,
                    head_dim=self.HEAD_DIM, n_heads=self.HEADS, radius=1,
                ),
            ),
        ).eval()
        # zero-init weights carry no signal; randomize everything so parity
        # exercises every path (proj_out, FiLMs, u_mod, u_out)
        with torch.no_grad():
            for p in ref.parameters():
                p.uniform_(-0.2, 0.2)

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        net = {}
        for i in range(self.DEPTH):
            t = f"net.layers.{i}"
            net[f"layer{i}"] = {
                "film_attn": _dense(sd, f"{t}.ssg1"),
                "audio_proj": _dense(sd, f"{t}.proj_cl", conv=True),
                "attn": {
                    "qkv": _dense(sd, f"{t}.attn.qkv_proj", conv=True),
                    "out": _dense(sd, f"{t}.attn.out_proj", conv=True),
                    "q_gamma": sd[f"{t}.attn.q_norm.weight"],
                    "k_gamma": sd[f"{t}.attn.k_norm.weight"],
                },
                "film_ffn": _dense(sd, f"{t}.ssg2"),
                "ffn": _swiglu(sd, f"{t}.ffn"),
            }
        params = {"params": {
            "audio_in": _dense(sd, "proj_audio.0", conv=True),
            "style_in": _dense(sd, "proj_style.0"),
            "proj_in": _dense(sd, "proj_in", conv=True),
            "net": net,
            "proj_out": _dense(sd, "proj_out", conv=True),
            "u_convs": {
                "layers_0": _dwconv(sd, "u_head.0"),
                "layers_1": _dense(sd, "u_head.1", conv=True),
                "layers_3": _dwconv(sd, "u_head.3"),
                "layers_4": _dense(sd, "u_head.4", conv=True),
            },
            "u_film": _dense(sd, "u_mod"),
            "u_out": _dense(sd, "u_out"),
        }}
        params = jax.tree.map(jnp.asarray, params)

        args = DiffusionModelArgs(
            emb_dim=self.EMB, a_dim=self.A, style_dim=self.S,
            global_cond_dim=self.CG, backbone_dim=self.D, u_head_dim=self.U,
            backbone=BackboneArgs(
                depth=self.DEPTH, expand=2,
                head_dim=self.HEAD_DIM, n_heads=self.HEADS, radius=1,
            ),
        )
        mine = DiffusionModel(args, dtype=jnp.float32)
        return ref, mine, params

    def test_forward_matches(self, pair):
        import jax.numpy as jnp

        ref, mine, params = pair
        rng = np.random.default_rng(0)
        B, l = 3, 25
        audio = rng.normal(size=(B, l, self.A)).astype(np.float32)
        style = rng.normal(size=(B, self.S)).astype(np.float32)
        xt = rng.normal(size=(B, l, self.EMB)).astype(np.float32)

        with torch.no_grad():
            u_ref, v_ref = ref(
                torch.from_numpy(audio.transpose(0, 2, 1)),
                torch.from_numpy(style),
                torch.from_numpy(xt.transpose(0, 2, 1)),
            )
        u, v = mine.apply(params, jnp.asarray(audio), jnp.asarray(style), jnp.asarray(xt))

        np.testing.assert_allclose(np.asarray(u), u_ref.numpy(), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(v).transpose(0, 2, 1), v_ref.numpy(), rtol=2e-4, atol=2e-5
        )

    def test_sampler_matches_reference_loop(self, pair):
        """my jitted lax.scan sphere tracer == the reference's eager python
        sampling loop (reference model.py:117-137) run on the transplanted
        torch model with the same x0: forward parity + identical step/eta
        semantics => end-to-end sampler parity"""
        import jax
        import jax.numpy as jnp

        ref, mine, params = pair
        B, l, steps = 2, 19, 4
        rng = np.random.default_rng(3)
        audio = rng.normal(size=(B, l, self.A)).astype(np.float32)
        style = rng.normal(size=(B, self.S)).astype(np.float32)

        key = jax.random.PRNGKey(7)
        x_mine = np.asarray(
            jax.jit(
                lambda p, a, s, k: mine.apply(p, a, s, k, steps, method=type(mine).sample)
            )(params, jnp.asarray(audio), jnp.asarray(style), key)
        )

        # same x0 the jax sampler drew
        x0 = np.asarray(jax.random.normal(key, (B, l, self.EMB), jnp.float32))
        x_t = torch.from_numpy(x0.transpose(0, 2, 1).copy())
        a_t = torch.from_numpy(audio.transpose(0, 2, 1))
        s_t = torch.from_numpy(style)
        with torch.no_grad():
            cond = ref._precompute_conditioning(a_t, s_t)
            u0 = ref._pred(*cond, x_t)[0].mean().item()
            sqrt_c0 = float(np.sqrt(mine.args.c0))  # double-precision c0 (see below)
            eta = 1.0 - (sqrt_c0 / max(u0, sqrt_c0 + 1e-6)) ** (1.0 / steps)
            for _ in range(steps):
                u, v = ref._pred(*cond, x_t)
                x_t = x_t - eta * u[:, None, None] * v

        np.testing.assert_allclose(
            x_mine, x_t.numpy().transpose(0, 2, 1), rtol=1e-3, atol=2e-4
        )

    def test_constants_match(self, pair):
        ref, mine, _ = pair
        # the reference evaluates sigmoid(ndtri(.99)) through a float32 torch
        # scalar (reference model.py:40), rounding t99 at the 5th decimal; we
        # keep the exact double — c0 (a noise-floor smoothing) differs 0.08%
        assert np.isclose(mine.args.c0, ref.c0, rtol=1e-3)
        assert np.isclose(mine.args.u_scale, ref.u_scale)


class TestStyleParity:
    S, F, H, DEPTH = 6, 16, 24, 2

    @pytest.fixture(scope="class")
    def pair(self, ref_models):
        import jax, jax.numpy as jnp

        from osu_dreamer_tpu.models.style import StyleModel, StyleModelArgs
        from osu_dreamer_tpu.nn.features import _RFF_SEED

        rm = ref_models.style
        torch.manual_seed(0)
        ref = rm.StyleModel(
            style_dim=self.S,
            args=rm.StyleModelArgs(
                label_features=self.F, h_dim=self.H, depth=self.DEPTH, expand=2,
            ),
        ).eval()
        with torch.no_grad():
            for p in ref.parameters():
                p.uniform_(-0.2, 0.2)

        # align the (untrained, fixed) random-Fourier tables: ours are
        # regenerated from a pinned PRNG key; inject them into the torch side
        kw, kb = jax.random.split(jax.random.PRNGKey(_RFF_SEED))
        W = np.asarray(jax.random.normal(kw, (1, self.F)) * 32.0, np.float32)
        b = np.asarray(
            jax.random.uniform(kb, (self.F,), jnp.float32, -jnp.pi, jnp.pi)
        )
        with torch.no_grad():
            ref.rff.W.copy_(torch.from_numpy(W.T))
            ref.rff.b.copy_(torch.from_numpy(b))

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params = {"params": {
            "label_proj_w": sd["cond_proj_w"],
            "label_proj_b": sd["cond_proj_b"],
            "null_labels": sd["null_labels"],
            "proj_in": _dense(sd, "proj_in"),
            **{f"film{i}": _dense(sd, f"films.{i}") for i in range(self.DEPTH)},
            **{
                f"block{i}": {
                    "layers_0": _dense(sd, f"blocks.{i}.0"),
                    "layers_2": _dense(sd, f"blocks.{i}.3"),
                }
                for i in range(self.DEPTH)
            },
            "out_gamma": sd["proj_out.0.weight"],
            "proj_out": _dense(sd, "proj_out.1"),
            "u_out": _dense(sd, "u_out"),
        }}
        import jax as _jax

        params = _jax.tree.map(jnp.asarray, params)
        mine = StyleModel(
            StyleModelArgs(
                style_dim=self.S, label_features=self.F, h_dim=self.H,
                depth=self.DEPTH, expand=2,
            ),
            dtype=jnp.float32,
        )
        return ref, mine, params

    def test_forward_matches(self, pair):
        import jax.numpy as jnp

        ref, mine, params = pair
        rng = np.random.default_rng(1)
        B = 4
        st = rng.normal(size=(B, self.S)).astype(np.float32)
        labels = (rng.random((B, 5)) * 10).astype(np.float32)
        labels[0, 2] = -1.0  # exercise the null-label row

        with torch.no_grad():
            u_ref, v_ref = ref(torch.from_numpy(st), torch.from_numpy(labels))
        u, v = mine.apply(params, jnp.asarray(st), jnp.asarray(labels))

        np.testing.assert_allclose(np.asarray(u), u_ref.numpy(), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(v), v_ref.numpy(), rtol=2e-4, atol=2e-5)
