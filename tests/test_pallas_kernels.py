"""Pallas kernel tests (interpreter mode on CPU; compiled path exercised on
real TPU by bench/demo runs)."""
import numpy as np
import jax.numpy as jnp
import pytest

from audio_algebra_tpu.ops.pallas.stft_kernel import pallas_stft
from audio_algebra_tpu.ops.stft import stft


@pytest.mark.parametrize("shape,nfft,hop", [
    ((2, 16384), 1024, 256),
    ((1, 2, 8192), 512, 128),
    ((3, 4096), 1024, 256),     # n_frames not a multiple of the tile
])
def test_pallas_stft_matches_reference(shape, nfft, hop):
    x = jnp.asarray(np.random.default_rng(0).standard_normal(shape).astype(np.float32))
    ref = stft(x, nfft, hop)
    ours = pallas_stft(x, nfft, hop, interpret=True)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)


def test_pallas_stft_no_center():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 8192)).astype(np.float32))
    ref = stft(x, 1024, 256, center=False)
    ours = pallas_stft(x, 1024, 256, center=False, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)


class TestGroupNormFused:
    """Parity of the Pallas fused GroupNorm(1)+GELU kernels vs flax
    nn.GroupNorm (interpret mode on CPU)."""

    def _ref(self, x, scale, bias, gelu):
        from flax import linen as nn
        gn = nn.GroupNorm(num_groups=1, epsilon=1e-6)
        y = gn.apply({"params": {"scale": scale, "bias": bias}}, x)
        return nn.gelu(y) if gelu else y

    @pytest.mark.parametrize("gelu", [True, False])
    @pytest.mark.parametrize("xla_stats", ["1", "0"])
    def test_btc_variant_matches_flax(self, gelu, xla_stats, monkeypatch):
        """Both statistics paths: the default XLA reduce (fuses into the
        producing conv's output fusion on TPU) and the AA_GN_XLA_STATS=0
        Pallas stats-pass fallback must agree with flax GroupNorm."""
        import jax
        import jax.numpy as jnp
        from audio_algebra_tpu.ops.pallas.groupnorm import groupnorm1_gelu_btc

        monkeypatch.setenv("AA_GN_XLA_STATS", xla_stats)
        x = jax.random.normal(jax.random.PRNGKey(0), (3, 512, 256),
                              jnp.float32) * 2.0 + 0.3
        scale = jnp.linspace(0.5, 1.5, 256)
        bias = jnp.linspace(-0.2, 0.2, 256)
        ref = self._ref(x, scale, bias, gelu)
        y = groupnorm1_gelu_btc(x, scale, bias, gelu=gelu)
        assert float(jnp.abs(y - ref).max()) < 1e-5

    @pytest.mark.parametrize("residual", [False, True])
    def test_xla_apply_matches_pallas(self, residual, monkeypatch):
        """AA_GN_XLA_APPLY=1 (all-XLA apply experiment) must be numerically
        identical to the Pallas apply path it substitutes."""
        import jax
        import jax.numpy as jnp
        from audio_algebra_tpu.ops.pallas.groupnorm import groupnorm1_gelu_btc

        x = jax.random.normal(jax.random.PRNGKey(7), (3, 512, 128),
                              jnp.float32) * 1.3 + 0.1
        res = (jax.random.normal(jax.random.PRNGKey(8), x.shape, jnp.float32)
               if residual else None)
        scale = jnp.linspace(0.6, 1.4, 128)
        bias = jnp.linspace(-0.3, 0.3, 128)
        ref = self._ref(x, scale, bias, True)
        if res is not None:
            ref = res + ref
        monkeypatch.setenv("AA_GN_XLA_APPLY", "1")
        y_xla = groupnorm1_gelu_btc(x, scale, bias, gelu=True, residual=res)
        monkeypatch.setenv("AA_GN_XLA_APPLY", "0")
        y_pl = groupnorm1_gelu_btc(x, scale, bias, gelu=True, residual=res)
        assert float(jnp.abs(y_xla - ref).max()) < 1e-5
        assert float(jnp.abs(y_xla - y_pl).max()) < 1e-6

    def test_xla_apply_default_at_large_batch(self, monkeypatch):
        """The round-3 default — XLA apply at b >= 16 (bf16 2.57 -> 2.69x
        on chip) — must match the Pallas apply it replaced. b=16 with no
        env flag takes the XLA path; AA_GN_XLA_APPLY=0 forces Pallas."""
        import jax
        import jax.numpy as jnp
        from audio_algebra_tpu.ops.pallas.groupnorm import groupnorm1_gelu_btc

        monkeypatch.delenv("AA_GN_XLA_APPLY", raising=False)
        x = jax.random.normal(jax.random.PRNGKey(9), (16, 256, 128),
                              jnp.float32) * 1.1 - 0.2
        scale = jnp.linspace(0.7, 1.3, 128)
        bias = jnp.linspace(-0.1, 0.1, 128)
        ref = self._ref(x, scale, bias, True)
        y_default = groupnorm1_gelu_btc(x, scale, bias, gelu=True)
        monkeypatch.setenv("AA_GN_XLA_APPLY", "0")
        y_pl = groupnorm1_gelu_btc(x, scale, bias, gelu=True)
        assert float(jnp.abs(y_default - ref).max()) < 1e-5
        assert float(jnp.abs(y_default - y_pl).max()) < 1e-6

    @pytest.mark.parametrize("b", [1, 3, 4])
    @pytest.mark.parametrize("residual", [False, True])
    def test_flat_apply_small_batch_matches(self, b, residual, monkeypatch):
        """The flat (T*B, C)-row apply (small-batch fast path, 100% sublane
        fill at any B) must agree with both flax and the (T, B, C)-view
        kernels it replaces below AA_GN_FLAT_MAX_B."""
        import jax
        import jax.numpy as jnp
        from audio_algebra_tpu.ops.pallas.groupnorm import groupnorm1_gelu_btc

        x = jax.random.normal(jax.random.PRNGKey(3), (b, 512, 128),
                              jnp.float32) * 1.7 - 0.4
        res = (jax.random.normal(jax.random.PRNGKey(4), x.shape, jnp.float32)
               if residual else None)
        scale = jnp.linspace(0.7, 1.3, 128)
        bias = jnp.linspace(-0.1, 0.1, 128)
        ref = self._ref(x, scale, bias, True)
        if res is not None:
            ref = res + ref
        monkeypatch.setenv("AA_GN_FLAT_MAX_B", "16")    # flat path ON
        y_flat = groupnorm1_gelu_btc(x, scale, bias, gelu=True, residual=res)
        monkeypatch.setenv("AA_GN_FLAT_MAX_B", "0")     # (T,B,C) path
        y_view = groupnorm1_gelu_btc(x, scale, bias, gelu=True, residual=res)
        assert float(jnp.abs(y_flat - ref).max()) < 1e-5
        assert float(jnp.abs(y_flat - y_view).max()) < 1e-6

    @pytest.mark.parametrize("b", [1, 4])
    @pytest.mark.parametrize("variant", ["quant", "emit_amax", "q_emit"])
    def test_flat_turbo_variants_match_view(self, b, variant, monkeypatch):
        """The flat-row turbo extras (int8 quant emit / residual amax /
        amax-carry int8 twin) must reproduce the (T, B, C)-view kernels
        bit-for-bit — they are what lets AA_TURBO_MIN_B + AA_GN_FLAT_MAX_B
        put the int8 MXU in play at MIRAGE's serving batches."""
        import jax
        import jax.numpy as jnp
        from audio_algebra_tpu.ops.pallas.groupnorm import groupnorm1_gelu_btc

        x = jax.random.normal(jax.random.PRNGKey(7), (b, 512, 128),
                              jnp.float32) * 1.5 + 0.2
        scale = jnp.linspace(0.7, 1.3, 128)
        bias = jnp.linspace(-0.1, 0.1, 128)
        res = jax.random.normal(jax.random.PRNGKey(8), x.shape, jnp.float32)
        qs = jnp.linspace(0.02, 0.08, 128)
        kwargs = dict(quant=dict(quant_scale=qs),
                      emit_amax=dict(residual=res, emit_amax=True),
                      q_emit=dict(residual=res, emit_amax=True,
                                  q_emit_scale=qs))[variant]

        def run():
            return groupnorm1_gelu_btc(x, scale, bias, gelu=True, **kwargs)

        monkeypatch.setenv("AA_GN_FLAT_MAX_B", "16")    # flat path ON
        got = run()
        monkeypatch.setenv("AA_GN_FLAT_MAX_B", "0")     # (T,B,C) path
        want = run()
        got = got if isinstance(got, tuple) else (got,)
        want = want if isinstance(want, tuple) else (want,)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g.dtype == w.dtype and g.shape == w.shape
            assert float(jnp.abs(g.astype(jnp.float32)
                                 - w.astype(jnp.float32)).max()) < 1e-5

    @pytest.mark.parametrize("b,t,c", [(1, 64, 128), (2, 256, 256),
                                       (8, 32, 512)])
    @pytest.mark.parametrize("film", [False, True])
    @pytest.mark.parametrize("pallas", [False, True])
    def test_grouped_gn_film_silu_matches_flax(self, b, t, c, film, pallas,
                                               monkeypatch):
        """The folded grouped-GN (+FiLM) (+SiLU) affine-planes form (both
        the XLA apply and the Pallas apply) must match the literal flax
        GroupNorm graph it replaces in UNetCFG1d.ResnetBlock."""
        import jax
        import jax.numpy as jnp
        from flax import linen as nn
        from audio_algebra_tpu.ops.pallas.groupnorm_grouped import (
            grouped_gn_film_silu)

        groups = 8
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(k, (b, t, c), jnp.float32) * 1.3 + 0.2
        scale = jnp.linspace(0.8, 1.2, c)
        bias = jnp.linspace(-0.2, 0.2, c)
        fs = (jax.random.normal(jax.random.PRNGKey(1), (b, 1, c)) * 0.3
              if film else None)
        fsh = (jax.random.normal(jax.random.PRNGKey(2), (b, 1, c)) * 0.2
               if film else None)

        gn = nn.GroupNorm(num_groups=groups, use_scale=False, use_bias=False)
        ref = gn.apply({"params": {}}, x) * scale + bias
        if film:
            ref = ref * (1 + fs) + fsh
        ref = nn.silu(ref)

        monkeypatch.setenv("AA_LDM_GN_PALLAS", "1" if pallas else "0")
        y = grouped_gn_film_silu(x, scale, bias, groups,
                                 film_scale=fs, film_shift=fsh)
        assert float(jnp.abs(y - ref).max()) < 2e-5

    def test_unetcfg_fold_matches_default_graph(self, monkeypatch):
        """UNetCFG1d forward with AA_LDM_GN=1 (folded grouped GN) must
        match the default graph on the same params."""
        import jax
        import jax.numpy as jnp
        from audio_algebra_tpu.models.unet_cfg1d import UNetCFG1d

        model = UNetCFG1d(in_channels=4, channels=64, multipliers=(2, 2),
                          factors=(2,), num_blocks=(1,), attentions=(0, 0),
                          attention_heads=2, attention_features=8)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 64))
        tt = jnp.array([0.3, 0.7])
        emb = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 512))
        monkeypatch.setenv("AA_LDM_GN", "0")
        params = model.init({"params": jax.random.PRNGKey(2)}, x, tt,
                            embedding=emb)
        v0 = model.apply(params, x, tt, embedding=emb)
        monkeypatch.setenv("AA_LDM_GN", "1")
        v1 = model.apply(params, x, tt, embedding=emb)
        assert float(jnp.abs(v1 - v0).max()) < 2e-5

    def test_residual_and_stats_paths_agree(self):
        """residual + gelu through the XLA-stats default vs the Pallas
        stats pass: bit-comparable results (same f32 accumulation)."""
        import os
        import jax
        import jax.numpy as jnp
        from audio_algebra_tpu.ops.pallas.groupnorm import groupnorm1_gelu_btc

        x = jax.random.normal(jax.random.PRNGKey(1), (2, 1024, 128),
                              jnp.float32)
        res = jax.random.normal(jax.random.PRNGKey(2), (2, 1024, 128),
                                jnp.float32)
        scale = jnp.ones((128,)); bias = jnp.zeros((128,))
        old = os.environ.get("AA_GN_XLA_STATS")
        try:
            os.environ["AA_GN_XLA_STATS"] = "1"
            y1 = groupnorm1_gelu_btc(x, scale, bias, residual=res)
            os.environ["AA_GN_XLA_STATS"] = "0"
            y0 = groupnorm1_gelu_btc(x, scale, bias, residual=res)
        finally:
            if old is None:
                os.environ.pop("AA_GN_XLA_STATS", None)
            else:
                os.environ["AA_GN_XLA_STATS"] = old
        assert float(jnp.abs(y1 - y0).max()) < 1e-6

    def test_module_dispatch_and_fallback(self):
        import jax
        import jax.numpy as jnp
        from audio_algebra_tpu.models.blocks import GroupNorm1

        # aligned shape -> pallas path; tiny channels -> jnp fallback.
        # both must agree with flax.
        for shape, tol in (((2, 256, 128), 1e-5), ((2, 100, 24), 1e-5)):
            x = jax.random.normal(jax.random.PRNGKey(1), shape) + 0.1
            m = GroupNorm1(fuse_gelu=True)
            params = m.init(jax.random.PRNGKey(0), x)
            y = m.apply(params, x)
            ref = self._ref(x, params["params"]["scale"],
                            params["params"]["bias"], gelu=True)
            assert float(jnp.abs(y - ref).max()) < tol, shape


class TestTurboInt8:
    """Opt-in int8 turbo conv path (AA_TURBO_INT8=1)."""

    def test_block_error_band_and_param_compat(self, monkeypatch):
        import jax
        import jax.numpy as jnp
        from audio_algebra_tpu.models.blocks import ResConvBlock
        from audio_algebra_tpu.utils.params import fast_random_params

        blk = ResConvBlock(256, 256)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 512, 256)) * 0.6
        params = fast_random_params(blk, 1, jnp.zeros((1, 8, 256)))
        ref = blk.apply(params, x)
        monkeypatch.setenv("AA_TURBO_INT8", "1")
        monkeypatch.setenv("AA_TURBO_MIN_B", "1")   # tiny CPU batches
        turbo = blk.apply(params, x)       # same params tree: no new leaves
        rel = float(jnp.sqrt(jnp.mean((turbo - ref) ** 2)
                             / jnp.mean(ref ** 2)))
        # quantisation noise must be present (path engaged) and small
        assert 1e-5 < rel < 0.05, rel

    def test_emit_amax_matches_true_amax(self):
        import jax
        import jax.numpy as jnp
        from audio_algebra_tpu.ops.pallas.groupnorm import groupnorm1_gelu_btc

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 512, 256)) * 1.7
        res = jax.random.normal(jax.random.PRNGKey(1), (2, 512, 256)) * 3.0
        scale = jnp.linspace(0.5, 1.5, 256)
        bias = jnp.linspace(-0.2, 0.2, 256)
        out, amax = groupnorm1_gelu_btc(x, scale, bias, residual=res,
                                        emit_amax=True)
        ref = groupnorm1_gelu_btc(x, scale, bias, residual=res)
        assert float(jnp.abs(out - ref).max()) < 1e-6
        true_amax = jnp.max(jnp.abs(ref), axis=(0, 1))
        assert float(jnp.abs(amax - true_amax).max()) < 1e-5

    def test_amax_threading_through_level(self, monkeypatch):
        """conv1-int8: blocks 2..3 of a level consume the previous block's
        emitted amax; the whole level must stay within the turbo error band
        and produce no new param leaves."""
        import jax
        import jax.numpy as jnp
        from audio_algebra_tpu.models.unet1d import _Stack3
        from audio_algebra_tpu.utils.params import fast_random_params

        lvl = _Stack3(256, 256, attn=False)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 512, 256)) * 0.6
        params = fast_random_params(lvl, 1, jnp.zeros((1, 8, 256)))
        ref, a_ref, q_ref = lvl.apply(params, x)
        assert a_ref is None and q_ref is None
        monkeypatch.setenv("AA_TURBO_INT8", "1")
        monkeypatch.setenv("AA_TURBO_MIN_B", "1")
        turbo, amax, q = lvl.apply(params, x)
        assert amax is not None and amax.shape == (256,)
        assert q is not None and q[0].shape == (256,)
        rel = float(jnp.sqrt(jnp.mean((turbo - ref) ** 2)
                             / jnp.mean(ref ** 2)))
        assert 1e-5 < rel < 0.05, rel
        # the emitted bound must actually bound the output
        true_amax = jnp.max(jnp.abs(turbo), axis=(0, 1))
        assert bool(jnp.all(amax >= true_amax - 1e-4))

    @pytest.mark.slow
    def test_amax_threading_flat_small_batch(self, monkeypatch):
        """The whole turbo level through the FLAT-row GN dispatch
        (AA_GN_FLAT_MAX_B) at serving batch B=1 must match the
        (T, B, C)-view turbo path exactly — same int8 grids, same amax."""
        import jax
        import jax.numpy as jnp
        from audio_algebra_tpu.models.unet1d import _Stack3
        from audio_algebra_tpu.utils.params import fast_random_params

        lvl = _Stack3(256, 256, attn=False)
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 512, 256)) * 0.6
        params = fast_random_params(lvl, 1, jnp.zeros((1, 8, 256)))
        monkeypatch.setenv("AA_TURBO_INT8", "1")
        monkeypatch.setenv("AA_TURBO_MIN_B", "1")
        want, a_want, q_want = lvl.apply(params, x)
        monkeypatch.setenv("AA_GN_FLAT_MAX_B", "16")
        got, a_got, q_got = lvl.apply(params, x)
        assert float(jnp.abs(got - want).max()) < 1e-5
        assert float(jnp.abs(a_got - a_want).max()) < 1e-5
        assert q_got is not None and q_got[0].shape == q_want[0].shape

    def test_rows_variant_matches_3d_paths(self, monkeypatch):
        """The flattened-rows GN (small-batch dispatch) must agree with the
        (T, B, C)-view kernels on every variant: plain, residual+amax, and
        residual+amax+int8-twin."""
        import jax
        import jax.numpy as jnp
        from audio_algebra_tpu.ops.pallas import groupnorm as pgn

        x = jax.random.normal(jax.random.PRNGKey(0), (4, 256, 256)) * 1.4
        res = jax.random.normal(jax.random.PRNGKey(1), (4, 256, 256)) * 2.0
        scale = jnp.linspace(0.5, 1.5, 256)
        bias = jnp.linspace(-0.2, 0.2, 256)

        def run():
            plain = pgn.groupnorm1_gelu_btc(x, scale, bias)
            out, amax = pgn.groupnorm1_gelu_btc(x, scale, bias, residual=res,
                                                emit_amax=True)
            grid = jnp.maximum(amax, 1e-6) * 1.25 / 127.0
            o2, a2, o8 = pgn.groupnorm1_gelu_btc(x, scale, bias, residual=res,
                                                 emit_amax=True,
                                                 q_emit_scale=grid)
            return plain, out, amax, o2, a2, o8

        monkeypatch.setenv("AA_GN_ROWS_MAX_B", "16")   # enable rows path
        r_rows = run()
        monkeypatch.setenv("AA_GN_ROWS_MAX_B", "0")    # force 3-D path
        r_3d = run()
        for a, b, tol in zip(r_rows, r_3d, (1e-5, 1e-5, 1e-4, 1e-5, 1e-4, 1.001)):
            assert float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                         - b.astype(jnp.float32)))) <= tol

    def test_q_emit_twin_matches_separate_quantize(self):
        """The GN residual kernel's int8 twin (q_emit_scale) must equal
        quantising the bf16 output separately on the same grid — the
        amax-carry path changes WHERE quantisation happens, not its math."""
        import jax
        import jax.numpy as jnp
        from audio_algebra_tpu.ops.pallas.groupnorm import groupnorm1_gelu_btc

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 512, 256)) * 1.3
        res = jax.random.normal(jax.random.PRNGKey(1), (2, 512, 256)) * 2.0
        scale = jnp.linspace(0.5, 1.5, 256)
        bias = jnp.linspace(-0.2, 0.2, 256)
        out_ref, amax_ref = groupnorm1_gelu_btc(x, scale, bias, residual=res,
                                                emit_amax=True)
        grid = (jnp.maximum(amax_ref, 1e-6) * 1.25 / 127.0)
        out, amax, o8 = groupnorm1_gelu_btc(x, scale, bias, residual=res,
                                            emit_amax=True,
                                            q_emit_scale=grid)
        assert float(jnp.abs(out - out_ref).max()) < 1e-6
        assert float(jnp.abs(amax - amax_ref).max()) < 1e-6
        manual = jnp.clip(jnp.round(out_ref.astype(jnp.float32) / grid),
                          -127, 127).astype(jnp.int8)
        assert int(jnp.abs(o8.astype(jnp.int32)
                           - manual.astype(jnp.int32)).max()) <= 1

    @pytest.mark.slow
    def test_amax_carry_unet_decode(self, monkeypatch):
        """Turbo decode with the amax-carry sampler (aux threaded through
        the loop, step 0 unrolled) stays within the turbo error band of the
        bf16 decode, on a 2-level UNet with 128-channel pallas-aligned
        shapes."""
        import jax
        import jax.numpy as jnp
        from audio_algebra_tpu.models.dvae import DiffusionDVAE
        from audio_algebra_tpu.samplers.vddim import sample as vddim_sample
        from audio_algebra_tpu.utils.params import fast_random_params

        model = DiffusionDVAE(latent_dim=8, capacity=4, c_mults=(2, 4),
                              strides=(4, 2), n_attn_layers=0,
                              diffusion_c_mults=(128, 128))
        params = fast_random_params(model, 0, jnp.zeros((1, 2, 2048)),
                                    jnp.zeros((1,)))
        noise = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 2048))
        cond = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 256))

        ref = vddim_sample(
            lambda x, t, cond: model.apply(params, x, t, cond,
                                           method=DiffusionDVAE.decode_v),
            noise, 3, 0, cond)
        monkeypatch.setenv("AA_TURBO_INT8", "1")
        monkeypatch.setenv("AA_TURBO_MIN_B", "1")
        got = vddim_sample(
            lambda x, t, aux, cond: model.apply(
                params, x, t, cond, q_aux=aux,
                method=DiffusionDVAE.decode_v_aux),
            noise, 3, 0, cond, aux_mode=True)
        rel = float(jnp.sqrt(jnp.mean((got - ref) ** 2)
                             / jnp.maximum(jnp.mean(ref ** 2), 1e-12)))
        assert 1e-6 < rel < 0.08, rel

    def test_conv1d_int8_matches_float(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from audio_algebra_tpu.models.blocks import conv1d_int8, conv1d

        rng = jax.random.PRNGKey(2)
        c = 128
        w = jax.random.normal(rng, (5, c, c)) * 0.05
        xf = jax.random.normal(jax.random.PRNGKey(3), (2, 256, c))
        s_x = (jnp.max(jnp.abs(xf), axis=(0, 1)) + 1e-6) / 127.0
        x8 = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
        y8 = conv1d_int8(x8, s_x, w, None, jnp.float32)
        yf = conv1d(xf, w)
        rel = float(jnp.sqrt(jnp.mean((y8 - yf) ** 2) / jnp.mean(yf ** 2)))
        assert rel < 0.02, rel


class TestTbcTileVmem:
    """The (tile, b, c) block pads b to the sublane count and c to the
    lane count in VMEM; the tile choice must budget on PADDED elements or
    small-batch f32 launches exceed the 16 MiB scoped-vmem limit
    (measured: 17.96M requested at (65536, 1, 256) f32, B=1 Destructo)."""

    def test_padded_budget_at_b1_f32(self):
        from audio_algebra_tpu.ops.pallas.groupnorm import (
            _pick_tbc_tile, MAX_TILE_ELEMS)
        tile = _pick_tbc_tile(65536, 1, 256, 4)
        assert tile * 8 * 256 <= MAX_TILE_ELEMS       # padded b=1 -> 8 rows

    def test_padded_budget_at_b1_bf16(self):
        from audio_algebra_tpu.ops.pallas.groupnorm import (
            _pick_tbc_tile, MAX_TILE_ELEMS)
        tile = _pick_tbc_tile(65536, 1, 256, 2)
        assert tile * 16 * 256 <= MAX_TILE_ELEMS      # bf16 sublane = 16

    def test_full_batch_unchanged(self):
        # at B=16 bf16 (the headline config) padding is a no-op: the tile
        # the round-2 numbers were measured with must not shrink
        from audio_algebra_tpu.ops.pallas.groupnorm import (
            _pick_tbc_tile, MAX_TILE_ELEMS)
        tile = _pick_tbc_tile(65536, 16, 256, 2)
        assert tile * 16 * 256 == MAX_TILE_ELEMS

    def test_b1_f32_apply_runs(self):
        # end-to-end: the exact shape that OOMed compiles + matches numpy
        # (interpret mode on CPU; on TPU the budget fix keeps it <16 MiB)
        import jax
        from audio_algebra_tpu.ops.pallas.groupnorm import groupnorm1_gelu_btc
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, 4096, 256), jnp.float32)
        res = jax.random.normal(jax.random.PRNGKey(1), x.shape, jnp.float32)
        scale = jnp.ones((256,))
        bias = jnp.zeros((256,))
        y = groupnorm1_gelu_btc(x, scale, bias, residual=res)
        x32 = np.asarray(x, np.float64)
        mu = x32.mean(axis=(1, 2), keepdims=True)
        sd = x32.std(axis=(1, 2))
        xn = (x32 - mu) / np.sqrt(sd[:, None, None] ** 2 + 1e-6)
        from scipy.stats import norm  # exact GELU
        ref = np.asarray(res, np.float64) + xn * norm.cdf(xn)
        rel = np.abs(np.asarray(y, np.float64) - ref).max()
        assert rel < 2e-2, rel
