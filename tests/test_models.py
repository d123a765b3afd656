import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acav100m_tpu.models import get_model, model_names
from acav100m_tpu.models.vggish import LayerVggish, convert_torch_state_dict
from acav100m_tpu.models.slowfast import (
    LayerSlowFast,
    pack_pathways,
    normalize_frames,
)


class TestDtypeIndependentInit:
    def test_init_tree_is_bit_identical_across_compute_dtypes(self):
        """build_models inits bf16/int8 models through a float32 twin
        (pipeline/feature_extraction.py): flax keeps params in param_dtype
        (float32) regardless of compute dtype, so the twin's tree must be
        BIT-identical — structure, dtypes, and values. Pin that contract
        on a representative block and on the full VGGish (small enough to
        init eagerly both ways)."""
        from acav100m_tpu.models.slowfast import Bottleneck

        x = jnp.zeros((1, 4, 16, 16, 8))
        p32 = Bottleneck(dim_out=16, dim_inner=4, temp_kernel=3,
                         dtype=jnp.float32).init(jax.random.PRNGKey(0), x)
        pbf = Bottleneck(dim_out=16, dim_inner=4, temp_kernel=3,
                         dtype=jnp.bfloat16).init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(p32)
                == jax.tree_util.tree_structure(pbf))
        for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(p32),
                                  jax.tree_util.tree_leaves_with_path(pbf)):
            assert a.dtype == b.dtype and a.shape == b.shape, k
            assert (np.asarray(a) == np.asarray(b)).all(), k

        v32 = LayerVggish(dtype=jnp.float32).init(jax.random.PRNGKey(1))
        vbf = LayerVggish(dtype=jnp.bfloat16).init(jax.random.PRNGKey(1))
        for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(v32),
                                  jax.tree_util.tree_leaves_with_path(vbf)):
            assert a.dtype == b.dtype, k
            assert (np.asarray(a) == np.asarray(b)).all(), k

    def test_build_models_bf16_uses_fp32_twin_tree(self):
        """The bf16 build's param tree equals the fp32 build's bit-for-bit
        (same PRNG key), i.e. the twin path changes nothing observable."""
        from acav100m_tpu.pipeline.feature_extraction import (
            build_models, get_config)

        key = jax.random.PRNGKey(7)
        cfg32 = get_config({"models": ["layer_vggish"],
                            "model_types.visual": [],
                            "model_types.audio": ["layer_vggish"]})
        cfgbf = get_config({"models": ["layer_vggish"],
                            "model_types.visual": [],
                            "model_types.audio": ["layer_vggish"],
                            "computation.dtype": "bfloat16"})
        _, p32 = build_models(cfg32, key=key)
        mbf, pbf = build_models(cfgbf, key=key)
        assert mbf["layer_vggish"].backbone.dtype == jnp.bfloat16
        for (k, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(p32),
                                  jax.tree_util.tree_leaves_with_path(pbf)):
            assert a.dtype == b.dtype, k
            assert (np.asarray(a) == np.asarray(b)).all(), k


class TestRegistry:
    def test_names(self):
        names = model_names()
        assert "layer_vggish" in names
        assert "layer_slowfast" in names
        assert "vggish" in names and "slowfast" in names

    def test_tags(self):
        assert get_model("layer_vggish").model_tag == {
            "name": "VGGish",
            "dataset": "YouTube-8M",
        }
        assert get_model("layer_slowfast").model_tag == {
            "name": "SLOWFAST_8x8_R50",
            "dataset": "kinetics-400",
        }


class TestVggish:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = LayerVggish()
        params = model.init(jax.random.PRNGKey(0))
        return model, params

    def test_layer_dims(self, model_and_params):
        model, params = model_and_params
        audio = jnp.asarray(np.random.RandomState(0).randn(2, 160000), jnp.float32)
        taps = jax.jit(model.apply)(params, audio)
        assert [t.shape for t in taps] == [
            (2, 64), (2, 128), (2, 256), (2, 512), (2, 128)
        ]
        assert all(np.isfinite(np.asarray(t)).all() for t in taps)
        # reference check: dims [64,128,256,512,128] (vggish.py:81)
        assert LayerVggish.output_dims == [64, 128, 256, 512, 128]

    def test_masked_mean_equals_truncated(self, model_and_params):
        """A zero-padded 2.88 s clip with a valid mask must equal the
        3-example mean computed directly."""
        model, params = model_and_params
        rng = np.random.RandomState(1)
        short = rng.randn(int(16000 * 2.88)).astype(np.float32)
        padded = np.zeros(160000, np.float32)
        padded[: len(short)] = short
        taps_masked = model.apply(
            params, jnp.asarray(padded[None]),
            valid_samples=jnp.asarray([len(short)]),
        )
        # direct: only first 3 examples
        from acav100m_tpu.ops import melspec

        ex = melspec.vggish_examples(jnp.asarray(padded[None]))  # (1,10,96,64)
        flat = ex.reshape(10, 96, 64, 1)
        blocks = model.backbone.apply(params, flat)
        for tm, tap in zip(taps_masked, blocks):
            want = np.asarray(tap[:3]).mean(axis=0)
            np.testing.assert_allclose(np.asarray(tm[0]), want, rtol=1e-4, atol=1e-5)

    def test_torch_conversion_shapes(self, model_and_params):
        model, params = model_and_params
        # synthesize a torch-like state dict with the right shapes
        rng = np.random.RandomState(0)
        sd = {}
        chans = [(1, 64), (64, 128), (128, 256), (256, 256), (256, 512), (512, 512)]
        keys = ["features.0", "features.3", "features.6", "features.8",
                "features.11", "features.13"]
        for (i, o), k in zip(chans, keys):
            sd[f"{k}.weight"] = rng.randn(o, i, 3, 3).astype(np.float32)
            sd[f"{k}.bias"] = rng.randn(o).astype(np.float32)
        for k, (i, o) in zip(
            ["embeddings.0", "embeddings.2", "embeddings.4"],
            [(12288, 4096), (4096, 4096), (4096, 128)],
        ):
            sd[f"{k}.weight"] = rng.randn(o, i).astype(np.float32)
            sd[f"{k}.bias"] = rng.randn(o).astype(np.float32)
        converted = convert_torch_state_dict(sd)
        # tree structure must match the flax init exactly
        want = jax.tree_util.tree_structure(params)
        got = jax.tree_util.tree_structure(converted)
        assert want == got
        for a, b in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(converted),
        ):
            assert a.shape == np.asarray(b).shape


class TestSlowFast:
    @pytest.fixture(scope="class")
    def model_and_params(self):
        model = LayerSlowFast()
        # small spatial size for test speed; dims don't depend on H,W
        params = model.init(jax.random.PRNGKey(0), num_frames=32, size=64)
        return model, params

    def test_layer_dims(self, model_and_params):
        model, params = model_and_params
        frames = jnp.asarray(
            np.random.RandomState(0).randint(0, 255, (1, 32, 64, 64, 3)),
            jnp.uint8,
        )
        taps = jax.jit(model.apply)(params, frames)
        assert [int(t.shape[-1]) for t in taps] == [88, 352, 704, 1408, 2304]
        assert all(np.isfinite(np.asarray(t)).all() for t in taps)
        # reference check: dims (slowfast.py:103)
        assert LayerSlowFast.output_dims == [88, 352, 704, 1408, 2304]

    def test_pack_pathways(self):
        frames = jnp.arange(32)[None, :, None, None, None] * jnp.ones((1, 32, 2, 2, 3))
        slow, fast = pack_pathways(frames)
        assert slow.shape == (1, 8, 2, 2, 3)
        assert fast.shape == (1, 32, 2, 2, 3)
        np.testing.assert_array_equal(
            np.asarray(slow[0, :, 0, 0, 0]), np.arange(0, 32, 4)
        )

    def test_normalize(self):
        x = jnp.full((1, 1, 1, 1, 3), 255, jnp.uint8)
        got = np.asarray(normalize_frames(x))
        np.testing.assert_allclose(got, (1.0 - 0.45) / 0.225, rtol=1e-6)

    def test_conversion_tree_matches(self, model_and_params):
        from acav100m_tpu.models.slowfast import (
            convert_pyslowfast_state_dict,
            STAGE_BLOCKS,
            BETA_INV,
        )

        model, variables = model_and_params
        # build a synthetic torch state dict with correct shapes
        rng = np.random.RandomState(0)
        sd = {}

        def add_bn(prefix, c):
            sd[f"{prefix}.weight"] = rng.randn(c).astype(np.float32)
            sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
            sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32)
            sd[f"{prefix}.running_var"] = np.abs(rng.randn(c)).astype(np.float32)

        # stems
        sd["s1.pathway0_stem.conv.weight"] = rng.randn(64, 3, 1, 7, 7).astype(np.float32)
        add_bn("s1.pathway0_stem.bn", 64)
        sd["s1.pathway1_stem.conv.weight"] = rng.randn(8, 3, 5, 7, 7).astype(np.float32)
        add_bn("s1.pathway1_stem.bn", 8)
        # fuses
        fuse_fast = [8, 32, 64, 128]
        for i, fc in enumerate(fuse_fast):
            sd[f"s{i + 1}_fuse.conv_f2s.weight"] = rng.randn(
                fc * 2, fc, 7, 1, 1
            ).astype(np.float32)
            add_bn(f"s{i + 1}_fuse.bn", fc * 2)
        # stages
        slow_in = [80, 320, 640, 1280]
        slow_out = [256, 512, 1024, 2048]
        slow_inner = [64, 128, 256, 512]
        slow_kt = [1, 1, 3, 3]
        for si in range(4):
            for pw in (0, 1):
                div = 1 if pw == 0 else BETA_INV
                cin = slow_in[si] if pw == 0 else slow_out[si - 1] // BETA_INV if si else 8
                cout, cinn = slow_out[si] // div, slow_inner[si] // div
                kt = slow_kt[si] if pw == 0 else 3
                for bi in range(STAGE_BLOCKS[si]):
                    pre = f"s{si + 2}.pathway{pw}_res{bi}"
                    bin_ = cin if bi == 0 else cout
                    sd[f"{pre}.branch2.a.weight"] = rng.randn(
                        cinn, bin_, kt, 1, 1
                    ).astype(np.float32)
                    add_bn(f"{pre}.branch2.a_bn", cinn)
                    sd[f"{pre}.branch2.b.weight"] = rng.randn(
                        cinn, cinn, 1, 3, 3
                    ).astype(np.float32)
                    add_bn(f"{pre}.branch2.b_bn", cinn)
                    sd[f"{pre}.branch2.c.weight"] = rng.randn(
                        cout, cinn, 1, 1, 1
                    ).astype(np.float32)
                    add_bn(f"{pre}.branch2.c_bn", cout)
                    if bi == 0:
                        sd[f"{pre}.branch1.weight"] = rng.randn(
                            cout, bin_, 1, 1, 1
                        ).astype(np.float32)
                        add_bn(f"{pre}.branch1_bn", cout)
        converted = convert_pyslowfast_state_dict(sd)
        want = jax.tree_util.tree_structure(variables)
        got = jax.tree_util.tree_structure(converted)
        assert want == got, "converted tree != flax init tree"
        for (kp, a), b in zip(
            jax.tree_util.tree_leaves_with_path(variables),
            jax.tree_util.tree_leaves(converted),
        ):
            assert a.shape == np.asarray(b).shape, f"shape mismatch at {kp}"


@pytest.mark.slow
class TestSpaceToDepthStem:
    def test_s2d_stem_matches_plain(self):
        from acav100m_tpu.models.slowfast import Stem

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 4, 32, 32, 3).astype(np.float32))
        plain = Stem(8, 5, s2d=False)
        s2d = Stem(8, 5, s2d=True)
        variables = plain.init(jax.random.PRNGKey(0), x)
        o1 = plain.apply(variables, x)
        o2 = s2d.apply(variables, x)  # same params, same layout
        np.testing.assert_allclose(
            np.asarray(o1), np.asarray(o2), rtol=1e-4, atol=1e-5
        )

    def test_backbone_s2d_matches_plain(self):
        from acav100m_tpu.models.slowfast import SlowFastBackbone

        rng = np.random.RandomState(1)
        slow = jnp.asarray(rng.randn(1, 2, 32, 32, 3).astype(np.float32))
        fast = jnp.asarray(rng.randn(1, 8, 32, 32, 3).astype(np.float32))
        plain = SlowFastBackbone(s2d=False)
        variables = plain.init(jax.random.PRNGKey(0), slow, fast)
        t1 = plain.apply(variables, slow, fast)
        for bb in (SlowFastBackbone(s2d=True),
                   SlowFastBackbone(fast_block=(8, 8, 4, 4, 2)),
                   SlowFastBackbone(fast_block=(4, 4, 4, 4, 4)),
                   SlowFastBackbone(fast_block=(8, 4, 1, 2, 1))):
            t2 = bb.apply(variables, slow, fast)
            for a, b in zip(t1, t2):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-3, atol=1e-4)

    def test_fold_norm_matches_explicit_normalize(self):
        """Folding (x/255-mean)/std into the stem kernels + bias is the
        same computation to fp rounding, on raw uint8 frames."""
        from acav100m_tpu.models.slowfast import LayerSlowFast

        rng = np.random.RandomState(7)
        frames = jnp.asarray(rng.randint(0, 255, (1, 32, 32, 32, 3)),
                             jnp.uint8)
        ref = LayerSlowFast(fold_norm=False)
        v = ref.init(jax.random.PRNGKey(0), num_frames=32, size=32)
        t1 = ref.apply(v, frames)
        for model in (LayerSlowFast(fold_norm=True),
                      LayerSlowFast(fold_norm=True,
                                    fast_block=(8, 8, 4, 4, 2))):
            t2 = model.apply(v, frames)
            for a, b in zip(t1, t2):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-3, atol=2e-4)

    def test_pallas_stage_matches_canonical(self):
        """The fused Pallas bottleneck stage (interpret mode on CPU) is the
        canonical s2/s3 slow computation, same parameter tree."""
        from acav100m_tpu.models.slowfast import SlowFastBackbone

        rng = np.random.RandomState(2)
        slow = jnp.asarray(rng.randn(1, 2, 16, 16, 3).astype(np.float32))
        fast = jnp.asarray(rng.randn(1, 8, 16, 16, 3).astype(np.float32))
        plain = SlowFastBackbone()
        v = plain.init(jax.random.PRNGKey(0), slow, fast)
        pl_bb = SlowFastBackbone(pallas_stages=True)
        v2 = pl_bb.init(jax.random.PRNGKey(0), slow, fast)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(v2))
        t1 = plain.apply(v, slow, fast)
        t2 = pl_bb.apply(v, slow, fast)
        for a, b in zip(t1, t2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)

    def test_blocked_backbone_params_match_canonical(self):
        """The blocked modules declare the identical parameter tree, so
        checkpoints and converters are unaffected by the layout."""
        from acav100m_tpu.models.slowfast import SlowFastBackbone

        slow = jnp.zeros((1, 2, 16, 16, 3))
        fast = jnp.zeros((1, 8, 16, 16, 3))
        v_plain = SlowFastBackbone(s2d=False).init(
            jax.random.PRNGKey(0), slow, fast)
        v_blk = SlowFastBackbone(fast_block=(8, 8, 4, 4, 2)).init(
            jax.random.PRNGKey(0), slow, fast)
        p1 = jax.tree_util.tree_structure(v_plain)
        p2 = jax.tree_util.tree_structure(v_blk)
        assert p1 == p2
        for a, b in zip(jax.tree_util.tree_leaves(v_plain),
                        jax.tree_util.tree_leaves(v_blk)):
            assert a.shape == b.shape

    @pytest.mark.parametrize("kt,T,bt", [(5, 32, 16), (5, 8, 4), (1, 8, 4),
                                         (5, 8, 8)])
    def test_tblock_stem_matches_plain(self, kt, T, bt):
        """Temporal output-block stems (bt output frames stacked as
        channels) are the same convolution, same params, to fp32 rounding."""
        from acav100m_tpu.models.slowfast import Stem

        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, T, 16, 16, 3).astype(np.float32))
        plain = Stem(8, kt, s2d=False, t_block=0)
        tb = Stem(8, kt, t_block=bt)
        v = plain.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(
            np.asarray(plain.apply(v, x)), np.asarray(tb.apply(v, x)),
            rtol=1e-4, atol=1e-5,
        )

    def test_tblock_falls_back_on_unblockable_t(self):
        from acav100m_tpu.models.slowfast import Stem

        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(1, 6, 32, 32, 3).astype(np.float32))  # 6 % 4 != 0
        plain = Stem(8, 5, s2d=False, t_block=0)
        tb = Stem(8, 5, t_block=4)
        v = plain.init(jax.random.PRNGKey(0), x)
        np.testing.assert_allclose(
            np.asarray(plain.apply(v, x)), np.asarray(tb.apply(v, x)),
            rtol=1e-4, atol=1e-5,
        )

    def test_odd_size_falls_back(self):
        from acav100m_tpu.models.slowfast import Stem

        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 2, 17, 17, 3).astype(np.float32))
        s2d = Stem(8, 1, s2d=True)
        v = s2d.init(jax.random.PRNGKey(0), x)
        out = s2d.apply(v, x)  # falls back to the plain conv path
        assert out.shape[-1] == 8
