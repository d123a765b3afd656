"""Executable forward parity of the evaluation models vs the REFERENCE's own
torch code.

The reference's evaluation suite ships self-contained PySlowFast-derived
model code (``evaluation/code/models/*.py``) that runs on CPU torch in this
image given two tiny shims (fvcore Registry/weight-init/Timer and the
diffdist stub that ``utils/distributed.py`` imports).  These tests build the
reference ``Contrast`` model at the production widths (visual 3D R50 width
64, audio 2D R50 width 32), randomize every parameter AND running statistic,
convert the state dict with ``convert_contrast_state_dict``, and assert the
flax rebuild produces the same numbers the reference's own forward produces:

* visual backbone (stem stride (2,2,2) + (1,3,3) maxpool, bottleneck stages,
  exact-pool head == mean)           — eval AND train(batch-stats) modes
* audio backbone (separable (9,1)/(1,9) stem, separable s2/s3 blocks)
* projection FFNs + l2 normalize -> embeddings
* the symmetric InfoNCE (loss, acc) pair
* MultimodalHead linear-eval projection on concatenated features

Everything runs in float64 on both sides so cross-implementation noise
cannot mask a real architecture mismatch (a wrong stride/padding produces
O(1) deltas; f64 agreement is ~1e-12).

Reference: ``evaluation/code/models/{video_model_builder,audio_model_builder,
contrast,classify}.py``, ``stem_helper.py``, ``resnet_helper.py``,
``audio_stem_helper.py:119-171``, ``audio_resnet_helper.py:186-291``,
``utils.py:46-86`` (FFNLayer).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests import reference_oracle as ro

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

pytestmark = [
    pytest.mark.skipif(not ro.has_reference(), reason="reference not present"),
    # production-width torch-vs-flax forwards: heavy jit/oracle tier
    pytest.mark.slow,
]

B = 2
T, CROP = 8, 64          # visual clip (stem halves T; crop 64 -> s5 2x2)
FREQ, TIME = 32, 32      # audio log-mel (stages /16 -> head pool 2x2)


def make_cfg():
    return ro.NS.make({
        "VIS": {"ARCH": "resnet", "MODEL_NAME": "ResNet"},
        "AUD": {"ARCH": "resnet", "MODEL_NAME": "AudioResNet"},
        "RESNET": {
            "TRANS_FUNC": "bottleneck_transform", "NUM_GROUPS": 1,
            "WIDTH_PER_GROUP": 64, "STRIDE_1X1": False, "DEPTH": 50,
            "NUM_BLOCK_TEMP_KERNEL": [[3], [4], [6], [3]],
            "SPATIAL_STRIDES": [[1], [2], [2], [2]],
            "SPATIAL_DILATIONS": [[1], [1], [1], [1]],
            "INPLACE_RELU": True,
        },
        "AUDIO_RESNET": {
            "TRANS_FUNC": "bottleneck_transform", "NUM_GROUPS": 1,
            "WIDTH_PER_GROUP": 32, "STRIDE_1X1": False, "DEPTH": 50,
            "STRIDES": [2, 2, 2, 2], "DILATIONS": [1, 1, 1, 1],
            "INPLACE_RELU": True,
        },
        "MODEL": {"EPSILON": 1e-5, "MOMENTUM": 0.1, "FC_INIT_STD": 0.01,
                  "ZERO_INIT_FINAL_BN": True, "DROPOUT_RATE": 0.0},
        "DATA": {"INPUT_CHANNEL_NUM": [3], "NUM_FRAMES": T,
                 "CROP_SIZE": CROP, "AUDIO_FREQUENCY": FREQ,
                 "AUDIO_TIME": TIME},
        "CONTRAST": {"PROJECTION_SIZE": 128, "TEMPERATURE": 0.1,
                     "USE_GLOBAL_BATCH": True},
    })


def ref_models():
    ro.install_fvcore_shims()
    return ro.import_stage("evaluation", ["models"])["models"]


def randomize_(model: "torch.nn.Module", seed: int):
    """Give every parameter and BN running stat a nontrivial value so the
    conversion test is sharp (init_weights zeroes final-BN scales and leaves
    running stats at (0, 1), which would mask transposition errors)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.uniform_(-0.2, 0.2, generator=g)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.uniform_(-0.2, 0.2, generator=g)
            elif name.endswith("running_var"):
                b.uniform_(0.5, 1.5, generator=g)


def to_f64(tree):
    return jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64), tree)


@pytest.fixture(scope="module")
def ref_contrast():
    models = ref_models()
    cfg = make_cfg()
    model = models.Contrast(cfg)
    randomize_(model, seed=7)
    model.double().eval()
    # np.array COPIES — torch train-mode forwards mutate BN buffers in
    # place, and .numpy() would alias them.
    sd = {k: np.array(v.detach().cpu().numpy())
          for k, v in model.state_dict().items()}
    return models, cfg, model, sd


@pytest.fixture(scope="module")
def inputs():
    g = torch.Generator().manual_seed(11)
    vt = torch.rand((B, 3, T, CROP, CROP), generator=g, dtype=torch.float64)
    at = torch.rand((B, 1, FREQ, TIME), generator=g, dtype=torch.float64)
    v_ndhwc = np.transpose(vt.numpy(), (0, 2, 3, 4, 1))  # (B,T,H,W,3)
    a_nhwc = np.transpose(at.numpy(), (0, 2, 3, 1))      # (B,F,T,1)
    return vt, at, v_ndhwc, a_nhwc


class TestBackboneParity:
    def test_visual_backbone_eval(self, ref_contrast, inputs):
        from acav100m_tpu.evaluation import models as em

        _, _, model, sd = ref_contrast
        vt, _, v_ndhwc, _ = inputs
        with torch.no_grad():
            ref_out = model.visual_conv([vt.clone()]).numpy()  # (B, 2048)
        with jax.enable_x64(True):
            variables = to_f64(em.convert_contrast_state_dict(sd))
            ours = em.VisualResNet3D(train=False, dtype=jnp.float64).apply(
                {"params": variables["params"]["visual_conv"],
                 "batch_stats": variables["batch_stats"]["visual_conv"]},
                jnp.asarray(v_ndhwc),
            )
        np.testing.assert_allclose(np.asarray(ours), ref_out,
                                   rtol=1e-9, atol=1e-9)

    def test_audio_backbone_eval(self, ref_contrast, inputs):
        from acav100m_tpu.evaluation import models as em

        _, _, model, sd = ref_contrast
        _, at, _, a_nhwc = inputs
        with torch.no_grad():
            ref_out = model.audio_conv(at.clone()).numpy()  # (B, 1024)
        with jax.enable_x64(True):
            variables = to_f64(em.convert_contrast_state_dict(sd))
            ours = em.AudioResNet2D(train=False, dtype=jnp.float64).apply(
                {"params": variables["params"]["audio_conv"],
                 "batch_stats": variables["batch_stats"]["audio_conv"]},
                jnp.asarray(a_nhwc),
            )
        np.testing.assert_allclose(np.asarray(ours), ref_out,
                                   rtol=1e-9, atol=1e-9)

    def test_visual_backbone_train_batch_stats(self, ref_contrast, inputs):
        """Train-mode BN normalizes by the CURRENT batch's (biased-variance)
        statistics on both sides — forward outputs must match exactly even
        though the running stats differ (torch updates running_var with the
        UNBIASED variance; a documented train-state delta, not a forward
        one)."""
        from acav100m_tpu.evaluation import models as em

        _, _, model, sd = ref_contrast
        vt, _, v_ndhwc, _ = inputs
        # train-mode BN mutates running buffers IN PLACE even under no_grad;
        # restore them or later eval-mode tests compare a drifted reference.
        saved = {k: v.clone() for k, v in model.state_dict().items()}
        model.train()
        try:
            with torch.no_grad():
                ref_out = model.visual_conv([vt.clone()]).numpy()
        finally:
            model.eval()
            model.load_state_dict(saved)
        with jax.enable_x64(True):
            variables = to_f64(em.convert_contrast_state_dict(sd))
            ours, _ = em.VisualResNet3D(train=True, dtype=jnp.float64).apply(
                {"params": variables["params"]["visual_conv"],
                 "batch_stats": variables["batch_stats"]["visual_conv"]},
                jnp.asarray(v_ndhwc), mutable=["batch_stats"],
            )
        np.testing.assert_allclose(np.asarray(ours), ref_out,
                                   rtol=1e-9, atol=1e-9)


class TestContrastParity:
    def test_embeddings_and_infonce(self, ref_contrast, inputs):
        """Full Contrast forward: l2-normalized 128-d embeddings from both
        projection heads, then the symmetric InfoNCE (loss, acc) pair
        (contrast.py:126-201)."""
        from acav100m_tpu.evaluation import models as em

        _, _, model, sd = ref_contrast
        vt, at, v_ndhwc, a_nhwc = inputs
        with torch.no_grad():
            v_feat, a_feat = model.get_conv_output([vt.clone()], at.clone())
            ref_zv = torch.nn.functional.normalize(
                model.visual_mlp(v_feat), dim=-1).numpy()
            ref_za = torch.nn.functional.normalize(
                model.audio_mlp(a_feat), dim=-1).numpy()
            ref_loss, ref_acc = model([vt.clone()], at.clone())
        with jax.enable_x64(True):
            variables = to_f64(em.convert_contrast_state_dict(sd))
            zv, za = em.Contrast(train=False, dtype=jnp.float64).apply(
                variables, jnp.asarray(v_ndhwc), jnp.asarray(a_nhwc))
            loss, acc = em.contrast_loss(zv, za)
        np.testing.assert_allclose(np.asarray(zv), ref_zv, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(za), ref_za, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-9)
        assert float(acc) == pytest.approx(float(ref_acc))

    def test_train_mode_loss(self, ref_contrast, inputs):
        """The pretrain step's actual forward: train-mode BN everywhere."""
        from acav100m_tpu.evaluation import models as em

        _, _, model, sd = ref_contrast
        vt, at, v_ndhwc, a_nhwc = inputs
        saved = {k: v.clone() for k, v in model.state_dict().items()}
        model.train()
        try:
            with torch.no_grad():
                ref_loss, ref_acc = model([vt.clone()], at.clone())
        finally:
            model.eval()
            model.load_state_dict(saved)
        with jax.enable_x64(True):
            variables = to_f64(em.convert_contrast_state_dict(sd))
            (zv, za), _ = em.Contrast(train=True, dtype=jnp.float64).apply(
                variables, jnp.asarray(v_ndhwc), jnp.asarray(a_nhwc),
                mutable=["batch_stats"])
            loss, acc = em.contrast_loss(zv, za)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-9)
        assert float(acc) == pytest.approx(float(ref_acc))


class TestRunningStatsParity:
    def test_train_step_updates_running_stats_like_torch(self, inputs):
        """After ONE train-mode forward the running mean/var must equal
        torch's updated buffers: torch folds the UNBIASED batch variance
        into running_var (momentum 0.1); ``TorchBatchNorm`` replicates that
        exactly (flax's stock BatchNorm uses the biased variance — the
        round-2 delta this closes)."""
        from acav100m_tpu.evaluation import models as em

        models = ref_models()
        model = models.Contrast(make_cfg())
        randomize_(model, seed=7)
        model.double()
        sd0 = {k: np.array(v.detach().cpu().numpy())
               for k, v in model.state_dict().items()}
        vt, at, v_ndhwc, a_nhwc = inputs
        model.train()
        with torch.no_grad():
            model([vt.clone()], at.clone())
        model.eval()
        sd1 = {k: np.array(v.detach().cpu().numpy())
               for k, v in model.state_dict().items()}
        with jax.enable_x64(True):
            variables = to_f64(em.convert_contrast_state_dict(sd0))
            _, mutated = em.Contrast(train=True, dtype=jnp.float64).apply(
                variables, jnp.asarray(v_ndhwc), jnp.asarray(a_nhwc),
                mutable=["batch_stats"])
            expect = em.convert_contrast_state_dict(sd1)["batch_stats"]
            got = jax.tree.map(np.asarray, mutated["batch_stats"])
        flat_e = dict(jax.tree_util.tree_flatten_with_path(expect)[0])
        flat_g = dict(jax.tree_util.tree_flatten_with_path(got)[0])
        assert set(map(str, flat_e)) == set(map(str, flat_g))
        for path, e in flat_e.items():
            np.testing.assert_allclose(
                flat_g[path], e, rtol=1e-9, atol=1e-9,
                err_msg=str(path))


class TestClassifyHeadParity:
    def test_multimodal_head_logits(self, ref_contrast):
        """Linear-eval projection on concatenated (visual, audio) features
        (classify.py MultimodalHead.forward; train mode -> raw logits)."""
        from acav100m_tpu.evaluation import models as em

        models, _, _, _ = ref_contrast
        head = models.classify.MultimodalHead(
            dim_in=(16, 8), num_classes=5, dropout_rate=0.0)
        randomize_(head, seed=3)
        head.double().train()
        g = torch.Generator().manual_seed(5)
        x = torch.rand((B, 16), generator=g, dtype=torch.float64)
        y = torch.rand((B, 8), generator=g, dtype=torch.float64)
        with torch.no_grad():
            ref_logits = head(x, y).numpy()
        sd = {k: v.detach().cpu().numpy() for k, v in head.state_dict().items()}
        with jax.enable_x64(True):
            variables = to_f64(em.convert_classify_head_state_dict(sd, prefix=""))
            feats = jnp.concatenate(
                [jnp.asarray(x.numpy()), jnp.asarray(y.numpy())], axis=-1)
            ours = em.ClassifyHead(num_classes=5, dropout_rate=0.0,
                                   train=False, dtype=jnp.float64).apply(
                variables, feats)
        np.testing.assert_allclose(np.asarray(ours), ref_logits,
                                   rtol=1e-12, atol=1e-12)
