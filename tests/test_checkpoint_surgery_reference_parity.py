"""Executable parity of linear-eval checkpoint surgery vs the REFERENCE's own
``utils/checkpoint.py`` (evaluation/code/utils/checkpoint.py:25-45).

The reference's ``load_pretrained_checkpoint`` transfers a pretrain
(``Contrast``) state dict into a downstream classify model by key filtering:
keep keys containing ``visual_conv`` or ``audio_conv`` AND not containing
``head``, intersected with the target's own keys, loaded with
``strict=False``.  The repo's surgery is :func:`evaluation.models.strip_heads`
(keep the ``visual_conv``/``audio_conv`` subtrees of the converted flax
variables).  These tests EXECUTE the reference function on CPU torch and pin
that both sides keep/drop exactly the same logical set:

* onto a ``MultimodalClassify`` target: every backbone tensor is transferred
  verbatim (the backbones' parameter-free pooling ``head`` makes the
  ``'head' not in key`` clause vacuous there — asserted, not assumed);
* onto a fresh ``Contrast`` target: the projection MLPs stay at their own
  init — the surgery never leaks head weights;
* the repo's ``strip_heads`` keeps exactly the converted images of the
  transferred torch keys and nothing else, value-for-value.

Reference: ``evaluation/code/utils/checkpoint.py:12-45``,
``models/classify.py:303-326``, ``models/contrast.py:13-89``.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests import reference_oracle as ro

torch = pytest.importorskip("torch")

from tests.test_eval_model_reference_parity import (  # noqa: E402
    make_cfg,
    randomize_,
    ref_models,
)

pytestmark = pytest.mark.skipif(
    not ro.has_reference(), reason="reference not present"
)


def ref_checkpoint():
    ro.install_fvcore_shims()
    return ro.import_stage("evaluation", ["utils.checkpoint"])[
        "utils.checkpoint"
    ]


def reference_kept_keys(source_sd, target_sd):
    """The key filter of load_pretrained_checkpoint:25-45, stated once."""
    return {
        k
        for k in source_sd
        if (("visual_conv" in k or "audio_conv" in k) and "head" not in k)
        and k in target_sd
    }


@pytest.fixture(scope="module")
def surgery():
    models = ref_models()
    ck = ref_checkpoint()
    cfg = make_cfg()
    pre = models.Contrast(cfg)
    randomize_(pre, seed=23)
    sd = pre.state_dict()
    return models, ck, cfg, pre, sd


class TestSurgeryParity:
    def test_transfer_onto_multimodal_classify(self, surgery):
        models, ck, cfg, pre, sd = surgery
        clf = models.classify.MultimodalClassify(cfg)
        randomize_(clf, seed=57)  # distinct from the source
        before = {k: v.clone() for k, v in clf.state_dict().items()}

        ck.load_pretrained_checkpoint(clf, sd)

        after = clf.state_dict()
        kept = reference_kept_keys(sd, before)
        assert kept, "filter selected nothing — fixture broken"
        for k in after:
            if k in kept:
                assert torch.equal(after[k], sd[k]), k
            else:
                assert torch.equal(after[k], before[k]), k

        # The backbones' pooling `head` submodule is parameter-free, so on
        # this target the 'head' exclusion is vacuous: every target tensor
        # is a backbone tensor and all of them transfer.
        assert kept == set(before)
        assert not any("head" in k for k in before)

    def test_heads_never_leak_onto_contrast_target(self, surgery):
        models, ck, cfg, pre, sd = surgery
        tgt = models.Contrast(cfg)
        randomize_(tgt, seed=91)
        before = {k: v.clone() for k, v in tgt.state_dict().items()}

        ck.load_pretrained_checkpoint(tgt, sd)

        after = tgt.state_dict()
        kept = reference_kept_keys(sd, before)
        mlp_keys = {k for k in before if "mlp" in k}
        assert mlp_keys and not (mlp_keys & kept)
        for k in mlp_keys:  # projection heads keep the TARGET's init
            assert torch.equal(after[k], before[k]), k
        for k in kept:  # backbones take the SOURCE's values
            assert torch.equal(after[k], sd[k]), k

    def test_strip_heads_keeps_exactly_the_transferred_set(self, surgery):
        """Repo-side equivalence: strip_heads(convert(sd)) == the converted
        images of exactly the torch keys the reference surgery transfers."""
        from acav100m_tpu.evaluation.models import (
            convert_contrast_state_dict,
            strip_heads,
        )

        models, ck, cfg, pre, sd = surgery
        np_sd = {k: np.array(v.detach().cpu().numpy())
                 for k, v in sd.items()}
        variables = convert_contrast_state_dict(np_sd)
        stripped = strip_heads(variables)

        kept = reference_kept_keys(sd, sd)
        # Every torch key the reference transfers has the visual_conv /
        # audio_conv prefix and vice versa — the prefix IS the criterion on
        # both sides (modulo torch-only num_batches_tracked bookkeeping).
        prefix_set = {
            k for k in sd
            if k.startswith(("visual_conv.", "audio_conv."))
        }
        assert kept == prefix_set

        for col in ("params", "batch_stats"):
            assert set(stripped[col]) == {"visual_conv", "audio_conv"}
            assert set(variables[col]) == {
                "visual_conv", "audio_conv", "visual_mlp", "audio_mlp"
            }
            for name in ("visual_conv", "audio_conv"):
                got = jax_flat(stripped[col][name])
                want = jax_flat(variables[col][name])
                assert got.keys() == want.keys()
                for path, arr in got.items():
                    assert np.array_equal(arr, want[path]), (col, name, path)


def jax_flat(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(jax_flat(v, prefix + (k,)))
    else:
        out[prefix] = np.asarray(tree)
    return out
