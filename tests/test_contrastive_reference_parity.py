"""Executable parity for the contrastive alt-measure probe.

Runs the reference's OWN ``subset_selection/code/measures/contrastive``
code on CPU torch (f64-lifted) as the oracle for the repo's
``pipeline/contrastive_selection`` probe:

* forward parity: identical injected weights + batch -> identical
  InfoNCE loss, top-1 accuracy, and ``infer`` alignment logits;
* full training-trajectory parity: the reference's ``get_optimizer``
  (AdamW amsgrad, eps 1e-6) + per-epoch ``update_lr`` + ``train_batch``
  (``loss.backward(); optimizer.step()`` — gradients NEVER zeroed,
  contrastive.py:91-99) driven step-for-step against
  ``train_probe(accumulate_grads=True)`` -> final parameters equal;
* the clean-AdamW variant (grads zeroed each step) against
  ``train_probe(accumulate_grads=False)`` — isolates the optimizer math
  from the accumulation quirk;
* quirk pins, executed not assumed: the global-batch gather in
  ``ContrastiveModule.forward`` is dead code (module.py:50-52 overwrite
  the gathered tensors), and ``run_contrastive.copy_measure`` copies
  only the linear WEIGHTS — biases stay freshly random, so the
  reference's inference model runs with untrained biases (the repo
  deliberately does not replicate that; documented in PARITY.md).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import reference_oracle as ro

pytestmark = pytest.mark.skipif(
    not ro.has_reference(), reason="/root/reference not present"
)


def _modules(extra=()):
    names = ["measures.contrastive.module", "measures.contrastive.contrastive"]
    names += list(extra)
    return ro.import_stage("subset_selection", tuple(names))


def make_torch_probe(video_dim, audio_dim, out_size, seed=0):
    import torch

    mods = _modules()
    module_mod = mods["measures.contrastive.module"]
    torch.manual_seed(seed)
    model = module_mod.ContrastiveModule(video_dim, audio_dim, out_size).double()
    return model, module_mod


def params_from_torch(model):
    """torch Linear weight is (out, in); the repo probe uses (in, out).

    ``np.array`` (copy) is load-bearing: ``detach().numpy()`` VIEWS the
    live torch parameters, and on the CPU backend ``jnp.asarray``
    zero-copy-aliases contiguous f64 numpy buffers — an un-copied
    snapshot silently mutates as the torch model keeps training.
    """
    sd = {k: np.array(v.detach().numpy()) for k, v in model.state_dict().items()}
    return {
        "wv": jnp.asarray(sd["visual_linear.weight"].T),
        "bv": jnp.asarray(sd["visual_linear.bias"]),
        "wa": jnp.asarray(sd["audio_linear.weight"].T),
        "ba": jnp.asarray(sd["audio_linear.bias"]),
    }


def make_batch(rng, b, video_dim, audio_dim):
    return (rng.randn(b, video_dim), rng.randn(b, audio_dim))


class TestForwardParity:
    def test_loss_and_acc_match(self):
        import torch

        from acav100m_tpu.pipeline import contrastive_selection as cs

        model, _ = make_torch_probe(24, 12, 8, seed=0)
        rng = np.random.RandomState(1)
        video, audio = make_batch(rng, 16, 24, 12)
        ref_loss, ref_acc = model(torch.from_numpy(video), torch.from_numpy(audio))
        with jax.enable_x64(True):
            params = params_from_torch(model)
            loss = cs.probe_loss(params, jnp.asarray(video), jnp.asarray(audio))
            acc = cs.probe_accuracy(params, jnp.asarray(video), jnp.asarray(audio))
        np.testing.assert_allclose(float(loss), ref_loss.item(), rtol=1e-12)
        np.testing.assert_allclose(float(acc), ref_acc.item(), rtol=1e-12)

    def test_infer_logits_match(self):
        import torch

        from acav100m_tpu.pipeline import contrastive_selection as cs

        model, _ = make_torch_probe(24, 12, 8, seed=2)
        rng = np.random.RandomState(3)
        video, audio = make_batch(rng, 10, 24, 12)
        ref = model.infer(torch.from_numpy(video), torch.from_numpy(audio))
        with jax.enable_x64(True):
            scores = cs.alignment_scores(params_from_torch(model), video, audio)
        np.testing.assert_allclose(scores, ref.detach().numpy(), rtol=1e-12)

    def test_global_batch_gather_is_dead_code(self, monkeypatch):
        """module.py:50-52 unconditionally overwrite the gathered tensors,
        so with world_size=2 and a gather that WOULD change the logits the
        forward still equals the local-batch result."""
        import torch

        model, module_mod = make_torch_probe(24, 12, 8, seed=4)
        model.use_global_batch = True
        rng = np.random.RandomState(5)
        video, audio = make_batch(rng, 6, 24, 12)
        vb, ab = torch.from_numpy(video), torch.from_numpy(audio)
        base_loss, base_acc = model(vb, ab)

        gathered = []

        def fake_gather(t):
            gathered.append(t)
            return torch.cat([t, t + 1000.0])  # would wreck logits if used

        monkeypatch.setattr(module_mod.du, "get_world_size", lambda: 2)
        monkeypatch.setattr(module_mod.du, "get_rank", lambda: 0)
        monkeypatch.setattr(module_mod.du, "diff_all_gather", fake_gather)
        assert model.has_to_gather
        loss, acc = model(vb, ab)
        assert len(gathered) == 2  # the gather RUNS ...
        np.testing.assert_allclose(loss.item(), base_loss.item(), rtol=0)
        np.testing.assert_allclose(acc.item(), base_acc.item(), rtol=0)


class TestTrainingTrajectoryParity:
    def _run_torch(self, model, mod_c, video, audio, num_epochs, batch_size,
                   base_lr, warmup, seed, zero_grad):
        """Drive the reference's own get_optimizer/update_lr/forward exactly
        as Contrastive.train + train_batch do (contrastive.py:126-151,91-99),
        with the batch order drawn from the same numpy permutation stream
        train_probe consumes."""
        import torch

        opt = mod_c.get_optimizer(model.parameters(), base_lr)
        rng = np.random.RandomState(seed)
        v = video.shape[0]
        losses = []
        for epoch in range(num_epochs):
            opt, lr = mod_c.update_lr(opt, epoch, num_epochs, base_lr, warmup)
            order = rng.permutation(v)
            for i in range(0, v, batch_size):
                idx = order[i : i + batch_size]
                loss, _ = model(torch.from_numpy(video[idx]),
                                torch.from_numpy(audio[idx]))
                if zero_grad:
                    opt.zero_grad()
                loss.backward()
                opt.step()
                losses.append(loss.item())
        return losses

    @pytest.mark.parametrize("accumulate", [True, False])
    def test_final_params_match(self, accumulate):
        from acav100m_tpu.pipeline import contrastive_selection as cs

        mods = _modules()
        mod_c = mods["measures.contrastive.contrastive"]
        num_epochs, batch_size, base_lr, warmup, seed = 4, 16, 1e-3, 2, 7
        rng = np.random.RandomState(11)
        v = 40  # 40/16 -> tail batch of 8 every epoch, like drop_last=False
        video, audio = make_batch(rng, v, 24, 12)

        model, _ = make_torch_probe(24, 12, 8, seed=6)
        with jax.enable_x64(True):
            init = params_from_torch(model)
            self._run_torch(model, mod_c, video, audio, num_epochs,
                            batch_size, base_lr, warmup, seed,
                            zero_grad=not accumulate)
            got = cs.train_probe(
                video, audio, num_epochs=num_epochs, batch_size=batch_size,
                base_lr=base_lr, warmup_steps=warmup, seed=seed,
                params=init, accumulate_grads=accumulate,
            )
            want = params_from_torch(model)
            for k in want:
                np.testing.assert_allclose(
                    np.asarray(got[k]), np.asarray(want[k]),
                    rtol=1e-9, atol=1e-11, err_msg=k,
                )

    def test_lr_func_linear_matches(self):
        from acav100m_tpu.pipeline import contrastive_selection as cs

        mod_c = _modules()["measures.contrastive.contrastive"]
        for total in (1, 3, 4, 10):
            for warmup in (0, 1, 3, 5):
                for step in range(total + 2):
                    assert cs.lr_func_linear(step, total, warmup) == \
                        mod_c.lr_func_linear(step, total, warmup)


class TestCopyMeasureQuirk:
    def test_copy_measure_drops_biases(self):
        """run_contrastive.copy_measure copies only .weight — the fresh
        model keeps ITS OWN random biases (run_contrastive.py:62-68), and
        ``_infer`` rebuilds the model through it, so reference inference
        runs with untrained biases. Pinned here; the repo keeps trained
        biases (deliberate divergence, PARITY.md)."""
        import torch

        mods = _modules(extra=("run_contrastive",))
        rc = mods["run_contrastive"]
        mod_c = mods["measures.contrastive.contrastive"]

        torch.manual_seed(0)
        trained = mod_c.Contrastive(num_epochs=1, device="cpu")
        with torch.no_grad():
            for p in trained.model.parameters():
                p.add_(1.0)  # stand-in for training having moved params
        torch.manual_seed(1)
        fresh = mod_c.Contrastive(num_epochs=1, device="cpu")
        args = ro.NS.make({"computation": {"device": "cpu"}})
        out = rc.copy_measure(args, fresh, trained)
        assert torch.equal(out.model.visual_linear.weight,
                           trained.model.visual_linear.weight)
        assert torch.equal(out.model.audio_linear.weight,
                           trained.model.audio_linear.weight)
        assert not torch.allclose(out.model.visual_linear.bias,
                                  trained.model.visual_linear.bias)
        assert not torch.allclose(out.model.audio_linear.bias,
                                  trained.model.audio_linear.bias)
