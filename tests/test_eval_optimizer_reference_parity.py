"""Trajectory parity of the evaluation optimizers vs the REFERENCE's own
``models/optimizer.py`` running real torch optimizers on CPU.

The reference builds torch SGD/Adam/AdamW with a BN/non-BN weight-decay
split (``'bn' in name`` -> BN.WEIGHT_DECAY=0, rest SOLVER.WEIGHT_DECAY;
optimizer.py:18-45) and drives the lr per step through ``set_lr`` with
``lr_policy.get_lr`` (contrast_net.py/classify_net.py).  These tests run
that exact code — ``construct_optimizer`` on a tiny torch module — next to
``evaluation.train.build_optimizer``'s optax chain on an identical
parameter pytree, feed both the SAME per-step gradient stream and the SAME
lr schedule, and assert the parameter trajectories stay equal to 1e-12 in
f64 over 25 steps.

What this pins (all in torch semantics, not optax defaults):

* SGD: nesterov + first-step ``buf = g`` quirk + COUPLED weight decay
  added to the gradient before the momentum update;
* Adam: eps=1e-6 placed on the bias-corrected denominator, coupled decay;
* AdamW: DECOUPLED ``p -= lr wd p`` decay + optional amsgrad running max
  of the UNcorrected second moment (SOLVER.USE_AMSGRAD default True);
* the BN/rest weight-decay group split.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests import reference_oracle as ro

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.skipif(
    not ro.has_reference(), reason="reference not present"
)

SHAPES = [
    ("fc1.weight", (4, 4)), ("fc1.bias", (4,)),
    ("bn.weight", (4,)), ("bn.bias", (4,)),
    ("fc2.weight", (2, 4)), ("fc2.bias", (2,)),
]
STEPS = 25
BASE_LR = 0.05
WARMUP = 5


class _TinyModule(torch.nn.Module):
    """Parameter names replicate the reference models' split: the BN
    module's params contain 'bn' in their dotted names."""

    def __init__(self, init):
        super().__init__()
        self.fc1 = torch.nn.Linear(4, 4)
        self.bn = torch.nn.BatchNorm1d(4)
        self.fc2 = torch.nn.Linear(4, 2)
        self.double()  # BEFORE copying inits — copy_ casts to param dtype
        with torch.no_grad():
            for name, p in self.named_parameters():
                p.copy_(torch.from_numpy(init[name]))


def make_init(seed=0):
    rng = np.random.RandomState(seed)
    return {name: rng.uniform(-0.5, 0.5, shape) for name, shape in SHAPES}


def make_grad_stream(seed=1):
    rng = np.random.RandomState(seed)
    return [{name: rng.uniform(-1.0, 1.0, shape) for name, shape in SHAPES}
            for _ in range(STEPS)]


def to_pytree(flat):
    tree = {}
    for name, arr in flat.items():
        mod, leaf = name.split(".")
        leaf = {"weight": "kernel", "bias": "bias"}[leaf]
        if mod == "bn":
            leaf = {"kernel": "scale", "bias": "bias"}[leaf]
        tree.setdefault(mod, {})[leaf] = jnp.asarray(arr, jnp.float64)
    return tree


def ref_modules():
    ro.install_fvcore_shims()
    return ro.import_stage(
        "evaluation", ["models.optimizer", "utils.lr_policy"])


def make_cfg(method, use_amsgrad=True, weight_decay=1e-2):
    return ro.NS.make({
        "BN": {"WEIGHT_DECAY": 0.0},
        "SOLVER": {
            "OPTIMIZING_METHOD": method, "MOMENTUM": 0.9, "DAMPENING": 0.0,
            "NESTEROV": True, "USE_AMSGRAD": use_amsgrad,
            "WEIGHT_DECAY": weight_decay, "BASE_LR": BASE_LR,
            "WARMUP_START_LR": 0.0,
        },
    })


def run_reference(method, use_amsgrad, weight_decay, policy="cosine"):
    mods = ref_modules()
    optim = mods["models.optimizer"]
    model = _TinyModule(make_init()).double()
    cfg = make_cfg(method, use_amsgrad, weight_decay)
    optimizer = optim.construct_optimizer(model, cfg)
    grads = make_grad_stream()
    for step in range(STEPS):
        lr = optim.get_lr(policy, BASE_LR, 0.0, step, STEPS, WARMUP)
        optim.set_lr(optimizer, lr)
        optimizer.zero_grad()
        for name, p in model.named_parameters():
            p.grad = torch.from_numpy(grads[step][name]).double()
        optimizer.step()
    return {name: p.detach().numpy() for name, p in model.named_parameters()}


def run_ours(method, use_amsgrad, weight_decay, policy="cosine"):
    from acav100m_tpu.evaluation.train import build_optimizer, lr_schedule

    with jax.enable_x64(True):
        params = to_pytree(make_init())
        schedule = lr_schedule(policy, BASE_LR, STEPS, warmup_steps=WARMUP)
        opt = build_optimizer(method, schedule, weight_decay=weight_decay,
                              amsgrad=use_amsgrad)
        state = opt.init(params)
        import optax
        for step in range(STEPS):
            gtree = to_pytree(make_grad_stream()[step])
            updates, state = opt.update(gtree, state, params)
            params = optax.apply_updates(params, updates)
        out = {}
        for mod, leaves in params.items():
            for leaf, arr in leaves.items():
                tleaf = "weight" if leaf in ("kernel", "scale") else "bias"
                out[f"{mod}.{tleaf}"] = np.asarray(arr)
        return out


@pytest.mark.parametrize("method,use_amsgrad,wd", [
    ("sgd", False, 1e-2),
    ("adam", False, 1e-2),
    ("adamw", False, 1e-2),
    ("adamw", True, 1e-2),   # SOLVER.USE_AMSGRAD default
    ("sgd", False, 0.0),
])
def test_trajectory_parity(method, use_amsgrad, wd):
    ref = run_reference(method, use_amsgrad, wd)
    ours = run_ours(method, use_amsgrad, wd)
    assert set(ref) == set(ours)
    for name in ref:
        np.testing.assert_allclose(
            ours[name], ref[name], rtol=1e-12, atol=1e-12,
            err_msg=f"{method} amsgrad={use_amsgrad} wd={wd} param {name}")


def test_bn_group_gets_zero_decay():
    """With a large weight decay and zero gradients, non-BN params must
    shrink while BN params stay put — on BOTH sides (the group split
    itself)."""
    ref = run_reference("adamw", False, 0.5)
    ours = run_ours("adamw", False, 0.5)
    init = make_init()
    # BN params see no decay: any drift comes from the gradient stream only.
    np.testing.assert_allclose(ours["bn.weight"], ref["bn.weight"],
                               rtol=1e-12, atol=1e-12)
    # Non-BN params were decayed relative to a wd=0 run.
    no_wd = run_ours("adamw", False, 0.0)
    assert not np.allclose(no_wd["fc1.weight"], ours["fc1.weight"])
    del init
