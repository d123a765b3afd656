"""Generate the engineered assignment fixtures for reference-parity tests.

Cross-implementation trajectory parity (tests/test_reference_parity.py,
tests/test_reference_e2e.py) requires every greedy round to be decided by a
score gap larger than float noise: candidates whose contingency patterns are
equivalent w.r.t. the current cache score EXACTLY equal mathematically, and
torch's CPU topk/argmax order between equal values is arbitrary
(``torch.topk`` of an all-equal vector returns e.g. [12,14,13,15]) while
``lax.top_k``/``argmax`` are index-stable — no implementation could
reproduce the reference's picks on tied rounds.

So the fixtures are *engineered*: starting from structured random
assignments, simulate the REFERENCE's own greedy (f64-lifted), find the
earliest round whose decision boundary is tied (margin < 1e-9), resample the
first-loser's row, and repeat until every round has a macroscopic margin.
The parity tests re-measure those margins at run time — the comparison is
self-validating, not baked in.

Run:  python -m tests.gen_parity_fixtures
Writes tests/data/*.npy (committed).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

DATA_DIR = Path(__file__).parent / "data"

# shared fixture geometry (production-like: D=10 clusterings -> P=45 pairs)
# POOL_SKIP: the first rounds of pool greedy score candidates against a
# nearly-empty cache where "no shared cells" is a single huge exactly-tied
# class (mathematically, not numerically) — no data can gap them. The parity
# test seeds both sides from the reference's own first POOL_SKIP winners and
# compares the rest; engineering only enforces gaps for rounds > POOL_SKIP.
POOL = dict(v=120, d=10, c=16, subset=30, nclasses=14, noise=0.6)
POOL_SKIP = 8
E2E = dict(v=200, d=10, c=32, subset=40, nclasses=14, noise=0.6, batch=20, k=4)
# chunked stage-6 fixture: 2 chunks of 1 shard x 100 clips, each chunk an
# INDEPENDENT batch_mi run (subset.size 40 -> ceil(40/2)=20 per chunk,
# chunk.py:45-46) with a FRESH shuffle stream (the repo reseeds its rng per
# partition; the test unifies the reference per-instance to match)
CHUNK = dict(v_per_chunk=100, chunks=2, d=10, c=32, per_chunk_subset=20,
             nclasses=14, noise=0.6, batch=20, k=4)


def make_assignments(v, d, c, seed=0, nclasses=5, noise=0.3):
    rng = np.random.RandomState(seed)
    classes = rng.randint(0, nclasses, size=v)
    maps = rng.randint(0, c, size=(d, nclasses))
    a = maps[np.arange(d)[None, :], classes[:, None]]
    flip = rng.rand(v, d) < noise
    a[flip] = rng.randint(0, c, size=int(flip.sum()))
    return a.astype(np.int64)


def _sel_modules():
    from tests import reference_oracle as ro

    return ro, ro.subset_selection_modules()


def simulate_pool(ro, sel, A, kind, subset, c):
    """Reference pool greedy (f64-lifted); returns (S, per-round winner
    margins) — margin[i] = score(rank1) - score(rank2) at round i."""
    import torch

    combos = sel["pairing"].get_cluster_pairing(
        [("m", f"l{i}") for i in range(A.shape[1])], "combination"
    )
    margins = []
    with ro.f64_measures(sel["measures"].mi):
        m = (
            sel["measures"].mi.EfficientNMI(A, ncentroids=c)
            if kind == "nmi"
            else sel["measures"].get_measure(kind)(A, ncentroids=c)
        )
        m.init(combos, list(range(1, A.shape[0])))
        orig = m.calc_score

        def calc_score(*a, **k):
            scores = m._calc_score(*a, **k).mean(-1)
            top2 = torch.topk(scores, 2)
            margins.append(
                (float(top2.values[0] - top2.values[1]),
                 int(m.candidate_ids[top2.indices[1]]))
            )
            return orig(*a, **k)

        m.calc_score = calc_score
        S, G, _, _ = m.run_greedy(subset, [0])
    return S, margins


def engineer_pool(ro, sel, kind, seed=0, max_iters=80, tol=1e-9):
    cfg = POOL
    A = make_assignments(cfg["v"], cfg["d"], cfg["c"], seed=seed,
                         nclasses=cfg["nclasses"], noise=cfg["noise"])
    fix_rng = np.random.RandomState(77_000 + seed)
    for it in range(max_iters):
        S, margins = simulate_pool(ro, sel, A, kind, cfg["subset"], cfg["c"])
        scored = margins[POOL_SKIP:]
        bad = [(i, rank2) for i, (mm, rank2) in enumerate(scored) if mm < tol]
        if not bad:
            return A, min(mm for mm, _ in scored), it
        _, rank2 = bad[0]
        A[rank2] = _fresh_row(A, fix_rng, cfg["c"], cfg["d"])
    raise RuntimeError(f"pool engineering did not converge for {kind}")


def _fresh_row(A, rng, c, d):
    """Random row distinct from every existing row (duplicate rows tie
    exactly at every round they both survive)."""
    while True:
        row = rng.randint(0, c, size=d)
        if not (A == row).all(axis=1).any():
            return row


def simulate_batch(ro, sel, A, shufseed, subset, c, batch_size, k):
    """Reference batch_mi (f64-lifted, unified shuffles); returns
    (S, [(boundary margin, rank-(k+1) id)] per round)."""
    import torch

    combos = sel["pairing"].get_cluster_pairing(
        [("m", f"l{i}") for i in range(A.shape[1])], "combination"
    )
    M = sel["measures"].get_measure("batch_mi")
    rounds = []
    orig = M.calc_ids

    def calc_ids(self, scores):
        s = scores.mean(dim=-1)
        srt, order = torch.sort(s, descending=True)
        batch = self.candidate_ids[: self.B].numpy().copy()
        if len(srt) > self.k:
            rounds.append(
                (float(srt[self.k - 1] - srt[self.k]), int(batch[order[self.k]]))
            )
        return orig(self, scores)

    M.calc_ids = calc_ids
    try:
        with ro.f64_measures(sel["measures"].mi), ro.unified_shuffles(M, shufseed), \
                contextlib.redirect_stdout(io.StringIO()):
            m = M(A, ncentroids=c, batch_size=batch_size, selection_size=k,
                  device="cpu", keep_unselected=True)
            m.init(combos, list(range(1, A.shape[0])))
            S, G, _, _ = m.run_greedy(subset, [0])
    finally:
        M.calc_ids = orig
    return S, rounds


def engineer_batch(ro, sel, seed=0, shufseed=0, max_iters=80, tol=1e-9):
    cfg = E2E
    A = make_assignments(cfg["v"], cfg["d"], cfg["c"], seed=seed,
                         nclasses=cfg["nclasses"], noise=cfg["noise"])
    fix_rng = np.random.RandomState(10_000 + seed * 100 + shufseed)
    for it in range(max_iters):
        S, rounds = simulate_batch(ro, sel, A, shufseed, cfg["subset"], cfg["c"],
                                   cfg["batch"], cfg["k"])
        bad = [(i, r5) for i, (mm, r5) in enumerate(rounds) if mm < tol]
        if not bad:
            return A, min(mm for mm, _ in rounds), it
        _, rank5 = bad[0]
        A[rank5] = _fresh_row(A, fix_rng, cfg["c"], cfg["d"])
    raise RuntimeError("batch engineering did not converge")


def engineer_chunked(ro, sel, seed=0, shufseed=0, max_iters=80, tol=1e-9):
    """Each chunk's 100-clip half engineered independently (chunks never
    interact); both halves use the same fresh-per-chunk shuffle seed."""
    cfg = CHUNK
    halves, min_margins = [], []
    for ci in range(cfg["chunks"]):
        A = make_assignments(cfg["v_per_chunk"], cfg["d"], cfg["c"],
                             seed=seed * 10 + ci, nclasses=cfg["nclasses"],
                             noise=cfg["noise"])
        fix_rng = np.random.RandomState(20_000 + seed * 100 + ci)
        for it in range(max_iters):
            S, rounds = simulate_batch(
                ro, sel, A, shufseed, cfg["per_chunk_subset"], cfg["c"],
                cfg["batch"], cfg["k"])
            bad = [(i, r5) for i, (mm, r5) in enumerate(rounds) if mm < tol]
            if not bad:
                min_margins.append(min(mm for mm, _ in rounds))
                break
            _, rank5 = bad[0]
            A[rank5] = _fresh_row(A, fix_rng, cfg["c"], cfg["d"])
        else:
            raise RuntimeError(f"chunk {ci} engineering did not converge")
        halves.append(A)
    return np.concatenate(halves, axis=0), min(min_margins), it


def main():
    sys.path.insert(0, str(Path(__file__).parent.parent))
    import jax

    jax.config.update("jax_platforms", "cpu")
    ro, sel = _sel_modules()
    DATA_DIR.mkdir(exist_ok=True)

    for kind in ("mi", "mem_mi", "ami", "nmi"):
        A, mm, iters = engineer_pool(ro, sel, kind)
        np.save(DATA_DIR / f"pool_parity_{kind}.npy", A)
        print(f"pool {kind}: engineered in {iters} iters, min margin {mm:.2e}")

    A, mm, iters = engineer_batch(ro, sel)
    np.save(DATA_DIR / "e2e_parity_assignments.npy", A)
    print(f"e2e batch_mi: engineered in {iters} iters, min margin {mm:.2e}")

    A, mm, iters = engineer_chunked(ro, sel)
    np.save(DATA_DIR / "chunked_parity_assignments.npy", A)
    print(f"chunked batch_mi: engineered, min margin {mm:.2e}")


if __name__ == "__main__":
    main()
