"""Reproduce the PARITY.md correspondence-retrieval grid table.

Runs the reference's own search-target grid
(``correspondence_retrieval/code/search_targets/algorithms/ours.json``)
through the pooled grid runner on the pre-materialized stand-in datasets
(10 classes x 50/class; real MNIST/CIFAR/FSDD downloads are egress-gated),
plus a matched ConstantMeasure null for every job. ~30 min on one CPU core
(ResNet features cached across jobs in $ACAV_RETRIEVAL_CACHE).

The grid's sgd_kmeans frontend is swapped for the faiss stand-in (sklearn):
at stand-in scale the SGD frontend collapses to one cluster - verified
IDENTICALLY on the reference's own torch implementation
(tests/test_reference_parity.py::test_retrieval_sgd_collapse_parity).
"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["ACAV_RETRIEVAL_CACHE"] = "/tmp/retr_cache"
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from collections import defaultdict
from acav100m_tpu.retrieval.runner import load_option_grid, grid_search

jobs = load_option_grid('/root/reference/correspondence_retrieval/code/search_targets/algorithms/ours.json')
# faiss-kmeans stand-in frontend: the reference's sgd frontend collapses to
# one cluster at stand-in scale (verified identically on the reference's own
# torch code); see PARITY.md
jobs = [{**j, "clustering_method": "sklearn"} for j in jobs]
nulls = [{**j, "optimizer": "efficient_greedy", "measure": "constant"} for j in jobs]
results = grid_search(job_kwargs=jobs, num_workers=1)
base = grid_search(job_kwargs=nulls, num_workers=1)

def agg(rows):
    by = defaultdict(list)
    for r in rows:
        by[r["data_name"]].append(r)
    return {k: {m: [round(float(np.mean([r[m] for r in v])),3), round(float(np.std([r[m] for r in v])),3)]
                for m in ("precision", "recall", "f1")} for k, v in by.items()}

table = {"ours(batch_mi)": agg(results), "constant": agg(base)}
print(json.dumps(table))
json.dump(table, open("reference_grid_table.json", "w"), indent=1)
