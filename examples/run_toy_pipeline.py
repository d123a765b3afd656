"""Runnable toy pipeline: synthetic shards -> features -> clusters ->
output.csv (the rebuild's analogue of the reference's examples/ flow).

    python examples/run_toy_pipeline.py [workdir]

Works on CPU or TPU; on a no-egress image the clips are synthetic npz.
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main(workdir=None):
    from synthetic import make_shards  # tests/synthetic.py

    from acav100m_tpu.pipeline import clustering as cl
    from acav100m_tpu.pipeline import feature_extraction as fe
    from acav100m_tpu.pipeline import subset_selection as ss

    root = Path(workdir or tempfile.mkdtemp(prefix="acav_toy_"))
    print(f"workdir: {root}")

    spec = make_shards(root / "clips", num_shards=2, clips_per_shard=4)
    print("stage 3 artifacts: 2 tar shards + metadata jsons")

    fcfg = fe.get_config(
        {
            "data.media.path": spec,
            "data.output.path": str(root / "features"),
            "data.batch_size": 4,
        }
    )
    saved = fe.run_extraction(fcfg)
    print(f"stage 4: extracted {len(saved)} feature shards")

    ccfg = cl.get_config(
        {
            "data.path": str(root / "features" / "shard-{000000..000001}.pkl"),
            "data.output.path": str(root / "clusters"),
            "data.batch_size": 4,
            "clustering.ncentroids": 4,
        }
    )
    saved = cl.run_clustering(ccfg)
    print(f"stage 5: wrote {len(saved)} assignment shards")

    scfg = ss.get_config(
        {
            "data.path": str(root / "clusters" / "shard-{000000..000001}.pkl"),
            "data.output.path": str(root / "output.csv"),
            "data.meta.path": str(root / "clips"),
            "subset.ratio": 0.5,
            "batch.batch_size": 4,
            "batch.selection_size": 2,
        }
    )
    out, count = ss.run(scfg)
    print(f"stage 6: selected {count} clips -> {out}")
    print((root / "output.csv").read_text())


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
