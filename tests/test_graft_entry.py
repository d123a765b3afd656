"""The driver contract: entry() jit-compiles; dryrun_multichip(8) runs the
full sharded training/compute steps on the virtual CPU mesh."""

import sys

import jax
import pytest

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge

# the driver exercises both entry points directly every round; in the suite
# they are the heaviest single compiles → slow tier
pytestmark = pytest.mark.slow


class TestGraftEntry:
    def test_entry_returns_jittable(self):
        fn, example_args = ge.entry()  # params passed explicitly
        out = jax.jit(fn)(*example_args)
        assert len(out) == 10  # 5 vggish + 5 slowfast taps
        dims = sorted(int(t.shape[-1]) for t in out)
        assert dims == sorted([64, 128, 256, 512, 128, 88, 352, 704, 1408, 2304])

    def test_dryrun_multichip_8(self):
        assert len(jax.devices()) >= 8
        ge.dryrun_multichip(8)
