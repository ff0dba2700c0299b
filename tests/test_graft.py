"""Driver-contract regression tests for __graft_entry__."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft


def test_entry_is_jittable():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    vals, ids, retrieved = out
    assert vals.shape == (16, 5)
    assert ids.shape == (16, 5)
    assert retrieved.shape == (16,)


def test_dryrun_multichip_runs_on_virtual_mesh():
    graft.dryrun_multichip(len(jax.devices()))
