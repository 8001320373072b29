"""The driver entry points must stay importable and runnable.

Round-1 verdict flagged ``entry()`` calling a nonexistent method; this pins
both driver hooks (`__graft_entry__.entry` and `dryrun_multichip`).
"""

import sys
import pathlib

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __graft_entry__ as g  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    recs = out[-1]
    assert recs[0].shape == args[0].shape


def test_dryrun_multichip_smoke():
    n = len(jax.devices())
    g.dryrun_multichip(n)
