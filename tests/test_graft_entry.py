"""Driver entry-point contract tests.

entry() must return a jittable forward + example args (shape-checked via
abstract eval — no vitl compute on CPU); dryrun_multichip(8) must execute a
full sharded training step end to end. The subprocess self-provisioning path
(real devices < n) is exercised separately by requesting more devices than
the 8 virtual CPUs the conftest provides.
"""
import jax
import jax.numpy as jnp

import __graft_entry__ as graft


def test_entry_shapes():
    fn, (params, x) = graft.entry()
    assert x.shape == (1, 32, 518, 518, 3)
    assert x.dtype == jnp.bfloat16
    out = jax.eval_shape(fn, params, x)
    assert out.shape == (1, 32, 518, 518), out.shape


def test_dryrun_multichip_inprocess():
    # conftest provisions exactly 8 virtual CPU devices -> in-process path.
    assert jax.device_count() == 8
    graft.dryrun_multichip(8)


def test_dryrun_multichip_subprocess_self_provision(monkeypatch):
    # More devices than this process has -> must re-exec with a virtual
    # CPU mesh of the requested size (the driver-environment scenario).
    # tiny sections: the re-exec mechanics are under test here; the full
    # (vitl-dims) dryrun runs in-process above and in the driver. 10 (not
    # 16) virtual devices: every extra device thread oversubscribes the
    # single host core and pushes the collective rendezvous toward its
    # termination timeout.
    monkeypatch.setenv("_VDA_DRYRUN_SECTIONS", "tiny")
    graft.dryrun_multichip(10)
