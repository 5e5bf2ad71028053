"""The driver contract: entry() compiles single-chip; dryrun_multichip runs
the full sharded step; sharded training matches unsharded numerics."""

import importlib.util
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", Path(__file__).parent.parent / "__graft_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_entry_compiles_and_runs():
    m = _load_entry()
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (2, 21, 256)
    assert out[-1].shape == (2,)


@pytest.mark.parametrize("n", [8, 4, 2, 1])
def test_dryrun_multichip(n):
    if len(jax.devices()) < n:
        pytest.skip("needs %d devices" % n)
    m = _load_entry()
    m.dryrun_multichip(n)


def test_sharded_train_matches_unsharded(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices (CPU mesh)")
    import optax

    from swiftwatcher_tpu.models.squeezenet import random_params
    from swiftwatcher_tpu.models import train as train_mod
    from swiftwatcher_tpu.parallel.mesh import make_mesh, init_sharded_training

    params = random_params(rng)
    feats = rng.standard_normal((8, 2, 2, 512)).astype(np.float32)
    labels = (np.arange(8) % 2).astype(np.int32)

    # unsharded
    trunk, head0 = train_mod.split_params({k: jnp.asarray(v) for k, v in params.items()})
    opt = optax.adam(1e-3)
    step = jax.jit(train_mod.make_train_step(opt))
    h1, _, loss1 = step(head0, opt.init(head0), jnp.asarray(feats), jnp.asarray(labels))

    # sharded dp x tp
    mesh = make_mesh(8, shape=(4, 2))
    _, head, opt_state, sstep, place = init_sharded_training(mesh, params)
    head, opt_state, feats_d, labels_d = place(head, opt_state, feats, labels)
    h2, _, loss2 = sstep(head, opt_state, feats_d, labels_d)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(h1["classifier.1.weight"]),
        np.asarray(h2["classifier.1.weight"]),
        rtol=1e-4,
        atol=1e-6,
    )
