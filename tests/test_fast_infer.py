"""Parity tests: BN-folded fast inference vs the plain Flax AZNet.

The fast path (``models/fast_infer.py``) is what actors/arenas run in
production; these tests pin its numerics against the trained model
(``models/resnet.py``) on randomized params & batch stats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_risk_tpu.config import Config
from alphazero_risk_tpu.models.fast_infer import (
    apply_folded, fold_params, make_fast_eval_fn, quantize_trunk)
from alphazero_risk_tpu.models.resnet import init_network

CFG = Config(blocks=2, filters=32, value_hidden=16)


def _randomized_variables(cfg, seed=0):
    """Init the net, then randomize params AND batch stats so BN folding is
    exercised with non-trivial scale/bias/mean/var."""
    net, variables = init_network(cfg, jax.random.PRNGKey(seed))
    leaves, treedef = jax.tree.flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), len(leaves))
    out = []
    for leaf, k in zip(leaves, keys):
        r = jax.random.normal(k, leaf.shape, jnp.float32)
        out.append(0.15 * r + leaf.astype(jnp.float32))
    variables = jax.tree.unflatten(treedef, out)

    # variances must stay positive; scales away from zero
    def fix(path, x):
        name = "/".join(str(p) for p in path)
        if name.endswith("var')]"):
            return jnp.abs(x) + 0.5
        return x

    variables = jax.tree.map_with_path(fix, variables)
    return net, variables


def _inputs(cfg, batch, seed=2):
    return jax.random.uniform(jax.random.PRNGKey(seed),
                              (batch, 7, 6, cfg.num_features))


@pytest.mark.parametrize("batch", [8, 48])
def test_bf16_parity(batch):
    net, variables = _randomized_variables(CFG)
    x = _inputs(CFG, batch)
    ref_logits, ref_value = net.apply(variables, x, train=False)

    folded = fold_params(variables, CFG)
    logits, value = apply_folded(folded, x)

    # reference forward is itself bf16 end-to-end; the folded path runs
    # heads in f32, so residual bf16 rounding noise of a few tenths on a
    # +-10 logit scale is expected
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=0.5, rtol=0.1)
    # tanh steepens bf16 rounding of the pre-activation near its center, so
    # individual values get a loose bound plus a tight batch-mean bound
    np.testing.assert_allclose(np.asarray(value), np.asarray(ref_value),
                               atol=0.25)
    assert float(jnp.abs(value - ref_value).mean()) < 0.05
    # action ranking must agree
    assert (jnp.argmax(logits, -1) == jnp.argmax(ref_logits, -1)).mean() \
        >= 0.9


@pytest.mark.parametrize("calibrated", [False, True])
def test_int8_agreement(calibrated):
    net, variables = _randomized_variables(CFG)
    x = _inputs(CFG, 32)
    ref_logits, ref_value = net.apply(variables, x, train=False)

    folded = quantize_trunk(fold_params(variables, CFG))
    if calibrated:
        from alphazero_risk_tpu.models.fast_infer import calibrate_trunk
        folded = calibrate_trunk(folded, _inputs(CFG, 64, seed=7))
    logits, value = apply_folded(folded, x, int8=True)

    # int8 trunk: looser numeric agreement, but play-relevant signals
    # (argmax action, value sign/magnitude) must hold.  Play strength is
    # certified at full scale by experiments/int8_cert.py (512-game arena
    # vs bf16, identical weights).
    agree = (jnp.argmax(logits, -1) == jnp.argmax(ref_logits, -1)).mean()
    assert agree >= 0.85, f"top-1 agreement {agree}"
    assert float(jnp.abs(value - ref_value).mean()) < 0.1
    corr = np.corrcoef(np.asarray(logits).ravel(),
                       np.asarray(ref_logits).ravel())[0, 1]
    assert corr > 0.99, f"logit correlation {corr}"


def test_eval_fn_masks_and_normalizes():
    from alphazero_risk_tpu.env import rules
    from alphazero_risk_tpu.env.state import new_game

    _, variables = _randomized_variables(CFG)
    folded = fold_params(variables, CFG)
    state = new_game(jax.random.PRNGKey(0), 8)
    legal = rules.legal_actions(state, CFG)
    eval_fn = make_fast_eval_fn(CFG)
    probs, value = eval_fn(folded, state, legal)
    probs = np.asarray(probs)
    assert probs.shape == (8, 43)
    assert np.all(probs[~np.asarray(legal)] == 0)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    assert np.all(np.abs(np.asarray(value)) <= 1.0)
