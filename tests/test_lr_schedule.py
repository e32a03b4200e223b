"""LR scheduler parity: the four HF get_scheduler variants the reference
trainer exposes (train_apadapter_v2.py:125-134, 809-815) as optax schedules."""

import numpy as np
import pytest

from ap_adapter_tpu.train.trainer import TrainConfig, make_lr_schedule

pytestmark = pytest.mark.quick

LR, W, TOTAL = 1e-4, 10, 100


def _tc(name):
    # accumulation=1 so make_optimizer skips MultiSteps (which would swallow
    # the first k-1 updates in test_optimizer_uses_schedule)
    return TrainConfig(learning_rate=LR, lr_scheduler=name,
                       lr_warmup_steps=W, max_train_steps=TOTAL,
                       gradient_accumulation_steps=1)


def test_constant():
    s = make_lr_schedule(_tc("constant"))
    assert float(s(0)) == LR and float(s(TOTAL)) == LR


def test_constant_with_warmup():
    s = make_lr_schedule(_tc("constant_with_warmup"))
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(W // 2)), LR * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(s(W)), LR, rtol=1e-6)
    np.testing.assert_allclose(float(s(TOTAL)), LR, rtol=1e-6)


def test_linear():
    s = make_lr_schedule(_tc("linear"))
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(W)), LR, rtol=1e-6)
    # halfway through decay: (TOTAL - W) / 2 steps past warmup
    np.testing.assert_allclose(float(s(W + (TOTAL - W) // 2)), LR * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(s(TOTAL)), 0.0, atol=1e-12)


def test_cosine():
    s = make_lr_schedule(_tc("cosine"))
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(W)), LR, rtol=1e-6)
    np.testing.assert_allclose(float(s(W + (TOTAL - W) // 2)), LR * 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(s(TOTAL)), 0.0, atol=1e-10)


def test_unknown_raises():
    with pytest.raises(ValueError):
        make_lr_schedule(_tc("nope"))


def test_optimizer_uses_schedule():
    """The AdamW chain actually applies the scheduled LR (warmup step 0 ->
    zero update)."""

    import jax.numpy as jnp
    import optax

    from ap_adapter_tpu.train.trainer import make_optimizer

    tx = make_optimizer(_tc("constant_with_warmup"))
    p = {"w": jnp.ones((3,))}
    st = tx.init(p)
    g = {"w": jnp.ones((3,))}
    upd, st = tx.update(g, st, p)
    np.testing.assert_allclose(np.asarray(upd["w"]), 0.0, atol=1e-12)
    upd, st = tx.update(g, st, p)  # step 1: warmup LR > 0 now
    assert float(jnp.abs(upd["w"]).max()) > 0.0
