"""Optimizer/schedule factories: Adai correctness and LR-curve parity.

The reference factory offers SGD / Adai / AdaiW / any torch.optim name
(train/optimizer_scheduler.py:7-27) with CosineAnnealingWarmRestarts(10,2)
for the SGD/Adai family and MultiStepLR otherwise (:30-44). Its
``from train import adai_optim`` is a broken import (module absent), so the
Adai tests here verify our implementation against an independent numpy
transcription of the published algorithm (Xie et al., ICML 2022) rather
than reference code.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from litehandnet_tpu.train.optim import (
    adai,
    make_lr_schedule,
    make_optimizer,
    scale_by_adai,
)


def _numpy_adai_updates(grads_seq, shapes, beta0=0.1, beta2=0.99, eps=1e-3):
    """Independent numpy transcription: returns the raw (unscaled) update
    direction m_hat per step."""
    m = [np.zeros(s, np.float32) for s in shapes]
    v = [np.zeros(s, np.float32) for s in shapes]
    b1p = [np.ones(s, np.float32) for s in shapes]
    out = []
    total = sum(int(np.prod(s)) for s in shapes)
    for t, grads in enumerate(grads_seq, start=1):
        v = [beta2 * vi + (1 - beta2) * g * g for vi, g in zip(v, grads)]
        bias2 = 1 - beta2**t
        v_hat = [vi / bias2 for vi in v]
        v_mean = sum(vh.sum() for vh in v_hat) / total
        b1 = [np.clip(1 - beta0 * vh / v_mean, 0, 1 - eps) for vh in v_hat]
        m = [b * mi + (1 - b) * g for b, mi, g in zip(b1, m, grads)]
        b1p = [p * b for p, b in zip(b1p, b1)]
        out.append([mi / (1 - p) for mi, p in zip(m, b1p)])
    return out


def test_scale_by_adai_matches_numpy(rng):
    shapes = [(3, 4), (5,)]
    steps = 6
    grads_seq = [
        [rng.normal(size=s).astype(np.float32) for s in shapes]
        for _ in range(steps)
    ]
    want = _numpy_adai_updates(grads_seq, shapes)

    tx = scale_by_adai()
    params = {"a": jnp.zeros(shapes[0]), "b": jnp.zeros(shapes[1])}
    state = tx.init(params)
    step = jax.jit(tx.update)
    for t in range(steps):
        g = {"a": jnp.asarray(grads_seq[t][0]), "b": jnp.asarray(grads_seq[t][1])}
        upd, state = step(g, state)
        np.testing.assert_allclose(np.asarray(upd["a"]), want[t][0],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(upd["b"]), want[t][1],
                                   rtol=1e-5, atol=1e-6)


def test_adai_uniform_gradients_use_base_inertia():
    """With every |g| equal, v_hat/mean(v_hat) == 1 so beta1 == 1 - beta0
    everywhere, and the bias-corrected first step returns g exactly."""
    tx = scale_by_adai(beta0=0.1)
    params = {"w": jnp.zeros((4, 4))}
    state = tx.init(params)
    g = {"w": jnp.full((4, 4), 0.5)}
    upd, state = tx.update(g, state)
    np.testing.assert_allclose(np.asarray(upd["w"]), 0.5, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state.beta1_prod["w"]), 0.9, rtol=1e-6
    )


@pytest.mark.parametrize("name", ["Adai", "AdaiW"])
def test_make_optimizer_adai_descends(name):
    sched = make_lr_schedule(0.5, optimizer_type=name, steps_per_epoch=10,
                             total_epochs=30)
    tx = make_optimizer(name, sched)
    params = {"w": jnp.asarray([3.0, -2.0])}
    state = tx.init(params)
    loss = lambda p: jnp.sum(p["w"] ** 2)

    @jax.jit
    def step(params, state):
        grads = jax.grad(loss)(params)
        updates, state = tx.update(grads, state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), state

    l0 = float(loss(params))
    for _ in range(20):
        params, state = step(params, state)
    assert float(loss(params)) < 0.1 * l0


def test_cosine_restart_schedule_matches_torch():
    """Our per-step cosine-warm-restarts equals torch's
    CosineAnnealingWarmRestarts(10, 2) at every epoch boundary
    (the reference steps its scheduler per epoch)."""
    torch = pytest.importorskip("torch")
    base_lr, spe, epochs = 1e-2, 7, 210
    sched = make_lr_schedule(base_lr, optimizer_type="SGD",
                             steps_per_epoch=spe, total_epochs=epochs)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    tsched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(opt, 10, 2)
    for e in range(epochs):
        want = opt.param_groups[0]["lr"]
        got = float(sched(e * spe))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-8, err_msg=f"epoch {e}")
        opt.step()
        tsched.step()


def test_multistep_schedule_matches_torch():
    torch = pytest.importorskip("torch")
    base_lr, spe, epochs = 5e-4, 3, 210
    sched = make_lr_schedule(base_lr, optimizer_type="Adam",
                             step_epoch=[170, 200], steps_per_epoch=spe,
                             total_epochs=epochs)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=base_lr)
    tsched = torch.optim.lr_scheduler.MultiStepLR(opt, [170, 200], 0.1)
    for e in range(epochs):
        want = opt.param_groups[0]["lr"]
        got = float(sched(e * spe))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-8, err_msg=f"epoch {e}")
        opt.step()
        tsched.step()
