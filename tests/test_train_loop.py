"""Durable training loop: periodic checkpoints, bit-exact preemption resume.

The reference has no training and no recovery story (SURVEY §5); this is the
framework's elasticity leg: kill a run at any step, restart the same command,
land on identical parameters.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusionrenderer_tpu.config import DiTConfig
from diffusionrenderer_tpu.models.dit import init_dit_params
from diffusionrenderer_tpu.training import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from diffusionrenderer_tpu.training.loop import train_loop

CFG = DiTConfig(
    model_channels=64,
    num_blocks=2,
    num_heads=4,
    adaln_lora_dim=8,
    crossattn_emb_channels=16,
    additional_concat_ch=16,
)


def _make_state():
    params = init_dit_params(jax.random.key(0), CFG, dtype=jnp.float32)
    return init_train_state(params, make_optimizer(1e-3))


def _batch_fn(step: int):
    # Pure function of the step number — resume must re-derive the batch.
    k = jax.random.key(1000 + step)
    b, t, h, w = 2, 2, 8, 8
    return {
        "latents": jax.random.normal(k, (b, t, h, w, 16), jnp.float32),
        "latent_condition": jax.random.normal(
            jax.random.fold_in(k, 1), (b, t, h, w, 16), jnp.float32
        ),
        "context_index": jnp.zeros((b,), jnp.int32),
    }


@pytest.fixture(scope="module")
def train_step():
    opt = make_optimizer(1e-3)
    return make_train_step(CFG, opt, donate=True)


def _leaves(state):
    return jax.tree_util.tree_leaves(state.params)


def test_resume_is_bit_exact(tmp_path, train_step):
    # Uninterrupted 6-step run.
    s_full, losses_full = train_loop(
        _make_state, train_step, _batch_fn, num_steps=6, seed=7,
        ckpt_dir=str(tmp_path / "full"), save_every=2, log_every=0,
    )
    # Preempted run: killed after step 3 (checkpoints exist at 2 and 3).
    s_head, losses_head = train_loop(
        _make_state, train_step, _batch_fn, num_steps=3, seed=7,
        ckpt_dir=str(tmp_path / "pre"), save_every=2, log_every=0,
    )
    # Restart the same command: resumes from step 3, runs only 3..6.
    s_resumed, losses_tail = train_loop(
        _make_state, train_step, _batch_fn, num_steps=6, seed=7,
        ckpt_dir=str(tmp_path / "pre"), save_every=2, log_every=0,
    )
    assert len(losses_head) == 3 and len(losses_tail) == 3
    assert losses_head + losses_tail == losses_full
    assert int(s_resumed.step) == int(s_full.step) == 6
    for a, b in zip(_leaves(s_resumed), _leaves(s_full)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_skips_completed_work(tmp_path, train_step):
    # A finished run saved its final step; re-running the command is a no-op.
    train_loop(
        _make_state, train_step, _batch_fn, num_steps=4, seed=0,
        ckpt_dir=str(tmp_path), save_every=100, log_every=0,
    )  # save_every > num_steps: only the final-step save exists
    state, losses = train_loop(
        _make_state, train_step, _batch_fn, num_steps=4, seed=0,
        ckpt_dir=str(tmp_path), save_every=100, log_every=0,
    )
    assert losses == []
    assert int(state.step) == 4


def test_grad_accum_matches_manual_microbatching():
    """grad_accum=N must equal: per-microbatch grads with fold_in(key, i)
    keys, averaged, then ONE optimizer update — i.e. effective batch B at
    the activation memory of B/N."""
    import optax

    from diffusionrenderer_tpu.training.train import edm_loss

    # SGD, not adamw: adam's update is lr*g/(sqrt(g^2)+eps), which amplifies
    # fp32 rounding differences between the scan-traced and directly-traced
    # gradient without bound as g -> 0.  SGD is linear in the gradient, so
    # the equivalence check is numerically meaningful.
    opt = optax.sgd(0.1)
    step_accum = jax.jit(make_train_step(CFG, opt, donate=False, grad_accum=2))
    state = init_train_state(
        init_dit_params(jax.random.key(0), CFG, dtype=jnp.float32), opt)
    batch = _batch_fn(0)  # B=2 -> two microbatches of 1
    key = jax.random.key(11)

    got, loss_got = step_accum(state, batch, key)

    def loss_fn(p, mb, k):
        return edm_loss(p, mb["latents"], mb["latent_condition"],
                        mb["context_index"], k, CFG)

    losses, grads = [], []
    for i in range(2):
        mb = jax.tree.map(lambda x, i=i: x[i : i + 1], batch)
        l, g = jax.value_and_grad(loss_fn)(
            state.params, mb, jax.random.fold_in(key, i))
        losses.append(l)
        grads.append(g)
    grads = jax.tree.map(lambda a, b: (a + b) / 2.0, *grads)
    updates, _ = opt.update(grads, state.opt_state, state.params)
    want_params = optax.apply_updates(state.params, updates)

    np.testing.assert_allclose(
        float(loss_got), float((losses[0] + losses[1]) / 2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(got.params),
                    jax.tree_util.tree_leaves(want_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-7)
    assert int(got.step) == 1


def test_grad_accum_rejects_indivisible_batch():
    step = make_train_step(CFG, make_optimizer(1e-3), donate=False,
                           grad_accum=3)
    with pytest.raises(Exception):  # trace-time assert: 2 % 3 != 0
        jax.eval_shape(step, _make_state(), _batch_fn(0), jax.random.key(0))


def test_no_ckpt_dir_runs_plain(train_step):
    state, losses = train_loop(
        _make_state, train_step, _batch_fn, num_steps=2, seed=3,
        ckpt_dir=None, log_every=0,
    )
    assert len(losses) == 2 and int(state.step) == 2
    assert all(np.isfinite(l) for l in losses)
