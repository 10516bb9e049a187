"""Two REAL processes through the JAX distributed runtime (gloo on CPU).

Everything else in the suite runs multi-device in ONE process; this is the
only place the multi-host code path (`initialize_distributed`,
cross-process collectives, `make_hybrid_mesh` with the data axis crossing
the process boundary) actually executes with more than one process — the
structural stand-in for a multi-slice TPU deployment (NOTES.md item 5).
Each child process owns 4 virtual CPU devices; the contiguous 4-device
groups stand in for ICI slices and the process boundary for DCN, exactly
the layout `make_hybrid_mesh(dcn_data=2, ...)` models.

The invariant mirrors tests/test_sharding.py: distributed sharded
execution == local single-device execution, bit-for-bit tolerances.
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Child process body.  argv: [process_id, coordinator_port, repo_root].
_CHILD = r'''
import os, sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax

jax.config.update("jax_platforms", "cpu")  # axon plugin ignores the env var

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, sys.argv[3])
from diffusionrenderer_tpu.config import DiTConfig
from diffusionrenderer_tpu.models.dit import dit_forward, init_dit_params
from diffusionrenderer_tpu.parallel import (
    batch_sharding, dit_param_shardings, initialize_distributed,
    make_hybrid_mesh, token_sharding_constraint,
)

initialize_distributed(
    coordinator_address=f"localhost:{sys.argv[2]}",
    num_processes=2,
    process_id=int(sys.argv[1]),
)
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4, jax.local_device_count()
assert jax.device_count() == 8, jax.device_count()

mesh = make_hybrid_mesh(dcn_data=2, data=1, seq=2, tensor=2)

# --- 1. a replicated reduction over data-sharded rows: the all-reduce
# crosses the process boundary (gloo), every process must see the total.
rows = np.arange(8, dtype=np.float32).reshape(2, 4)
sh = NamedSharding(mesh, P("data", None))
garr = jax.make_array_from_callback((2, 4), sh, lambda idx: rows[idx])
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
np.testing.assert_allclose(jax.device_get(total), rows.sum())

# --- 2. the product path: DP x SP x TP DiT forward over the hybrid mesh.
cfg = DiTConfig(model_channels=64, num_blocks=2, num_heads=4,
                adaln_lora_dim=8, crossattn_emb_channels=16,
                additional_concat_ch=16)
params = jax.device_get(
    init_dit_params(jax.random.key(0), cfg, dtype=jnp.float32)
)  # identical on both processes (same seed), host-resident
b, t, h, w = 2, 2, 8, 8
rng = np.random.default_rng(1)
x = rng.standard_normal((b, t, h, w, 16), np.float32)
cond = rng.standard_normal((b, t, h, w, 16), np.float32)
sigma = np.full((b,), 7.5, np.float32)
ctx = np.array([0, 1], np.int32)

expected = np.asarray(
    dit_forward(jax.tree.map(jnp.asarray, params), x, sigma, cond, ctx, cfg)
)  # local single-device reference, before any distributed placement

def globalize(leaf, sharding):
    host = np.asarray(leaf)
    return jax.make_array_from_callback(
        host.shape, sharding, lambda idx: host[idx]
    )

gparams = jax.tree.map(globalize, params, dit_param_shardings(params, mesh))
bs = batch_sharding(mesh)
gx = jax.make_array_from_callback(x.shape, bs, lambda idx: x[idx])
gcond = jax.make_array_from_callback(cond.shape, bs, lambda idx: cond[idx])
constraint = token_sharding_constraint(mesh)

fwd = jax.jit(
    lambda p, xx, cc: dit_forward(
        p, xx, sigma, cc, ctx, cfg, seq_sharding_constraint=constraint
    ),
    out_shardings=NamedSharding(mesh, P()),
)
with mesh:
    got = jax.device_get(fwd(gparams, gx, gcond))
np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

# --- 3. a training step: the gradient psum over the data axis is the one
# collective a real multi-slice deployment routes over DCN.  Loss is
# replicated; both processes must fetch the identical finite value, and the
# fixed-draw objective must descend.
from diffusionrenderer_tpu.training import (
    init_train_state, make_optimizer, make_train_step,
)

gparams2 = jax.tree.map(globalize, params, dit_param_shardings(params, mesh))
opt = make_optimizer(1e-3)
with mesh:
    state = init_train_state(gparams2, opt)
step = make_train_step(
    cfg, opt, condition_drop_rate=0.1,
    seq_sharding_constraint=constraint,
)
batch = {"latents": gx, "latent_condition": gcond, "context_index": ctx}
losses = []
with mesh:
    for _ in range(3):
        state, loss = step(state, batch, jax.random.key(0))
        losses.append(float(jax.device_get(loss)))
assert all(np.isfinite(l) for l in losses), losses
assert losses[-1] < losses[0], losses
print(f"TRAIN_LOSSES {losses}", flush=True)

# --- 4. distributed checkpoint/resume: a COLLECTIVE orbax save of the
# sharded post-training params (each process writes its addressable
# shards), then a sharded restore onto the same mesh — the multi-host
# resume path of a real deployment.
from diffusionrenderer_tpu.checkpoint import restore_native, save_native

trained = state.params
save_native(sys.argv[4], trained)
restored = jax.tree.map(lambda x: x, restore_native(sys.argv[4], like=trained))
diff = jax.jit(
    lambda a, b: jax.tree.reduce(
        jnp.maximum,
        jax.tree.map(lambda x, y: jnp.max(jnp.abs(x - y)), a, b),
    ),
    out_shardings=NamedSharding(mesh, P()),
)(restored, trained)
assert float(jax.device_get(diff)) == 0.0, float(jax.device_get(diff))
print("CKPT_ROUNDTRIP_OK", flush=True)

print(f"MULTIPROC_OK process={jax.process_index()}", flush=True)
'''


def _run_children(port: int, ckpt_dir: str):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children set their own 4-device count
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = _REPO
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, str(i), str(port), _REPO,
             ckpt_dir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=420)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


def test_two_process_hybrid_mesh_matches_local(tmp_path):
    port = 20000 + os.getpid() % 10000
    outs = _run_children(port, str(tmp_path / "ckpt"))
    if any(rc != 0 and "address" in (err or "").lower()
           for rc, _, err in outs):
        # Coordinator port collision with another process on this host:
        # one retry on a different port before declaring failure.
        outs = _run_children(port + 1, str(tmp_path / "ckpt2"))
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, (
            f"child {i} rc={rc}\nstdout:\n{out}\nstderr:\n{err[-3000:]}"
        )
        assert f"MULTIPROC_OK process={i}" in out
        assert "CKPT_ROUNDTRIP_OK" in out

    # The replicated loss must be bit-identical on both processes — each
    # only computed its own data shard; agreement proves the cross-process
    # gradient reduction actually synchronized them.
    loss_lines = [
        next(l for l in out.splitlines() if l.startswith("TRAIN_LOSSES"))
        for _, out, _ in outs
    ]
    assert loss_lines[0] == loss_lines[1], loss_lines
