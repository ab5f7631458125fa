"""Diagnostic: which train-step variant executes on the TPU terminal.
Run from anywhere with the ambient (axon) environment."""

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from crosstalk_tpu.config import ModelConfig, OptimConfig
from crosstalk_tpu.models import build_model, init_model
from crosstalk_tpu.train.steps import _train_core, init_train_state, make_optimizer


def trial(name, dtype, donate, with_opt):
    model = build_model(ModelConfig(variant="single", compute_dtype=dtype))
    v = init_model(model, jax.random.key(0))
    tx = make_optimizer(OptimConfig())
    state = init_train_state(model, v, tx)
    x = jnp.zeros((32, 256, 256, 2))
    y = jnp.zeros((32, 1))
    if with_opt:
        core = _train_core(model, tx, None)
        fn = jax.jit(core, donate_argnums=0) if donate else jax.jit(core)
        args = (state, x, y, np.float32(1e-3), jax.random.key(1))
    else:
        def fwd_bwd(params, stats, xx, yy, rng):
            def loss_fn(p):
                preds, mut = model.apply(
                    {"params": p, "batch_stats": stats}, xx, train=True,
                    mutable=["batch_stats"], rngs={"dropout": rng},
                )
                return jnp.mean(jnp.square(preds - yy)), mut
            (l, m), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return l, g
        fn = jax.jit(fwd_bwd)
        args = (state.params, state.batch_stats, x, y, jax.random.key(1))
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "a"):
        trial("fwd_bwd_bf16_nodonate_noopt", "bf16", False, False)
    if which in ("all", "b"):
        trial("full_bf16_nodonate", "bf16", False, True)
    if which in ("all", "c"):
        trial("full_bf16_donate", "bf16", True, True)
