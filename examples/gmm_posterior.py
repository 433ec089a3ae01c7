"""Statistical correctness validation: CARD posterior recovery on a 1-D GMM.

On a two-component Gaussian mixture the true class posterior p(y=1|x) is
analytic (ladine_tpu.data.GaussianMixture1D.posterior). A correctly
implemented CARD classification-diffusion model trained on samples from the
mixture should produce Monte-Carlo vote fractions that track that posterior —
this is the core claim of the method (CARD, NeurIPS 2022), validated here
end-to-end through our trainer + sampler with no image machinery in the way.

Run: python examples/gmm_posterior.py
Prints the mean absolute error between the MC-estimated and analytic
posterior over a grid; < 0.1 indicates the diffusion machinery is sound.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from ladine_tpu.data import GaussianMixture1D
from ladine_tpu.infer import member_mc_sample
from ladine_tpu.models import ConditionalModel
from ladine_tpu.ops import DiffusionSchedule
from ladine_tpu.train import create_member_state, make_member_step, make_optimizer


def run(n_train_steps=1500, mc_trials=100, seed=0, verbose=True):
    gmm = GaussianMixture1D(mu=(-1.0, 1.0), sigma=(0.6, 0.6), seed=seed)
    T = 100
    sched = DiffusionSchedule.create("linear", T, 1e-4, 0.02)
    # x enters the eps net directly (data_dim=1); flat guidance so the
    # posterior signal must flow through the diffusion model itself
    model = ConditionalModel(data_dim=1, feature_dim=64, hidden_dim=64, y_dim=2, n_steps=T + 1)
    tx = make_optimizer("Adam", 1e-3)
    state = create_member_state(model, jax.random.PRNGKey(seed), tx, batch_size=128)
    step = jax.jit(make_member_step(model, tx, sched))

    flat = jnp.full((128, 2), 0.5)
    for i in range(n_train_steps):
        x, y = gmm.sample(128)
        y0 = jnp.asarray(np.eye(2)[y], jnp.float32)
        state, loss = step(state, jnp.asarray(x), y0, flat, jax.random.PRNGKey(i))
        if verbose and i % 300 == 0:
            print(f"step {i}: loss {float(loss):.4f}")

    # evaluate the MC vote fraction on a grid vs the analytic posterior,
    # with BOTH samplers: the full ancestral chain (reference behavior) and
    # the strided DDIM chain (the fast serving path) — matched MAE is the
    # accuracy-parity evidence behind the DDIM throughput numbers
    from ladine_tpu.ops import ddim_timesteps

    grid = np.linspace(-2.5, 2.5, 41, dtype=np.float32)[:, None]
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    p_true = gmm.posterior(grid)
    maes = {}
    ddim_tau = ddim_timesteps(T, max(T // 20, 4))
    # the int8_bf16 row runs the SERVING numerics end-to-end: int8 lin2/lin3
    # + bf16 hidden intermediates (int8_eps stores them in f.dtype — the
    # TPU serving configuration, kernels/int8.py), validated against the
    # same analytic posterior as the fp32 samplers
    model_bf16 = model.copy(dtype=jnp.bfloat16)
    # pallas_int8 runs the FUSED-kernel serving numerics (interpret mode on
    # CPU — the real kernel body) through the same analytic-posterior gate,
    # including the engine's MC-fold (kernels/int8_pallas.py)
    for name, mdl, tau, int8, pallas in [
        ("ancestral", model, None, False, False),
        ("ddim", model, ddim_tau, False, False),
        ("int8_bf16", model_bf16, ddim_tau, True, False),
        ("pallas_int8", model_bf16, ddim_tau, False, True),
        ("pallas_v2", model_bf16, ddim_tau, False, True),
    ]:
        samples = member_mc_sample(
            mdl, variables, jnp.asarray(grid), jnp.full((41, 2), 0.5),
            jax.random.PRNGKey(123), sched, mc_trials, tau=tau,
            use_int8_eps=int8, use_int8_pallas=pallas,
            pallas_fuse_ends=(name == "pallas_v2"),
        )  # (mc_trials, 41, 2)
        p_hat = np.asarray(jnp.argmax(samples, -1)).mean(axis=0)
        maes[name] = float(np.abs(p_hat - p_true).mean())
        if verbose and name == "ancestral":
            for i in range(0, 41, 8):
                print(f"x={grid[i,0]:+.2f}  p_true={p_true[i]:.3f}  p_mc={p_hat[i]:.3f}")
    if verbose:
        print(f"MAE(p_mc, p_analytic): ancestral={maes['ancestral']:.4f}  "
              f"ddim({max(T // 20, 4)} steps)={maes['ddim']:.4f}  "
              f"int8+bf16 intermediates={maes['int8_bf16']:.4f}  "
              f"pallas-fused int8={maes['pallas_int8']:.4f}  "
              f"pallas v2={maes['pallas_v2']:.4f}")
    return maes["ancestral"]


if __name__ == "__main__":
    mae = run()
    sys.exit(0 if mae < 0.1 else 1)
