"""Conductivity calibration — the inverse problem the adjoint unlocks.

The reference's workflow treats tissue conductivities as literature
constants (step03_ankle_layers/params.yaml sigma block) and quantifies
their influence by brute-force sweeps (step04's 15-point sigma_contact
sweep, run_pressure_sweep.py:709-738).  With the differentiable solve
(ops/adjoint.py) the framework can instead FIT conductivities to
measurements — e.g. electrode impedance + surface potentials from a
fitting session — at one forward + one adjoint MG-CG solve per
optimizer step, independent of the number of unknowns.

Optimization runs on log-sigma (positivity + scale-free steps across
the 7000x physiological contrast) with Adam, the whole loop jitted as
one lax.scan over steps: the TPU executes N steps without host
round-trips."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from pelvistim_fem_tpu.ops.adjoint import solve_stencil_mg_diff


@partial(jax.jit, static_argnames=("bodies", "steps", "lr", "tol",
                                   "maxiter"))
def calibrate_sigma(scase, hier, obs_idx, obs_phi, bodies: tuple,
                    sigma0=None, *, steps=120, lr=0.08, tol=1e-8,
                    maxiter=2_000):
    """Recover sigma_table[bodies] from potential measurements.

    obs_idx  (M,) int32 — mesh node indices of the observations
    obs_phi  (M,)       — measured potentials there
    bodies   tuple of sigma_table slots to fit (static)
    sigma0   (len(bodies),) starting guess; defaults to the table values

    Returns (sigma_table_fit, loss_history) where loss is the
    measurement-normalized MSE  sum((phi-obs)^2)/sum(obs^2).

    Requires f64 (the refined-solver honesty rule applies doubly here:
    gradients inherit the solve tolerance)."""
    from pelvistim_fem_tpu.ops.solve import require_x64
    require_x64("calibrate_sigma")
    base = scase.sigma_table.astype(jnp.float64)
    bidx = jnp.asarray(bodies, jnp.int32)
    start = base[bidx] if sigma0 is None else \
        jnp.asarray(sigma0, jnp.float64)
    denom = jnp.sum(obs_phi * obs_phi)

    def loss_fn(logsig):
        sig = base.at[bidx].set(jnp.exp(logsig))
        phi = solve_stencil_mg_diff(scase, hier, sig, tol=tol,
                                    maxiter=maxiter)
        r = phi[obs_idx] - obs_phi
        return jnp.sum(r * r) / denom

    opt = optax.adam(lr)
    p0 = jnp.log(start)

    def step(carry, _):
        p, st = carry
        loss, g = jax.value_and_grad(loss_fn)(p)
        upd, st = opt.update(g, st, p)
        return (optax.apply_updates(p, upd), st), loss

    (p, _), losses = jax.lax.scan(step, (p0, opt.init(p0)), None,
                                  length=steps)
    return base.at[bidx].set(jnp.exp(p)), losses
