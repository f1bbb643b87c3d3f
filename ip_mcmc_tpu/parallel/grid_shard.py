"""Sharded-grid forward solve: the reserved ``'model'`` mesh axis
(SURVEY.md §2.3/§5.7) made concrete.

When a single forward PDE solve outgrows one chip, the field itself is the
"long context": the grid is row-block-decomposed across the ``'model'``
axis, the 5-point stencil's cross-block dependencies become a ONE-ROW halo
exchange via ``ppermute`` (the stencil analog of ring attention's block
passing), and CG's dot products become ``psum`` reductions. Everything runs
inside one ``shard_map``-ed program; collectives ride ICI.

Validated against the single-device operator/solver on virtual CPU meshes
(tests/test_grid_shard.py) — bitwise-level agreement up to f32 reduction
order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

MODEL_AXIS = "model"


def _halo_exchange_rows(x_local, axis_name=MODEL_AXIS):
    """Return (row_above, row_below) for each device's row block.

    row_above: last row of the previous shard (zeros on the first device);
    row_below: first row of the next shard (zeros on the last device).
    """
    nd = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # send my last row to the NEXT device (it becomes their row_above)
    perm_down = [(i, i + 1) for i in range(nd - 1)]
    row_above = jax.lax.ppermute(x_local[-1], axis_name, perm_down)
    # send my first row to the PREVIOUS device (their row_below)
    perm_up = [(i + 1, i) for i in range(nd - 1)]
    row_below = jax.lax.ppermute(x_local[0], axis_name, perm_up)
    zero = jnp.zeros_like(x_local[0])
    row_above = jnp.where(idx == 0, zero, row_above)
    row_below = jnp.where(idx == nd - 1, zero, row_below)
    return row_above, row_below


def sharded_apply_operator(a_local, p_local, n: int, axis_name=MODEL_AXIS):
    """Row-block-distributed A(a) @ p (matches models.darcy.apply_operator).

    a_local, p_local: (rows_per_device, n) blocks of the (n, n) fields.
    """
    h2 = float(n * n)
    nd = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    a_above, a_below = _halo_exchange_rows(a_local, axis_name)
    p_above, p_below = _halo_exchange_rows(p_local, axis_name)

    # horizontal faces — fully local
    t_h = 2.0 * a_local[:, :-1] * a_local[:, 1:] / (
        a_local[:, :-1] + a_local[:, 1:]
    ) * h2
    flux_h = t_h * (p_local[:, :-1] - p_local[:, 1:])
    out = jnp.zeros_like(p_local)
    out = out.at[:, :-1].add(flux_h).at[:, 1:].add(-flux_h)

    # vertical faces — on the extended block (halo row above + local + below)
    a_ext = jnp.concatenate([a_above[None], a_local, a_below[None]], axis=0)
    p_ext = jnp.concatenate([p_above[None], p_local, p_below[None]], axis=0)
    # guard: harmonic mean with zero halo row would divide by a+0 — safe
    # since a > 0 locally and halo zeros are masked out below
    denom = a_ext[:-1] + a_ext[1:]
    t_v_ext = jnp.where(
        denom > 0.0, 2.0 * a_ext[:-1] * a_ext[1:] / jnp.where(denom > 0.0, denom, 1.0), 0.0
    ) * h2  # (rows+1, n): face k sits between ext rows k and k+1
    flux_v = t_v_ext * (p_ext[:-1] - p_ext[1:])
    # flux_v[k] lives on the face between ext rows k and k+1; local row r is
    # ext row r+1, so it gains +flux_v[r+1] (face below) − flux_v[r] (face
    # above). Halo faces on the global boundary carry t_v = 0 (masked halo).
    out = out + flux_v[1:] - flux_v[:-1]

    # global Dirichlet boundary faces
    tb = 2.0 * h2
    top = jnp.where(idx == 0, tb * a_local[0] * p_local[0], jnp.zeros(n))
    bot = jnp.where(
        idx == nd - 1, tb * a_local[-1] * p_local[-1], jnp.zeros(n)
    )
    out = out.at[0].add(top).at[-1].add(bot)
    out = out.at[:, 0].add(tb * a_local[:, 0] * p_local[:, 0])
    out = out.at[:, -1].add(tb * a_local[:, -1] * p_local[:, -1])
    return out


def solve_cg_local(a_local, f_local, n: int, n_iters: int = 150,
                   axis_name=MODEL_AXIS):
    """Per-shard body of the distributed Jacobi-PCG solve (callable INSIDE a
    ``shard_map`` over ``axis_name``; also vmap-able over a leading chain
    axis — the composed ('chains','model') path in parallel/composed.py
    relies on that batching of the ppermute/psum collectives).

    a_local, f_local: (rows_per_device, n) row blocks. Returns the local
    row block of the solution.
    """
    # Jacobi diagonal, assembled locally with halo transmissibilities
    h2 = float(n * n)
    a_above, a_below = _halo_exchange_rows(a_local, axis_name)
    t_h = 2.0 * a_local[:, :-1] * a_local[:, 1:] / (
        a_local[:, :-1] + a_local[:, 1:]
    ) * h2
    d = jnp.zeros_like(a_local)
    d = d.at[:, :-1].add(t_h).at[:, 1:].add(t_h)
    a_ext = jnp.concatenate([a_above[None], a_local, a_below[None]], axis=0)
    denom = a_ext[:-1] + a_ext[1:]
    t_v_ext = jnp.where(
        denom > 0.0,
        2.0 * a_ext[:-1] * a_ext[1:] / jnp.where(denom > 0.0, denom, 1.0),
        0.0,
    ) * h2
    d = d + t_v_ext[1:] + t_v_ext[:-1]
    nd = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    tb = 2.0 * h2
    d = d.at[0].add(jnp.where(idx == 0, tb * a_local[0], jnp.zeros(n)))
    d = d.at[-1].add(
        jnp.where(idx == nd - 1, tb * a_local[-1], jnp.zeros(n))
    )
    d = d.at[:, 0].add(tb * a_local[:, 0])
    d = d.at[:, -1].add(tb * a_local[:, -1])
    inv_diag = 1.0 / d

    def psum(x):
        return jax.lax.psum(x, axis_name)

    def matvec(p):
        return sharded_apply_operator(a_local, p, n, axis_name)

    x = jnp.zeros_like(f_local)
    r = f_local
    z = inv_diag * r
    p = z
    rz = psum(jnp.sum(r * z))

    def it(_, carry):
        x, r, p, rz = carry
        Ap = matvec(p)
        pAp = psum(jnp.sum(p * Ap))
        alpha = jnp.where(pAp > 0.0, rz / jnp.where(pAp > 0.0, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = inv_diag * r
        rz_new = psum(jnp.sum(r * z))
        beta = jnp.where(rz > 0.0, rz_new / jnp.where(rz > 0.0, rz, 1.0), 0.0)
        p = z + beta * p
        return x, r, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, n_iters, it, (x, r, p, rz))
    return x


def sharded_solve_cg(a, f, n: int, mesh, n_iters: int = 150):
    """Distributed Jacobi-PCG solve of A(a) p = f over the 'model' axis.

    a, f: full (n, n) and (n²,) arrays (placed/sharded by caller or here).
    Returns the full solution (n²,) (row-sharded output, global view).
    """
    out = jax.shard_map(
        lambda al, fl: solve_cg_local(al, fl, n, n_iters),
        mesh=mesh,
        in_specs=(P(MODEL_AXIS), P(MODEL_AXIS)),
        out_specs=P(MODEL_AXIS),
    )(a, f.reshape(n, n))
    return out.reshape(-1)


def make_model_mesh(n_devices=None):
    import numpy as np

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (MODEL_AXIS,))
