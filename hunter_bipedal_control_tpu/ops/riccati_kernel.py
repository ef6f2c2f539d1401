"""Pallas TPU kernel: batched Riccati backward pass, batch-in-lanes layout.

Why a kernel: XLA executes the 66-step Riccati recursion as a while loop of
small (22x22) batched matmuls and an LU solve — measured ~0.6 ms per knot at
B=128 (the LU dominating).  This kernel lays matrices out as (i, j, lane)
with the *scenario batch on the 128-wide lane axis*, so every matrix product
is nx fused multiply-adds of (n, m, 128) tiles on the VPU and the solve is a
lane-parallel Gauss-Jordan elimination (no pivoting needed: Huu is
regularized SPD).  Stage data streams from HBM knot by knot under double
buffering; the value-function state (S, s) lives in VMEM for the whole
recursion.

Layout: per-knot stage data is packed as
    mats (N, 5, n, n, LANES)  [A, B, Qxx, Qww, Qwx]  (n = max(nx, nu))
    vecs (N, 4, n, LANES)     [d, qx, qw, pad]
outputs packed as (N, nu, nx+1, LANES) = [K | kff].
LANES = 128 scenarios per grid step; grid over batch blocks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _mm(a, b, k_dim, trans_a=False, trans_b=False):
    """Lane-batched matmul: contraction over k_dim (static)."""
    out = None
    for j in range(k_dim):
        av = a[j, :, :] if trans_a else a[:, j, :]          # (rows, L)
        bv = b[:, j, :] if trans_b else b[j, :, :]          # (cols, L)
        t = av[:, None, :] * bv[None, :, :]
        out = t if out is None else out + t
    return out


def _mv(a, v, k_dim, trans_a=False):
    acc = None
    for j in range(k_dim):
        av = a[j, :, :] if trans_a else a[:, j, :]
        t = av * v[j][None, :]
        acc = t if acc is None else acc + t
    return acc


def _gauss_jordan_solve(H, R, n):
    """Lane-parallel solve H X = R without pivoting (H regularized SPD).

    Layout care: (rows, cols, L) arrays tile as rows x (sublane=cols,
    lane=L); row slices Hc[i] are free tile selects, but column slices
    Hc[:, i, :] are sublane gathers — extracted instead via a one-hot
    multiply + sublane reduction.  Row updates use mask-select (no scatter
    in Mosaic)."""
    Hc = jnp.concatenate([H, R], axis=1)  # (n, n+r, L)
    m = Hc.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)
    for i in range(n):
        row_i = Hc[i]                                  # (m, L) free
        piv = row_i[i]                                 # (L,)
        inv = 1.0 / piv
        row = row_i * inv[None, :]
        # column i via one-hot reduce over the sublane axis
        col = jnp.sum(jnp.where(col_ids == i, Hc, 0.0), axis=1)  # (n, L)
        upd = Hc - col[:, None, :] * row[None, :, :]
        Hc = jnp.where(row_ids == i, row[None, :, :], upd)
    return Hc[:, n:, :]


def _riccati_kernel(nsteps, nx, nu, reg,
                    mats_hbm, vecs_hbm, out_hbm,
                    S_scr, s_scr, mats_vmem, vecs_vmem, out_vmem,
                    in_sems, out_sems):
    nmax = max(nx, nu)
    blk = pl.program_id(0)

    def in_dma(slot, k):
        return pltpu.make_async_copy(mats_hbm.at[blk, k], mats_vmem.at[slot],
                                     in_sems.at[slot])

    def vec_dma(slot, k):
        return pltpu.make_async_copy(vecs_hbm.at[blk, k], vecs_vmem.at[slot],
                                     in_sems.at[2 + slot])

    def out_dma(slot, k):
        return pltpu.make_async_copy(out_vmem.at[slot], out_hbm.at[blk, k],
                                     out_sems.at[slot])

    S_scr[...] = jnp.zeros_like(S_scr)
    s_scr[...] = jnp.zeros_like(s_scr)

    # warm up: fetch the last knot
    in_dma(0, nsteps - 1).start()
    vec_dma(0, nsteps - 1).start()

    def body(step, _):
        k = nsteps - 1 - step
        slot = step % 2
        nslot = (step + 1) % 2

        @pl.when(step + 1 < nsteps)
        def _():
            in_dma(nslot, k - 1).start()
            vec_dma(nslot, k - 1).start()

        in_dma(slot, k).wait()
        vec_dma(slot, k).wait()

        A = mats_vmem[slot, 0, :nx, :nx, :]
        Bm = mats_vmem[slot, 1, :nx, :nu, :]
        Qxx = mats_vmem[slot, 2, :nx, :nx, :]
        Qww = mats_vmem[slot, 3, :nu, :nu, :]
        Qwx = mats_vmem[slot, 4, :nu, :nx, :]
        d = vecs_vmem[slot, 0, :nx, :]
        qx = vecs_vmem[slot, 1, :nx, :]
        qw = vecs_vmem[slot, 2, :nu, :]
        S = S_scr[...]
        s = s_scr[...]

        # S is symmetric: S[:, j, :] == S[j, :, :], so trans_a=True gives
        # free major-axis slices instead of sublane gathers
        SB = _mm(S, Bm, nx, trans_a=True)           # (nx, nu, L)
        SA = _mm(S, A, nx, trans_a=True)            # (nx, nx, L)
        Huu = Qww + _mm(Bm, SB, nx, trans_a=True)   # (nu, nu, L)
        tr = Huu[0, 0]
        for i in range(1, nu):
            tr = tr + Huu[i, i]
        shift = reg * (1.0 + tr / nu)
        Huu = Huu + shift[None, None, :] * jnp.eye(nu, dtype=S.dtype)[:, :, None]
        Hux = Qwx + _mm(Bm, SA, nx, trans_a=True)   # (nu, nx, L)
        Sd = s + _mv(S, d, nx, trans_a=True)        # symmetric S again
        hu = qw + _mv(Bm, Sd, nx, trans_a=True)     # (nu, L)

        rhs = jnp.concatenate([Hux, hu[:, None, :]], axis=1)   # (nu, nx+1, L)
        Ksol = _gauss_jordan_solve(Huu, rhs, nu)
        K = -Ksol[:, :nx, :]
        kff = -Ksol[:, nx, :]

        # publish [K | kff] for this knot (wait for previous write slot)
        @pl.when(step >= 2)
        def _():
            out_dma(slot, k + 2).wait()
        out_vmem[slot] = jnp.concatenate([K, kff[:, None, :]], axis=1)
        out_dma(slot, k).start()

        ASA = _mm(A, SA, nx, trans_a=True)
        HK = _mm(Hux, K, nu, trans_a=True)
        S_new = Qxx + ASA + HK
        S_new = 0.5 * (S_new + jnp.swapaxes(S_new, 0, 1))
        s_new = qx + _mv(A, Sd, nx, trans_a=True) + _mv(Hux, kff, nu, trans_a=True)
        S_scr[...] = S_new
        s_scr[...] = s_new
        return ()

    jax.lax.fori_loop(0, nsteps, body, ())
    # drain the last two output DMAs
    out_dma((nsteps - 1) % 2, 0).wait()

    @pl.when(nsteps >= 2)
    def _():
        out_dma(nsteps % 2, 1).wait()


def riccati_backward_pallas(A, B, d, Qxx, Qww, Qwx, qx, qw, reg=1e-6,
                            interpret=False):
    """Batched Riccati backward pass (K, kff) — see module docstring.

    Inputs: (Bb, N, ...) with Bb a multiple of LANES.
    """
    Bb, N, nx, _ = A.shape
    nu = B.shape[3]
    assert Bb % LANES == 0, "pad the batch to a multiple of 128"
    nblocks = Bb // LANES
    nmax = max(nx, nu)
    dtype = A.dtype

    def lanes_mat(x, rows, cols):
        pad = jnp.zeros((Bb, N, nmax, nmax), dtype)
        pad = pad.at[:, :, :rows, :cols].set(x)
        return pad.reshape(nblocks, LANES, N, nmax, nmax).transpose(0, 2, 3, 4, 1)

    def lanes_vec(x, rows):
        pad = jnp.zeros((Bb, N, nmax), dtype)
        pad = pad.at[:, :, :rows].set(x)
        return pad.reshape(nblocks, LANES, N, nmax).transpose(0, 2, 3, 1)

    mats = jnp.stack(
        [lanes_mat(A, nx, nx), lanes_mat(B, nx, nu), lanes_mat(Qxx, nx, nx),
         lanes_mat(Qww, nu, nu), lanes_mat(Qwx, nu, nx)], axis=2
    )  # (blocks, N, 5, nmax, nmax, LANES)
    vecs = jnp.stack(
        [lanes_vec(d, nx), lanes_vec(qx, nx), lanes_vec(qw, nu),
         lanes_vec(jnp.zeros_like(d), nx)], axis=2
    )  # (blocks, N, 4, nmax, LANES)

    kern = functools.partial(_riccati_kernel, N, nx, nu, reg)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((nx, nx, LANES), dtype),           # S
            pltpu.VMEM((nx, LANES), dtype),               # s
            pltpu.VMEM((2, 5, nmax, nmax, LANES), dtype),  # stage mats x2
            pltpu.VMEM((2, 4, nmax, LANES), dtype),        # stage vecs x2
            pltpu.VMEM((2, nu, nx + 1, LANES), dtype),     # out buffer x2
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nblocks, N, nu, nx + 1, LANES), dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(mats, vecs)

    out = out.transpose(0, 4, 1, 2, 3).reshape(Bb, N, nu, nx + 1)
    return out[..., :nx], out[..., nx]
