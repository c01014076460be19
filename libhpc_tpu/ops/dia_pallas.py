"""Pallas DIA SpMV — the HBM-bound structured fast path.

XLA serves DIA well only while the working set is VMEM-resident (~100 MB
on v5e: 500-660 Gnnz/s measured on Poisson-1024²/2048² via the fused
pad+add form, round 4). Past VMEM the XLA forms collapse — the
`.at[].add` chain re-reads/rewrites y once per diagonal (~380-440 GB/s
of mostly-wasted traffic) and the pad+add chain materializes its padded
terms (~93-110 GB/s on Poisson-3072²). This kernel restores the
single-pass roofline at any size:

  * the diagonal planes stream HBM->VMEM through the grid pipeline
    (auto double-buffered) — the dominant traffic, touched exactly once;
  * each tile DMAs its x window [t*T, t*T + T + span] once (span = the
    offset spread, padded to 1024);
  * a shifted read at static in-window offset c_d is two static lane
    rolls + a select on the (T/128, 128) view — no gather anywhere;
  * y is written exactly once.

Traffic = D*T*4 + (T+span)*4 + T*4 bytes per tile — the format_spmv_bytes
model, achieved.

Capability parity: the streaming-stencil member of the SpMV family
(SURVEY.md §7 capability map; reference stencil ladder
tests/test_hpc_benchmark/test_hpc_benchmark.cpp:354-601).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from libhpc_tpu.ops._pallas_utils import interpret_mode

LANE = 128


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiaPallas:
    """Tiled DIA operand for the Pallas kernel."""

    dflat: jax.Array     # (n_tiles * D * T/128, 128) per-tile diag planes
    x_pad_lo: int = dataclasses.field(metadata=dict(static=True))
    coffs: tuple = dataclasses.field(metadata=dict(static=True))
    shape: tuple = dataclasses.field(metadata=dict(static=True))
    T: int = dataclasses.field(metadata=dict(static=True))
    span_pad: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n_tiles(self) -> int:
        D = len(self.coffs)
        return self.dflat.shape[0] // (D * (self.T // LANE))

    @property
    def hbm_bytes(self) -> int:
        """Per-SpMV traffic: diagonal planes + x + y (+ the per-tile x
        window overlap, which is span_pad per tile)."""
        m, n = self.shape
        return (self.dflat.size * 4 + n * 4 + m * 4
                + self.n_tiles * self.span_pad * 4)

    @staticmethod
    def from_dia(dia, T: int = 1 << 17) -> "DiaPallas":
        """Host-side tiling of a DIA container (sparse/dia.py)."""
        data = np.asarray(dia.data, np.float32)
        offs = [int(o) for o in dia.offsets]
        m, n = dia.shape
        D = len(offs)
        o_min, o_max = min(offs + [0]), max(offs + [0])
        P = ((-o_min + 1023) // 1024) * 1024      # aligned left x pad
        span = o_max + P
        span_pad = ((span + 1024) // 1024) * 1024
        n_tiles = -(-m // T)
        m_pad = n_tiles * T
        Tr = T // LANE
        dflat = np.zeros((n_tiles, D, Tr, LANE), np.float32)
        for d, o in enumerate(offs):
            # y[i] = sum_d data[d, i+o] * x[i+o]; valid j=i+o range:
            j0, j1 = max(0, o), min(n, m + o)
            if j1 <= j0:
                continue
            # plane[d][i] = data[d, i+o] for i in [j0-o, j1-o)
            plane = np.zeros(m_pad, np.float32)
            plane[j0 - o:j1 - o] = data[d, j0:j1]
            dflat[:, d] = plane.reshape(n_tiles, Tr, LANE)
        coffs = tuple(P + o for o in offs)        # in-window offsets >= 0
        return DiaPallas(
            dflat=jnp.asarray(
                dflat.reshape(n_tiles * D * Tr, LANE)),
            x_pad_lo=P, coffs=coffs, shape=(m, n), T=T,
            span_pad=span_pad)


def _kernel(d_ref, x_any, o_ref, xs, sem, *, coffs, T, span_pad):
    g = pl.program_id(0)
    Tr = T // LANE
    wrows = (T + span_pad) // LANE
    cp = pltpu.make_async_copy(x_any.at[pl.ds(g * Tr, wrows)], xs, sem)
    cp.start()
    cp.wait()
    lane = jax.lax.broadcasted_iota(jnp.int32, (Tr, LANE), 1)
    acc = jnp.zeros((Tr, LANE), jnp.float32)
    for d, c in enumerate(coffs):
        r, l = c // LANE, c % LANE
        a = xs[r:r + Tr]
        if l == 0:
            val = a
        else:
            b = xs[r + 1:r + 1 + Tr]
            # shifted read: val[j] = window[128*row + j + c]
            ra = pltpu.roll(a, LANE - l, 1)
            rb = pltpu.roll(b, LANE - l, 1)
            val = jnp.where(lane < LANE - l, ra, rb)
        acc = acc + d_ref[d * Tr:(d + 1) * Tr, :] * val
    o_ref[:] = acc


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _dia_call(dflat, x_ext, coffs, T, span_pad, n_tiles):
    D = len(coffs)
    Tr = T // LANE
    wrows = (T + span_pad) // LANE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((D * Tr, LANE), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),    # x stays in HBM
        ],
        out_specs=pl.BlockSpec((Tr, LANE), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((wrows, LANE), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        partial(_kernel, coffs=coffs, T=T, span_pad=span_pad),
        out_shape=jax.ShapeDtypeStruct((n_tiles * Tr, LANE), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret_mode(),
    )(dflat, x_ext)


def _probe_kernel(d_ref, x_any, o_ref, xs, sem, *, D, T, span_pad):
    """Pattern-matched speed-of-light probe (VERDICT r4 #3): the same
    access pattern as _kernel — D diagonal planes streamed per tile
    through the grid pipeline, one x window DMA, one output write — with
    the cheapest compute that still touches every byte (plane adds, no
    rolls/selects). Its achieved GB/s over the SAME byte model is the
    defensible denominator for the DIA fraction: generic stream probes
    undercut what a Pallas plane-streaming kernel can pull (719 vs 913+
    GB/s, PERF_NOTES round 4 probe physics)."""
    g = pl.program_id(0)
    Tr = T // LANE
    sr = span_pad // LANE
    cp = pltpu.make_async_copy(
        x_any.at[pl.ds(g * Tr, Tr + sr)], xs, sem)
    cp.start()
    cp.wait()
    acc = xs[0:Tr] + xs[sr:sr + Tr]       # touch the full window
    for d in range(D):
        acc = acc + d_ref[d * Tr:(d + 1) * Tr, :]
    o_ref[:] = acc


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _dia_probe_call(dflat, x_ext, D, T, span_pad, n_tiles):
    Tr = T // LANE
    wrows = (T + span_pad) // LANE
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((D * Tr, LANE), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((Tr, LANE), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((wrows, LANE), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        partial(_probe_kernel, D=D, T=T, span_pad=span_pad),
        out_shape=jax.ShapeDtypeStruct((n_tiles * Tr, LANE), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret_mode(),
    )(dflat, x_ext)


def dia_pattern_probe(dp: DiaPallas, x: jax.Array) -> jax.Array:
    """Run the pattern-matched probe over dp's exact operands. Returns a
    (n_tiles*T/128, 128) array; time it with the same harness as
    dia_spmv_pallas — fraction = t_probe / t_kernel, and the probe's
    dp.hbm_bytes / t is the access-pattern speed-of-light in GB/s."""
    m, n = dp.shape
    n_tiles = dp.n_tiles
    L = max(dp.x_pad_lo + n_tiles * dp.T + dp.span_pad,
            -(-(dp.x_pad_lo + n) // LANE) * LANE)
    x_ext = jnp.pad(x, (dp.x_pad_lo, L - dp.x_pad_lo - n))
    x2 = x_ext.reshape(L // LANE, LANE)
    return _dia_probe_call(dp.dflat, x2, len(dp.coffs), dp.T,
                           dp.span_pad, n_tiles)


def dia_spmv_pallas(dp: DiaPallas, x: jax.Array) -> jax.Array:
    """y = A @ x for a DiaPallas operand; x f32 (ncols,) -> f32 (nrows,)."""
    m, n = dp.shape
    n_tiles = dp.n_tiles
    # window coverage needs P + n_tiles*T + span_pad; a WIDE rectangular
    # matrix (ncols beyond the diagonals' reach) needs room for all of x
    # too — round the larger requirement up to whole rows
    L = max(dp.x_pad_lo + n_tiles * dp.T + dp.span_pad,
            -(-(dp.x_pad_lo + n) // LANE) * LANE)
    x_ext = jnp.pad(x, (dp.x_pad_lo, L - dp.x_pad_lo - n))
    x2 = x_ext.reshape(L // LANE, LANE)   # row view for the window DMAs
    out = _dia_call(dp.dflat, x2, dp.coffs, dp.T, dp.span_pad, n_tiles)
    return out.reshape(-1)[:m]
