"""Fully-fused DCN sampling: gather INSIDE the Pallas kernel.

The production path (ops/pallas_dcn.py) lets XLA do the patch-row gather
and fuses only the corner-combine + tap contraction; the gathered stack
``g`` still round-trips HBM twice (write by the gather, read by the
kernel — 2x77 MB per stage-3 DCN block at v1b serving shapes, the
largest single term in the round-4 roofline). This module prototypes the
last step: consume the rows directly inside the kernel so ``g`` never
exists in HBM. Two table placements are implemented because they probe
different hardware limits:

* ``table_in_vmem=False`` — the packed table stays in HBM and each row
  is fetched with its own async DMA (scalar-prefetched indices). The
  risk is the DMA-issue rate: XLA's gather engine sustains ~115 GB/s on
  2 KB rows (~18 ns/row); a scalar-core loop that starts + waits one
  descriptor per row must approach that to win.
* ``table_in_vmem=True`` — the whole packed table is staged into VMEM
  (9.2 MB for a 672x1600 stride-16 C=256 block — fits; stride-8 tables
  do NOT) and rows are read with dynamic vector loads, no DMAs at all.
  The risk is scalar-loop overhead per row.

``tools/bench_dcn_fused.py`` measures both against the production
two-step path; whichever survives replaces it, and if neither does the
measurement IS the deliverable (the round-4 roofline's open question).

Reference semantics: mmcv DCNv2 (EPro-PnP-Det R101-DCN stages,
configs/epropnp_det_basic.py:8-14); forward-parity is pinned against
ops/deform_conv.py in tests/test_pallas_dcn_fused.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flip to True (tests) to run in interpret mode on CPU.
INTERPRET = False


def _combine_contract(g, w4, k_ref, taps, c):
    """(taps, bl, 4c) gathered rows -> (bl, cout) f32 accumulator."""
    acc = None
    for t in range(taps):
        gt = g[t]
        wt = w4[t]
        s = (gt[:, :c] * wt[:, 0:1]
             + gt[:, c:2 * c] * wt[:, 1:2]
             + gt[:, 2 * c:3 * c] * wt[:, 2:3]
             + gt[:, 3 * c:] * wt[:, 3:4])
        d = jnp.dot(s.astype(gt.dtype), k_ref[t].astype(gt.dtype),
                    preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    return acc


def _fused_dma_kernel(rows_ref, packed_ref, w4_ref, k_ref, out_ref,
                      g_scratch, sem, *, taps: int, bl: int):
    """Per-row DMA variant: packed_ref lives in HBM (ANY)."""
    i = pl.program_id(0)
    base = i * bl
    c4 = g_scratch.shape[-1]
    c = c4 // 4

    def issue(j, _):
        t = j // bl
        l = j - t * bl
        row = rows_ref[t, base + l]
        pltpu.make_async_copy(packed_ref.at[row],
                              g_scratch.at[t, l], sem).start()
        return 0

    jax.lax.fori_loop(0, taps * bl, issue, 0)

    def wait(j, _):
        t = j // bl
        l = j - t * bl
        row = rows_ref[t, base + l]
        pltpu.make_async_copy(packed_ref.at[row],
                              g_scratch.at[t, l], sem).wait()
        return 0

    jax.lax.fori_loop(0, taps * bl, wait, 0)
    acc = _combine_contract(g_scratch[:], w4_ref[:], k_ref, taps, c)
    out_ref[:] = acc.astype(out_ref.dtype)


def _fused_vmem_kernel(rows_ref, packed_ref, w4_ref, k_ref, out_ref,
                       g_scratch, *, taps: int, bl: int):
    """VMEM-table variant: packed_ref resident in VMEM, dynamic loads."""
    i = pl.program_id(0)
    base = i * bl
    c4 = g_scratch.shape[-1]
    c = c4 // 4

    def load(j, _):
        t = j // bl
        l = j - t * bl
        row = rows_ref[t, base + l]
        g_scratch[t, l] = packed_ref[row]
        return 0

    jax.lax.fori_loop(0, taps * bl, load, 0)
    acc = _combine_contract(g_scratch[:], w4_ref[:], k_ref, taps, c)
    out_ref[:] = acc.astype(out_ref.dtype)


def dcn_fused_forward(packed_flat: jnp.ndarray, rows: jnp.ndarray,
                      w4: jnp.ndarray, kern: jnp.ndarray,
                      block_l: int = 128, table_in_vmem: bool = False,
                      interpret: bool = False) -> jnp.ndarray:
    """Gather + corner-combine + tap contraction in ONE kernel.

    Args match ops/pallas_dcn.dcn_gather_contract: packed_flat (R, 4c)
    pack_patches table(s), rows (taps, L) int32, w4 (taps, L, 4) corner
    weights with modulation folded in, kern (taps, c, cout).
    Forward-only prototype (no custom_vjp); serving path only.
    """
    taps, length = rows.shape
    c4 = packed_flat.shape[-1]
    c = c4 // 4
    cout = kern.shape[-1]
    bl = block_l
    pad = (-length) % bl
    if pad:
        rows = jnp.pad(rows, ((0, 0), (0, pad)))
        w4 = jnp.pad(w4, ((0, 0), (0, pad), (0, 0)))
    lpad = rows.shape[1]
    grid = (lpad // bl,)

    if table_in_vmem:
        kernel = functools.partial(_fused_vmem_kernel, taps=taps, bl=bl)
        table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((taps, bl, c4), packed_flat.dtype)]
    else:
        kernel = functools.partial(_fused_dma_kernel, taps=taps, bl=bl)
        table_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [pltpu.VMEM((taps, bl, c4), packed_flat.dtype),
                   pltpu.SemaphoreType.DMA(())]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            table_spec,
            pl.BlockSpec((taps, bl, 4), lambda i, rows: (0, i, 0)),
            pl.BlockSpec((taps, c, cout), lambda i, rows: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bl, cout), lambda i, rows: (i, 0)),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((lpad, cout), packed_flat.dtype),
        interpret=interpret or INTERPRET,
    )(rows, packed_flat, w4.astype(jnp.float32), kern)
    return out[:length]
