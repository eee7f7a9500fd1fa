"""Fused deformable-conv sampling contraction (TPU Pallas kernel).

Motivation (measured on 1x v5e, v1b 896x1600 serving): XLA compiles the
jnp formulation of DCNv2 — patch-row gather -> bilinear corner combine ->
``(h*w, taps*C) @ (taps*C, Cout)`` matmul — into ~3x more HBM traffic
than the gather itself. The corner combine lowers to a VPU loop fusion
(~8 ms per stride-8 layer), and the ``(h*w, taps*C)`` stack is
materialized twice more for layout conversion around the MXU matmul (a
103 MB bf16 relayout fusion alone costs ~18 ms). This kernel consumes
the raw gathered patch rows in L-blocks and performs the corner combine
(VPU) plus the per-tap contraction (MXU) entirely in VMEM, so the
intermediate stack never exists in HBM.

The gather itself stays in XLA (random-access row gathers run at the
XLA gather ceiling, ~90-115 GB/s on 1x v5e; Pallas cannot beat that
without per-sample DMAs). Differentiation goes through a ``custom_vjp``
whose backward re-derives the pure-jnp reference formulation, so the
training path is numerically unchanged.

Reference: mmcv DCNv2 semantics (EPro-PnP-Det R101-DCN backbone stages
and ``dcn_on_last_conv`` head towers — configs/epropnp_det_basic.py:31,
61); module-level citations in ops/deform_conv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401  (kept for parity with sibling kernels)


# Flip to True (tests) to run the kernel in interpret mode on CPU.
INTERPRET = False


def _contract_kernel(g_ref, w4_ref, k_ref, out_ref, *, taps: int, c: int):
    """One L-block: combine 4 corners per tap, contract taps on the MXU.

    g_ref: (taps, bl, 4c) gathered patch rows (float, or int8 from the
        quantized table — dequantization is folded into ``k_ref`` by the
        caller, so int8 rows only need a cast here).
    w4_ref: (taps, bl, 4) corner weights (modulation folded in).
    k_ref: (taps, c, cout) conv kernel, constant across the grid.
    out_ref: (bl, cout).
    """
    # int8 tables compute in the (scale-folded) kernel dtype; float
    # tables keep the feature dtype (bf16 hits the single-pass MXU path,
    # matching XLA's default matmul precision; f32 stays full precision)
    cdt = k_ref.dtype if g_ref.dtype == jnp.int8 else g_ref.dtype
    acc = None
    for t in range(taps):
        gt = g_ref[t].astype(cdt)
        wt = w4_ref[t].astype(cdt)
        s = (gt[:, :c] * wt[:, 0:1]
             + gt[:, c:2 * c] * wt[:, 1:2]
             + gt[:, 2 * c:3 * c] * wt[:, 2:3]
             + gt[:, 3 * c:] * wt[:, 3:4])
        d = jnp.dot(s, k_ref[t].astype(cdt),
                    preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    out_ref[:] = acc.astype(out_ref.dtype)


def _contract_pallas(g: jnp.ndarray, w4: jnp.ndarray, kern: jnp.ndarray,
                     block_l: int | None = None,
                     interpret: bool = False) -> jnp.ndarray:
    """(taps, L, 4c), (taps, L, 4), (taps, c, cout) -> (L, cout)."""
    taps, length, c4 = g.shape
    c = c4 // 4
    cout = kern.shape[-1]
    out_dtype = kern.dtype if g.dtype == jnp.int8 else g.dtype
    if block_l is None:
        # VMEM budget: g/w4/out blocks are double-buffered by the
        # pipeline, the kernel block is resident. Size bl to stay under
        # the ~16M scoped-vmem limit (wide stage-4 blocks at f32 need
        # bl < 64: taps=9, 4c=2048, cout=512 puts the kernel alone at
        # 9.4M).
        limit = 13 * 1024 * 1024
        kern_bytes = taps * c * cout * kern.dtype.itemsize
        per_row = 2 * taps * (c4 * g.dtype.itemsize + 4 * 4) \
            + 2 * cout * g.dtype.itemsize
        min_bl = 8
        if kern_bytes + min_bl * per_row > limit:
            raise ValueError(
                f'DCN contraction kernel block ({kern_bytes / 2**20:.1f} '
                f'MiB: taps={taps}, 4c={c4}, cout={cout}, '
                f'{kern.dtype}) leaves no scoped-VMEM headroom under the '
                f'{limit / 2**20:.0f} MiB budget even at block_l={min_bl}'
                ' — cast the kernel to bfloat16 or use the jnp '
                'deform_conv path for this layer geometry')
        block_l = int(max(min_bl, min(128, (limit - kern_bytes) // per_row)))
        block_l -= block_l % 8
    pad = (-length) % block_l
    if pad:
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
        w4 = jnp.pad(w4, ((0, 0), (0, pad), (0, 0)))
    grid = (g.shape[1] // block_l,)
    out = pl.pallas_call(
        functools.partial(_contract_kernel, taps=taps, c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((taps, block_l, c4), lambda i: (0, i, 0)),
            pl.BlockSpec((taps, block_l, 4), lambda i: (0, i, 0)),
            pl.BlockSpec((taps, c, cout), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_l, cout), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((g.shape[1], cout), out_dtype),
        interpret=interpret or INTERPRET,
    )(g, w4.astype(jnp.float32), kern)
    return out[:length]


def _ref_contract(packed_flat, rows, w4, kern):
    """Pure-jnp reference of gather+combine+contract (backward path).

    Matches bilinear_sample_prepacked followed by the tap matmul: the
    combine runs in the gathered dtype (weights cast down), accumulation
    in f32 via the dot.
    """
    taps, length = rows.shape
    c4 = packed_flat.shape[-1]
    c = c4 // 4
    g = packed_flat[rows]                                   # (taps, L, 4c)
    g = g.reshape(taps, length, 4, c)
    s = jnp.einsum('tljc,tlj->tlc', g, w4.astype(g.dtype))
    return jnp.einsum('tlc,tco->lo', s.astype(kern.dtype), kern,
                      preferred_element_type=jnp.float32).astype(g.dtype)


def pack_patches_mxu(feat: jnp.ndarray) -> jnp.ndarray:
    """``pack_patches`` as a one-hot 2x2 convolution (bf16 features).

    XLA lowers the pad+4-slice-concat construction of the (h+2, w+2, 4c)
    patch table to a ~9 GB/s loop fusion (~5 ms per stride-8 DCN at v1b
    serving shapes). A 2x2 convolution with a constant 0/1 kernel builds
    the same table on the MXU in ~0.1 ms, exactly: products by 1.0 and
    accumulation with zeros are lossless, and the f32 accumulator rounds
    back to the original bf16 values.

    Only used for 16-bit features — for f32 inputs the MXU's default
    bf16 truncation would corrupt the copy, and the concat construction
    is comparatively cheap there.
    """
    h, w, c = feat.shape
    fp = jnp.pad(feat, ((1, 2), (1, 2), (0, 0)))
    kern = np.zeros((2, 2, c, 4 * c), np.float32)
    for j, (ky, kx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        kern[ky, kx, np.arange(c), j * c + np.arange(c)] = 1.0
    out = jax.lax.conv_general_dilated(
        fp[None], jnp.asarray(kern, feat.dtype),
        window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return out[0].astype(feat.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def dcn_gather_contract(packed_flat, rows, w4, kern, interpret=False):
    """Gather patch rows and contract with the DCN kernel, fused on TPU.

    The gather MUST stay a plain 1-D row gather: callers fold any image
    batch index into ``rows`` (``row + img * rows_per_image``) instead of
    vmapping this function — a vmapped/batched gather lowers to XLA's
    two-index "bitpacked" gather path, which runs ~7x slower than the
    1-D row form at v1b stride-8 shapes (26 vs 187 GB/s measured).

    Args:
        packed_flat: (R, 4c) ``pack_patches`` table(s), flattened
            spatially (and across images, if batched).
        rows: (taps, L) int32 row indices (``corner_rows_and_weights``).
        w4: (taps, L, 4) corner weights with modulation folded in.
        kern: (taps, c, cout) convolution kernel.

    Returns (L, cout) in the feature dtype.
    """
    g = packed_flat[rows]
    return _contract_pallas(g, w4, kern, interpret=interpret)


def _fwd(packed_flat, rows, w4, kern, interpret):
    return dcn_gather_contract(packed_flat, rows, w4, kern, interpret), \
        (packed_flat, rows, w4, kern)


# Backward row-chunk size: above this L the backward streams the patch
# table in chunks instead of materializing (taps, L, 4, c) whole — at v1b
# train shapes that tensor is 4.6 GiB per DCN (f32, L=134400, c=256) and
# dominates the train-step HBM peak (see tools/mem_envelope_det.py).
# Env-overridable for tuning sweeps (tools/run_v1b_train_step.py): larger
# chunks cut scan trips (faster) at a linearly larger temp footprint.
import os as _os  # noqa: E402

BWD_CHUNK_ROWS = int(_os.environ.get('EPROPNP_DCN_BWD_CHUNK', 8192))


def _bwd_chunked(packed_flat, rows, w4, kern, ct):
    """Manual gradients of ``_ref_contract``, streamed over L-chunks.

    A ``lax.scan`` re-gathers one (taps, Lc, 4, c) patch block at a time
    and scatter-accumulates ``d_packed`` into the carry, so the peak
    temp is ~L/Lc times smaller than the whole-table ``jax.vjp`` path.
    Gradient math (all in f32, cast to input dtypes at the end):
      d_s = ct @ kern^T          d_kern += s^T @ ct
      d_w4 = <g, d_s>            d_packed[rows] += w4 * d_s
    """
    taps, length = rows.shape
    c4 = packed_flat.shape[-1]
    c = c4 // 4
    cout = kern.shape[-1]
    lc = BWD_CHUNK_ROWS
    n_chunks = -(-length // lc)
    pad = n_chunks * lc - length
    # zero-cotangent padding rows contribute nothing to any gradient
    rows_p = jnp.pad(rows, ((0, 0), (0, pad)))
    w4_p = jnp.pad(w4, ((0, 0), (0, pad), (0, 0)))
    ct_p = jnp.pad(ct, ((0, pad), (0, 0)))
    rows_x = rows_p.reshape(taps, n_chunks, lc).transpose(1, 0, 2)
    w4_x = w4_p.reshape(taps, n_chunks, lc, 4).transpose(1, 0, 2, 3)
    ct_x = ct_p.reshape(n_chunks, lc, cout)
    kern_f = kern.astype(jnp.float32)

    def step(carry, xs):
        d_packed, d_kern = carry
        rows_c, w4_c, ct_c = xs
        g = packed_flat[rows_c].reshape(taps, lc, 4, c)
        g_f = g.astype(jnp.float32)
        w4_f = w4_c.astype(jnp.float32)
        ct_f = ct_c.astype(jnp.float32)
        s = jnp.einsum('tljc,tlj->tlc', g_f, w4_f)
        d_s = jnp.einsum('lo,tco->tlc', ct_f, kern_f)
        d_kern = d_kern + jnp.einsum('tlc,lo->tco', s, ct_f)
        d_w4 = jnp.einsum('tljc,tlc->tlj', g_f, d_s)
        d_g = w4_f[..., None] * d_s[:, :, None, :]
        d_packed = d_packed.at[rows_c].add(
            d_g.reshape(taps, lc, c4).astype(d_packed.dtype))
        return (d_packed, d_kern), d_w4

    init = (jnp.zeros_like(packed_flat),
            jnp.zeros(kern.shape, jnp.float32))
    (d_packed, d_kern), d_w4 = jax.lax.scan(
        step, init, (rows_x, w4_x, ct_x))
    d_w4 = d_w4.transpose(1, 0, 2, 3).reshape(taps, n_chunks * lc, 4)
    d_rows = np.zeros(rows.shape, jax.dtypes.float0)  # int input
    return (d_packed, d_rows, d_w4[:, :length].astype(w4.dtype),
            d_kern.astype(kern.dtype))


def _bwd(interpret, res, ct):
    packed_flat, rows, w4, kern = res
    if rows.shape[1] > BWD_CHUNK_ROWS:
        return _bwd_chunked(packed_flat, rows, w4, kern, ct)
    _, vjp = jax.vjp(_ref_contract, packed_flat, rows, w4, kern)
    return vjp(ct)


dcn_gather_contract.defvjp(_fwd, _bwd)


# ------------------------------------------------------- int8 gather table

def quantize_packed_table(packed_flat: jnp.ndarray, kern: jnp.ndarray,
                          eps: float = 1e-8):
    """Per-channel int8 quantization of a ``pack_patches`` table.

    The DCN gather is HBM-bandwidth-bound on the randomly-addressed
    patch rows (round-4 roofline: ~22 ms of a ~30 ms backbone at v1b
    serving geometry); int8 rows halve the gathered bytes IF the gather
    is byte-bound at >=1 KB rows (tools/bench_gather.py decides).
    Dequantization costs nothing at solve time: the per-channel scale is
    folded into the conv kernel, so the contraction kernel only casts.

    Args:
        packed_flat: (R, 4c) float patch-row table.
        kern: (taps, c, cout) conv kernel.

    Returns ``(q_table int8 (R, 4c), kern_scaled (taps, c, cout))`` with
    ``q @ fold(kern) ~= packed @ kern``. Channel scales are shared by the
    4 corner copies of each channel (they hold the same values shifted
    spatially, and the kernel contracts over the c axis only).
    """
    c4 = packed_flat.shape[-1]
    c = c4 // 4
    amax4 = jnp.max(jnp.abs(packed_flat.astype(jnp.float32)), axis=0)
    ch_scale = jnp.maximum(jnp.max(amax4.reshape(4, c), axis=0), eps)
    q = jnp.clip(jnp.round(
        packed_flat.astype(jnp.float32)
        / jnp.tile(ch_scale, 4) * 127.0), -127, 127).astype(jnp.int8)
    kern_scaled = (kern.astype(jnp.float32)
                   * (ch_scale / 127.0)[None, :, None]).astype(kern.dtype)
    return q, kern_scaled


def dcn_gather_contract_q(q_table: jnp.ndarray, rows: jnp.ndarray,
                          w4: jnp.ndarray, kern_scaled: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """Serving-only quantized twin of :func:`dcn_gather_contract`.

    ``q_table``/``kern_scaled`` come from :func:`quantize_packed_table`.
    Forward-only by design (no custom_vjp): the int8 gather path is a
    serving optimization; training paths keep the float table.
    Returns (L, cout) in ``kern_scaled.dtype``.
    """
    g = q_table[rows]
    # unlike the float fused path (auto-selected off-CPU), this path is
    # config-forced — run interpreted on CPU so int8 configs stay usable
    return _contract_pallas(g, w4, kern_scaled,
                            interpret=interpret
                            or jax.default_backend() == 'cpu')
