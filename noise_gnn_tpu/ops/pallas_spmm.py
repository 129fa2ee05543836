"""Pallas TPU kernels for CSR SpMM (segment sum/mean over dst-sorted edges).

The north-star kernel (BASELINE.md): replaces torch-scatter's CUDA
scatter-mean behind the reference's SAGEConv (reference
src/models/layers/sage.py:16-19).

Measured on v5e (see bench.py): XLA's scatter-add path runs a full SpMM at
~22 M edges/s and its row gather at ~74 M rows/s; a per-edge-DMA Pallas
gather is scalar-core bound at <1 M edges/s. The winning split is hybrid:

  * the GATHER stays on XLA (`jnp.take`), emitting messages directly in
    *block-aligned dst order* (each output row-block's edges start at an
    EDGE_CHUNK-aligned offset);
  * the SEGMENT REDUCTION is a Pallas kernel: contiguous [G, F] message
    slabs DMA at full bandwidth and reduce via ``onehot(dst_local).T @ slab``
    one-hot matmuls on the MXU — no scatter anywhere.

Message chunks are double-buffered so the slab DMA of chunk c+1 overlaps the
matmul of chunk c.

Forward only (eval / bench); training mini-batches use the dense-tree path
which has no scatter at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

ROW_BLOCK = 256  # output rows per grid step
EDGE_CHUNK = 1024  # edges per inner iteration (int32 1-D tile size)
LANES = 128
N_BUF = 2  # double buffering of message slabs


def _reduce_kernel(
    # scalar prefetch (rank-1: SMEM pads the last dim to 128 lanes, so a
    # [nblocks, 2] layout would blow the 1 MB SMEM budget)
    base_ref,  # [nblocks] int32 aligned edge base per block
    count_ref,  # [nblocks] int32 edge count per block
    # inputs
    msgs_hbm,  # [E_blk, F] gathered messages in block-aligned dst order (ANY)
    dst_hbm,  # [E_blk] int32 block-aligned dst, -1 padding (ANY)
    deg_ref,  # [R, 1] f32 (VMEM block)
    # output
    out_ref,  # [R, F] f32 (VMEM block)
    # scratch (two statically-addressed buffers: VMEM refs cannot be sliced
    # dynamically on a leading buffer axis)
    msg_a,  # [G, F] message slab A (VMEM)
    msg_b,  # [G, F] message slab B (VMEM)
    dst_a,  # [G] int32 (VMEM, 1-D = exactly one int32 tile)
    dst_b,  # [G] int32 (VMEM)
    acc_ref,  # [R, F] f32 (VMEM)
    sem_a,  # DMA sems (msg, dst) for buffer A
    sem_b,  # DMA sems for buffer B
    *,
    mean: bool,
):
    b = pl.program_id(0)
    r0 = b * out_ref.shape[0]
    base = base_ref[b]
    count = count_ref[b]
    g = msg_a.shape[0]
    nchunks = pl.cdiv(count, g)

    acc_ref[:] = jnp.zeros_like(acc_ref)

    bufs = ((msg_a, dst_a, sem_a), (msg_b, dst_b, sem_b))

    def start_chunk(c, buf):
        msg_ref, dst_ref, sem = buf
        off = pl.multiple_of(base + c * g, EDGE_CHUNK)
        pltpu.make_async_copy(
            msgs_hbm.at[pl.ds(off, g), :], msg_ref, sem.at[0]
        ).start()
        pltpu.make_async_copy(dst_hbm.at[pl.ds(off, g)], dst_ref, sem.at[1]).start()

    def wait_and_accumulate(c, buf):
        msg_ref, dst_ref, sem = buf
        off = pl.multiple_of(base + c * g, EDGE_CHUNK)
        pltpu.make_async_copy(msgs_hbm.at[pl.ds(off, g), :], msg_ref, sem.at[0]).wait()
        pltpu.make_async_copy(dst_hbm.at[pl.ds(off, g)], dst_ref, sem.at[1]).wait()
        # segment reduction as one-hot matmul on the MXU (padding dst = -1
        # matches no local row, so no count mask is needed)
        dst_local = dst_ref[:].reshape(g, 1) - r0
        ri = jax.lax.broadcasted_iota(jnp.int32, (g, acc_ref.shape[0]), 1)
        slab = msg_ref[:]
        onehot = (dst_local == ri).astype(slab.dtype)
        acc_ref[:] += jax.lax.dot_general(
            onehot,
            slab,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.HIGHEST
                if slab.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT
            ),
        )

    @pl.when(nchunks > 0)
    def _():
        start_chunk(0, bufs[0])

    def chunk_body(c, _):
        parity = jax.lax.rem(c, 2)

        @pl.when((c + 1 < nchunks) & (parity == 0))
        def _():
            start_chunk(c + 1, bufs[1])

        @pl.when((c + 1 < nchunks) & (parity == 1))
        def _():
            start_chunk(c + 1, bufs[0])

        @pl.when(parity == 0)
        def _():
            wait_and_accumulate(c, bufs[0])

        @pl.when(parity == 1)
        def _():
            wait_and_accumulate(c, bufs[1])

        return 0

    jax.lax.fori_loop(0, nchunks, chunk_body, 0)

    result = acc_ref[:]
    if mean:
        result = result / jnp.maximum(deg_ref[:], 1.0)
    out_ref[:] = result


@functools.partial(
    jax.jit, static_argnames=("num_nodes", "feat", "mean", "interpret")
)
def _spmm_call(
    x: Array,
    src_blk: Array,
    dst_blk: Array,
    bases: Array,
    counts: Array,
    deg: Array,
    *,
    num_nodes: int,
    feat: int,
    mean: bool,
    interpret: bool = False,
):
    nblocks = bases.shape[0]
    n_pad = nblocks * ROW_BLOCK
    # XLA gather into block-aligned dst order (padding src=0 rows are
    # gathered but never matched by the -1 padding dst)
    msgs = jnp.take(x, src_blk, axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # msgs
            pl.BlockSpec(memory_space=pl.ANY),  # dst
            pl.BlockSpec((ROW_BLOCK, 1), lambda b, *_: (b, 0)),
        ],
        out_specs=pl.BlockSpec((ROW_BLOCK, feat), lambda b, *_: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((EDGE_CHUNK, feat), x.dtype),
            pltpu.VMEM((EDGE_CHUNK, feat), x.dtype),
            pltpu.VMEM((EDGE_CHUNK,), jnp.int32),
            pltpu.VMEM((EDGE_CHUNK,), jnp.int32),
            pltpu.VMEM((ROW_BLOCK, feat), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_reduce_kernel, mean=mean),
        out_shape=jax.ShapeDtypeStruct((n_pad, feat), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(bases, counts, msgs, dst_blk, deg)
    return out[:num_nodes]


def blocked_edges_from_csr(indptr: np.ndarray, indices: np.ndarray):
    """Re-pack dst-sorted CSR edges into block-aligned storage.

    Each ROW_BLOCK's edge range starts at an EDGE_CHUNK-aligned offset;
    padding slots get src=0, dst=-1. Returns (src_blk, dst_blk,
    block_off [nblocks, 2] = (aligned base, count)).
    """
    n = indptr.shape[0] - 1
    nblocks = max(-(-n // ROW_BLOCK), 1)
    row_starts = indptr[np.minimum(np.arange(nblocks) * ROW_BLOCK, n)]
    row_ends = indptr[np.minimum((np.arange(nblocks) + 1) * ROW_BLOCK, n)]
    counts = (row_ends - row_starts).astype(np.int64)
    alloc = -(-counts // EDGE_CHUNK) * EDGE_CHUNK
    bases = np.zeros(nblocks, np.int64)
    np.cumsum(alloc[:-1], out=bases[1:])
    total = max(int(alloc.sum()), EDGE_CHUNK)
    src_blk = np.zeros(total, np.int32)
    dst_blk = np.full(total, -1, np.int32)
    dst_global = np.repeat(
        np.arange(n, dtype=np.int32), np.diff(indptr).astype(np.int64)
    )
    # vectorized re-pack: destination slot of edge k (in block b) is
    # bases[b] + (k - row_starts[b])
    edge_block = np.repeat(np.arange(nblocks), counts)
    k = np.arange(int(indptr[-1]), dtype=np.int64)
    slots = bases[edge_block] + (k - row_starts[edge_block])
    src_blk[slots] = indices
    dst_blk[slots] = dst_global
    block_off = np.stack([bases, counts], axis=1).astype(np.int32)
    return src_blk, dst_blk, block_off


class PallasSpmm:
    """Pre-packed SpMM operator for a fixed graph (pack once, apply often).

    Large graphs are processed in super-groups of row blocks so the gathered
    message buffer stays under ``edge_budget`` edges per launch (~2 GB at
    F=256 bf16); every group is padded to identical shapes, so all launches
    share one compiled executable."""

    def __init__(self, indptr, indices, num_nodes: int,
                 edge_budget: int = 4 << 20):
        from .. import native

        indptr = np.asarray(indptr, np.int64)
        indices = np.asarray(indices, np.int32)
        self.num_nodes = int(num_nodes)
        packed = native.pack_blocked(indptr, indices, self.num_nodes,
                                     ROW_BLOCK, EDGE_CHUNK)
        if packed is not None:
            src_blk, dst_blk, p_bases, p_counts = packed
            block_off = np.stack([p_bases, p_counts], axis=1).astype(np.int64)
        else:
            src_blk, dst_blk, block_off = blocked_edges_from_csr(indptr, indices)
        nblocks = block_off.shape[0]
        deg = (indptr[1:] - indptr[:-1]).astype(np.float32)
        deg = np.pad(deg, (0, nblocks * ROW_BLOCK - self.num_nodes))[:, None]

        alloc = -(-block_off[:, 1].astype(np.int64) // EDGE_CHUNK) * EDGE_CHUNK
        self._groups = []
        self._budget = int(edge_budget)
        b0 = 0
        while b0 < nblocks:
            b1, edges = b0, 0
            while b1 < nblocks and (edges + alloc[b1] <= self._budget or b1 == b0):
                edges += int(alloc[b1])
                b1 += 1
            self._groups.append((b0, b1, int(block_off[b0, 0]), int(edges)))
            b0 = b1
        # pad all groups to the same (nblocks, edges) so one executable serves
        self._g_nblocks = max(b1 - b0 for b0, b1, _, _ in self._groups)
        self._g_edges = max(e for _, _, _, e in self._groups)

        self._parts = []
        for b0, b1, e0, e_len in self._groups:
            nb = b1 - b0
            bases = block_off[b0:b1, 0].astype(np.int64) - e0
            counts = block_off[b0:b1, 1].astype(np.int32)
            bases = np.pad(bases, (0, self._g_nblocks - nb))
            counts = np.pad(counts, (0, self._g_nblocks - nb))
            src_g = np.zeros(self._g_edges, np.int32)
            dst_g = np.full(self._g_edges, -1, np.int32)
            src_g[:e_len] = src_blk[e0 : e0 + e_len]
            dst_g[:e_len] = dst_blk[e0 : e0 + e_len] - b0 * ROW_BLOCK
            deg_g = deg[b0 * ROW_BLOCK : b0 * ROW_BLOCK + self._g_nblocks * ROW_BLOCK]
            deg_g = np.pad(deg_g, ((0, self._g_nblocks * ROW_BLOCK - deg_g.shape[0]), (0, 0)))
            self._parts.append(
                (
                    jnp.asarray(src_g),
                    jnp.asarray(dst_g),
                    jnp.asarray(bases.astype(np.int32)),
                    jnp.asarray(counts),
                    jnp.asarray(deg_g),
                )
            )

    def __call__(self, x: Array, mean: bool = True, interpret: bool = False) -> Array:
        n, f = x.shape
        assert n == self.num_nodes and f % LANES == 0
        outs = []
        for (b0, b1, _, _), (src_g, dst_g, bases, counts, deg_g) in zip(
            self._groups, self._parts
        ):
            rows = min(b1 * ROW_BLOCK, self.num_nodes) - b0 * ROW_BLOCK
            out = _spmm_call(
                x, src_g, dst_g, bases, counts, deg_g,
                num_nodes=self._g_nblocks * ROW_BLOCK, feat=f, mean=mean,
                interpret=interpret,
            )
            outs.append(out[:rows])
        return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def pack_blocked_device(
    indptr_np: np.ndarray, indices_dev: Array, num_nodes: int
):
    """Build the block-aligned edge layout ON DEVICE from an
    already-resident CSR (avoids re-uploading hundreds of MB through slow
    host->device links; only the [nblocks] bases/counts go up).

    Returns (src_blk, dst_blk, bases i32, counts i32, deg [n_pad,1] f32) —
    the same arrays ``blocked_edges_from_csr`` would produce.
    """
    n = int(num_nodes)
    e = int(indptr_np[-1])
    nblocks = max(-(-n // ROW_BLOCK), 1)
    row_starts = indptr_np[np.minimum(np.arange(nblocks) * ROW_BLOCK, n)]
    row_ends = indptr_np[np.minimum((np.arange(nblocks) + 1) * ROW_BLOCK, n)]
    counts = (row_ends - row_starts).astype(np.int64)
    alloc = -(-counts // EDGE_CHUNK) * EDGE_CHUNK
    bases = np.zeros(nblocks, np.int64)
    np.cumsum(alloc[:-1], out=bases[1:])
    total = max(int(alloc.sum()), EDGE_CHUNK)

    # int32 everywhere: edge counts stay under 2^31 (products: 1.2e8)
    indptr_dev = jnp.asarray(indptr_np.astype(np.int32))
    bases_dev = jnp.asarray(bases.astype(np.int32))
    starts_dev = jnp.asarray(row_starts.astype(np.int32))

    # per-edge dst from CSR: dst[k] = row r with indptr[r] <= k < indptr[r+1]
    k = jnp.arange(e, dtype=jnp.int32)
    dst = (jnp.searchsorted(indptr_dev, k, side="right") - 1).astype(jnp.int32)
    blk = dst // ROW_BLOCK
    slots = jnp.take(bases_dev, blk) + (k - jnp.take(starts_dev, blk))
    src_blk = jnp.zeros(total, jnp.int32).at[slots].set(indices_dev.astype(jnp.int32))
    dst_blk = jnp.full(total, -1, jnp.int32).at[slots].set(dst)

    deg = (indptr_np[1:] - indptr_np[:-1]).astype(np.float32)
    deg = np.pad(deg, (0, nblocks * ROW_BLOCK - n))[:, None]
    return (
        src_blk,
        dst_blk,
        bases.astype(np.int32),
        counts.astype(np.int32),
        deg,
    )


class PallasSpmmDevice:
    """Like :class:`PallasSpmm` but packs on device from a resident CSR."""

    def __init__(self, indptr_np: np.ndarray, indices_dev: Array,
                 num_nodes: int, edge_budget: int = 4 << 20):
        self.num_nodes = int(num_nodes)
        src_blk, dst_blk, bases, counts, deg = pack_blocked_device(
            np.asarray(indptr_np, np.int64), indices_dev, num_nodes
        )
        nblocks = bases.shape[0]
        alloc = -(-counts.astype(np.int64) // EDGE_CHUNK) * EDGE_CHUNK
        self._groups = []
        b0 = 0
        while b0 < nblocks:
            b1, edges = b0, 0
            while b1 < nblocks and (edges + alloc[b1] <= edge_budget or b1 == b0):
                edges += int(alloc[b1])
                b1 += 1
            self._groups.append((b0, b1, int(bases[b0]), int(edges)))
            b0 = b1
        self._g_nblocks = max(b1 - b0 for b0, b1, _, _ in self._groups)
        self._g_edges = max(e for _, _, _, e in self._groups)

        self._parts = []
        for b0, b1, e0, e_len in self._groups:
            nb = b1 - b0
            g_bases = np.pad(bases[b0:b1].astype(np.int64) - e0,
                             (0, self._g_nblocks - nb))
            g_counts = np.pad(counts[b0:b1], (0, self._g_nblocks - nb))
            # device-side slice + pad (no host round-trip of edge data)
            src_g = jax.lax.dynamic_slice_in_dim(
                jnp.pad(src_blk, (0, self._g_edges)), e0, self._g_edges
            )
            dst_g = jax.lax.dynamic_slice_in_dim(
                jnp.pad(dst_blk, (0, self._g_edges), constant_values=-1),
                e0, self._g_edges,
            )
            # mask out edges beyond this group's real extent
            idx = jnp.arange(self._g_edges)
            dst_g = jnp.where(idx < e_len, dst_g - b0 * ROW_BLOCK, -1)
            deg_g = deg[b0 * ROW_BLOCK : b0 * ROW_BLOCK + self._g_nblocks * ROW_BLOCK]
            deg_g = np.pad(deg_g, ((0, self._g_nblocks * ROW_BLOCK - deg_g.shape[0]), (0, 0)))
            self._parts.append(
                (src_g, dst_g, jnp.asarray(g_bases.astype(np.int32)),
                 jnp.asarray(g_counts), jnp.asarray(deg_g))
            )

    __call__ = PallasSpmm.__call__


def csr_spmm(
    x: Array,
    indptr,
    indices,
    num_nodes: int,
    mean: bool = True,
    interpret: bool = False,
) -> Array:
    """One-shot convenience wrapper around :class:`PallasSpmm`."""
    return PallasSpmm(indptr, indices, num_nodes)(x, mean=mean, interpret=interpret)
