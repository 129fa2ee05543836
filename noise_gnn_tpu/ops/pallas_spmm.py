"""Pallas TPU kernels for CSR SpMM (segment sum/mean over dst-sorted edges).

The north-star kernel (BASELINE.md): replaces torch-scatter's CUDA
scatter-mean behind the reference's SAGEConv (reference
src/models/layers/sage.py:16-19).

Measured on v5e (see bench.py): XLA's scatter-add path runs a full SpMM at
~22 M edges/s, its row gather at ~150 M rows/s in stream, and a per-edge-DMA
Pallas gather is scalar-core bound at <1 M edges/s. The winning split is
hybrid:

  * the GATHER stays on XLA (`jnp.take`), emitting messages in COMPACT
    dst-sorted CSR order (the gather is per-index bound, so block-alignment
    padding — ~EDGE_CHUNK/2 slots per row block — was pure cost; chunks
    that straddle a block boundary are visited by both blocks' schedule
    entries and the one-hot masks the other block's edges);
  * the SEGMENT REDUCTION is a chunk-major Pallas kernel: the grid walks
    EDGE_CHUNK message slabs (auto-pipelined [G, F] DMAs), reduces each via
    a pre-transposed ``onehot @ slab`` matmul on the MXU, accumulates blocks
    in a two-deep VMEM scratch ring, and flushes finished blocks to HBM with
    explicit DMAs overlapped against the next block — scatter never appears,
    and the output block never round-trips through HBM mid-reduction.

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
EDGE_CHUNK = 2048  # edges per grid step (measured best on v5e)
LANES = 128
# XLA's TPU gather emits a ~2x slower loop when the index count is divisible
# by 1024 (measured on v5e: 79 vs 147 M idx/s). Group storage is a multiple
# of EDGE_CHUNK, so pad every gather by 512 dummy indices to stay off that
# path; the reduce kernel's chunk maps never address the tail.
GATHER_PAD = 512


@functools.partial(
    jax.jit,
    static_argnames=("num_nodes", "ring_blocks", "feat", "mean", "interpret",
                     "out_dtype"),
    donate_argnames=("out_prev",),
)
def _spmm_call(
    x: Array,
    src_blk: Array,
    dst_blk: Array,
    deginv: Array,
    base: Array,
    blk: Array,
    ch: Array,
    first: Array,
    last: Array,
    act: Array,
    out_prev: Array,
    *,
    num_nodes: int,
    ring_blocks: int,
    feat: int,
    mean: bool,
    interpret: bool = False,
    out_dtype=jnp.float32,
):
    # XLA gather in compact dst-sorted order (padding src=0 rows are
    # gathered but never matched by the -1 padding dst)
    msgs = jnp.take(x, src_blk, axis=0)
    return _spmm_call_pregathered(
        msgs, dst_blk, deginv, base, blk, ch, first, last, act, out_prev,
        num_nodes=num_nodes, ring_blocks=ring_blocks, feat=feat, mean=mean,
        interpret=interpret, out_dtype=out_dtype,
    )


def _chunk_maps(bases, counts, g_edges: int, g_nblocks: int):
    """Chunk-major schedule for the grid-pipelined reduce kernel, over
    COMPACT (unaligned) edge storage.

    Edge storage is plain dst-sorted CSR order with no per-block alignment:
    the gather is per-INDEX bound, so alignment padding (~EDGE_CHUNK/2 slots
    per block) was pure cost. Block b's edges live at [bases[b],
    bases[b]+counts[b]); the schedule visits every chunk that range touches.
    A chunk straddling a block boundary appears in BOTH blocks' schedules —
    consecutive grid steps, so the pipeline doesn't re-fetch the slab — and
    the one-hot (which matches dst against the block's own rows) masks the
    other block's edges. This also requires the mean divide to use the
    pack-time degree rather than in-kernel one-hot counting.

    One entry per (block, chunk) visit, in block order:
      blk[c]   output row-block of schedule entry c
      ch[c]    chunk index into the edge arrays
      first[c] 1 on a block's first chunk (kernel initializes the block)
      last[c]  1 on a block's last chunk (kernel applies the mean divide)

    Empty blocks get one dummy chunk (clamped into range): its dst values
    lie outside the block's rows, so the block comes out zero.
    """
    bases = np.asarray(bases, np.int64)
    counts = np.asarray(counts, np.int64)
    ends = bases + counts
    cmax = max(g_edges // EDGE_CHUNK - 1, 0)
    c0 = np.minimum(bases // EDGE_CHUNK, cmax)
    c1 = np.minimum(np.maximum(-(-ends // EDGE_CHUNK) - 1, c0), cmax)
    nchunks = c1 - c0 + 1
    blk = np.repeat(np.arange(g_nblocks, dtype=np.int64), nchunks)
    cum = np.cumsum(nchunks)
    within = np.arange(int(cum[-1]), dtype=np.int64) - (cum - nchunks)[blk]
    first = within == 0
    last = within == nchunks[blk] - 1
    return (
        blk.astype(np.int32),
        (c0[blk] + within).astype(np.int32),
        first.astype(np.int32),
        last.astype(np.int32),
        np.ones(blk.shape[0], np.int32),  # act: real schedule entry
    )


def _pad_chunk_maps(maps, c_pad: int, g_nblocks: int):
    """Pad a group's chunk maps to a common length with INACTIVE chunks
    (act=0): they re-read chunk 0 but touch no accumulator, so the trailing
    grid steps only serve as the drain point for in-flight flush DMAs."""
    blk, ch, first, last, act = maps
    extra = c_pad - blk.shape[0]
    if extra <= 0:
        return maps
    return (
        np.concatenate([blk, np.full(extra, g_nblocks - 1, np.int32)]),
        np.concatenate([ch, np.zeros(extra, np.int32)]),
        np.concatenate([first, np.zeros(extra, np.int32)]),
        np.concatenate([last, np.zeros(extra, np.int32)]),
        np.concatenate([act, np.zeros(extra, np.int32)]),
    )


def _reduce_kernel_chunked(
    # scalar prefetch
    base_ref,  # [1] int32 this group's first GLOBAL block: flushes land at
    #          (base + blk) * R in the shared output, so all super-groups
    #          write one buffer and the per-group output concat disappears
    blk_ref,  # [C] int32 output block per chunk (GROUP-LOCAL)
    ch_ref,  # [C] int32 edge-chunk index per chunk (used by index maps)
    first_ref,  # [C] int32 1 on a block's first chunk
    last_ref,  # [C] int32 1 on a block's last chunk
    act_ref,  # [C] int32 0 on grid-padding chunks
    # inputs (msgs/dst/deginv auto-pipelined VMEM blocks)
    msgs_ref,  # [G, F] gathered messages of this chunk
    dst_ref,  # [G] int32 dst of this chunk (-1 padding)
    deginv_ref,  # [R, 1] f32 1/max(in-degree, 1) of this chunk's block
    out_in_ref,  # [n_pad, F] aliased to out_hbm (prior groups' rows)
    # output (HBM; written by explicit flush DMAs)
    out_hbm,  # [n_pad, F] f32 or bf16
    # scratch: block accumulators ring (parity of the block index), so the
    # flush DMA of block b overlaps the accumulation of block b+1
    acc_a,  # [R, F] f32
    acc_b,  # [R, F] f32
    cast_a,  # [R, F] out-dtype flush staging (accumulation stays f32; a
    cast_b,  # bf16 output halves the flush-DMA + downstream concat traffic)
    sem_a,  # flush DMA semaphores
    sem_b,
    *,
    mean: bool,
    nblocks: int,
):
    del out_in_ref  # same buffer as out_hbm (input_output_aliases)
    c = pl.program_id(0)
    ctot = pl.num_programs(0)
    b = blk_ref[c]
    base = base_ref[0]
    r = acc_a.shape[0]
    g = dst_ref.shape[0]
    dst_local = dst_ref[:].reshape(1, g) - b * r
    ri = jax.lax.broadcasted_iota(jnp.int32, (r, g), 0)
    slab = msgs_ref[:]
    # segment reduction as a one-hot matmul on the MXU, one-hot built
    # pre-transposed [R, G] (out-of-block and padding dst match no row, so
    # no masking is needed; in-degree falls out as the one-hot row sum)
    onehot_t = (dst_local == ri).astype(slab.dtype)
    contrib = jax.lax.dot_general(
        onehot_t,
        slab,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(
            jax.lax.Precision.HIGHEST
            if slab.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
    )

    cast_out = out_hbm.dtype != jnp.float32

    def flush(acc, cast, sem, blk_i):
        src = cast if cast_out else acc
        return pltpu.make_async_copy(
            src, out_hbm.at[pl.ds((base + blk_i) * r, r), :], sem
        )

    for par, (acc, cast, sem) in enumerate(
        ((acc_a, cast_a, sem_a), (acc_b, cast_b, sem_b))
    ):
        @pl.when((act_ref[c] == 1) & (jax.lax.rem(b, 2) == par))
        def _(acc=acc, cast=cast, sem=sem):
            @pl.when(first_ref[c] == 1)
            def _():
                # this parity's previous flush (block b-2) must finish
                # before its accumulator is overwritten
                if nblocks > 2:
                    @pl.when(b >= 2)
                    def _():
                        flush(acc, cast, sem, b - 2).wait()
                acc[:] = contrib

            @pl.when(first_ref[c] == 0)
            def _():
                acc[:] += contrib

            @pl.when(last_ref[c] == 1)
            def _():
                # mean divide uses the PACK-TIME degree (the one-hot matches
                # exactly a row's in-degree edges, all within this block), so
                # no per-chunk count reduction is ever computed
                if mean:
                    acc[:] = acc[:] * deginv_ref[:]
                if cast_out:
                    cast[:] = acc[:].astype(out_hbm.dtype)
                flush(acc, cast, sem, b).start()

    # drain: the final grid step is always an inactive padding chunk (the
    # schedule is padded by at least one), so every flush has been started
    @pl.when(c == ctot - 1)
    def _():
        flush(acc_a, cast_a, sem_a, 0).wait()
        if nblocks >= 2:
            flush(acc_b, cast_b, sem_b, 0).wait()


@functools.partial(
    jax.jit,
    static_argnames=("num_nodes", "ring_blocks", "feat", "mean", "interpret",
                     "out_dtype"),
    donate_argnames=("out_prev",),
)
def _spmm_call_pregathered(
    msgs: Array,
    dst_blk: Array,
    deginv: Array,
    base: Array,
    blk: Array,
    ch: Array,
    first: Array,
    last: Array,
    act: Array,
    out_prev: Array,
    *,
    num_nodes: int,
    ring_blocks: int,
    feat: int,
    mean: bool,
    interpret: bool = False,
    out_dtype=jnp.float32,
):
    """Grid-pipelined segment reduction over pre-gathered messages.

    The grid is chunk-major: Pallas's automatic pipeline double-buffers each
    chunk's [G, F] message slab DMA behind the previous chunk's one-hot
    matmul. Blocks accumulate in a two-deep VMEM scratch ring and flush to
    the HBM output with explicit DMAs that overlap the next block's work —
    a BlockSpec-revisited output would round-trip the 256 KB block through
    HBM on every chunk. Replaces a manual-DMA fori_loop kernel that was
    ~10x off this schedule (15.4 us vs ~1.5 us per chunk on v5e).

    ``out_prev`` is ALIASED to the output: every super-group's flush DMAs
    write its global rows (``(base + blk) * ROW_BLOCK``) of one shared
    [n_pad, F] buffer, replacing the per-group outputs + final concat
    (measured ~25 ms of pure copy at products scale — 16x off the copy
    roofline — now zero). A group's shape-padding blocks flush zeros into
    the NEXT group's range; group calls are chained through the aliased
    buffer, so the later group's real rows land on top."""
    n_pad = num_nodes
    out_dtype = jnp.dtype(out_dtype)
    assert out_prev.shape == (n_pad, feat) and out_prev.dtype == out_dtype
    # flush staging only needed when casting; keep a minimal buffer otherwise
    cast_shape = (ROW_BLOCK, feat) if out_dtype != jnp.float32 else (8, LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(blk.shape[0],),
        in_specs=[
            pl.BlockSpec(
                (EDGE_CHUNK, feat),
                lambda c, ba, blk, ch, fi, la, ac: (ch[c], 0),
            ),
            pl.BlockSpec(
                (EDGE_CHUNK,), lambda c, ba, blk, ch, fi, la, ac: (ch[c],)
            ),
            pl.BlockSpec(
                (ROW_BLOCK, 1), lambda c, ba, blk, ch, fi, la, ac: (blk[c], 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # aliased shared output
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((ROW_BLOCK, feat), jnp.float32),
            pltpu.VMEM((ROW_BLOCK, feat), jnp.float32),
            pltpu.VMEM(cast_shape, out_dtype),
            pltpu.VMEM(cast_shape, out_dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _reduce_kernel_chunked, mean=mean, nblocks=ring_blocks
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, feat), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        # operand order: 6 scalar-prefetch + msgs, dst, deginv, out_prev(=9)
        input_output_aliases={9: 0},
    )(base, blk, ch, first, last, act, msgs, dst_blk, deginv, out_prev)
    return out


def _check_group_order(groups):
    """Shared-output correctness is ORDER-DEPENDENT: a group's shape-padding
    blocks flush zeros into the NEXT group's real rows, and the chained
    aliased-buffer calls rely on the later group's flushes landing on top.
    Enforce the invariant (strictly increasing first-block bases) instead of
    only documenting it, so a refactor that reorders the parts fails loudly
    rather than corrupting output."""
    bases = [b0 for b0, _, _, _ in groups]
    if any(a >= b for a, b in zip(bases, bases[1:])):
        raise AssertionError(
            f"SpMM super-groups must be in strictly increasing block order "
            f"(got first-block sequence {bases}); the aliased shared output "
            f"depends on sequential chaining"
        )


def _make_groups(alloc: np.ndarray, bases: np.ndarray, budget: int):
    """Split row blocks into super-groups of ~equal edge storage.

    All groups are padded to the largest group's shape so one compiled
    executable serves them — so the split places boundaries at even
    cumulative quotas instead of filling ``budget`` greedily (which leaves
    a near-empty final group padded up to ``budget``: 2x wasted gather
    work when the graph's storage is just over the budget). Every group
    lands within one block-alloc of ``total/ngroups``."""
    nblocks = alloc.shape[0]
    total = int(alloc.sum())
    ngroups = max(1, -(-total // int(budget)))
    cum = np.cumsum(alloc)
    groups = []
    b0 = 0
    for i in range(ngroups):
        if b0 >= nblocks:
            break
        quota = total * (i + 1) // ngroups
        # advance to the first block whose cumulative storage meets the
        # quota (last group always takes the rest)
        b1 = nblocks if i == ngroups - 1 else int(
            np.searchsorted(cum, quota, side="left") + 1
        )
        b1 = max(b1, b0 + 1)
        edges = int(cum[b1 - 1]) - (int(cum[b0 - 1]) if b0 else 0)
        groups.append((b0, b1, int(bases[b0]), edges))
        b0 = b1
    return groups


def block_edge_ranges(indptr: np.ndarray, num_nodes: int):
    """Per-ROW_BLOCK edge ranges of a dst-sorted CSR: (starts, counts),
    where block b's edges are CSR slots [starts[b], starts[b]+counts[b])."""
    n = int(num_nodes)
    nblocks = max(-(-n // ROW_BLOCK), 1)
    bounds = indptr[np.minimum(np.arange(nblocks + 1) * ROW_BLOCK, n)]
    return bounds[:-1].astype(np.int64), np.diff(bounds).astype(np.int64)


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
        blk_start, blk_count = block_edge_ranges(indptr, self.num_nodes)

        self._budget = int(edge_budget)
        self._groups = _make_groups(blk_count, blk_start, self._budget)
        _check_group_order(self._groups)
        # pad all groups to the same (nblocks, edges) so one executable serves
        self._g_nblocks = max(b1 - b0 for b0, b1, _, _ in self._groups)
        self._g_edges = max(
            -(-max(e for _, _, _, e in self._groups) // EDGE_CHUNK), 1
        ) * EDGE_CHUNK

        # compact storage is plain CSR order; only dst (row per edge) is
        # materialized — in C++ when available (products: 123 M edges)
        dst_global = native.expand_rows(indptr, self.num_nodes)
        if dst_global is None:
            dst_global = np.repeat(
                np.arange(self.num_nodes, dtype=np.int32),
                np.diff(indptr).astype(np.int64),
            )
        # pack-time inverse in-degree: the mean divide must not count
        # one-hot matches in-kernel (boundary chunks see a block's edges
        # split across two schedule entries)
        deginv = 1.0 / np.maximum(
            np.diff(indptr).astype(np.float32), 1.0
        )
        raw = []
        for b0, b1, e0, e_len in self._groups:
            nb = b1 - b0
            bases = np.pad(blk_start[b0:b1] - e0,
                           (0, self._g_nblocks - nb), constant_values=e_len)
            counts = np.pad(blk_count[b0:b1], (0, self._g_nblocks - nb))
            src_g = np.zeros(self._g_edges + GATHER_PAD, np.int32)
            dst_g = np.full(self._g_edges, -1, np.int32)
            src_g[:e_len] = indices[e0 : e0 + e_len]
            dst_g[:e_len] = dst_global[e0 : e0 + e_len] - b0 * ROW_BLOCK
            dg = np.ones(self._g_nblocks * ROW_BLOCK, np.float32)
            take = deginv[b0 * ROW_BLOCK : (b0 + self._g_nblocks) * ROW_BLOCK]
            dg[: take.shape[0]] = take
            maps = _chunk_maps(bases, counts, self._g_edges, self._g_nblocks)
            raw.append((src_g, dst_g, dg[:, None], b0, maps))

        # shared-output extent: every group flushes its g_nblocks blocks
        # (shape padding included) at global offsets, so the buffer must
        # reach past the LAST group's padding blocks
        self._n_pad = (self._groups[-1][0] + self._g_nblocks) * ROW_BLOCK
        # +1 guarantees a trailing inactive chunk = the kernel's DMA drain
        c_pad = max(m[4][0].shape[0] for m in raw) + 1
        self._parts = [
            (
                jnp.asarray(src_g),
                jnp.asarray(dst_g),
                jnp.asarray(dg),
                jnp.asarray([b0], jnp.int32),
                tuple(jnp.asarray(a) for a in
                      _pad_chunk_maps(maps, c_pad, self._g_nblocks)),
            )
            for src_g, dst_g, dg, b0, maps in raw
        ]

    def __call__(self, x: Array, mean: bool = True, interpret: bool = False,
                 out_dtype=jnp.float32) -> Array:
        n, f = x.shape
        assert n == self.num_nodes and f % LANES == 0
        out = jnp.zeros((self._n_pad, f), jnp.dtype(out_dtype))
        for src_g, dst_g, dgi, base, maps in self._parts:
            # out is DONATED through each jitted group call: all groups'
            # flush DMAs write one shared buffer, no per-group concat
            out = _spmm_call(
                x, src_g, dst_g, dgi, base, *maps, out,
                num_nodes=self._n_pad, ring_blocks=self._g_nblocks, feat=f,
                mean=mean, interpret=interpret, out_dtype=out_dtype,
            )
        return out[: self.num_nodes]

    def _traced(self, x: Array, parts, mean: bool, interpret: bool,
                out_dtype=jnp.float32) -> Array:
        """All super-groups inside one trace: gathers and reduce kernels
        compile into ONE executable — no per-group host dispatch (measured
        ~3 ms/launch through a dev tunnel) and no intermediate device
        round-trips. Group calls chain through one input_output_aliased
        output buffer (each kernel flushes its global rows), so the former
        per-group outputs + concat (~25 ms of pure copy at products scale)
        are gone. ``out_dtype=bfloat16`` casts at the flush DMA
        (accumulation stays f32), halving flush traffic for consumers that
        run in bf16 anyway (eval/inference.py)."""
        f = x.shape[-1]
        out = jnp.zeros((self._n_pad, f), jnp.dtype(out_dtype))
        for src_g, dst_g, dgi, base, maps in parts:
            msgs = jnp.take(x, src_g, axis=0)
            out = _spmm_call_pregathered(
                msgs, dst_g, dgi, base, *maps, out,
                num_nodes=self._n_pad, ring_blocks=self._g_nblocks, feat=f,
                mean=mean, interpret=interpret, out_dtype=out_dtype,
            )
        return out[: self.num_nodes]

    def apply(self, x: Array, mean: bool = True, interpret: bool = False,
              out_dtype=jnp.float32) -> Array:
        """Single-dispatch whole-op application (one jit over all groups).

        Group edge/schedule arrays travel as ARGUMENTS, not closed-over
        constants (closures over large device arrays serialize into the
        remote-compile payload and fail)."""
        n, f = x.shape
        assert n == self.num_nodes and f % LANES == 0
        key = (f, x.dtype, mean, interpret, jnp.dtype(out_dtype))
        if getattr(self, "_jfn_key", None) != key:
            self._jfn = jax.jit(
                functools.partial(self._traced, mean=mean, interpret=interpret,
                                  out_dtype=out_dtype)
            )
            self._jfn_key = key
        return self._jfn(x, self._parts)


def expand_rows_device(indptr_np: np.ndarray, num_edges: int) -> Array:
    """Per-edge dst row of a CSR, computed ON DEVICE (avoids shipping an
    [e] array through slow host->device links; only indptr goes up):
    dst[k] = row r with indptr[r] <= k < indptr[r+1]."""
    indptr_dev = jnp.asarray(indptr_np.astype(np.int32))
    k = jnp.arange(int(num_edges), dtype=jnp.int32)
    return (jnp.searchsorted(indptr_dev, k, side="right") - 1).astype(jnp.int32)


class PallasSpmmDevice:
    """Like :class:`PallasSpmm` but packs on device from a resident CSR."""

    def __init__(self, indptr_np: np.ndarray, indices_dev: Array,
                 num_nodes: int, edge_budget: int = 4 << 20):
        self.num_nodes = int(num_nodes)
        indptr_np = np.asarray(indptr_np, np.int64)
        num_edges = int(indptr_np[-1])
        blk_start, blk_count = block_edge_ranges(indptr_np, self.num_nodes)
        dst_all = expand_rows_device(indptr_np, num_edges)
        src_all = indices_dev.astype(jnp.int32)

        self._groups = _make_groups(blk_count, blk_start, int(edge_budget))
        _check_group_order(self._groups)
        self._g_nblocks = max(b1 - b0 for b0, b1, _, _ in self._groups)
        self._g_edges = max(
            -(-max(e for _, _, _, e in self._groups) // EDGE_CHUNK), 1
        ) * EDGE_CHUNK

        deginv = 1.0 / np.maximum(
            np.diff(indptr_np).astype(np.float32), 1.0
        )
        raw = []
        for b0, b1, e0, e_len in self._groups:
            nb = b1 - b0
            g_bases = np.pad(blk_start[b0:b1] - e0,
                             (0, self._g_nblocks - nb), constant_values=e_len)
            g_counts = np.pad(blk_count[b0:b1], (0, self._g_nblocks - nb))
            dg = np.ones(self._g_nblocks * ROW_BLOCK, np.float32)
            take = deginv[b0 * ROW_BLOCK : (b0 + self._g_nblocks) * ROW_BLOCK]
            dg[: take.shape[0]] = take
            # device-side slice + pad (no host round-trip of edge data)
            src_g = jnp.pad(
                jax.lax.dynamic_slice_in_dim(
                    jnp.pad(src_all, (0, self._g_edges)), e0, self._g_edges
                ),
                (0, GATHER_PAD),
            )
            dst_g = jax.lax.dynamic_slice_in_dim(
                jnp.pad(dst_all, (0, self._g_edges), constant_values=-1),
                e0, self._g_edges,
            )
            # mask out edges beyond this group's real extent
            idx = jnp.arange(self._g_edges)
            dst_g = jnp.where(idx < e_len, dst_g - b0 * ROW_BLOCK, -1)
            maps = _chunk_maps(g_bases, g_counts, self._g_edges, self._g_nblocks)
            raw.append((src_g, dst_g, dg[:, None], b0, maps))

        self._n_pad = (self._groups[-1][0] + self._g_nblocks) * ROW_BLOCK
        # +1 guarantees a trailing inactive chunk = the kernel's DMA drain
        c_pad = max(m[4][0].shape[0] for m in raw) + 1
        self._parts = [
            (src_g, dst_g, jnp.asarray(dg), jnp.asarray([b0], jnp.int32),
             tuple(jnp.asarray(a) for a in
                   _pad_chunk_maps(maps, c_pad, self._g_nblocks)))
            for src_g, dst_g, dg, b0, maps in raw
        ]

    __call__ = PallasSpmm.__call__
    _traced = PallasSpmm._traced
    apply = PallasSpmm.apply


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
