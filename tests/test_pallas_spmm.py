"""Pallas SpMM kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from noise_gnn_tpu.graph.containers import CSRGraph
from noise_gnn_tpu.ops.pallas_spmm import (
    EDGE_CHUNK,
    ROW_BLOCK,
    PallasSpmm,
    _chunk_maps,
    block_edge_ranges,
    csr_spmm,
)
from noise_gnn_tpu.ops.scatter import gather_scatter_mean, gather_scatter_sum


def make_graph(n, e, seed=0):
    rng = np.random.default_rng(seed)
    ei = rng.integers(0, n, (2, e)).astype(np.int32)
    return ei, CSRGraph.from_coo(ei, n)


def test_compact_chunk_schedule():
    # compact storage: block b's edges at CSR offsets [start, start+count);
    # the schedule must visit exactly the chunks each block's range touches,
    # in ascending block order, with correct first/last flags
    ei, csr = make_graph(600, 5000)
    indptr = np.asarray(csr.indptr, np.int64)
    starts, counts = block_edge_ranges(indptr, 600)
    assert counts.sum() == 5000
    nb = starts.shape[0]
    g_edges = -(-5000 // EDGE_CHUNK) * EDGE_CHUNK
    blk, ch, first, last, act = _chunk_maps(starts, counts, g_edges, nb)
    assert (act == 1).all()
    assert (np.diff(blk) >= 0).all()  # ascending blocks
    for b in range(nb):
        sel = blk == b
        cs = ch[sel]
        s, e = int(starts[b]), int(starts[b] + counts[b])
        if counts[b] == 0:
            assert sel.sum() == 1  # one dummy chunk flushes the zero block
        else:
            want = np.arange(s // EDGE_CHUNK, -(-e // EDGE_CHUNK))
            np.testing.assert_array_equal(cs, want)
        # exactly one first and one last per block, at the span's ends
        assert first[sel][0] == 1 and first[sel][1:].sum() == 0
        assert last[sel][-1] == 1 and last[sel][:-1].sum() == 0
    # chunk indices stay inside storage
    assert ch.max() < g_edges // EDGE_CHUNK


@pytest.mark.parametrize("mean", [True, False])
def test_kernel_matches_xla(mean):
    ei, csr = make_graph(700, 6000, seed=1)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((700, 128)), jnp.float32)
    out = csr_spmm(x, np.asarray(csr.indptr), np.asarray(csr.indices), 700,
                   mean=mean, interpret=True)
    if mean:
        want = gather_scatter_mean(x, jnp.asarray(ei), 700)
    else:
        want = gather_scatter_sum(x, jnp.asarray(ei), 700)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_multi_group_split():
    ei, csr = make_graph(3000, 40000, seed=3)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((3000, 128)), jnp.float32)
    op = PallasSpmm(np.asarray(csr.indptr), np.asarray(csr.indices), 3000,
                    edge_budget=8192)
    assert len(op._groups) > 1
    out = op(x, interpret=True)
    want = gather_scatter_mean(x, jnp.asarray(ei), 3000)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-4, atol=1e-4)
    # single-dispatch whole-op form: all groups write one aliased buffer
    out2 = op.apply(x, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_group_split_balanced():
    # groups target ceil(total/ngroups), not greedy budget-filling: the
    # padded shape (max group) must stay close to the mean group size
    from noise_gnn_tpu.ops.pallas_spmm import _make_groups

    rng = np.random.default_rng(11)
    alloc = rng.integers(1, 5, 100).astype(np.int64) * EDGE_CHUNK
    bases = np.zeros(100, np.int64)
    np.cumsum(alloc[:-1], out=bases[1:])
    total = int(alloc.sum())
    for budget in (total - EDGE_CHUNK, total // 3 + 7, 9 * EDGE_CHUNK):
        groups = _make_groups(alloc, bases, budget)
        # coverage: contiguous, complete, edge counts match alloc
        assert groups[0][0] == 0 and groups[-1][1] == 100
        for (a0, a1, e0, e), (b0, _, _, _) in zip(groups, groups[1:]):
            assert a1 == b0
        assert sum(g[3] for g in groups) == total
        biggest = max(g[3] for g in groups)
        ngroups_ideal = max(1, -(-total // budget))
        # exactly the ideal group count, every group within one block-alloc
        # of the even split (no near-empty remainder group)
        assert len(groups) == ngroups_ideal
        assert biggest <= total // ngroups_ideal + int(alloc.max())


def test_bf16_output_and_device_pack():
    # out_dtype=bfloat16 casts at the flush DMA (accumulation stays f32);
    # PallasSpmmDevice packs on device and must agree with the host pack
    from noise_gnn_tpu.ops.pallas_spmm import PallasSpmmDevice

    ei, csr = make_graph(900, 12000, seed=7)
    x = jnp.asarray(np.random.default_rng(8).standard_normal((900, 128)), jnp.float32)
    want = np.asarray(gather_scatter_mean(x, jnp.asarray(ei), 900))
    for op in (
        PallasSpmm(np.asarray(csr.indptr), np.asarray(csr.indices), 900),
        PallasSpmmDevice(np.asarray(csr.indptr, np.int64),
                         jnp.asarray(csr.indices), 900),
    ):
        out = op.apply(x, interpret=True, out_dtype=jnp.bfloat16)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, np.float32), want,
                                   rtol=2e-2, atol=2e-2)
        outs = op.apply(x, mean=False, interpret=True)
        np.testing.assert_allclose(
            np.asarray(outs),
            np.asarray(gather_scatter_sum(x, jnp.asarray(ei), 900)),
            rtol=1e-4, atol=1e-4)


def test_power_law_hubs_and_sparse_tail():
    # hub dst rows whose in-degree spans many EDGE_CHUNKs (multi-chunk
    # blocks with straddles at both ends) next to a long near-empty tail
    # (many blocks sharing one chunk) — the compact layout's hard cases
    rng = np.random.default_rng(13)
    n = 4000
    hub_dst = rng.integers(0, 40, 3 * EDGE_CHUNK)          # few hot rows
    tail_dst = rng.integers(40, n, 4000)                   # sparse tail
    dst = np.concatenate([hub_dst, tail_dst]).astype(np.int32)
    src = rng.integers(0, n, dst.shape[0]).astype(np.int32)
    ei = np.stack([src, dst])
    csr = CSRGraph.from_coo(ei, n)
    x = jnp.asarray(rng.standard_normal((n, 128)), jnp.float32)
    op = PallasSpmm(np.asarray(csr.indptr), np.asarray(csr.indices), n)
    want = gather_scatter_mean(x, jnp.asarray(ei), n)
    out = op.apply(x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_isolated_nodes_and_empty_blocks():
    # only a handful of edges at the start; later row blocks are empty
    n = 1500
    ei = np.asarray([[0, 1, 2], [3, 3, 4]], np.int32)
    csr = CSRGraph.from_coo(ei, n)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((n, 128)), jnp.float32)
    out = csr_spmm(x, np.asarray(csr.indptr), np.asarray(csr.indices), n,
                   interpret=True)
    want = gather_scatter_mean(x, jnp.asarray(ei), n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-4, atol=1e-4)
    assert np.abs(np.asarray(out[5:])).max() == 0.0
