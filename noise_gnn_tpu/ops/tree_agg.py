"""Scatter-free aggregation over flat k-hop-tree subgraphs.

The TE/TES/CTP/H pipelines operate on the sampled tree's *flat subgraph view*
(ops/sampler.py: seeds first, then each depth's children contiguously). Its
structural edge list is perfectly regular — the children of parent ``j`` at
depth ``d`` occupy a contiguous fanout-sized slot — so segment reductions
over those edges are a reshape + masked reduction instead of XLA's TPU
scatter-add, which serializes per row and measured ~3 orders of magnitude
slower at these shapes (tools/exp_flat_agg.py; it made round-1's CTP step
cost ~50 s).

Rewired graphs (reference topk_rewire, src/utils/augmentation.py:36-86) are
expressed as the structural tree edges with a keep-mask (removals) plus a
small *delta* edge list (additions) that goes through a normal segment-sum —
a scatter over only ~2k edges is cheap.

``TreeTopo`` is the edge-structure argument the conv layers accept in place
of a [2, E] edge list; numerics are identical to the edge-list path
(equality-tested in tests/test_tree_agg.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .scatter import fast_take, segment_count, segment_sum

Array = jax.Array


@jax.tree_util.register_pytree_node_class
class TreeTopo:
    """Flat-tree subgraph topology (a pytree; static shape info in aux).

    Equivalent edge list: ``flat_edge_index(batch_size, fanouts)`` masked by
    ``edge_mask``, concatenated with ``extra`` edges masked by ``extra_mask``.
    """

    def __init__(
        self,
        batch_size: int,
        fanouts: tuple[int, ...],
        edge_mask: Array,
        extra_src: Array | None = None,
        extra_dst: Array | None = None,
        extra_mask: Array | None = None,
    ):
        self.batch_size = int(batch_size)
        self.fanouts = tuple(int(f) for f in fanouts)
        self.edge_mask = edge_mask
        self.extra_src = extra_src
        self.extra_dst = extra_dst
        self.extra_mask = extra_mask

    # ---- static structure helpers (plain ints, safe under jit)

    @property
    def sizes(self) -> list[int]:
        s = [self.batch_size]
        for f in self.fanouts:
            s.append(s[-1] * f)
        return s

    @property
    def bases(self) -> list[int]:
        b, acc = [], 0
        for s in self.sizes:
            b.append(acc)
            acc += s
        return b

    @property
    def num_nodes(self) -> int:
        return sum(self.sizes)

    def tree_flatten(self):
        leaves = (self.edge_mask, self.extra_src, self.extra_dst, self.extra_mask)
        return leaves, (self.batch_size, self.fanouts)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(aux[0], aux[1], *leaves)

    def parent_of(self, flat_ids: Array) -> Array:
        """Structural parent of each flat node id (seeds map to themselves)."""
        sizes, bases = self.sizes, self.bases
        parent = flat_ids
        for d, f in enumerate(self.fanouts):
            j = flat_ids - bases[d + 1]
            in_depth = (j >= 0) & (j < sizes[d + 1])
            parent = jnp.where(in_depth, bases[d] + j // f, parent)
        return parent


def tree_gather_scatter(
    x: Array,
    topo: TreeTopo,
    aggr: str = "mean",
) -> Array:
    """out[i] = aggr over in-neighbors of flat node i (children + extras).

    Numerically identical to ``gather_scatter_<aggr>(x, edge_index, n,
    edge_mask)`` on the equivalent edge list, but the structural part is a
    per-depth reshape + masked reduction (zero scatters).
    """
    sizes, bases = topo.sizes, topo.bases
    n_sub = topo.num_nodes
    f_dim = x.shape[-1]
    acc_dtype = jnp.float32 if x.dtype in (jnp.bfloat16, jnp.float16) else x.dtype

    sums, counts = [], []
    off = 0
    for d, f in enumerate(topo.fanouts):
        n_child = sizes[d + 1]
        child = jax.lax.slice_in_dim(x, bases[d + 1], bases[d + 1] + n_child)
        cm = jax.lax.slice_in_dim(topo.edge_mask, off, off + n_child)
        off += n_child
        cb = child.reshape(sizes[d], f, f_dim).astype(acc_dtype)
        mm = cm.reshape(sizes[d], f)
        if aggr == "max":
            neg = jnp.array(-jnp.inf, acc_dtype)
            sums.append(jnp.max(jnp.where(mm[..., None], cb, neg), axis=1))
        else:
            w = mm.astype(acc_dtype)[..., None]
            sums.append((cb * w).sum(axis=1))
        counts.append(mm.sum(axis=1).astype(jnp.float32))
    # deepest depth has no children
    if aggr == "max":
        sums.append(jnp.full((sizes[-1], f_dim), -jnp.inf, acc_dtype))
    else:
        sums.append(jnp.zeros((sizes[-1], f_dim), acc_dtype))
    counts.append(jnp.zeros((sizes[-1],), jnp.float32))
    total = jnp.concatenate(sums, axis=0)
    count = jnp.concatenate(counts)

    if topo.extra_src is not None:
        msgs = fast_take(x, topo.extra_src).astype(acc_dtype)
        dst = topo.extra_dst
        if topo.extra_mask is not None:
            dst = jnp.where(topo.extra_mask, dst, n_sub)
        if aggr == "max":
            extra = jax.ops.segment_max(msgs, dst, num_segments=n_sub + 1)[:n_sub]
            total = jnp.maximum(total, extra)
        else:
            total = total + segment_sum(msgs, dst, n_sub + 1)[:n_sub].astype(acc_dtype)
        count = count + segment_count(dst, n_sub + 1)[:n_sub]

    if aggr == "max":
        out = jnp.where(jnp.isfinite(total), total, 0)
        return out.astype(x.dtype)
    if aggr == "sum":
        return total.astype(x.dtype)
    return (total.astype(jnp.float32) / jnp.maximum(count, 1.0)[:, None]).astype(x.dtype)


def tree_parent_gather(p: Array, topo: TreeTopo) -> tuple[Array, Array]:
    """A^T-style aggregation used by ``get_uncertainty``: for each flat node
    (as edge SOURCE), the sum of its out-neighbors' rows and the out-degree.

    In the tree every child's single out-edge points to its parent, so this
    is a structural gather (plus extras), no scatter at all.
    """
    sizes, bases = topo.sizes, topo.bases
    n_sub = topo.num_nodes
    outs, degs = [jnp.zeros((sizes[0], p.shape[-1]), p.dtype)], [
        jnp.zeros((sizes[0],), jnp.float32)
    ]
    off = 0
    for d, f in enumerate(topo.fanouts):
        n_child = sizes[d + 1]
        parent_rows = jax.lax.slice_in_dim(p, bases[d], bases[d] + sizes[d])
        rep = jnp.repeat(parent_rows, f, axis=0, total_repeat_length=n_child)
        cm = jax.lax.slice_in_dim(topo.edge_mask, off, off + n_child)
        off += n_child
        outs.append(jnp.where(cm[:, None], rep, 0))
        degs.append(cm.astype(jnp.float32))
    total = jnp.concatenate(outs, axis=0)
    deg = jnp.concatenate(degs)
    if topo.extra_src is not None:
        src = topo.extra_src
        if topo.extra_mask is not None:
            src = jnp.where(topo.extra_mask, src, n_sub)
        msgs = fast_take(p, topo.extra_dst)
        total = total + segment_sum(msgs, src, n_sub + 1)[:n_sub]
        deg = deg + segment_count(src, n_sub + 1)[:n_sub]
    return total, deg
