"""Node-sharded edge-partitioned aggregation with halo exchange.

The round-2 upgrade promised by ``partition.py`` (which replicates features
and psums full [N, F] partials — O(N·F) comm per device per layer): here

  * node FEATURES are sharded over the ``data`` axis (contiguous row
    shards);
  * each EDGE lives on its source's shard, so the feature gather is local;
  * a device pre-reduces its messages into one row per *touched* remote
    destination (the boundary), and a single ``all_to_all`` ships only
    those boundary partials — per-layer comm is proportional to the
    boundary size, not N·F (SURVEY §2.4 "SP analog", §5 long-context row;
    the reference's only scaling mechanism is NeighborLoader fanout,
    src/pipeline.py:75-92).

Destination in-degrees are graph constants, so the mean divide needs no
count exchange at all.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.scatter import fast_take, segment_sum

Array = jax.Array


@dataclass
class HaloPartition:
    """Pack-time product of :func:`build_halo_partition` (device-sharded).

    Shapes (D = number of shards, leading axis sharded over ``data``):
      src_local   [D, E_max]    local row of each edge's source (pad: 0)
      slot        [D, E_max]    d * B_max + boundary-row index (pad: D*B_max)
      recv_rows   [D, D, B_max] for receiver r, sender s, slot i: the local
                                destination row (pad: per → dead row)
      deg         [D, per]      in-degree of each local destination node
    """

    num_nodes: int
    per: int        # nodes per shard (padded)
    b_max: int      # boundary rows per (src, dst) shard pair (padded)
    e_max: int      # edges per shard (padded)
    n_shards: int
    src_local: Array
    slot: Array
    recv_rows: Array
    deg: Array
    boundary_rows_total: int  # sum of true B_sd (for comm accounting)
    # [D, D] true B_sd as a nested tuple (hashable: it is static metadata
    # when a partition crosses a jit boundary as a pytree)
    pair_counts: tuple | None = None

    def comm_bytes_per_layer(self, feat_dim: int, bytes_per_el: int = 4) -> dict:
        """Per-layer exchange volume. 'actual' counts only true boundary
        rows; 'padded' is what the static [D, B_max, F] all_to_all buffer
        ships; 'ppermute_rounds' is what a round-robin exchange with
        per-round buffer sizes (max over senders of B_{s, s+k}) would ship."""
        d = self.n_shards
        out = {
            "actual": self.boundary_rows_total * feat_dim * bytes_per_el,
            "padded": d * d * self.b_max * feat_dim * bytes_per_el,
            "replicated_psum_equiv": 2 * self.num_nodes * feat_dim * bytes_per_el * d,
        }
        if self.pair_counts is not None:
            pc = np.asarray(self.pair_counts)
            rounds = sum(
                int(max(pc[s, (s + k) % d] for s in range(d)))
                for k in range(1, d)
            )
            out["ppermute_rounds"] = rounds * d * feat_dim * bytes_per_el
            # wire bytes exclude the diagonal (self) block — all_to_all's
            # self-chunk is a local copy, not ICI traffic
            offdiag = int(pc.sum() - np.trace(pc))
            out["actual_wire"] = offdiag * feat_dim * bytes_per_el
        return out


jax.tree_util.register_dataclass(
    HaloPartition,
    data_fields=("src_local", "slot", "recv_rows", "deg"),
    meta_fields=("num_nodes", "per", "b_max", "e_max", "n_shards",
                 "boundary_rows_total", "pair_counts"),
)


def build_halo_partition(
    edge_index: np.ndarray, num_nodes: int, n_shards: int
) -> HaloPartition:
    """Host-side pack: assign edges to source shards, dedupe destinations per
    (src-shard, dst-shard) pair into boundary rows."""
    src = np.asarray(edge_index[0], np.int64)
    dst = np.asarray(edge_index[1], np.int64)
    per = -(-num_nodes // n_shards)
    s_shard = src // per
    d_shard = dst // per
    pair_counts = np.zeros((n_shards, n_shards), np.int64)

    deg = np.zeros((n_shards * per,), np.float32)
    np.add.at(deg, dst, 1.0)
    deg = deg.reshape(n_shards, per)

    # per source shard: unique (d_shard, dst) boundary rows
    src_locals, slots = [], []
    send_rows = np.full((n_shards, n_shards, 0), per, np.int64)
    per_pair_rows: list[list[np.ndarray]] = []
    b_max = 1
    boundary_total = 0
    edge_slot_parts = []
    for s in range(n_shards):
        sel = s_shard == s
        es, ed, edsh = src[sel], dst[sel], d_shard[sel]
        pair_rows = []
        slot_of = np.zeros(es.shape[0], np.int64)
        for d in range(n_shards):
            m = edsh == d
            rows, inv = np.unique(ed[m], return_inverse=True)
            pair_rows.append(rows % per)
            slot_of[m] = inv  # boundary index within (s, d)
            b_max = max(b_max, rows.shape[0])
            boundary_total += rows.shape[0]
            pair_counts[s, d] = rows.shape[0]
        per_pair_rows.append(pair_rows)
        src_locals.append(es % per)
        edge_slot_parts.append((edsh, slot_of))

    e_max = max(max(a.shape[0] for a in src_locals), 1)
    src_local = np.zeros((n_shards, e_max), np.int32)
    slot = np.full((n_shards, e_max), n_shards * b_max, np.int32)
    for s in range(n_shards):
        k = src_locals[s].shape[0]
        src_local[s, :k] = src_locals[s]
        edsh, slot_of = edge_slot_parts[s]
        slot[s, :k] = edsh * b_max + slot_of

    send_rows = np.full((n_shards, n_shards, b_max), per, np.int32)
    for s in range(n_shards):
        for d in range(n_shards):
            rows = per_pair_rows[s][d]
            send_rows[s, d, : rows.shape[0]] = rows
    # receiver view: recv_rows[r, s] = send_rows[s, r]
    recv_rows = np.ascontiguousarray(np.swapaxes(send_rows, 0, 1))

    return HaloPartition(
        num_nodes=num_nodes,
        per=per,
        b_max=b_max,
        e_max=e_max,
        n_shards=n_shards,
        src_local=jnp.asarray(src_local),
        slot=jnp.asarray(slot),
        recv_rows=jnp.asarray(recv_rows),
        deg=jnp.asarray(deg),
        boundary_rows_total=boundary_total,
        pair_counts=tuple(map(tuple, pair_counts.tolist())),
    )


def place_partition(mesh, part: HaloPartition) -> HaloPartition:
    """Shard the partition arrays over the mesh's ``data`` axis."""
    sh = NamedSharding(mesh, P("data"))
    return HaloPartition(
        num_nodes=part.num_nodes,
        per=part.per,
        b_max=part.b_max,
        e_max=part.e_max,
        n_shards=part.n_shards,
        src_local=jax.device_put(part.src_local, sh),
        slot=jax.device_put(part.slot, sh),
        recv_rows=jax.device_put(part.recv_rows, sh),
        deg=jax.device_put(part.deg, sh),
        boundary_rows_total=part.boundary_rows_total,
        pair_counts=part.pair_counts,
    )


def shard_features(mesh, x: np.ndarray, part: HaloPartition) -> Array:
    """Pad node rows to n_shards*per and shard over ``data``."""
    n, f = x.shape
    pad = part.n_shards * part.per - n
    xp = np.concatenate([x, np.zeros((pad, f), x.dtype)]) if pad else x
    return jax.device_put(jnp.asarray(xp), NamedSharding(mesh, P("data")))


def halo_spmm(mesh, part: HaloPartition, x: Array, mean: bool = True) -> Array:
    """Distributed SpMM: x sharded [N_pad, F] over ``data`` -> same sharding.

    Inside each device: local gather + pre-reduction into [D, B_max, F]
    boundary partials; one tiled all_to_all; local scatter-accumulate.
    """
    d, per, b_max = part.n_shards, part.per, part.b_max

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P("data")),
        out_specs=P("data"),
    )
    def run(x_, src_local, slot, recv_rows, deg):
        x_loc = x_  # [per, F]
        msgs = fast_take(x_loc, src_local[0])  # [E_max, F]
        partial = segment_sum(msgs, slot[0], d * b_max + 1)[: d * b_max]
        send = partial.reshape(d, b_max, -1)
        recv = jax.lax.all_to_all(send, "data", split_axis=0, concat_axis=0,
                                  tiled=True)
        acc = segment_sum(recv.reshape(d * b_max, -1),
                          recv_rows[0].reshape(-1), per + 1)[:per]
        if mean:
            acc = (acc.astype(jnp.float32)
                   / jnp.maximum(deg[0], 1.0)[:, None]).astype(x_.dtype)
        return acc

    return run(x, part.src_local, part.slot, part.recv_rows, part.deg)


def make_halo_inference(mesh, spec, edge_index: np.ndarray | None,
                        num_nodes: int, log=None, exchange: str = "alltoall",
                        part: HaloPartition | None = None):
    """Distributed full-graph conv-stack inference over node-sharded
    features (replaces partition.make_partitioned_inference's replicated
    design). Returns ``(part, infer, infer_pair)``:
      infer(params, x_sharded)           -> logits [N_pad, C]
      infer_pair(params1, params2, x)    -> (logits1, logits2) — both
        co-teaching nets in ONE sweep: activations concatenated on the
        feature axis so every halo exchange + local gather serves two
        models for one model's index traffic (same fusion as
        eval/inference.FullGraphInference.pair; the gather engine is
        per-index bound, docs/DESIGN.md).

    ``exchange``: 'alltoall' (one tiled collective, globally padded) or
    'ppermute' (round-robin, per-round buffers — less wire traffic when
    pair sizes are skewed, e.g. after :func:`locality_order`).
    ``part``: a pre-built (already placed) partition to reuse across spec
    variants — the pack is per-(graph, n_shards), not per-model.
    """
    if part is None:
        part = place_partition(
            mesh, build_halo_partition(edge_index, num_nodes,
                                       mesh.shape["data"]))
    is_gcn = spec.module == "gcn"
    spmm = halo_spmm_rr if exchange == "ppermute" else halo_spmm
    if log is not None:
        for i in range(spec.num_layers):
            f = spec.in_size if i == 0 else spec.hidden_size
            log(f"halo layer {i}: comm {part.comm_bytes_per_layer(f)}")

    def conv(p, xi, agg):
        if is_gcn:
            return agg @ p["w"].astype(xi.dtype) + p["b"].astype(xi.dtype)
        return (
            agg @ p["w_neigh"].astype(xi.dtype)
            + xi @ p["w_root"].astype(xi.dtype)
            + p["b"].astype(xi.dtype)
        )

    def infer(params, x):
        if spec.compute_dtype != "float32":
            x = x.astype(jnp.dtype(spec.compute_dtype))
        for i, p in enumerate(params["convs"]):
            agg = spmm(mesh, part, x, mean=not is_gcn)
            x = conv(p, x, agg + x if is_gcn else agg)
            if i != spec.num_layers - 1:
                x = jax.nn.relu(x)
        return x.astype(jnp.float32)

    def infer_pair(p1, p2, x):
        if spec.compute_dtype != "float32":
            x = x.astype(jnp.dtype(spec.compute_dtype))
        x1 = x2 = x
        for i, (l1, l2) in enumerate(zip(p1["convs"], p2["convs"])):
            f = x1.shape[-1]
            both = jnp.concatenate([x1, x2], axis=1)
            agg = spmm(mesh, part, both, mean=not is_gcn)
            a1, a2 = agg[:, :f], agg[:, f:]
            if is_gcn:
                a1, a2 = a1 + x1, a2 + x2
            x1, x2 = conv(l1, x1, a1), conv(l2, x2, a2)
            if i != spec.num_layers - 1:
                x1, x2 = jax.nn.relu(x1), jax.nn.relu(x2)
        return x1.astype(jnp.float32), x2.astype(jnp.float32)

    return part, infer, infer_pair


def locality_order(
    edge_index: np.ndarray,
    num_nodes: int,
    n_shards: int,
    iters: int = 8,
    sticky: float = 1.1,
) -> tuple[np.ndarray, np.ndarray]:
    """Graph-only balanced label propagation for shard locality.

    The halo design's comm volume is proportional to the boundary (unique
    (dst, src-shard) pairs), and contiguous-ID sharding of a homophilous
    graph is near worst-case. This recovers community structure from EDGES
    ALONE (no labels/features): each node repeatedly adopts the shard most
    of its neighbors live on, with votes scaled by each shard's remaining
    capacity so partitions stay balanced, then nodes are stably sorted by
    shard into contiguous blocks. Static graphs pay this once at load time.

    Returns ``(order, inv)``: ``order[new_id] = old_id`` (a permutation to
    relabel features/labels) and ``inv[old_id] = new_id`` (to relabel
    edges: ``inv[edge_index]``).
    """
    src = np.asarray(edge_index[0], np.int64)
    dst = np.asarray(edge_index[1], np.int64)
    per = -(-num_nodes // n_shards)
    part = np.minimum(np.arange(num_nodes) // per, n_shards - 1).astype(np.int32)
    target = num_nodes / n_shards
    nodes = np.arange(num_nodes)
    from .. import native

    native_part = native.label_prop(src, dst, num_nodes, n_shards,
                                    part.copy(), iters=iters, sticky=sticky)
    if native_part is not None:
        part = native_part  # C++ threads: ~seconds at products scale
    else:
        for _ in range(iters):  # numpy fallback: same recurrence
            counts = np.zeros((num_nodes, n_shards), np.float32)
            np.add.at(counts, (dst, part[src]), 1.0)
            np.add.at(counts, (src, part[dst]), 1.0)
            sizes = np.bincount(part, minlength=n_shards).astype(np.float64)
            balance = target / np.maximum(sizes, 1.0)
            score = counts * balance[None, :].astype(np.float32)
            score[nodes, part] *= sticky  # damp oscillation
            part = score.argmax(1).astype(np.int32)
    order = np.argsort(part, kind="stable").astype(np.int64)
    inv = np.empty_like(order)
    inv[order] = nodes
    return order, inv


def halo_spmm_rr(mesh, part: HaloPartition, x: Array, mean: bool = True) -> Array:
    """Round-robin halo exchange: D-1 ``ppermute`` rounds with PER-ROUND
    buffer sizes instead of one [D, B_max, F] ``all_to_all``.

    The tiled all_to_all pads every (src, dst) pair to the GLOBAL max
    boundary B_max; after :func:`locality_order` the pair sizes are highly
    skewed (intra-community pairs dominate), so the padded buffer ships ~2x
    the true wire bytes. Round k ships only
    ``R_k = max_s B_{s,(s+k)%D}`` rows (a static pack-time constant), and
    the diagonal (self) block never leaves the device. Same result as
    :func:`halo_spmm`; equality-tested.
    """
    d, per, b_max = part.n_shards, part.per, part.b_max
    assert part.pair_counts is not None, "needs pack-time pair_counts"
    pc = np.asarray(part.pair_counts)
    r_k = [int(max(pc[s, (s + k) % d] for s in range(d))) for k in range(d)]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P("data")),
        out_specs=P("data"),
    )
    def run(x_, src_local, slot, recv_rows, deg):
        s = jax.lax.axis_index("data")
        msgs = fast_take(x_, src_local[0])  # [E_max, F]
        partial = segment_sum(msgs, slot[0], d * b_max + 1)[: d * b_max]
        partial = partial.reshape(d, b_max, -1)
        # self block: no wire
        own = jax.lax.dynamic_index_in_dim(partial, s, 0, keepdims=False)
        rr = jax.lax.dynamic_index_in_dim(recv_rows[0], s, 0, keepdims=False)
        acc = segment_sum(own, rr, per + 1)[:per]
        for k in range(1, d):
            rk = r_k[k]
            if rk == 0:
                continue
            dst_shard = jax.lax.rem(s + k, d)
            send = jax.lax.dynamic_index_in_dim(
                partial, dst_shard, 0, keepdims=False
            )[:rk]
            perm = [(i, (i + k) % d) for i in range(d)]
            recv = jax.lax.ppermute(send, "data", perm)
            src_shard = jax.lax.rem(s - k + d, d)
            rows = jax.lax.dynamic_index_in_dim(
                recv_rows[0], src_shard, 0, keepdims=False
            )[:rk]
            acc = acc + segment_sum(recv, rows, per + 1)[:per]
        if mean:
            acc = (acc.astype(jnp.float32)
                   / jnp.maximum(deg[0], 1.0)[:, None]).astype(x_.dtype)
        return acc

    return run(x, part.src_local, part.slot, part.recv_rows, part.deg)
