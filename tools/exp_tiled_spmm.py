"""Prototype: tiled-gather SpMM — split x into <96MB hash tiles so XLA's
gather takes its fast small-operand path (measured ~160 vs ~113 M idx/s
materialized on v5e), with tile-major message storage consumed by the
EXISTING Pallas reduce kernel via a generalized chunk schedule.

Layout per group (blocks b0:b1):
  for tile r: [region starts EDGE_CHUNK-aligned]
     per block b: segment of (tile==r, block==b) edges, 16-row aligned start
Schedule visits blocks outer, tiles inner (ascending storage offset); chunk
windows may over-read neighbouring segments — those rows' dst lies in
another block, so the one-hot reduction drops them (and the mean count
ignores them). Hash tiling (tile = src % T, local = src // T) equalizes
tile loads for any degree distribution.

Run: timeout 580 python tools/exp_tiled_spmm.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ROW_BLOCK = 256
E = 2048
ALIGN = 16


def fetch_time(fn, iters=5):
    float(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); float(fn()); ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def group_tile_sizes(dst, src, b0, b1, T):
    """Pass 1: 16-aligned packed size of each tile region in this group."""
    nb = b1 - b0
    tile = src % T
    db = dst // ROW_BLOCK - b0
    sizes = []
    for r in range(T):
        cnt = np.bincount(db[tile == r], minlength=nb)
        sizes.append(int((-(-cnt // ALIGN) * ALIGN).sum()))
    return sizes


def pack_group(dst, src, b0, b1, T, Lmax):
    """Pass 2: build per-tile index/dst arrays (length Lmax[r]) + schedule."""
    nb = b1 - b0
    tile = src % T
    loc = src // T
    db = dst // ROW_BLOCK - b0
    order = np.lexsort((loc, db, tile))
    tile, loc, db, dst_l = (tile[order], loc[order], db[order],
                            (dst - (dst // ROW_BLOCK) * ROW_BLOCK)[order])
    dst_l = db * ROW_BLOCK + dst_l  # group-local row id
    entries = []
    seen_first = np.zeros(nb, bool)
    last_for = {}
    idx_tiles, dst_tiles, pads = [], [], []
    base = 0
    t_off = np.zeros(T + 1, np.int64)
    np.cumsum(np.bincount(tile, minlength=T), out=t_off[1:])
    for r in range(T):
        loc_r = loc[t_off[r]:t_off[r + 1]]
        db_r = db[t_off[r]:t_off[r + 1]]
        dst_r = dst_l[t_off[r]:t_off[r + 1]]
        cnt = np.bincount(db_r, minlength=nb)
        idx_arr = np.zeros(Lmax[r], np.int32)
        dst_arr = np.full(Lmax[r], -1, np.int32)
        csr = np.zeros(nb + 1, np.int64); np.cumsum(cnt, out=csr[1:])
        cur = 0
        for b in range(nb):
            c = int(cnt[b])
            if c:
                idx_arr[cur:cur + c] = loc_r[csr[b]:csr[b] + c]
                dst_arr[cur:cur + c] = dst_r[csr[b]:csr[b] + c]
                g0 = base + cur
                for ci in range(g0 // E, -(-(g0 + c) // E)):
                    entries.append([b, ci, int(not seen_first[b]), 0])
                    seen_first[b] = True
                    last_for[b] = len(entries) - 1
            cur += -(-c // ALIGN) * ALIGN
        assert cur <= Lmax[r]
        idx_tiles.append(idx_arr)
        dst_tiles.append(dst_arr)
        pad = -(base + Lmax[r]) % E
        pads.append(pad)
        base += Lmax[r] + pad
    for b in range(nb):
        if b in last_for:
            entries[last_for[b]][3] = 1
        else:
            entries.append([b, 0, 1, 1])
    entries.sort(key=lambda t: (t[0], t[1]))
    return idx_tiles, dst_tiles, pads, np.array(entries, np.int32), base


def main():
    import jax
    import jax.numpy as jnp
    from noise_gnn_tpu.ops.pallas_spmm import PallasSpmm, _spmm_call_pregathered

    n, e, f, T = 1_000_000, 32_000_000, 256, 6
    rng = np.random.default_rng(0)
    src_e = rng.integers(0, n, e).astype(np.int32)
    dst_counts = np.bincount(rng.integers(0, n, e), minlength=n)
    indptr = np.zeros(n + 1, np.int64); np.cumsum(dst_counts, out=indptr[1:])
    dst_e = np.repeat(np.arange(n, dtype=np.int32), dst_counts)

    x = jax.random.normal(jax.random.key(0), (n, f), jnp.bfloat16)

    nblocks = -(-n // ROW_BLOCK)
    gsize = 456
    groups = [(b0, min(b0 + gsize, nblocks)) for b0 in range(0, nblocks, gsize)]

    def gslice(b0, b1):
        k0 = int(indptr[min(b0 * ROW_BLOCK, n)])
        k1 = int(indptr[min(b1 * ROW_BLOCK, n)])
        return dst_e[k0:k1], src_e[k0:k1]

    t0 = time.perf_counter()
    sizes = np.array([group_tile_sizes(*gslice(b0, b1), b0, b1, T)
                      for b0, b1 in groups])
    Lmax = []
    for r in range(T):
        L = int(sizes[:, r].max()) + 512
        if L % 1024 == 0:
            L += ALIGN
        Lmax.append(L)
    packs = [pack_group(*gslice(b0, b1), b0, b1, T, Lmax)
             for b0, b1 in groups]
    print(f"pack: {time.perf_counter()-t0:.1f}s  Lmax={Lmax}", flush=True)

    Cmax = max(p[3].shape[0] for p in packs) + 1
    nb_max = max(b1 - b0 for b0, b1 in groups)
    parts = []
    slot_total = 0
    static_pads = []
    for (idx_tiles, dst_tiles, pads, ent, total) in packs:
        dst_full = []
        for r in range(T):
            dst_full.append(dst_tiles[r])
            if pads[r]:
                dst_full.append(np.full(pads[r], -1, np.int32))
        pad_e = Cmax - ent.shape[0]
        maps = (
            np.pad(ent[:, 0], (0, pad_e), constant_values=int(ent[-1, 0])),
            np.pad(ent[:, 1], (0, pad_e)),
            np.pad(ent[:, 2], (0, pad_e)),
            np.pad(ent[:, 3], (0, pad_e)),
            np.pad(np.ones(ent.shape[0], np.int32), (0, pad_e)),
        )
        parts.append((
            tuple(jnp.asarray(a) for a in idx_tiles),
            jnp.asarray(np.concatenate(dst_full)),
            tuple(jnp.asarray(a.astype(np.int32)) for a in maps),
        ))
        slot_total += total
        static_pads.append(tuple(int(p) for p in pads))
    print(f"slots: {slot_total/1e6:.1f} M, sched entries: {Cmax}", flush=True)

    n_pad2 = -(-n // (T * ALIGN)) * (T * ALIGN)
    tile_rows = n_pad2 // T
    ob = jax.lax.optimization_barrier

    def tiled_spmm(xx, parts):
        xp = jnp.pad(xx, ((0, n_pad2 - n), (0, 0)))
        xt = ob(jnp.transpose(xp.reshape(tile_rows, T, f), (1, 0, 2)))
        outs = []
        for gi, (idx_tiles, dst_g, maps) in enumerate(parts):
            pads = static_pads[gi]
            pieces = []
            for r in range(T):
                tl = jax.lax.dynamic_index_in_dim(xt, r, 0, keepdims=False)
                pieces.append(ob(jnp.take(tl, idx_tiles[r], axis=0)))
                if pads[r]:
                    pieces.append(jnp.zeros((pads[r], f), xx.dtype))
            msgs = jnp.concatenate(pieces, axis=0)
            b0, b1 = groups[gi]
            dgf = 1.0 / np.maximum(np.diff(indptr).astype(np.float32), 1.0)
            dg = np.ones(nb_max * ROW_BLOCK, np.float32)
            take = dgf[b0 * ROW_BLOCK : (b0 + nb_max) * ROW_BLOCK]
            dg[: take.shape[0]] = take
            out = _spmm_call_pregathered(
                msgs, dst_g, jnp.asarray(dg[:, None]),
                jnp.zeros(1, jnp.int32), *maps,
                jnp.zeros((nb_max * ROW_BLOCK, f), jnp.float32),
                num_nodes=nb_max * ROW_BLOCK, ring_blocks=nb_max, feat=f,
                mean=True)
            rows = min(b1 * ROW_BLOCK, n) - b0 * ROW_BLOCK
            outs.append(out[:rows])
        return jnp.concatenate(outs, axis=0)

    jfn = jax.jit(lambda xx, p: tiled_spmm(xx, p).sum())
    t = fetch_time(lambda: jfn(x, parts))
    print(f"tiled full : {t*1e3:7.1f} ms -> {e/t/1e6:7.1f} M edges/s", flush=True)

    op = PallasSpmm(indptr, src_e, n)
    ref = jax.jit(lambda xx, p: op._traced(xx, p, True, False).sum())
    t = fetch_time(lambda: ref(x, op._parts))
    print(f"current    : {t*1e3:7.1f} ms -> {e/t/1e6:7.1f} M edges/s", flush=True)
    a = float(jfn(x, parts)); b = float(ref(x, op._parts))
    print(f"sums: tiled={a:.1f} ref={b:.1f} reldiff={abs(a-b)/max(abs(b),1):.2e}")


if __name__ == "__main__":
    main()
