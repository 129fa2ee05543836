"""Multi-host (multi-process) logic test: 2 local processes, CPU backend,
gloo collectives — exercises ``parallel.multihost.initialize`` end-to-end
(SURVEY §4 item 6; VERDICT round-2 item 7).

Each worker forces 2 virtual CPU devices, joins the coordination service,
builds the global 4-device mesh, and runs a psum + one DP co-teaching step
over globally sharded seed batches; both processes must agree.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from noise_gnn_tpu.parallel import multihost

pid = int(sys.argv[1])
multihost.initialize(coordinator_address={coord!r}, num_processes=2,
                     process_id=pid)
info = multihost.process_info()
assert info["process_count"] == 2, info
assert info["global_devices"] == 4, info

import functools
import numpy as np
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P
from noise_gnn_tpu.parallel import make_mesh

mesh = make_mesh()
assert mesh.devices.size == 4

@functools.partial(shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
def total(x):
    return jax.lax.psum(x.sum(), "data")

# global array sharded across both processes: each process supplies its
# local shards via device_put of the full (small) host value
arr = jax.device_put(jnp.arange(8.0), NamedSharding(mesh, P("data")))
got = float(jax.jit(total)(arr))
assert got == 28.0, got

# one DP co-teaching step over the global mesh
import optax
from noise_gnn_tpu.graph.datasets import synthetic_graph
from noise_gnn_tpu.models import nets
from noise_gnn_tpu.noise import flip_label, noise_or_not
from noise_gnn_tpu.parallel.dp import make_dp_ct_step, shard_batch
from noise_gnn_tpu.train import steps as S

g = synthetic_graph(120, 8, 3, 700, seed=0)
yhn, _ = flip_label(g.y, 3, "sym", 0.3, np.random.default_rng(0))
data = S.GraphData(x=jnp.asarray(g.x), y=jnp.asarray(g.y), yhn=jnp.asarray(yhn),
                   clean=jnp.asarray(noise_or_not(g.y, yhn)), csr=g.csr())
spec = nets.NetSpec(module="sage", in_size=8, hidden_size=8, out_size=3,
                    num_layers=2)
opt = optax.adam(1e-3)
step = make_dp_ct_step(spec, opt, (3, 2), mesh)
s1 = S.init_state(jax.random.key(0), spec, opt)
s2 = S.init_state(jax.random.key(1), spec, opt)
rng = np.random.default_rng(0)
batch = S.Batch(jnp.asarray(rng.integers(0, 120, 16).astype(np.int32)),
                jnp.ones((16,), bool))
batch = shard_batch(batch, mesh)
s1, s2, m = step(s1, s2, data, batch, jax.random.key(2), jnp.float32(0.2))
l1 = float(m["loss_1"])
assert np.isfinite(l1)

# ---- halo-exchange inference ACROSS THE PROCESS BOUNDARY (the DCN path
# SCALING.md extrapolates to multi-host): every locally addressable shard
# must equal the corresponding rows of the single-device edge-list forward
# (the partition is contiguous by node id, parallel/halo.py:95-104)
from noise_gnn_tpu.parallel.halo import make_halo_inference, shard_features

spec_h = nets.NetSpec(module="sage", in_size=8, hidden_size=8, out_size=3,
                      num_layers=2, dropout=0.0)
ph = nets.init_params(jax.random.key(5), spec_h)
part, infer, _ = make_halo_inference(mesh, spec_h, g.edge_index, g.num_nodes)
xs = shard_features(mesh, g.x, part)
hl = infer(ph, xs)
want = np.asarray(nets.apply(spec_h, ph, jnp.asarray(g.x),
                             jnp.asarray(g.edge_index), train=False)["logits"])
checked = 0
for sh in hl.addressable_shards:
    s0 = sh.index[0].start or 0
    rows = np.asarray(sh.data)
    stop = min(s0 + rows.shape[0], g.num_nodes)
    if stop > s0:
        np.testing.assert_allclose(rows[: stop - s0], want[s0:stop],
                                   rtol=1e-3, atol=1e-3)
        checked += stop - s0
assert checked > 0

# ---- one full-graph CT epoch across the process boundary: the sharded
# batch loss must equal the single-device edge-list computation
from noise_gnn_tpu.losses.coteaching import ct_loss
from noise_gnn_tpu.parallel import fullbatch as FB

fg_part = FB.build_train_partition(mesh, g.edge_index, g.num_nodes)
fg_xs = shard_features(mesh, g.x, fg_part)
p1 = nets.init_params(jax.random.key(6), spec_h)
p2 = nets.init_params(jax.random.key(7), spec_h)
fs1, fs2 = S.TrainState(p1, opt.init(p1)), S.TrainState(p2, opt.init(p2))
fg_seeds = jnp.arange(32, dtype=jnp.int32)
fg_mask = jnp.ones(32, bool)
# single-device reference FIRST: the epoch donates its state buffers, so
# p1/p2 are dead afterwards
l1w = nets.apply(spec_h, p1, jnp.asarray(g.x), jnp.asarray(g.edge_index),
                 train=False)["logits"]
l2w = nets.apply(spec_h, p2, jnp.asarray(g.x), jnp.asarray(g.edge_index),
                 train=False)["logits"]
outw = ct_loss(jnp.take(l1w, fg_seeds, 0), jnp.take(l2w, fg_seeds, 0),
               jnp.take(data.yhn, fg_seeds), jnp.float32(0.2),
               jnp.take(data.clean, fg_seeds), fg_mask)
fg_epoch = FB.make_fullgraph_ct_epoch(mesh, spec_h, opt)
_, _, fg_m = fg_epoch(fs1, fs2, fg_part, fg_xs, data.y, data.yhn, data.clean,
                      fg_seeds, fg_mask, jax.random.key(8), jnp.float32(0.2))
fg_l = float(fg_m["loss_1"]) + float(fg_m["loss_2"])
np.testing.assert_allclose(fg_l, float(outw.loss_1 + outw.loss_2),
                           rtol=2e-3, atol=2e-4)

print(f"OK pid={{pid}} psum={{got}} loss={{l1:.6f}} halo_rows={{checked}} "
      f"fg={{fg_l:.6f}}", flush=True)
"""


def test_two_process_dp_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = WORKER.format(repo=repo, coord=f"localhost:{port}")
    wf = tmp_path / "worker.py"
    wf.write_text(script)
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    procs = [
        subprocess.Popen([sys.executable, str(wf), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=str(tmp_path))
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
    ok = [l for o in outs for l in o.splitlines() if l.startswith("OK")]
    assert len(ok) == 2, outs
    # both processes computed the identical global step / full-graph epoch
    loss0 = ok[0].split("loss=")[1].split()[0]
    loss1 = ok[1].split("loss=")[1].split()[0]
    assert loss0 == loss1, ok
    fg0 = ok[0].split("fg=")[1].split()[0]
    fg1 = ok[1].split("fg=")[1].split()[0]
    assert fg0 == fg1, ok
    # each process verified a non-empty set of locally addressable halo rows
    assert all(int(l.split("halo_rows=")[1].split()[0]) > 0 for l in ok), ok
