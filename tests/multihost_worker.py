"""Worker for test_multihost.py: one process of a 2-process
``jax.distributed`` CPU slice.

Pins app.train's --multihost init ORDERING contract (`app.py:1073-1090`):
``apply_platform(args, defer_backend_check=True)`` must run BEFORE
``jax.distributed.initialize()`` (config-only — touching the backend
first would pin this process to its local devices and break the global
mesh), and the backend assert only after. Then one data-parallel distill
step runs over a mesh SPANNING BOTH PROCESSES and prints its loss, which
the test compares to the single-process value.

Usage: python multihost_worker.py <process_id> <coordinator_port>
"""
import sys
from types import SimpleNamespace

pid, port = int(sys.argv[1]), sys.argv[2]

import jax  # noqa: E402

# Stand-in for --platform cpu --num_cpu_devices 2 (the CLI forbids cpu
# with --multihost because no real multi-host CPU slices exist; the
# ordering contract is what this pins).
args = SimpleNamespace(platform="cpu", num_cpu_devices=2, multihost=True)
from r2l_tpu.app import apply_platform  # noqa: E402

apply_platform(args, defer_backend_check=args.multihost)
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
apply_platform(args)  # the post-init call app.train makes

assert jax.process_index() == pid, (jax.process_index(), pid)
assert jax.local_device_count() == 2, jax.local_devices()
assert jax.device_count() == 4, jax.devices()

import numpy as np  # noqa: E402

from r2l_tpu.models.r2l import R2LConfig, init_r2l  # noqa: E402
from r2l_tpu.parallel import batch_sharding, make_mesh  # noqa: E402
from r2l_tpu.sampler import PointSampler  # noqa: E402
from r2l_tpu.train import (DistillConfig, init_train_state,  # noqa: E402
                           make_distill_step)

cfg = R2LConfig(input_dim=4 * 3 * 21, netwidth=16, netdepth=4)
dcfg = DistillConfig(batch_size=32, perturb=True)
sampler = PointSampler(H=4, W=4, focal=5.0, n_sample=4, near=2.0, far=6.0)
params = init_r2l(jax.random.key(0), cfg)
# host-resident state: identical on both processes, globalized by the
# pjit'd step (committed single-device arrays would be process-local)
state, tx = init_train_state(jax.random.key(0), params, dcfg)
state = jax.tree.map(np.asarray, state)

mesh = make_mesh({"data": 4})
assert {d.process_index for d in mesh.devices.flat} == {0, 1}, \
    "mesh does not span both processes"
step = make_distill_step(cfg, dcfg, sampler, tx, mesh=mesh)

rng = np.random.default_rng(0)  # same records on both processes
rec = np.concatenate([np.zeros((32, 3), np.float32),
                      rng.normal(size=(32, 3)).astype(np.float32),
                      rng.uniform(0, 1, (32, 3)).astype(np.float32)], 1)
# each process feeds ITS shard of the global batch (2 of 4 mesh rows)
local = rec.reshape(4, 8, 9)[pid * 2:(pid + 1) * 2].reshape(16, 9)
batch = jax.make_array_from_process_local_data(
    batch_sharding(mesh), local, (32, 9))

state, ms = step(state, batch, jax.random.key(1))
print(f"MULTIHOST_OK pid={pid} loss={float(ms['loss']):.8f} "
      f"psnr={float(ms['psnr']):.6f}", flush=True)

# --- multihost data contract (r4 verdict Next #3) --------------------------
# run_distill asserts at step 0 that every process drew the IDENTICAL
# global batch (the device_put-with-spanning-sharding invariant). Both
# the agreeing case and an injected per-process seed skew are exercised
# (the allgather is a collective: both processes call it both times).
from types import SimpleNamespace as _NS  # noqa: E402

from r2l_tpu import app as app_mod  # noqa: E402

_quiet = _NS(print=lambda *a, **k: None)
app_mod._assert_multihost_batch_identical(rec, _quiet)
print(f"CONTRACT_OK pid={pid}", flush=True)
try:
    app_mod._assert_multihost_batch_identical(rec + np.float32(pid), _quiet)
    print(f"CONTRACT_SKEW_MISSED pid={pid}", flush=True)
except RuntimeError:
    print(f"CONTRACT_SKEW_CAUGHT pid={pid}", flush=True)

# --- hard-pool checkpoint across processes --------------------------------
# The pjit'd step leaves pool.rays sharded over 'data' (spanning both
# processes -> NOT fully addressable); app._save must allgather it
# before np.asarray instead of raising. Both processes save and must
# see the same global pool.
import os  # noqa: E402
import tempfile  # noqa: E402

from r2l_tpu import app as app_mod  # noqa: E402
from r2l_tpu import checkpoint as ckpt_mod  # noqa: E402

dcfg2 = DistillConfig(batch_size=32, perturb=True, n_hard_in=8,
                      n_hard_out=8, hard_mul=2.0)
state2, tx2 = init_train_state(jax.random.key(0), params, dcfg2)
state2 = jax.tree.map(np.asarray, state2)
step2 = make_distill_step(cfg, dcfg2, sampler, tx2, mesh=mesh)
state2, _ = step2(state2, batch, jax.random.key(1))
shim = SimpleNamespace(weights_dir=tempfile.mkdtemp(prefix=f"mhpool{pid}_"))
app_mod._save(shim, "ck.msgpack", state2, 1, 1.0, 1, save_pool=True)
blob, _ = ckpt_mod.load_checkpoint(
    os.path.join(shim.weights_dir, "ck.msgpack"))
pr = np.asarray(blob["pool"]["rays"])
print(f"POOL_SAVED pid={pid} shape={pr.shape} sum={pr.sum():.6f}",
      flush=True)
