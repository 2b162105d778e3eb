"""Worker for the real 2-process distributed test (test_multiprocess.py).

Runs the SAME deterministic stage-2 DP training program either as one
process x 8 CPU devices (golden) or as N processes x 8/N CPU devices each,
initialized through rqvae_tpu.parallel.dist's manual-coordinator path —
the regime the reference reaches via `accelerate launch --num_processes`
(reference train_rqvae.py:67-70,153). Prints one JSON line with the
per-step losses, a final param norm, and an Orbax save->restore check.

Usage: python dist_worker.py NPROCS PID PORT
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NPROCS = int(sys.argv[1])
PID = int(sys.argv[2])
PORT = sys.argv[3]
GLOBAL_DEVICES = 8
GLOBAL_B = 16

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", GLOBAL_DEVICES // NPROCS)

if NPROCS > 1:
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{PORT}"
    os.environ["RQVAE_TPU_NUM_PROCESSES"] = str(NPROCS)
    os.environ["RQVAE_TPU_PROCESS_ID"] = str(PID)

from rqvae_tpu.parallel import dist  # noqa: E402

dist.initialize_distributed()
assert jax.process_count() == NPROCS, (jax.process_count(), NPROCS)
assert len(jax.devices()) == GLOBAL_DEVICES, len(jax.devices())

import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

from __graft_entry__ import _tiny_retrieval_setup  # noqa: E402
from rqvae_tpu.ops.schedules import inverse_sqrt_schedule  # noqa: E402
from rqvae_tpu.parallel.mesh import (  # noqa: E402
    global_batch_from_process_local,
    make_mesh,
)
from rqvae_tpu.train.decoder_steps import make_decoder_train_step  # noqa: E402
from rqvae_tpu.train.state import TrainState, adamw  # noqa: E402
from rqvae_tpu.utils.checkpoint_orbax import (  # noqa: E402
    load_checkpoint_orbax,
    save_checkpoint_orbax,
)

mesh = make_mesh(n_data=GLOBAL_DEVICES, n_model=1)

# identical full-batch content on every process; each keeps its local rows
model, params, batch = _tiny_retrieval_setup(B=GLOBAL_B, dropout=0.1)
rows_per_proc = GLOBAL_B // NPROCS
lo, hi = PID * rows_per_proc, (PID + 1) * rows_per_proc
local_batch = jax.tree_util.tree_map(lambda a: np.asarray(a)[lo:hi], batch)
gbatch = global_batch_from_process_local(mesh, local_batch)
assert gbatch.sem_ids.shape[0] == GLOBAL_B  # globally assembled

params = jax.tree_util.tree_map(
    lambda a: jax.device_put(np.asarray(a), NamedSharding(mesh, P())), params
)
tx = adamw(inverse_sqrt_schedule(1e-3, 100), weight_decay=0.01, max_grad_norm=1.0)
state = TrainState.create(params, tx)
train_step = make_decoder_train_step(model, tx)

losses = []
for step in range(3):
    state, metrics = train_step(state, gbatch, jax.random.PRNGKey(step))
    losses.append(float(jax.block_until_ready(metrics["total_loss"])))

pnorm = float(
    jax.jit(
        lambda p: sum(jax.numpy.sum(x.astype(jax.numpy.float32) ** 2) for x in jax.tree_util.tree_leaves(p)),
        out_shardings=NamedSharding(mesh, P()),
    )(state.params)
)

# Orbax round-trip across processes: save (coordinated commit), restore into
# the live shardings, verify equality
ckpt_dir = sys.argv[4] if len(sys.argv) > 4 else os.path.join("/tmp", f"dist_ckpt_{PORT}")
path = save_checkpoint_orbax(ckpt_dir, int(state.step), state.params, state.opt_state)
restored = load_checkpoint_orbax(path, state.params, state.opt_state)
deltas = jax.tree_util.tree_map(
    lambda a, b: float(jax.numpy.max(jax.numpy.abs(a.astype(jax.numpy.float32) - b.astype(jax.numpy.float32)))),
    restored["params"], state.params,
)
max_delta = max(jax.tree_util.tree_leaves(deltas))
assert restored["step"] == int(state.step)

print(json.dumps({
    "pid": PID, "nprocs": NPROCS, "losses": losses,
    "param_norm": pnorm, "orbax_max_delta": max_delta,
}))
