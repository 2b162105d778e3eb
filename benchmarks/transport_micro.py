"""Transport anatomy of the serving flush through a remoted runtime.

The SLO bench (slo_bench.py) saturates at ~170 QPS even with dispatch/fetch
pipelined across threads: one flush's host FETCH is ~12-18 blocking
`np.asarray` calls (3 leaves x 4-6 bucket groups), each a full tunnel round
trip, serialized in the resolver thread. This script measures the
candidate mechanisms for collapsing them:

  1. dispatch cost       — does enqueuing a program block on an RTT?
  2. serial fetch        — today's finalize_many: np.asarray per leaf.
  3. copy_to_host_async  — start ALL transfers, then block: if the runtime
                           honors async copies, G fetches cost ~1 RTT.
  4. threaded fetch      — ThreadPoolExecutor over blocking fetches: wins
                           only if the tunnel client allows concurrent
                           in-flight requests.

Run on the real chip:  python benchmarks/transport_micro.py
(no repo imports on the hot path — this is a pure jax transport probe)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _mk_outputs(n_groups: int, key):
    """Simulate one flush's device results: per group [bb,k,L] ids,
    [bb,k] items, [bb,k] scores — the Retriever's output pytree."""
    outs = []
    for g in range(n_groups):
        k1, k2, k3, key = jax.random.split(key, 4)
        outs.append((
            jax.random.randint(k1, (16, 10, 3), 0, 64, jnp.int32),
            jax.random.randint(k2, (16, 10), 0, 20000, jnp.int32),
            jax.random.uniform(k3, (16, 10), jnp.float32),
        ))
    jax.block_until_ready(outs)
    return outs, key


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def step(x):
        return (x @ x.T).sum(axis=1)

    x = jnp.ones((256, 256), jnp.float32)
    jax.block_until_ready(step(x))

    # 1. dispatch (enqueue) cost, no fetch
    for _ in range(3):
        t0 = time.perf_counter()
        rs = [step(x) for _ in range(10)]
        t1 = time.perf_counter()
        jax.block_until_ready(rs)
        t2 = time.perf_counter()
        print(f"dispatch x10: enqueue {1e3*(t1-t0):.1f} ms total "
              f"({1e2*(t1-t0):.1f} ms each), drain {1e3*(t2-t1):.1f} ms", flush=True)

    G = 6
    # 2. serial blocking fetch (today's finalize_many)
    for rep in range(3):
        outs, key = _mk_outputs(G, key)
        t0 = time.perf_counter()
        host = [tuple(np.asarray(a) for a in o) for o in outs]
        t1 = time.perf_counter()
        print(f"serial fetch {G}x3 leaves: {1e3*(t1-t0):.1f} ms", flush=True)

    # 3. copy_to_host_async then block
    for rep in range(3):
        outs, key = _mk_outputs(G, key)
        t0 = time.perf_counter()
        for o in outs:
            for a in o:
                a.copy_to_host_async()
        t1 = time.perf_counter()
        host = [tuple(np.asarray(a) for a in o) for o in outs]
        t2 = time.perf_counter()
        print(f"async-copy fetch: start {1e3*(t1-t0):.1f} ms, "
              f"drain {1e3*(t2-t1):.1f} ms, total {1e3*(t2-t0):.1f} ms", flush=True)

    # 4. threaded blocking fetch
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=G) as pool:
        for rep in range(3):
            outs, key = _mk_outputs(G, key)
            t0 = time.perf_counter()
            host = list(pool.map(lambda o: tuple(np.asarray(a) for a in o), outs))
            t1 = time.perf_counter()
            print(f"threaded fetch ({G} workers): {1e3*(t1-t0):.1f} ms", flush=True)

    # 5. dispatch-interleaved async copy: enqueue program g, start its
    # copies, enqueue g+1 ... then drain — the engine's proposed shape.
    for rep in range(3):
        xs = [jnp.full((256, 256), float(g + rep)) for g in range(G)]
        jax.block_until_ready(xs)
        t0 = time.perf_counter()
        rs = []
        for g in range(G):
            r = step(xs[g])
            r.copy_to_host_async()
            rs.append(r)
        t1 = time.perf_counter()
        host = [np.asarray(r) for r in rs]
        t2 = time.perf_counter()
        print(f"dispatch+async-copy x{G}: enqueue+start {1e3*(t1-t0):.1f} ms, "
              f"drain {1e3*(t2-t1):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
