"""Profile the per-iteration kernel-launch floor (VERDICT r3 item 1).

Compiles the fused multi-iteration VB program for a given family, dumps the
optimized HLO, and reports (a) instruction counts by opcode inside the
iteration while-loop body, (b) warm it/s, (c) estimated per-iteration launch
overhead.  Usage: python benchmarks/profile_floor.py {gmm|lds|dmbd} [--hlo out.txt]
"""
import os
import sys
import time
import re
import collections

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_gmm(n=10_000, d=8, K=16, iters=30):
    import jax
    import jax.numpy as jnp
    from pyvbmp_tpu.models import GaussianMixtureModel
    from pyvbmp_tpu.dists.mixture import _mixture_multi, _mixture_step
    from functools import partial

    key = jax.random.key(0)
    X = jax.random.normal(key, (n, d)) + 3.0 * jax.random.randint(
        jax.random.key(1), (n, 1), 0, 4
    ).astype(jnp.float32)
    m = GaussianMixtureModel(K, d)
    Xv = m._reshape_data(X)
    fn = jax.jit(
        partial(_mixture_multi, m.event_dim, m.batch_dim),
        static_argnames=("iters",),
    )
    args = (m.pi, m.dist, Xv, 1.0)
    kwargs = dict(iters=iters)
    return fn, args, kwargs, iters


def build_lds(T=200, b=100, o=4, h=2, iters=30):
    import jax
    import numpy as np
    from pyvbmp_tpu.models import LinearDynamicalSystems

    data = np.asarray(
        jax.random.normal(jax.random.key(0), (T, b, o)), np.float32
    )
    m = LinearDynamicalSystems(
        obs_shape=(o,), hidden_dim=h, regression_dim=0, latent_noise="independent"
    )
    m.update(data, iters=1)  # warm caches / shapes
    y, u, r = m.reshape_inputs(data)
    fn = jax.jit(m._vb_multi, static_argnames=("iters",))
    args = (m.x0, m.A, m.obs_model, y, u, r, 1.0)
    kwargs = dict(iters=iters)
    return fn, args, kwargs, iters


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "gmm"
    hlo_out = None
    if "--hlo" in sys.argv:
        hlo_out = sys.argv[sys.argv.index("--hlo") + 1]

    import jax

    if which == "gmm":
        fn, args, kwargs, iters = build_gmm()
    elif which == "lds":
        fn, args, kwargs, iters = build_lds()
    else:
        raise SystemExit(f"unknown target {which}")

    lowered = fn.lower(*args, **kwargs)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compile: {time.time()-t0:.1f}s")

    txt = compiled.as_text()
    if hlo_out:
        with open(hlo_out, "w") as f:
            f.write(txt)
        print(f"HLO -> {hlo_out} ({len(txt)} bytes)")

    # Find while-loop body computations and count instructions.
    # Optimized HLO text: computations start with "%name (args) -> type {" or
    # "ENTRY %name ...". The scan becomes a while op whose body computation
    # name contains "while_body" or "body".
    comps = collections.OrderedDict()
    cur = None
    for line in txt.splitlines():
        mstart = re.match(r"^\s*(?:ENTRY\s+)?%?([\w\.\-]+)\s*\([^)]*\)\s*->.*{", line)
        if mstart:
            cur = mstart.group(1)
            comps[cur] = []
            continue
        if cur is not None:
            if line.strip() == "}":
                cur = None
                continue
            s = line.strip()
            if s.startswith("ROOT "):
                s = s[5:]
            m = re.match(r"%?[\w\.\-]+\s*=\s*\S+\s+(\w+)\(", s)
            if m:
                comps[cur].append(m.group(1))

    body_names = [c for c in comps if "body" in c]
    print(f"\ncomputations: {len(comps)}; while bodies: {body_names}")
    for bn in body_names:
        ops = comps[bn]
        cnt = collections.Counter(ops)
        # fusion kernels are the launch unit; each non-fused op that is not
        # free (tuple/parameter/constant/gte) is also a launch
        free = {"parameter", "constant", "get-tuple-element", "tuple", "bitcast"}
        launches = [o for o in ops if o not in free]
        print(f"\n== {bn}: {len(ops)} instrs, ~{len(launches)} launch-ish ops")
        for op, n in cnt.most_common(30):
            print(f"   {op:30s} {n}")

    # total across all computations (calls inside the body reference other
    # computations; count those reachable too — crude upper bound)
    allops = collections.Counter()
    for c, ops in comps.items():
        allops.update(ops)
    print("\n== whole module op histogram (top 25):")
    for op, n in allops.most_common(25):
        print(f"   {op:30s} {n}")

    # Warm timing (compiled signature excludes static kwargs)
    r = compiled(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[-1])
    best = np.inf
    for _ in range(5):
        t0 = time.time()
        r = compiled(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[-1])
        best = min(best, time.time() - t0)
    print(f"\nwarm best: {best*1e3:.2f} ms for {iters} iters -> "
          f"{best/iters*1e3:.3f} ms/iter, {iters/best:.1f} it/s")


if __name__ == "__main__":
    main()
