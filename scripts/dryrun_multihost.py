"""2-process multihost dryrun on virtual CPU devices.

Validates the multihost story end-to-end without TPU pods: two OS processes
(each presenting 4 virtual CPU devices) join one JAX distributed runtime,
build a GLOBAL data=8 mesh, assemble per-host batch shards into global
arrays (parallel/mesh.host_local_batch_to_global), and run one jitted
data-parallel loss+grad step whose gradient reduction crosses the process
boundary. Both processes must print the SAME global loss — proof the
cross-host collective ran.

This is the TPU-native analog of the reference's multi-node DeepSpeed
launcher handshake (/root/reference/train_ds_medplib.py:383-420).

Usage: python scripts/dryrun_multihost.py
"""

import os
import subprocess
import sys


def worker(coordinator: str, num_processes: int, process_id: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    jax.config.update("jax_platforms", "cpu")
    from medplib_tpu.parallel.mesh import (host_local_batch_to_global,
                                           init_distributed, make_mesh)
    init_distributed(coordinator, num_processes, process_id)
    import jax.numpy as jnp
    import numpy as np

    from medplib_tpu.config import LlamaConfig, MeshConfig
    from medplib_tpu.models import llama

    n = len(jax.devices())
    assert n == 8, f"global device count {n} != 8"
    mesh = make_mesh(MeshConfig(data=8, expert=1, model=1))

    cfg = LlamaConfig.tiny()
    params = llama.init_llama(jax.random.PRNGKey(0), cfg)

    # per-host data loading: each process materializes only its half of the
    # global batch (the SAME deterministic global batch, sliced by rank)
    global_bs, t = 8, 16
    rng = np.random.default_rng(0)
    full = rng.integers(0, cfg.vocab_size, size=(global_bs, t))
    per = global_bs // num_processes
    local = full[process_id * per:(process_id + 1) * per].astype(np.int32)
    ids = host_local_batch_to_global(mesh, {"input_ids": local})["input_ids"]

    def loss_fn(p, ids):
        h, _, _ = llama.forward(p, cfg, llama.embed(p, ids))
        logits = llama.logits(p, h)
        tgt = jnp.roll(ids, -1, axis=1)
        lp = jax.nn.log_softmax(logits, -1)
        return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))

    with jax.set_mesh(mesh):
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params, ids)
        gn = jax.jit(lambda g: jnp.sqrt(sum(
            jnp.sum(jnp.square(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(g))))(grads)
    print(f"RESULT pid={process_id} loss={float(loss):.6f} "
          f"gnorm={float(gn):.6f}", flush=True)


def main() -> int:
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=4").strip()
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", coord, "2", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    ok = all(p.returncode == 0 for p in procs)
    results = []
    for o in outs:
        for line in o.splitlines():
            if line.startswith("RESULT"):
                results.append(line)
                print(line)
    if not ok or len(results) != 2:
        print("FAILED")
        for o in outs:
            print(o[-2000:])
        return 1
    # both processes must agree on the global loss (cross-host reduction)
    l0 = results[0].split("loss=")[1]
    l1 = results[1].split("loss=")[1]
    if l0 != l1:
        print(f"loss mismatch: {l0} vs {l1}")
        return 1
    print("MULTIHOST DRYRUN OK")
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))
    else:
        sys.exit(main())
