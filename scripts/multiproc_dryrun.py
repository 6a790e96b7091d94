"""Multi-process (DCN) dryrun: the dp-across-hosts x tp-within-host story
executed across REAL process boundaries.

`parallel/mesh.py::make_mesh` lays dp across hosts and tp within a host
when `jax.distributed` is initialized (the TPU-native stand-in for the
reference's torchrun+NCCL launch, reference: tp.py:23-56). The in-repo
tests cover that layout only on a single-process virtual mesh; this script
runs it for real: N processes x 4 local virtual CPU devices, gloo-backed
cross-process collectives, hybrid (dcn, ici) device mesh, sharded
prefill + decode step, and a per-process check that the distributed
logits match an unsharded single-device run.

Launcher (spawns the workers):   python scripts/multiproc_dryrun.py
Worker (internal):               python scripts/multiproc_dryrun.py PID NPROC PORT
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NPROC = 2
LOCAL_DEVICES = 4


def worker(pid: int, nproc: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc
    assert jax.device_count() == nproc * LOCAL_DEVICES

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cold_compress_tpu.caches import CacheSpec
    from cold_compress_tpu.models import transformer as T
    from cold_compress_tpu.models.config import ModelConfig
    from cold_compress_tpu.parallel.mesh import (
        make_mesh,
        shard_caches,
        shard_params,
        validate_tp,
    )

    tp, dp = LOCAL_DEVICES, nproc
    cfg = ModelConfig.from_name("TestTiny").replace(
        n_head=8, n_kv_head=4, dim=512, intermediate_size=1024
    )
    validate_tp(cfg, tp)
    mesh = make_mesh(tp=tp, dp=dp)  # hybrid path: process_count() > 1
    # dp must span processes: every mesh row (a dp slice) lives on one host.
    rows = np.vectorize(lambda d: d.process_index)(mesh.devices)
    assert all(len(set(r)) == 1 for r in rows.tolist()), rows

    def build(batch):
        params = T.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
        specs = tuple(
            CacheSpec(
                cache_strategy="heavy_hitter",
                max_cache_length=32,
                max_seq_length=64,
                global_tokens=2,
                recent_window=4,
                prompt_compression_strategy="heavy_hitter",
            )
            for _ in range(cfg.n_layer)
        )
        caches = T.init_caches(cfg, specs, batch, jnp.float32)
        return params, caches

    def step(params, rope, caches, tokens, token1):
        logits, caches = T.prefill(cfg, params, rope, caches, tokens, 8)
        logits2, _ = T.decode_step(
            cfg, params, rope, caches, token1, jnp.int32(8)
        )
        return logits + logits2

    rope = T.make_rope_table(cfg)
    B = dp
    tokens_h = np.tile(np.arange(8, dtype=np.int32)[None], (B, 1))
    tok1_h = np.full((B,), 3, np.int32)

    # Distributed run: every process feeds the identical global value.
    params, caches = build(B)
    params = shard_params(params, mesh, cfg)
    caches = shard_caches(caches, mesh)
    tokens = jax.device_put(tokens_h, NamedSharding(mesh, P("dp", None)))
    tok1 = jax.device_put(tok1_h, NamedSharding(mesh, P("dp")))
    with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
        logits = jax.jit(step)(params, rope, caches, tokens, tok1)
    # Replicate so every process can fetch the full [B, vocab] result.
    logits = jax.jit(
        lambda x: x, out_shardings=NamedSharding(mesh, P())
    )(logits)
    got = np.asarray(jax.device_get(logits))

    # Reference: same step, unsharded, on one local device.
    params_r, caches_r = build(B)
    dev = jax.local_devices()[0]
    want = np.asarray(
        jax.device_get(
            jax.jit(step, device=dev)(
                jax.device_put(params_r, dev),
                jax.device_put(rope, dev),
                jax.device_put(caches_r, dev),
                jax.device_put(tokens_h, dev),
                jax.device_put(tok1_h, dev),
            )
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    print(
        f"MULTIPROC OK pid={pid}/{nproc} mesh=dp{dp}xtp{tp} "
        f"hosts-per-dp-row=1 max|diff|={np.abs(got - want).max():.2e}",
        flush=True,
    )


def launch() -> None:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, str(pid), str(NPROC), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(NPROC)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    ok = True
    for pid, (p, out) in enumerate(zip(procs, outs)):
        marker = f"MULTIPROC OK pid={pid}"
        if p.returncode != 0 or marker not in out:
            ok = False
            print(f"--- worker {pid} rc={p.returncode}\n{out[-3000:]}")
        else:
            print([ln for ln in out.splitlines() if marker in ln][0])
    if not ok:
        sys.exit(1)
    print(f"multiproc dryrun ok: {NPROC} processes x {LOCAL_DEVICES} devices")


if __name__ == "__main__":
    if len(sys.argv) == 4:
        worker(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
    else:
        launch()
