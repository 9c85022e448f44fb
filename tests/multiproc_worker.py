"""Worker for the 2-process jax.distributed integration test.

Each OS process owns 4 virtual CPU devices (XLA_FLAGS set by the parent);
together they form the 8-device pod.  The worker exercises the REAL
multi-host runtime path end to end — the launcher semantics of the
reference's ``notebook_launcher(training_function, num_processes=N)``
(finetune_sd.py:590-593):

  cli.common.maybe_init_distributed (explicit COORDINATOR_ADDRESS wiring)
  → parallel.make_mesh over the GLOBAL device set
  → per-host input slicing (host_local_batch_indices) +
    make_global_batch (jax.make_array_from_process_local_data)
  → replicate_tree_global parameter placement
  → ONE DP train step (psum gradient allreduce over gloo)
  → ONE sharded sampling call

and writes {loss, trainable checksum, sample mean} to
$SDBC_MP_OUT/result_<role>.json.  Run with SDBC_NUM_PROCESSES unset for
the single-process 8-device reference (same code path, no coordinator).
"""
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdbc_tpu.cli.common import maybe_init_distributed

maybe_init_distributed()

import jax.numpy as jnp
import numpy as np

from sdbc_tpu.diffusion.pipeline import PipelineConfig, sample
from sdbc_tpu.models import clip, unet, vae
from sdbc_tpu.parallel.mesh import (MeshConfig, data_sharding,
                                    host_local_batch_indices,
                                    make_global_batch, make_mesh,
                                    replicate_tree_global)
from sdbc_tpu.train.trainer import (TrainConfig, init_train_state,
                                    make_train_step)


def main():
    out_dir = os.environ["SDBC_MP_OUT"]
    role = os.environ.get("SDBC_PROCESS_ID", "single")
    nproc = int(os.environ.get("SDBC_NUM_PROCESSES", "1"))
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 8 // nproc
    assert jax.process_count() == nproc

    cfg = PipelineConfig.tiny()
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    params = {"text_encoder": clip.init(k1, cfg.clip),
              "unet": unet.init(k2, cfg.unet),
              "vae": vae.init(k3, cfg.vae)}

    mesh = make_mesh(MeshConfig(data=8))
    tcfg = TrainConfig(train_unet=False, train_text_encoder=True,
                       grad_accum=1, learning_rate=1e-4, num_examples=100,
                       lr_scale_by_dp=False)

    # the full global batch exists host-side on every process (deterministic
    # rng); each host hands ONLY its local rows to make_global_batch — the
    # per-host dataloader sharding contract
    rng = np.random.RandomState(7)
    gb = 8
    pixels = rng.standard_normal((1, gb, 32, 32, 3)).astype(np.float32)
    ids = np.ones((1, gb, cfg.clip.ctx), np.int32)
    idx = host_local_batch_indices(gb, mesh)
    local = {"pixel_values": pixels[:, idx], "input_ids": ids[:, idx]}
    batch = make_global_batch(local, mesh, batch_dim=1)

    def barrier(name, timeout_ms=1_500_000):
        """Coordination-service barrier (long timeout) between compile and
        execute: gloo's first-collective rendezvous times out after 30 s,
        and independent jit compiles on a loaded single-core host skew
        process arrival far beyond that — so compile ahead-of-time (no
        collectives run during compilation), THEN meet here, THEN execute
        in lockstep.  No-op single-process."""
        from jax._src import distributed

        c = distributed.global_state.client
        if c is not None:
            c.wait_at_barrier(name, timeout_in_ms=timeout_ms)

    state = replicate_tree_global(
        init_train_state(params, tcfg, compute_dtype=jnp.float32), mesh)
    step = make_train_step(cfg, tcfg, mesh=mesh, dp_size=8,
                           compute_dtype=jnp.float32)
    step_c = step.lower(state, batch, jax.random.key(5)).compile()
    barrier("sdbc_mp_train_compiled")
    state1, metrics = step_c(state, batch, jax.random.key(5))
    loss = float(metrics["loss"])
    # replicated post-update trainable tree → one order-independent scalar
    checksum = float(sum(
        jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(state1.trainable)))

    # sampling over the same mesh (the inference half of the runtime)
    gparams = replicate_tree_global(params, mesh)
    cond = np.ones((gb, cfg.clip.ctx), np.int32)
    uncond = np.zeros((gb, cfg.clip.ctx), np.int32)
    lat = np.asarray(jax.random.normal(jax.random.key(1), (gb, 8, 8, 4)),
                     np.float32)

    def shard(x, nd):
        sh = data_sharding(mesh, nd)
        loc = x[np.asarray(host_local_batch_indices(x.shape[0], mesh))]
        return jax.make_array_from_process_local_data(sh, loc)

    s_args = (gparams, shard(cond, 2), shard(uncond, 2), shard(lat, 4),
              jax.random.key(0), jnp.float32(7.5))
    s_kw = dict(cfg=cfg, num_inference_steps=2, compute_dtype=jnp.float32)
    sample_c = sample.lower(*s_args, **s_kw).compile()
    barrier("sdbc_mp_sample_compiled")
    imgs = sample_c(*s_args)
    sample_mean = float(jnp.mean(imgs))

    result = {"role": role, "nproc": nproc, "loss": loss,
              "checksum": checksum, "sample_mean": sample_mean,
              "process_index": jax.process_index()}
    with open(os.path.join(out_dir, f"result_{role}.json"), "w") as f:
        json.dump(result, f)
    print(f"[mp-worker {role}] {result}", flush=True)


if __name__ == "__main__":
    main()
