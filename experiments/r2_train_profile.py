"""Profile ONE training step (mode B: UNet + grad-ckpt + int8 Adam) and
print the HLO self-time breakdown. Run alone.
  PYTHONPATH=. python experiments/r2_train_profile.py
"""
import glob, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from sdbc_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from sdbc_tpu.diffusion.pipeline import PipelineConfig
from sdbc_tpu.models import clip, unet, vae
from sdbc_tpu.train.trainer import TrainConfig, init_train_state, make_train_step

cfg = PipelineConfig.sd15()
tcfg = TrainConfig(train_unet=True, train_text_encoder=False, grad_accum=4,
                   learning_rate=5e-6, num_examples=1000,
                   use_8bit_adam=True, grad_ckpt=True)
MICRO = 2
key = jax.random.key(0)
@jax.jit
def build(k):
    k1, k2, k3 = jax.random.split(k, 3)
    return {"text_encoder": clip.init(k1, cfg.clip),
            "unet": unet.init(k2, cfg.unet), "vae": vae.init(k3, cfg.vae)}
params = build(key)
state = init_train_state(params, tcfg, compute_dtype=jnp.bfloat16)
del params
step = make_train_step(cfg, tcfg, compute_dtype=jnp.bfloat16, donate=True)
batch = {"pixel_values": jnp.zeros((tcfg.grad_accum, MICRO, 512, 512, 3),
                                   jnp.bfloat16),
         "input_ids": jnp.ones((tcfg.grad_accum, MICRO, 77), jnp.int32)}

def run(s):
    s, m = step(s, batch, jax.random.key(2))
    jax.block_until_ready(m["loss"]); np.asarray(m["loss"])
    return s
state = run(state)
print("[trainprof] warmed", flush=True)
log_dir = "/tmp/sdbc_train_trace"
os.system(f"rm -rf {log_dir}")
jax.profiler.start_trace(log_dir)
state = run(state)
jax.profiler.stop_trace()
paths = glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True)
print("[trainprof] xplane:", paths, flush=True)
from xprof.convert import raw_to_tool_data
data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
mode = "wb" if isinstance(data, bytes) else "w"
with open("/tmp/sdbc_train_hlo.out", mode) as f:
    f.write(data)
print("[trainprof] wrote /tmp/sdbc_train_hlo.out", flush=True)
