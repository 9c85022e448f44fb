"""sdbc_tpu — TPU-native Stable Diffusion book-cover framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the
``Edenzzzz/Stable-Diffusion-for-book-cover-generation`` reference (see
/root/repo/SURVEY.md): SD-1.x fine-tuning (CLIP text encoder and/or UNet) on the
Goodreads book-cover dataset, a single jit-compiled classifier-free-guidance
sampling pipeline (DDPM/DDIM/PNDM), an input pipeline for the cover dataset, and
FID evaluation with an InceptionV3 pool3 feature extractor.

Layout (bottom-up):
  utils/     dtype policy, PRNG streams, image helpers, config
  ops/       NN primitives (NHWC convs, norms, attention) + Pallas TPU kernels
  models/    CLIP text encoder, AutoencoderKL, UNet2DCondition, InceptionV3
  diffusion/ beta schedules, DDPM/DDIM/PNDM schedulers, sampling pipeline
  data/      CLIP BPE tokenizer, prompt templates, Goodreads dataset, preprocess
  parallel/  named-axis Mesh over ICI/DCN, sharding rules (DP today, general axes)
  train/     pjit'ed train step, optax AdamW + cosine, grad accum, checkpointing
  eval/      FID math + stats, prompt-grid visualisation
  cli/       finetune / inference / precalc_fid_stats / fid entry points
"""

__version__ = "0.1.0"
