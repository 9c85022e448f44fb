"""Goodreads book-cover dataset + host input pipeline.

Replaces the reference's CustomDataset/DataLoader (utils.py:67-174, SURVEY.md
C6/C8/E11): CSV-driven example list; per-example JPEG decode → RGB → bicubic
resize to img_size² → [-1,1] float (NHWC, the TPU conv layout) → random
training-template prompt (optional legible-text suffix w.p.
``legible_text_prob``, optional description append) → CLIP tokenize padded to
77.

The loader replaces torch's worker processes with a thread pool + double
-buffered prefetch, emits fixed-shape (grad_accum, micro, ...) batches ready
for the jitted train step, and slices the global batch per host for multi-host
meshes (parallel.host_local_batch_slice).
"""
from __future__ import annotations

import concurrent.futures as cf
import dataclasses
import os
import random
import threading
import time
from typing import Iterator, Optional

import numpy as np

from sdbc_tpu.data import templates
from sdbc_tpu.utils.image import decode_and_prepare


@dataclasses.dataclass
class DatasetConfig:
    data_root: str = "./"
    csv_name: str = "df_train.csv"
    img_size: int = 512                 # reference utils.py:74
    size: Optional[int] = None          # cap on examples (training_size)
    legible_text_prob: float = 0.1      # reference utils.py:87
    include_desc: bool = False
    max_length: int = 77
    seed: int = 42
    use_native: bool = True  # C++ decode core when built (native/loader.cc)
    # "native" (this framework's rewritten wording) or "reference"
    # (byte-exact reference strings + first-slot legible interpolation,
    # templates.py REFERENCE_* — for apples-to-apples comparisons)
    prompt_bank: str = "native"
    # textual inversion: a registered placeholder (e.g. "<cover-style>")
    # appended to every training prompt as ", in the style of <tok>" so the
    # new embedding rows absorb the dataset's cover style
    # (train/textual_inversion.py)
    style_token: str = ""


class GoodreadsDataset:
    """Map-style dataset over the preprocessed Goodreads cover CSV."""

    def __init__(self, cfg: DatasetConfig, tokenizer, test_speed: bool = False,
                 tokenizer2=None):
        """``tokenizer2``: SDXL's second (OpenCLIP) tokenizer — when set,
        every item/batch additionally carries ``input_ids_2`` (the SAME
        drawn prompt encoded by both tokenizers, as the dual-encoder
        conditioning stack expects)."""
        import pandas as pd

        self.cfg = cfg
        self.tokenizer = tokenizer
        self.tokenizer2 = tokenizer2
        self.test_speed = test_speed
        csv_path = os.path.join(cfg.data_root, cfg.csv_name)
        self.df = pd.read_csv(csv_path, index_col=0)
        if cfg.size is not None:
            if cfg.size > len(self.df):
                print(f"WARNING: requested {cfg.size} examples but the dataset "
                      f"has {len(self.df)}; using all of them")
            self.df = self.df.iloc[: cfg.size]
        self.image_dir = os.path.join(cfg.data_root, "images", "images")
        # Prompt draws are keyed on (seed, idx, per-idx visit count) so the
        # prompt↔image pairing is independent of thread scheduling in the
        # loader (the reference's shared torch RNG stream is worker-order
        # dependent, utils.py:130-146; here both the native and thread-pool
        # paths produce identical, reproducible prompts) while still varying
        # across epochs via the visit count.
        self._visit_lock = threading.Lock()
        self._visit_counts: dict = {}
        self._epoch: Optional[int] = None

    def set_epoch(self, epoch: Optional[int]) -> None:
        """Key prompt draws on (seed, idx, epoch) instead of the per-process
        visit count.  Visit counts are process-local: under multi-host
        loading an index can migrate hosts between epochs, resetting its
        count and replaying its epoch-0 prompt.  An explicit epoch is
        host-independent (and equals the visit count in the single-host
        one-pass-per-epoch case, so prompts are unchanged there).
        make_dataloader(epoch=...) calls this.
        """
        self._epoch = epoch

    def __len__(self) -> int:
        return len(self.df)

    def image_path(self, idx: int) -> str:
        return os.path.join(self.image_dir, f"{self.df.index[idx]}.jpg")

    def _prompt_rng(self, idx: int) -> random.Random:
        """Deterministic per-(seed, idx, epoch-or-visit) RNG for template
        draws."""
        if self._epoch is not None:
            visit = self._epoch
        else:
            with self._visit_lock:
                visit = self._visit_counts.get(idx, 0)
                self._visit_counts[idx] = visit + 1
        # tuple-of-ints hash is deterministic across processes (only str/bytes
        # hashing is randomized by PYTHONHASHSEED)
        return random.Random(hash((self.cfg.seed, idx, visit)))

    def prompt_for(self, idx: int, rng: Optional[random.Random] = None) -> str:
        row = self.df.iloc[idx]
        desc = None
        if self.cfg.include_desc and "book_desc" in row and isinstance(
                row.get("book_desc"), str):
            desc = row["book_desc"]
        author = str(row.get("book_authors", ""))
        title = str(row.get("book_title", ""))
        if rng is None:
            rng = self._prompt_rng(idx)
        if self.cfg.prompt_bank == "reference":
            prompt = templates.format_reference_training_prompt(
                author, title, desc=desc, rng=rng,
                legible_text_prob=self.cfg.legible_text_prob,
                include_desc=self.cfg.include_desc)
        else:
            prompt = templates.format_training_prompt(
                author, title, desc=desc, rng=rng,
                legible_text_prob=self.cfg.legible_text_prob)
        if self.cfg.style_token:
            prompt = f"{prompt}, in the style of {self.cfg.style_token}"
        return prompt

    def __getitem__(self, idx: int) -> dict:
        t0 = time.perf_counter()
        pixels = decode_and_prepare(self.image_path(idx), self.cfg.img_size)
        prompt = self.prompt_for(idx)
        ids = np.asarray(self.tokenizer.encode(prompt, self.cfg.max_length),
                         np.int32)
        out = {"pixel_values": pixels, "input_ids": ids, "prompt": prompt}
        if self.tokenizer2 is not None:
            out["input_ids_2"] = np.asarray(
                self.tokenizer2.encode(prompt, self.cfg.max_length), np.int32)
        if self.test_speed:  # reference's per-item timing hook (utils.py:120-122)
            print(f"item {idx}: {time.perf_counter() - t0:.4f}s")
        return out


def decode_pixels(dataset: GoodreadsDataset, indices, num_workers: int = 4,
                  pool=None) -> np.ndarray:
    """Decode dataset images → (N, S, S, 3) float32 in [-1, 1].

    The ONE pixel-decode dispatch (native C++ batch decode vs PIL) shared
    by make_dataloader and the latent-cache builder — cached latents must
    encode exactly the pixels a non-cached run would see.  ``pool``: an
    optional ThreadPoolExecutor for the PIL path (serial otherwise).
    """
    from sdbc_tpu.data import native_loader

    if dataset.cfg.use_native and native_loader.available():
        paths = [dataset.image_path(i) for i in indices]
        return native_loader.decode_batch(paths, dataset.cfg.img_size,
                                          threads=num_workers)
    mapper = pool.map if pool is not None else map
    return np.stack(list(mapper(
        lambda i: decode_and_prepare(dataset.image_path(i),
                                     dataset.cfg.img_size), indices)))


def make_dataloader(dataset: GoodreadsDataset, micro_batch: int,
                    grad_accum: int = 1, shuffle: bool = True,
                    seed: int = 42, num_workers: int = 4,
                    drop_last: bool = True, mesh=None,
                    latent_cache=None,
                    epoch: Optional[int] = None) -> Iterator[dict]:
    """Yield {"pixel_values": (A, B, H, W, 3), "input_ids": (A, B, 77)} batches.

    Thread-pool decode with one-batch lookahead prefetch (the torch
    num_workers=4 pipeline equivalent, reference utils.py:173-174).

    With ``mesh``, each host decodes ONLY the rows that land on its local
    devices (accelerate's per-process dataloader sharding,
    finetune_sd.py:363-364) and batches are assembled into global jax.Arrays
    sharded over the ``data`` axis.  micro_batch stays the GLOBAL micro batch.

    With ``latent_cache`` (a (mean, logvar) pair of (N, h, w, c) arrays from
    train.latent_cache.open_latent_cache), image decode and the in-step VAE
    encode are skipped entirely: batches carry "latent_mean"/"latent_logvar"
    instead of "pixel_values" (prompts are still drawn per visit as usual).

    ``epoch``: pass the training epoch so prompt draws key on it instead of
    the process-local visit count (required for multi-host determinism —
    see GoodreadsDataset.set_epoch).
    """
    # unconditional (None included): a later epoch=None loader must not
    # silently replay a previously-set epoch's prompt draws — None restores
    # the per-process visit-count mode (see set_epoch)
    dataset.set_epoch(epoch)
    step = micro_batch * grad_accum
    order = list(range(len(dataset)))
    rng = random.Random(seed)
    if shuffle:
        rng.shuffle(order)
    n_batches = len(order) // step if drop_last else -(-len(order) // step)

    local_sel = None  # positions within a step batch this host loads
    if mesh is not None:
        from sdbc_tpu.parallel.mesh import (host_local_batch_indices,
                                            make_global_batch)

        local_micro = host_local_batch_indices(micro_batch, mesh)
        local_sel = np.concatenate(
            [a * micro_batch + local_micro for a in range(grad_accum)])
        n_micro_local = len(local_micro)

    def load_batch(batch_indices):
        if local_sel is not None:
            batch_indices = [batch_indices[i] for i in local_sel]
        # prompt draws are serial in all paths (per-idx-keyed rng makes them
        # order-independent anyway; serial keeps the code one shape).
        # Draw each prompt ONCE per index (prompt_for advances the per-idx
        # visit count) and encode it with both tokenizers when dual.
        prompts = [dataset.prompt_for(i) for i in batch_indices]
        ids = np.stack([
            np.asarray(dataset.tokenizer.encode(pr, dataset.cfg.max_length),
                       np.int32) for pr in prompts])
        ids2 = None
        if dataset.tokenizer2 is not None:
            ids2 = np.stack([
                np.asarray(dataset.tokenizer2.encode(
                    pr, dataset.cfg.max_length), np.int32) for pr in prompts])
        if latent_cache is not None:
            cmean, clogvar = latent_cache
            idx = np.asarray(batch_indices)
            payload = {
                "latent_mean": np.ascontiguousarray(cmean[idx]),
                "latent_logvar": np.ascontiguousarray(clogvar[idx]),
            }
        else:
            payload = {"pixel_values": decode_pixels(
                dataset, batch_indices, num_workers, pool=pil_pool)}
        payload["input_ids"] = ids
        if ids2 is not None:
            payload["input_ids_2"] = ids2
        mb = micro_batch if local_sel is None else n_micro_local
        a = len(batch_indices) // mb
        out = {k: v.reshape(a, mb, *v.shape[1:]) for k, v in payload.items()}
        if mesh is not None:
            out = make_global_batch(out, mesh, batch_dim=1)
        return out

    def pad_to_step(idxs):
        # wrap partial batches, cycling as often as needed (a dataset
        # smaller than step/2 would otherwise underfill and break the
        # jitted step's fixed (grad_accum, micro) shape)
        while len(idxs) < step:
            idxs = idxs + order[: step - len(idxs)]
        return idxs

    with cf.ThreadPoolExecutor(max_workers=1) as prefetcher, \
            cf.ThreadPoolExecutor(max_workers=num_workers) as pil_pool:
        future = None
        for b in range(n_batches):
            if future is None:
                future = prefetcher.submit(
                    load_batch, pad_to_step(order[b * step:(b + 1) * step]))
            batch = future.result()
            if b + 1 < n_batches:
                future = prefetcher.submit(
                    load_batch,
                    pad_to_step(order[(b + 1) * step:(b + 2) * step]))
            yield batch
