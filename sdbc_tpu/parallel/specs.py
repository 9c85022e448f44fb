"""Parameter partition specs: tensor parallelism + FSDP over the named mesh.

The reference scales with accelerate/NCCL data parallelism only
(finetune_sd.py:360-364; SURVEY.md §2.3).  On TPU the mesh already carries a
``model`` axis (parallel/mesh.py); this module populates it the GSPMD way:
we annotate *parameter* shardings (Megatron-style column/row splits for
attention and MLPs, feature splits for the UNet conv stacks) and let XLA's
SPMD partitioner insert the psum/all-gather collectives over ICI.  No model
code changes — ``jax.jit`` propagates the committed input shardings through
the unmodified functional graphs.

Layout (axis ``model`` = m-way):

  UNet spatial transformer   q/k/v column (heads split, m | heads),
                             o row (+psum); GEGLU up-proj row (contraction
                             split, +psum), ff_out column, proj_out row
                             (+psum).  GEGLU is row-parallel rather than
                             Megatron column-parallel because the checkpoint
                             stores val/gate halves CONTIGUOUSLY in one
                             (d, 8d) matrix — a column split would slice
                             val and gate onto different shards and force a
                             resharding at the jnp.split.
  UNet ResBlocks             conv1/temb column over out-channels, GroupNorm
                             affine sharded with them (groups stay intact on
                             a shard when m | norm_groups), conv2 row over
                             in-channels (+psum).
  CLIP layers                q/k/v/fc1 column, o/fc2 row — stacked (scanned)
                             layer dim stays unsharded.
  VAE / embeddings / conv_in|out / time_mlp  replicated (negligible FLOPs or
                             awkward layouts; the batch axis still shards
                             over ``data``).

FSDP (axis ``data`` = n-way, ZeRO-3 style): every leaf is sharded on its
first dimension divisible by n that is not already carrying ``model``; XLA
all-gathers parameters at use and reduce-scatters gradients.  Applied to a
whole TrainState this also shards the fp32 Adam moments — the dominant
training-memory term (suffix matching maps ``mu/unet/.../q/w`` onto the same
rule as the parameter).  Blockwise-int8 adam8bit state is REJECTED outright:
its fused update kernel is an opaque ``pallas_call`` the SPMD partitioner
cannot split (see ``_reject_int8_state``).

Divisibility is validated per leaf: any rule whose ``model`` dim does not
divide evenly falls back to replicated — correctness never depends on the
mesh agreeing with the architecture.
"""
from __future__ import annotations

import re
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-suffix regex, spec template over the LAST len(template) dims).
# Leading dims beyond the template (e.g. the stacked CLIP layer axis) are
# unsharded.  Templates use the literal axis name "model"; None = replicated.
_TP_RULES = (
    # attention: q/k/v column-parallel (splits heads), o row-parallel
    (r"attn[12]?/(q|k|v)/w$", (None, "model")),
    (r"attn[12]?/(q|k|v)/b$", ("model",)),
    (r"attn[12]?/o/w$", ("model", None)),
    # UNet GEGLU FF: row-parallel up-proj (see module docstring), column
    # down-proj, row proj_out — one psum per FF, one per proj_out
    (r"geglu/w$", ("model", None)),
    (r"ff_out/w$", (None, "model")),
    (r"ff_out/b$", ("model",)),
    (r"proj_out/w$", (None, None, "model", None)),
    # CLIP MLP: Megatron column→row
    # segment-anchored: a bare "mlp/..." suffix would also match the
    # UNet's time_mlp, which the layout deliberately replicates (tiny
    # latency-bound matmuls — sharding them only buys collectives)
    (r"(?:^|/)mlp/fc1/w$", (None, "model")),
    (r"(?:^|/)mlp/fc1/b$", ("model",)),
    (r"(?:^|/)mlp/fc2/w$", ("model", None)),
    # UNet ResBlock: conv1/temb column over cout, GN affine follows,
    # conv2 row over cin.  "resnet(s/<i>|1|2)" covers both the block lists
    # (down/up "resnets/0") and the mid block ("resnet1"/"resnet2").
    (r"resnet(s/\d+|[12])/conv1/w$", (None, None, None, "model")),
    (r"resnet(s/\d+|[12])/conv1/b$", ("model",)),
    (r"resnet(s/\d+|[12])/temb/w$", (None, "model")),
    (r"resnet(s/\d+|[12])/temb/b$", ("model",)),
    (r"resnet(s/\d+|[12])/norm2/(scale|bias)$", ("model",)),
    (r"resnet(s/\d+|[12])/conv2/w$", (None, None, "model", None)),
)

# components whose interior the TP rules may shard; anything else (vae,
# embeddings, inception, bart, ...) stays replicated even when a ResBlock
# rule would match its key names.  text_encoder_2 (SDXL) reuses the CLIP
# rules — same layer structure, bigger hidden; its text_projection has no
# rule and stays replicated (one tiny matmul per prompt).
_TP_COMPONENTS = ("unet", "text_encoder", "text_encoder_2")


def _path_str(path) -> str:
    parts = []
    for e in path:
        if hasattr(e, "key"):
            parts.append(str(e.key))
        elif hasattr(e, "idx"):
            parts.append(str(e.idx))
        elif hasattr(e, "name"):
            parts.append(str(e.name))
        else:  # pragma: no cover - future key types
            parts.append(str(e))
    return "/".join(parts)


def _tp_spec_for(path: str, shape, m: int) -> Optional[tuple]:
    """Spec template (padded to leaf rank) for one leaf, or None."""
    wrapped = "/" + path + "/"
    in_component = any(f"/{c}/" in wrapped for c in _TP_COMPONENTS)
    if not in_component or m <= 1:
        return None
    for pat, tpl in _TP_RULES:
        if re.search(pat, path):
            if len(tpl) > len(shape):
                return None
            full = (None,) * (len(shape) - len(tpl)) + tuple(tpl)
            ok = all(t is None or (shape[i] % m == 0)
                     for i, t in enumerate(full))
            return full if ok else None
    return None


def _reject_int8_state(tree, what: str) -> None:
    """Refuse TP/FSDP over blockwise-int8 (adam8bit) optimizer state.

    The fused int8 moment update (train/adam8bit.py) is a single opaque
    pallas_call: the SPMD partitioner can't split it, so sharding its
    operands would force a full re-gather per step — or fail to compile.
    The finetune CLI refuses --use_8bit_adam with --tp/--fsdp up front;
    this guard covers library callers that build the state directly.
    """
    if any(str(getattr(l, "dtype", "")) == "int8"
           for l in jax.tree.leaves(tree)):
        raise ValueError(
            f"{what} cannot shard blockwise-int8 (adam8bit) optimizer "
            "state: the fused update kernel is an unpartitionable "
            "pallas_call. Use the standard fp32 AdamW (use_8bit_adam=False) "
            "with TP/FSDP — FSDP already removes the moment-memory "
            "motivation for int8 moments.")


def tp_specs(tree, mesh_or_size, *, component: Optional[str] = None,
             exclude: tuple = ()):
    """PartitionSpec pytree assigning the ``model`` axis Megatron-style.

    ``tree`` may be a params dict ({"unet": ..., "text_encoder": ..., ...}),
    a single component subtree (pass ``component=`` its name so the rules
    apply), or a whole TrainState (opt-state moments pick up the parameter
    rules by path suffix).  Leaves not matching any rule — and any leaf
    whose dims don't divide by the axis size — are replicated, P().
    ``exclude`` names components to replicate wholesale (from
    ``validate_tp``, e.g. a text encoder whose head count doesn't divide
    the axis).
    """
    m = (mesh_or_size.shape["model"] if isinstance(mesh_or_size, Mesh)
         else int(mesh_or_size))
    if m > 1:
        _reject_int8_state(tree, "tp_specs")

    def leaf_spec(path, leaf):
        p = _path_str(path)
        if component is not None:
            p = f"{component}/{p}"
        if any(f"/{c}/" in f"/{p}/" for c in exclude):
            return P()
        shape = getattr(leaf, "shape", ())
        tpl = _tp_spec_for(p, shape, m)
        return P() if tpl is None else P(*tpl)

    return jax.tree_util.tree_map_with_path(leaf_spec, tree)


def fsdp_specs(tree, mesh_or_size, *, base=None, min_size: int = 2 ** 12):
    """ZeRO-3 parameter/optimizer sharding over the ``data`` axis.

    Each leaf with at least ``min_size`` elements is sharded on its first
    dim divisible by the data-axis size that the ``base`` spec (e.g. a
    tp_specs tree) leaves free; small leaves stay replicated (an all-gather
    of a GroupNorm scale costs more latency than it saves memory).
    """
    n = (mesh_or_size.shape["data"] if isinstance(mesh_or_size, Mesh)
         else int(mesh_or_size))
    if n > 1:
        _reject_int8_state(tree, "fsdp_specs")

    def merge(b, leaf):
        shape = getattr(leaf, "shape", ())
        size = 1
        for s in shape:
            size *= s
        if n <= 1 or size < min_size:
            return b
        # extend the base (e.g. TP) spec with `data` on a free divisible dim
        tpl = tuple(b) + (None,) * (len(shape) - len(tuple(b)))
        return _add_axis_spec(tpl, shape, n)

    if base is None:
        base = jax.tree.map(lambda _: P(), tree)
    return jax.tree.map(merge, base, tree)


def _add_axis_spec(tpl, shape, n, axis: str = "data"):
    tpl = tuple(tpl)
    for i, (t, s) in enumerate(zip(tpl, shape)):
        if t is None and s % n == 0:
            lst = list(tpl)
            lst[i] = axis
            return P(*lst)
    return P(*tpl) if any(t is not None for t in tpl) else P()


def shard_tree(tree, mesh: Mesh, specs):
    """device_put every leaf with its NamedSharding(mesh, spec)."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)


def validate_tp(cfg, m: int) -> tuple:
    """Check architecture/mesh alignment the per-leaf divisibility check
    can't see (head splits, GroupNorm group alignment).

    Raises when the UNet — the component TP exists for (~90% of sampling
    FLOPs) — can't shard cleanly.  A misaligned text encoder is NOT an
    error: it returns ``("text_encoder",)`` so callers pass it to
    ``tp_specs(exclude=...)`` and replicate CLIP instead (e.g. SD-1.5 at
    m=8: UNet heads 8 shard, CLIP heads 12 don't — CLIP replicates).
    Returns the tuple of component names to exclude (possibly empty).
    """
    if m <= 1:
        return ()
    u, c = cfg.unet, cfg.clip
    # only levels that HAVE attention constrain the head split (SDXL-base
    # declares heads=(5, 10, 20) but level 0 carries no transformer — its
    # nominal 5 heads never materialize as parameters)
    attn_heads = [h for h, has in zip(u.heads_per_level, u.cross_attn_blocks)
                  if has]
    attn_heads.append(u.heads_per_level[-1])  # the mid transformer's
    if any(h % m for h in attn_heads):
        raise ValueError(f"model axis {m} must divide the UNet head count "
                         f"at every attention level ({tuple(attn_heads)})")
    if u.norm_groups % m:
        raise ValueError(f"model axis {m} must divide UNet norm_groups "
                         f"{u.norm_groups} (keeps GroupNorm groups intact "
                         f"per shard)")
    excl = ("text_encoder",) if c.heads % m else ()
    c2 = getattr(cfg, "clip2", None)
    if c2 is not None and c2.heads % m:
        excl += ("text_encoder_2",)
    return excl
