"""Tensor-parallel serving shardings (latency mode).

The reference has no tensor parallelism at all — its serving path is one
CUDA GPU (inference.py:13 `CUDA_VISIBLE_DEVICES`). The TPU-native latency
story: Megatron-style sharding of the UNet's transformer stacks over the
mesh's ``model`` axis, expressed purely as GSPMD parameter shardings — XLA
inserts the collectives (the scaling-book recipe: annotate, compile,
profile):

  * attention q/k/v (and the adapter's ``to_k_ip``/``to_v_ip``) projections:
    column-sharded on the output dim — each device projects and attends its
    own subset of heads; sdpa's ``bqhd,bkhd->bhqk`` einsums batch over the
    (sharded) head axis with no communication,
  * attention ``to_out`` / FF ``out_proj``: row-sharded on the input dim —
    each device contracts its local heads/columns; GSPMD emits ONE
    all-reduce per site to sum the partial outputs (the bias is replicated
    and added once, post-reduction),
  * GEGLU ``geglu_proj``: column-sharded — the value/gate halves both split
    cleanly when the model-axis size is even (the [.., 2*inner] boundary at
    ``inner`` then lands on a shard edge),
  * everything else (convs, GroupNorms, time embedding, the non-UNet
    models): replicated. The transformer stacks are ~83% of the measured
    step time (docs/PERF.md r4 trace: 163.7 of 197 ms), so TP-N cuts the
    dominant term by N while replicating the conv residue.

TP serving forces the plain-XLA core (``UNetConfig.force_xla_core``): the
fused Pallas kernels are opaque to GSPMD and would force per-site
all-gathers; the einsum path partitions cleanly. That trade is measured in
the DP direction (the kernels are worth ~+13% single-chip, PERF r2), so TP
only wins where latency — not throughput — is the objective: N chips serving
ONE request cooperatively instead of N independent batches.

Divisibility: head-sharding needs ``model | heads`` (8 for audioldm2-large:
TP-2/4/8); a leaf whose sharded dim doesn't divide stays replicated —
correctness never depends on the rule set.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# projections whose OUTPUT dim (heads*dim_head or 2*ff_inner) splits over
# 'model'; kernel [.., in, out] and (geglu) bias [.., out]
_COL_PARALLEL = {"to_q", "to_k", "to_v", "to_k_ip", "to_v_ip", "geglu_proj"}
# projections whose INPUT dim splits (partial-sum + all-reduce); bias stays
# replicated so GSPMD adds it once after the reduction
_ROW_PARALLEL = {"to_out", "out_proj"}


def _spec_for(path, leaf, n_model: int, heads: int) -> P:
    names = [getattr(k, "key", str(k)) for k in path]
    parent = names[-2] if len(names) >= 2 else ""
    last = names[-1]
    nd = leaf.ndim
    if parent in _COL_PARALLEL:
        # head-boundary alignment: q/k/v reshape [.., H, d] downstream, so
        # the shard edge must land between heads; geglu needs an even split
        # so the value/gate halves separate cleanly
        aligned = (heads % n_model == 0) if parent != "geglu_proj" \
            else (n_model % 2 == 0 or n_model == 1)
        if aligned and leaf.shape[-1] % n_model == 0:
            return P(*([None] * (nd - 1) + ["model"]))
    elif parent in _ROW_PARALLEL and last == "kernel" and nd >= 2:
        aligned = (heads % n_model == 0) if parent == "to_out" \
            else (n_model % 2 == 0 or n_model == 1)
        if aligned and leaf.shape[-2] % n_model == 0:
            return P(*([None] * (nd - 2) + ["model", None]))
    return P()


def tp_unet_shardings(mesh: Mesh, unet_params: Dict[str, Any],
                      heads: int) -> Dict[str, Any]:
    """NamedSharding pytree for the UNet param tree (scan-stacked leaves
    carry leading [L] dims — the rules key off the trailing dims)."""

    n = mesh.shape["model"]
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, _spec_for(p, x, n, heads)),
        unet_params)


def tp_place_params(mesh: Mesh, params: Dict[str, Any],
                    heads: int) -> Dict[str, Any]:
    """Commit the full pipeline param dict: UNet tensor-sharded over
    'model', every other model replicated."""

    rep = NamedSharding(mesh, P())
    out = {}
    for name, tree in params.items():
        if name == "unet":
            out[name] = jax.tree_util.tree_map(
                jax.device_put, tree, tp_unet_shardings(mesh, tree, heads))
        else:
            out[name] = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), tree)
    return out


def count_sharded_leaves(params: Dict[str, Any]) -> int:
    """Number of leaves actually split over 'model' (diagnostics/tests)."""

    n = 0
    for leaf in jax.tree_util.tree_leaves(params):
        spec = getattr(getattr(leaf, "sharding", None), "spec", None)
        if spec is not None and "model" in jax.tree_util.tree_leaves(tuple(spec)):
            n += 1
    return n
