"""Tensor-parallel (model-axis) param sharding — SURVEY §2.2.

The reference is single-device; these models are ≤ a few M params, so TP is
a demonstration axis (off by default, mesh model=1). It is implemented the
GSPMD way: NO separate model code — a rule table maps param-tree paths to
PartitionSpecs, params (and, via zeros_like, optimizer moments) are placed
with those shardings, and XLA partitions the jitted step and inserts the
collectives over ICI.

Default rules cover the full weight surface: the deconv head dense +
conv/deconv channel dims, the bar-feature denses, every GRU cell's gate
kernels/biases (seq/encoder/conductor), the attention stack's denses
(temporal="attn": inp/qkv/wo/mlp projections), and the latent heads — all
sharded on their output/hidden dim over 'model'. Embeddings, LayerNorm
params, the attn pos_emb table, and any leaf whose sharded dim does not
divide the mesh axis stay replicated (the validation in param_shardings).
Correctness (TP+DP run ≡ replicated run) is asserted in
tests/test_parallel.py on the fake 8-device mesh.
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from musicvae_tpu.parallel.mesh import MODEL_AXIS

# (path regex, PartitionSpec) — first match wins; unmatched ⇒ replicated.
# Paths are '/'-joined param-tree keys, e.g. 'decoder/head/Dense_0/kernel'.
DEFAULT_TP_RULES: List[Tuple[str, P]] = [
    # decoder head: dense into the deconv stack (the widest matmul)
    (r"decoder/head/Dense_0/kernel$", P(None, MODEL_AXIS)),
    (r"decoder/head/Dense_0/bias$", P(MODEL_AXIS)),
    # deconv kernels (kh, kw, out, in): shard the output-channel dim
    # (the final 1-channel head falls back to replicated via validation)
    (r"decoder/head/ConvTranspose_[0-4]/kernel$",
     P(None, None, MODEL_AXIS, None)),
    (r"decoder/head/ConvTranspose_[0-4]/bias$", P(MODEL_AXIS)),
    # patch-stem head (stem="patch"): the final stride-1 conv emits
    # pt·pp (≥128) logit channels — shardable, unlike the parity head's
    # 1-channel deconv
    (r"decoder/head/Conv_0/kernel$", P(None, None, None, MODEL_AXIS)),
    (r"decoder/head/Conv_0/bias$", P(MODEL_AXIS)),
    # bar feature extractors: conv kernels (kh, kw, in, out) on out-channels
    # + the trunk-flatten dense
    (r"(enc_feat|prev_feat).*/Conv_[0-4]/kernel$",
     P(None, None, None, MODEL_AXIS)),
    (r"(enc_feat|prev_feat).*/Conv_[0-4]/bias$", P(MODEL_AXIS)),
    (r"(enc_feat|prev_feat).*/Dense_0/kernel$", P(None, MODEL_AXIS)),
    (r"(enc_feat|prev_feat).*/Dense_0/bias$", P(MODEL_AXIS)),
    # GRU cells (sequence, encoder, conductor): gate kernels [in, H] and
    # recurrent kernels [H, H] shard the hidden dim; GSPMD inserts the
    # per-step gathers for the recurrent operand
    (r"(seq_gru|conductor|enc_gru/GRUCell_\d+)/(ir|iz|in|hr|hz|hn)/kernel$",
     P(None, MODEL_AXIS)),
    (r"(seq_gru|conductor|enc_gru/GRUCell_\d+)/(ir|iz|in|hr|hz|hn)/bias$",
     P(MODEL_AXIS)),
    # attention temporal core (ModelSpec.temporal="attn"): every Dense in
    # the stack sharded on its output dim — qkv [H, 3H], wo [H, H],
    # mlp_up [H, 4H], mlp_dn [4H, H], and the input projection. GSPMD
    # reshards around the head-split einsums; equivalence vs replicated is
    # asserted in tests/test_parallel.py. LayerNorm scales/biases and the
    # pos_emb table stay replicated by design (tiny, elementwise).
    (r"(seq_attn|enc_attn)/(inp|qkv_\d+|wo_\d+|mlp_up_\d+|mlp_dn_\d+)"
     r"/kernel$", P(None, MODEL_AXIS)),
    (r"(seq_attn|enc_attn)/(inp|qkv_\d+|wo_\d+|mlp_up_\d+|mlp_dn_\d+)"
     r"/bias$", P(MODEL_AXIS)),
    # GRU/conductor init projections and the latent heads
    (r"(h_init|cond_init)/kernel$", P(None, MODEL_AXIS)),
    (r"(h_init|cond_init)/bias$", P(MODEL_AXIS)),
    (r"(z_head|phrase_head|bar_head)/Dense_0/kernel$", P(None, MODEL_AXIS)),
    (r"(z_head|phrase_head|bar_head)/Dense_0/bias$", P(MODEL_AXIS)),
]


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def param_shardings(params, mesh: Mesh,
                    rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES):
    """Pytree of NamedShardings matching ``params`` (rule table above).

    Specs are validated against leaf shapes: a spec whose sharded dimension
    does not divide evenly by the mesh axis falls back to replicated (e.g.
    the final 1-channel deconv).
    """
    compiled = [(re.compile(pat), spec) for pat, spec in rules]
    axis_size = mesh.shape[MODEL_AXIS]

    def assign(path, leaf):
        name = _path_str(path)
        for pat, spec in compiled:
            if pat.search(name):
                # rank check FIRST: a spec longer than the leaf's rank must
                # fall back to replicated, not IndexError in the dim check
                if len(spec) <= leaf.ndim and all(
                        dim is None or leaf.shape[i] % axis_size == 0
                        for i, dim in enumerate(spec)):
                    return NamedSharding(mesh, spec)
                break
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_params(params, mesh: Mesh,
                 rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES):
    """Place params on the mesh per the TP rules.

    Works on process-spanning meshes: plain jax.device_put rejects
    shardings with non-addressable devices, so multi-host placement goes
    through parallel/mesh.put_global (every process holds the identical
    full params — deterministic init or a restored checkpoint — and
    uploads only its own devices' shards). Proven by the 2-process DP×TP
    run in tests/test_multiprocess.py.
    """
    shardings = param_shardings(params, mesh, rules)
    if jax.process_count() == 1:
        return jax.device_put(params, shardings)
    from musicvae_tpu.parallel.mesh import put_global
    return jax.tree.map(put_global, params, shardings)
