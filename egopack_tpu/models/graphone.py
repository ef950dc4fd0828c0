"""GraphONE: cross-task prototype banks and k-NN interaction.

Covers both halves of the reference's EgoPack machinery:

- ``build_prototypes``: class-averaged task features over the AR train set
  (/root/reference/graphone.py:17-63). TPU-native: a jitted segment-sum over
  joint verb·noun labels, psum-reducible across a data mesh, with the bank
  padded to a static size + validity mask so downstream jits see fixed shapes.
- ``GraphONE``: per-task frozen prototype banks + depth× SAGE(aggr='max',
  bias=False) interaction stages (/root/reference/models/graphONE/graphONE.py:
  13-141).

Parity notes (load-bearing, verified against the reference source):

- prototypes are NEVER updated across depths — each stage re-concatenates the
  *original* bank (graphONE.py:108 uses the unreassigned ``graphone`` arg)
- k-NN edges are computed from the *original* input features every depth
  (``features_match`` is never reassigned), so the edge set is identical at
  every depth regardless of ``update_edges_interval`` — we compute it once
- after self-loops, a feature node aggregates max(k prototypes, itself-current)
  while prototype rows' own updates are discarded
- ``build_graphone`` appends the label batch once per task
  (/root/reference/graphone.py:51-52), inflating the bincount by n_tasks and
  uniformly scaling every prototype by 1/n_tasks; replicated here
- cfg keys ``output_projection``/``dropout``/``output_dropout`` are silently
  swallowed by ``**kwargs`` in the reference constructor and have no effect;
  we accept and ignore them the same way (the final Linear always exists)
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import prototype_topk
from .layers import LayerNorm, TLinear

logger = logging.getLogger(__name__)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
class PrototypeBank:
    """Static-shape prototype bank: padded rows + validity mask.

    Registered as a pytree so banks flow through jit/pjit boundaries and can be
    sharded over a mesh axis (the long-context analog for EgoPack: P grows with
    the seen verb-noun vocabulary, SURVEY.md §5)."""

    def __init__(self, values: jax.Array, mask: jax.Array):
        self.values = values  # (P_pad, F)
        self.mask = mask      # (P_pad,) bool

    @property
    def num_valid(self) -> int:
        return int(np.asarray(self.mask).sum())

    def tree_flatten(self):
        return (self.values, self.mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def finalize_prototypes(sums: Dict[str, jax.Array], counts: jax.Array,
                        pad_multiple: int = 128) -> Dict[str, PrototypeBank]:
    """Divide per-class sums by counts, drop never-seen (verb, noun) combos,
    pad to a static bucket (reference graphone.py:55-61 + static-shape policy).

    ``counts`` is the n_tasks-inflated bincount (see module docstring)."""
    counts = np.asarray(counts)
    seen = counts > 0
    p = int(seen.sum())
    p_pad = max(_round_up(p, pad_multiple), pad_multiple)
    banks = {}
    for task, s in sums.items():
        s = np.asarray(s)
        vals = s[seen] / counts[seen, None]
        padded = np.zeros((p_pad, s.shape[1]), np.float32)
        padded[:p] = vals.astype(np.float32)
        mask = np.zeros(p_pad, bool)
        mask[:p] = True
        banks[task] = PrototypeBank(jnp.asarray(padded), jnp.asarray(mask))
    return banks


class GraphONE(nn.Module):
    """Cross-task prototype interaction.

    Banks are passed as *inputs* (frozen by default, matching
    ``nn.Embedding.from_pretrained(freeze=True)`` at graphONE.py:46-49); conv
    stage weights are the trainable params.
    """

    task_labels: Tuple[str, ...]
    features_size: int = 1024
    hidden_size: int = 1024
    freeze: bool = True
    k: int = 8
    depth: int = 3
    distance_func: str = "cosine"
    residual: bool = False
    mix_strategy: str = "max"
    update_edges_interval: int = 1
    share_params: bool = False
    # accepted-and-ignored reference cfg keys (see module docstring)
    dropout: float = 0.0
    output_dropout: float = 0.0
    output_projection: bool = True

    def setup(self):
        def stage(task, i):
            prefix = "shared" if self.share_params else task
            return {
                "conv_l": TLinear(self.hidden_size, use_bias=False,
                                  name=f"{prefix}_conv{i}_l"),
                "conv_r": TLinear(self.hidden_size, use_bias=False,
                                  name=f"{prefix}_conv{i}_r"),
                "norm": LayerNorm(name=f"{prefix}_norm{i}"),
                "proj": TLinear(self.features_size, name=f"{prefix}_proj{i}"),
            }

        if self.share_params:
            shared = [stage("shared", i) for i in range(self.depth)]
            self.stages = {t: shared for t in self.task_labels}
        else:
            self.stages = {t: [stage(t, i) for i in range(self.depth)]
                           for t in self.task_labels}

    def interact(self, features: Dict[str, jax.Array],
                 banks: Dict[str, PrototypeBank],
                 train: bool = False):
        """Per-task k-NN message passing; returns (updated features dict,
        closest-prototype dict). Features are (M, F) flat node batches."""
        out, closest = {}, {}
        for task in features:
            out[task], closest[task] = self._task_interaction(
                task, features[task], banks[task])
        return out, closest

    def _task_interaction(self, task: str, feats: jax.Array,
                          bank: PrototypeBank):
        bank_vals = bank.values
        if self.freeze:
            bank_vals = jax.lax.stop_gradient(bank_vals)
        # edges: computed once from the ORIGINAL features (parity: the
        # reference recomputes identical edges every depth)
        idx, _ = prototype_topk(feats, bank_vals, bank.mask, self.k,
                                self.distance_func)  # (M, k)
        neighbors = jnp.take(bank_vals, idx, axis=0)  # (M, k, F)

        cur = feats
        for stage in self.stages[task]:
            # SAGE aggr='max' over {k prototypes, self-loop(current)}
            agg = jnp.maximum(neighbors.max(axis=1), cur)
            h = stage["conv_l"](agg) + stage["conv_r"](cur)
            h = stage["norm"](h)
            h = nn.relu(h)
            h = stage["proj"](h)
            cur = h + cur if self.residual else h
        return cur, idx[:, 0]


def make_prototype_step(system, aux_tasks: Tuple[str, ...],
                        n_verbs: int, n_nouns: int):
    """Jitted accumulation step for ``build_prototypes``: one fused program
    computing backbone features, every aux task's projection and the
    segment-sums over joint verb·noun labels (reference graphone.py:38-53 —
    there a per-batch CUDA scatter; here one ``segment_sum`` per task fused by
    XLA, psum-reducible across a data mesh)."""
    size = n_verbs * n_nouns

    @jax.jit
    def step(params, batch):
        feat, node_mask = system.backbone_features(params, batch, "ar",
                                                   train=False, rng=None)
        y = batch["y"]
        m = node_mask & (y[..., 0] != -1)
        labels = jnp.where(m, y[..., 0] * n_nouns + y[..., 1], size)
        flat = labels.reshape(-1)
        cnt = jax.ops.segment_sum(jnp.ones_like(flat, jnp.int32), flat,
                                  num_segments=size + 1)[:size]
        sums = {}
        for t in aux_tasks:
            tf = system.head_apply(params, t, "forward_features", feat)
            sums[t] = jax.ops.segment_sum(
                tf.reshape(-1, tf.shape[-1]).astype(jnp.float32), flat,
                num_segments=size + 1)[:size]
        return sums, cnt

    return step


def build_prototypes(proto_step, params, dataloader, n_verbs: int,
                     n_nouns: int, n_tasks: int,
                     pad_multiple: int = 128) -> Dict[str, PrototypeBank]:
    """Sweep the AR train set and average task features per seen (verb, noun)
    combo (reference graphone.py:17-63). Accumulation is float64 on host
    (mirroring the reference's overflow guard); the bincount is inflated by
    ``n_tasks`` exactly like the reference (see module docstring)."""
    import jax.numpy as _jnp  # noqa: F401 (kept local; host loop below)
    size = n_verbs * n_nouns
    sums: Dict[str, np.ndarray] = {}
    counts = np.zeros(size, np.float64)
    for batch in dataloader:
        device_batch = {k: jnp.asarray(v) for k, v in batch.items()
                        if k in ("x", "y", "valid")}
        s, cnt = proto_step(params, device_batch)
        counts += np.asarray(cnt, np.float64) * n_tasks
        for t, v in s.items():
            acc = sums.setdefault(t, np.zeros((size, v.shape[-1]), np.float64))
            acc += np.asarray(v, np.float64)
    return finalize_prototypes(sums, counts, pad_multiple)
